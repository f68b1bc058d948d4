"""Q11 — session-history semantics (app/app.py:304-334).

The reference renders history newest-first and shows only the best (j==0)
answer per question — a ``row_number() = 1`` window per key.  Generalized to
any (key, ordering): at scale this is one hash-partitioned window, no
driver-side loop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top1_per_key(df: DataFrame, key: str | list[str],
                 order: list[Column],
                 select: list[str] | None = None) -> DataFrame:
    keys = [key] if isinstance(key, str) else key
    w = Window.partitionBy(*keys).orderBy(*order)
    out = (df.withColumn("_rn", F.row_number().over(w))
           .filter(F.col("_rn") == 1)
           .drop("_rn"))
    return out.select(*select) if select else out


def history_pane(history: DataFrame,
                 question_col: str = "question_id",
                 score_col: str = "score",
                 ts_col: str = "asked_at") -> DataFrame:
    """The exact reference shape: per question keep the top-scored answer,
    order questions newest-first (app/app.py:309,324)."""
    return top1_per_key(
        history, key=question_col,
        order=[F.col(score_col).desc()],
    ).orderBy(F.col(ts_col).desc())
