"""Ranking-quality metrics for approximate retrieval: nDCG@k, MRR, recall.

The ANN ladder's recall@10 slots (``ann_*_recall_at_10``) measure SET
overlap only; this module adds the ORDER-AWARE metrics an offline
retrieval evaluation actually reports (public IR methodology — DCG:
Järvelin & Kekäläinen, TOIS 2002):

- graded relevance of an approximate item = ``k + 1 − exact_rank`` when
  the item is in the exact top-k, else 0 (the standard "ideal list as
  ground truth" protocol when no human judgments exist),
- ``nDCG@k = Σ rel_i / log2(i + 1)  /  IDCG`` over the approximate
  list's own order, IDCG computed from the exact list the same way,
- ``MRR = 1 / (first approximate position holding an exact-top-k item)``
  (0 when none is),
- ``recall@k`` = overlap / k (same number the recall slots report,
  carried for the one-row-per-evaluation shape).

Scale posture: both inputs are k-row top-k frames (already
``TakeOrderedAndProject``-bounded by whatever produced them) — every
join and aggregate here touches ≤ k rows, so the metric computation is
free at any corpus size; evaluation cost is the retrieval itself.

Determinism: positions come from ``ROW_NUMBER`` over (score desc, id
asc) — the ladder-wide tie-break — and every output rounds at 6 dp, so
the DuckDB oracle replays the whole evaluation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def ranking_metrics(approx: DataFrame, exact: DataFrame, k: int = 10,
                    id_col: str = "vec_id",
                    score_col: str = "similarity") -> DataFrame:
    """One row: (n_overlap, recall_at_k, mrr, ndcg_at_k) comparing the
    approximate top-k frame against the exact top-k frame.  Both inputs
    must carry ``id_col`` and ``score_col``; ranks are derived here so
    callers pass plain top-k results."""
    w = Window.orderBy(F.col(score_col).desc(), F.col(id_col).asc())
    a = (approx.withColumn("a_rank", F.row_number().over(w))
         .select(id_col, "a_rank").filter(F.col("a_rank") <= k))
    e = (exact.withColumn("e_rank", F.row_number().over(w))
         .select(id_col, "e_rank").filter(F.col("e_rank") <= k))
    joined = (a.join(e, id_col, "left")
              .withColumn("rel", F.coalesce(F.lit(k + 1) - F.col("e_rank"),
                                            F.lit(0))))
    idcg = e.select(
        F.sum((F.lit(k + 1) - F.col("e_rank"))
              / F.log2(F.col("e_rank") + 1)).alias("idcg"))
    agg = joined.agg(
        F.coalesce(F.sum(F.when(F.col("e_rank").isNotNull(), 1)),
                   F.lit(0)).cast("bigint").alias("n_overlap"),
        F.sum(F.col("rel") / F.log2(F.col("a_rank") + 1)).alias("dcg"),
        F.min(F.when(F.col("e_rank").isNotNull(),
                     F.col("a_rank"))).alias("first_hit"))
    return (agg.crossJoin(idcg)
            .select(
                "n_overlap",
                F.round(F.col("n_overlap") / F.lit(float(k)), 3)
                .alias(f"recall_at_{k}"),
                F.round(F.coalesce(1.0 / F.col("first_hit"), F.lit(0.0)), 6)
                .alias("mrr"),
                F.round(F.col("dcg") / F.col("idcg"), 6)
                .alias(f"ndcg_at_{k}")))
