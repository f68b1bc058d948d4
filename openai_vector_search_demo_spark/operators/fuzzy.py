"""Fuzzy string matching (entity resolution): all pairs of distinct
values within a bounded edit distance, found by BLOCKED comparison —
never the all-pairs product.

Blocking keys: the FIRST and the LAST whitespace token (each value
enters both blocks; candidates share at least one).  Recall contract,
stated honestly like the LSH operators': a pair is guaranteed found
whenever at least one of the two end tokens survives unchanged — with
``threshold`` = 2 the only escape is a pair whose first AND last tokens
each absorbed an edit (1+1).  The verify step is exact ``levenshtein``
(Spark ≡ DuckDB, parity pinned by ``string_function_surface``), so the
output has no false positives.

At scale: the distinct step collapses the corpus to the value
vocabulary first; blocks are hash-join buckets whose size follows token
frequency, and a hot block (everything called "inc") is the same skew a
hot shingle is — cap or salt it the same way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["fuzzy_match_pairs"]


def fuzzy_match_pairs(df: DataFrame, col: str,
                      threshold: int = 2) -> DataFrame:
    """``(name_a, name_b, distance)`` for distinct values of ``col``
    within ``threshold`` edits, ``name_a < name_b``."""
    if threshold < 1:
        raise ValueError("threshold must be >= 1")
    names = df.select(F.col(col).alias("name")).distinct()
    toks = F.split("name", r"\s+")
    blocks = names.select(
        "name",
        F.explode(F.array_distinct(F.array(
            F.concat(F.lit("F:"), F.element_at(toks, 1)),
            F.concat(F.lit("L:"), F.element_at(toks, -1)),
        ))).alias("blk"))
    a = blocks.select(F.col("name").alias("name_a"), "blk")
    b = blocks.select(F.col("name").alias("name_b"), "blk")
    cand = (a.join(b, "blk")
            .filter(F.col("name_a") < F.col("name_b"))
            .select("name_a", "name_b").distinct())
    return (cand
            .withColumn("distance", F.levenshtein("name_a", "name_b"))
            .filter(F.col("distance") <= threshold))
