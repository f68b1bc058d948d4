"""Maximal Marginal Relevance (MMR) diversified retrieval — Carbonell &
Goldstein 1998 (SIGIR, public): rerank a candidate pool so results are
relevant to the query but not redundant with each other,

    MMR(d) = λ·sim(q, d) − (1−λ)·max_{s ∈ S} sim(d, s)

selected greedily k times (first pick is pure relevance — S is empty).

Plain KNN returns near-duplicates when the corpus has them (and a
deduplicated training corpus is exactly where the near-dups that remain
are the interesting ones); MMR is the standard retrieval-side fix.

Plan shape: the candidate POOL comes from the distributed KNN
(``operators.knn.knn`` — TakeOrderedAndProject over the corpus, the
scale-bearing stage); the greedy loop then runs over that BOUNDED pool
(``fetch_k`` rows) as k chained tiny plan rounds — each round an
anti-join + cross-join against the ≤ k selected rows + one argmax
``limit(1)``, lineage-cut with ``localCheckpoint`` so round r does not
re-evaluate rounds 1..r−1.  Nothing reaches the driver; the sequential
dependency is inherent to greedy MMR, and every round touches
O(fetch_k · |S|) rows.
``candidates`` SHOULD be persisted by the caller when it is not a trivial
scan — each round re-evaluates it otherwise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from openai_vector_search_demo_spark.functions.vectors import (
    cosine_similarity,
)

__all__ = ["mmr_select"]


def mmr_select(candidates: DataFrame, k: int, lam: float = 0.5,
               id_col: str = "vec_id", vec_col: str = "embedding",
               rel_col: str = "rel") -> DataFrame:
    """Greedy MMR over a scored candidate pool.

    ``candidates`` must carry ``id_col``, ``vec_col`` and ``rel_col``
    (= sim(q, d), typically from ``knn``).  Returns
    ``(rank, <id_col>, <rel_col>)`` — ``rank`` is selection order.
    Deterministic: every argmax tie-breaks on the id.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    if not 0.0 <= lam <= 1.0:
        raise ValueError("lam must be in [0, 1]")

    cand = candidates.select(F.col(id_col).alias("id"),
                             F.col(vec_col).alias("v"),
                             F.col(rel_col).alias("rel"))
    selected: DataFrame | None = None
    for r in range(1, k + 1):
        if selected is None:
            pick = (cand.orderBy(F.col("rel").desc(), F.col("id").asc())
                    .limit(1))
        else:
            sel = selected.select(F.col("id").alias("sid"),
                                  F.col("v").alias("sv"))
            # aliased key → fresh attribute ids: a checkpointed plan keeps
            # its exprIds, and joining it back against its own ancestor
            # trips "conflicting references" resolution
            rem = cand.join(sel.select("sid"),
                            F.col("id") == F.col("sid"),
                            "left_anti")
            scored = (rem.crossJoin(sel)
                      .withColumn("s", cosine_similarity("v", "sv"))
                      .groupBy("id")
                      .agg(F.first("v").alias("v"),
                           F.first("rel").alias("rel"),
                           F.max("s").alias("ms"))
                      .withColumn("mmr", F.lit(lam) * F.col("rel")
                                  - F.lit(1.0 - lam) * F.col("ms")))
            pick = (scored.orderBy(F.col("mmr").desc(), F.col("id").asc())
                    .limit(1).select("id", "v", "rel"))
        # cut lineage each round: pick_r's plan contains every earlier
        # round's — without this, round r re-evaluates rounds 1..r−1 and
        # the chain goes exponential (the duplicate_clusters pattern; the
        # materialized state is ≤ k rows)
        pick = pick.withColumn("rank", F.lit(r)).localCheckpoint(eager=True)
        selected = pick if selected is None else selected.unionByName(pick)
    return selected.select("rank", F.col("id").alias(id_col),
                           F.col("rel").alias(rel_col))
