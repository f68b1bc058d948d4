"""SemDeDup — semantic deduplication by embedding clustering (Abbas et
al. 2023, "SemDeDup: Data-efficient learning at web-scale through semantic
deduplication", arXiv:2303.09540 — public).

The 100 TB shape of embedding-space dedup: instead of all-pairs cosine
(quadratic in the corpus) or LSH buckets (recall limited by random
planes), cluster the embedding space and compare ONLY within clusters —
the cluster size bounds every quadratic, and the assignment is one
codegen pass over centroid literals (``operators.ann.ivf_cell``).  Within
each near-duplicate group the kept representative is the member with the
LOWEST cosine similarity to its cluster centroid (the paper's keep rule:
prefer the outlier, it carries the most marginal information), ties to the
smallest id.

Plan: centroid assignment (map-only) → within-cell self-join on the cell
key (shuffle by cell; in-cell quadratic is the *deliberate* SemDeDup
trade, bounded by cluster granularity) → connected components
(``operators.dedup.duplicate_clusters`` large-star/small-star) → one
window per cluster for the keep rule.  No driver collect beyond
``duplicate_clusters``'s documented bounded probe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from openai_vector_search_demo_spark.functions.vectors import (
    cosine_similarity,
)
from openai_vector_search_demo_spark.operators.ann import ivf_cell
from openai_vector_search_demo_spark.operators.dedup import duplicate_clusters

__all__ = ["semdedup"]


def _centroid_sim(vec_col: str, centroids: list[list[float]]) -> F.Column:
    """Cosine of each row's vector to ITS OWN cell centroid — a when-chain
    over the centroid literals (fine for the usual 2^4..2^10 clusters; at
    extreme nlist switch to a broadcast-join against a centroid table)."""
    expr = F.lit(None).cast("double")
    for cell, c in enumerate(centroids):
        lit_vec = F.array(*[F.lit(float(x)) for x in c])
        expr = F.when(F.col("cell") == cell,
                      cosine_similarity(vec_col, lit_vec)).otherwise(expr)
    return expr


def semdedup(df: DataFrame, centroids: list[list[float]],
             id_col: str = "vec_id", vec_col: str = "embedding",
             threshold: float = 0.95) -> DataFrame:
    """Cluster-prefiltered semantic dedup.  Returns one row per member of
    every near-duplicate group: ``(id, cell, cluster_id, sim_centroid,
    keep)`` — ``keep`` marks the group's one retained representative.
    Documents in no group are implicitly kept and emit no row (same
    contract as ``duplicate_clusters``)."""
    cells = (df.select(F.col(id_col).alias("id"),
                       F.col(vec_col).alias("v"))
               .withColumn("cell", ivf_cell("v", centroids)))

    a = cells.select(F.col("id").alias("id_a"), F.col("v").alias("v_a"),
                     "cell")
    b = cells.select(F.col("id").alias("id_b"), F.col("v").alias("v_b"),
                     "cell")
    pairs = (a.join(b, "cell")
             .filter(F.col("id_a") < F.col("id_b"))
             .withColumn("cos", cosine_similarity("v_a", "v_b"))
             .filter(F.col("cos") >= threshold)
             .select("id_a", "id_b"))

    clusters = duplicate_clusters(pairs)          # (id, cluster_id)

    info = cells.withColumn("sim_centroid",
                            _centroid_sim("v", centroids)).drop("v")
    members = clusters.join(info, "id")
    w = Window.partitionBy("cluster_id").orderBy(F.col("sim_centroid").asc(),
                                                 F.col("id").asc())
    return (members
            .withColumn("keep", F.row_number().over(w) == 1)
            .select("id", "cell", "cluster_id",
                    F.round("sim_centroid", 6).alias("sim_centroid"),
                    "keep"))
