"""Weighted PageRank with a fixed iteration count — link-authority
scoring as a deterministic, oracle-checkable DataFrame loop.

Why this lives in a training-data engine: web-scale curation pipelines
weight documents by SOURCE AUTHORITY — harmonic/PageRank centrality
over the hyperlink graph is the classic crawl-prioritization and
quality-weighting signal (the CommonCrawl lineage: rank hosts, crawl
and keep the authoritative tail first).  The fixture has no hyperlink
table, so the registered query derives a deterministic co-purchase
graph from ``lineitem`` (the ``market_basket_pairs`` bounded self-join)
and ranks parts — the OPERATOR is graph-agnostic: any weighted directed
edge relation works.

Spark-first shape (the second instance of the engine's deterministic
iterative-algorithm pattern, after ``operators.kmeans``):

- Transition probabilities ``p = w / Σ_out w`` are computed ONCE and
  persisted (``scoped_persist`` — releasable under ``cache_scope``).
- Each iteration is one shuffle join (ranks ⋈ edges on src) + one
  aggregation keyed by dst + a left join back to the node set so
  sink-less nodes keep their teleport mass.  Nothing driver-side but
  the node COUNT (one scalar).
- **Determinism contract** (same discipline as kmeans): fixed ``iters``,
  no RNG, and ranks are rounded to ``round_dp`` IN-ENGINE each
  iteration (``F.round`` = HALF_UP = DuckDB ``ROUND``), so cross-engine
  float drift in the per-dst sums is clipped every round instead of
  compounding — what makes an unrolled-CTE DuckDB oracle replay the
  whole loop bit-for-bit.

At 100 TB: the edge relation shuffles once per iteration on ``src``
(pre-partitioning edges AND ranks by the join key makes the join
exchange-free after the first round); per-iteration state is one row
per node.  Dangling mass: the registered co-occurrence graph is
bidirectional so every node has out-edges; for general graphs callers
should add the standard dangling-redistribution term before trusting
absolute mass (documented, not silently assumed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pagerank"]


def pagerank(edges: DataFrame, src: str = "src", dst: str = "dst",
             weight: str = "w", iters: int = 3, damping: float = 0.85,
             round_dp: int = 9) -> DataFrame:
    """Rank nodes of a weighted directed edge relation; returns
    ``(node, pr)`` with ``Σ pr ≈ 1`` over nodes reachable as endpoints.
    Fixed ``iters`` power rounds from the uniform vector."""
    from openai_vector_search_demo_spark.caching import scoped_persist

    nodes = scoped_persist(
        edges.select(F.col(src).alias("node"))
        .union(edges.select(F.col(dst).alias("node"))).distinct())
    n = nodes.count()
    if n == 0:
        raise ValueError("pagerank: empty edge relation")
    outw = edges.groupBy(src).agg(F.sum(weight).alias("_tw"))
    e = scoped_persist(
        edges.join(outw, src)
        .select(F.col(src).alias("_src"), F.col(dst).alias("_dst"),
                (F.col(weight) / F.col("_tw")).alias("_p")))
    tele = (1.0 - damping) / n
    ranks = nodes.select("node",
                         F.round(F.lit(1.0) / F.lit(n), round_dp)
                         .alias("pr"))
    for _ in range(iters):
        contrib = (e.join(ranks, e["_src"] == ranks["node"])
                   .groupBy("_dst")
                   .agg(F.sum(F.col("pr") * F.col("_p")).alias("_s"))
                   .withColumnRenamed("_dst", "node"))
        ranks = (nodes.join(contrib, "node", "left")
                 .select("node",
                         F.round(F.lit(tele)
                                 + F.lit(damping)
                                 * F.coalesce(F.col("_s"), F.lit(0.0)),
                                 round_dp).alias("pr")))
    return ranks
