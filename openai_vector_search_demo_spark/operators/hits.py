"""HITS (hubs & authorities) with fixed iteration count — the second
link-authority signal of the curation family, next to
``operators.pagerank``.

Why this lives in a training-data engine: crawl curation weighs sources
two ways — PageRank-style global centrality, and HITS-style mutual
reinforcement ("good hubs point at good authorities"), the classic
signal for seed-list expansion and mirror/aggregator detection
(Kleinberg, JACM 1999).  On the fixture the registered query runs the
bipartite supplier→part supply graph (suppliers are pure hubs, parts
pure authorities); the operator is graph-agnostic.

Spark-first shape (third instance of the engine's deterministic
iterative-algorithm pattern, after ``operators.kmeans`` and
``operators.pagerank``):

- the weighted edge relation is normalized and persisted ONCE
  (``scoped_persist``, releasable under ``cache_scope``);
- each iteration is two shuffle joins + two keyed aggregations
  (authority pull then hub pull), each persisted (one row per node)
  and L1-re-normalized by ONE driver-collected scalar per pull that
  re-enters the plan as a literal — the engine's bounded-collect
  pattern (kmeans partials, pagerank's node count).  An in-plan
  broadcast total was rejected: it embeds the upstream chain twice per
  pull, i.e. 2^(2·iters) logical-plan growth;
- **determinism contract**: fixed ``iters``, no RNG, and both score
  vectors are rounded to ``round_dp`` IN-ENGINE after every
  normalization (``F.round`` = HALF_UP = DuckDB ``ROUND``), clipping
  cross-engine float drift each round so an unrolled-CTE DuckDB oracle
  replays the whole loop bit-for-bit.

L1 (sum) normalization is used rather than the textbook L2: it needs
no ``sqrt`` (one fewer libm call to keep bit-aligned across engines),
and scores stay interpretable as shares summing to 1 per side.
Convergence behavior is identical — normalization only rescales.

At 100 TB: per-iteration state is one row per node per side; the edge
relation is the only large operand and shuffles on its join key once
per pull.  ``checkpoint_every=N`` truncates the two score vectors'
lineage every N rounds (same rationale as ``pagerank``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["hits"]


def hits(edges: DataFrame, src: str = "src", dst: str = "dst",
         weight: str = "w", iters: int = 3, round_dp: int = 9,
         checkpoint_every: int | None = None) -> tuple[DataFrame, DataFrame]:
    """Run ``iters`` HITS rounds over a weighted directed edge relation.
    Returns ``(hubs, authorities)`` — ``(node, hub)`` over distinct
    sources and ``(node, auth)`` over distinct destinations, each side
    L1-normalized to sum 1 and rounded at ``round_dp`` in-engine."""
    from openai_vector_search_demo_spark.caching import scoped_persist

    if iters < 1:
        # iters=0 would return (uniform hubs, None) — callers unpacking
        # (hubs, auths) get a None frame.  Mirror the empty-edge check.
        raise ValueError(f"hits: iters must be >= 1, got {iters}")
    e = scoped_persist(
        edges.select(F.col(src).alias("_src"), F.col(dst).alias("_dst"),
                     F.col(weight).alias("_w")))
    hub_nodes = scoped_persist(
        e.select(F.col("_src").alias("node")).distinct())
    auth_nodes = scoped_persist(
        e.select(F.col("_dst").alias("node")).distinct())
    nh = hub_nodes.count()
    if nh == 0:
        raise ValueError("hits: empty edge relation")

    def _l1_normalize(df: DataFrame, col: str) -> DataFrame:
        # The raw pull is persisted (one row per node — bounded) and its
        # L1 total collected as ONE driver scalar, then re-entered as a
        # plan literal.  A `crossJoin(broadcast(df.agg(...)))` total
        # would embed the upstream chain TWICE per pull — 2^(2·iters)
        # logical-plan growth, unanalyzable beyond a few rounds.  The
        # driver scalar keeps plan growth linear in iters (the kmeans /
        # nodes.count() bounded-collect pattern).
        raw = scoped_persist(df)
        total = raw.agg(F.sum(col)).first()[0]
        if not total:
            # All-zero (or all-null) weights: SUM is 0 or NULL and the
            # division would litter every score with null/NaN.  Degenerate
            # input, not a normalization case — fail loudly.
            raise ValueError(
                f"hits: L1 total of '{col}' is {total!r} — all edge "
                "weights along this pull are zero/null; scores are "
                "undefined (check the weight column)")
        return raw.select(
            "node",
            F.round(F.col(col) / F.lit(float(total)), round_dp).alias(col))

    hubs = hub_nodes.select(
        "node", F.round(F.lit(1.0) / F.lit(nh), round_dp).alias("hub"))
    auths = None
    for i in range(iters):
        # authority pull: a(d) = Σ_{s→d} hub(s)·w
        auths = _l1_normalize(
            e.join(hubs, e["_src"] == hubs["node"]).drop("node")
            .groupBy("_dst")
            .agg(F.sum(F.col("hub") * F.col("_w")).alias("auth"))
            .withColumnRenamed("_dst", "node"), "auth")
        # hub pull: h(s) = Σ_{s→d} auth(d)·w
        hubs = _l1_normalize(
            e.join(auths, e["_dst"] == auths["node"]).drop("node")
            .groupBy("_src")
            .agg(F.sum(F.col("auth") * F.col("_w")).alias("hub"))
            .withColumnRenamed("_src", "node"), "hub")
        if checkpoint_every and (i + 1) % checkpoint_every == 0 \
                and (i + 1) < iters:
            hubs = hubs.localCheckpoint(eager=True)
            auths = auths.localCheckpoint(eager=True)
    return hubs, auths
