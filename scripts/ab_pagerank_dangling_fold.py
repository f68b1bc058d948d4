"""Paired same-session A/B (VERDICT r11 #6): the dangling-redistribute
PageRank's per-round scheduler floor.

A = shipped operator: per round, persist ranks, then ONE action that
    computes the dangling-mass scalar via a semi-join of ranks against
    the persisted sink-node list.
B = fold variant: the sink flag is carried as a column ON the rank
    vector itself (nodes are joined once up front), so the per-round
    scalar is a conditional aggregate over the cached ranks — the
    semi-join (and its broadcast stage) disappears from every round.

Values must be bit-identical (same math, same 9-dp rounding order).

Run: AB_SF=/root/testdata/sf0.1 python scripts/ab_pagerank_dangling_fold.py
     AB_SF=/tmp/sf1_scaled    python scripts/ab_pagerank_dangling_fold.py
"""
import os
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

SF = os.environ.get("AB_SF", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
spark = (SparkSession.builder.master(f"local[{CPUS}]")
         .config("spark.sql.shuffle.partitions", CPUS)
         .config("spark.ui.enabled", "false")
         .config("spark.driver.memory", "16g")
         .appName("ab-pagerank-dangling").getOrCreate())


def pagerank_fold(edges, src="src", dst="dst", weight="w", iters=3,
                  damping=0.85, round_dp=9):
    """Variant B: dangling='redistribute' with the sink flag carried on
    the rank vector (no per-round semi-join)."""
    from openai_vector_search_demo_spark.caching import scoped_persist
    ein = scoped_persist(
        edges.select(F.col(src).alias("_src"), F.col(dst).alias("_dst"),
                     F.col(weight).alias("_w")))
    srcs = ein.select(F.col("_src").alias("node")).distinct()
    nodes = scoped_persist(
        ein.select(F.col("_src").alias("node"))
        .union(ein.select(F.col("_dst").alias("node"))).distinct()
        .join(srcs.withColumn("_has_out", F.lit(True)), "node", "left")
        .select("node",
                F.coalesce(F.col("_has_out"), F.lit(False)).alias("_out")))
    n = nodes.count()
    outw = ein.groupBy("_src").agg(F.sum("_w").alias("_tw"))
    e = scoped_persist(
        ein.join(outw, "_src")
        .select("_src", "_dst", (F.col("_w") / F.col("_tw")).alias("_p")))
    tele = (1.0 - damping) / n
    ranks = nodes.select("node", "_out",
                         F.round(F.lit(1.0) / F.lit(n), round_dp)
                         .alias("pr"))
    for _ in range(iters):
        ranks = scoped_persist(ranks)
        dm = (ranks.agg(
            F.round(F.coalesce(
                F.sum(F.when(~F.col("_out"), F.col("pr"))), F.lit(0.0)),
                round_dp)).first()[0])
        contrib = (e.join(ranks, e["_src"] == ranks["node"])
                   .groupBy("_dst")
                   .agg(F.sum(F.col("pr") * F.col("_p")).alias("_s"))
                   .withColumnRenamed("_dst", "node"))
        new_pr = F.round(
            F.lit(tele) + F.lit(damping)
            * (F.coalesce(F.col("_s"), F.lit(0.0))
               + F.lit(float(dm)) / F.lit(n)),
            round_dp)
        ranks = (nodes.join(contrib, "node", "left")
                 .select("node", "_out", new_pr.alias("pr")))
    return ranks.select("node", "pr")


def edges_df():
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    return (li.select((-F.col("l_suppkey")).alias("src"),
                      F.col("l_partkey").alias("dst"))
            .groupBy("src", "dst").agg(F.count(F.lit(1)).alias("w")))


def run(fn, **kw):
    from openai_vector_search_demo_spark.caching import cache_scope
    t0 = time.perf_counter()
    with cache_scope():
        ranks = fn(edges_df(), iters=3, **kw)
        rows = (ranks.orderBy(F.col("pr").desc(), F.col("node").asc())
                .limit(20).collect())
    return time.perf_counter() - t0, [(r.node, r.pr) for r in rows]


from openai_vector_search_demo_spark.operators.pagerank import pagerank

_ = run(pagerank, dangling="redistribute")  # warmup
results = {"A_semi_join": [], "B_fold": []}
vals = {}
for trial in range(3):
    for name, thunk in (("A_semi_join",
                         lambda: run(pagerank, dangling="redistribute")),
                        ("B_fold", lambda: run(pagerank_fold))):
        sec, rows = thunk()
        results[name].append(sec)
        vals.setdefault(name, rows)

assert vals["A_semi_join"] == vals["B_fold"], (
    "value drift between variants!",
    vals["A_semi_join"][:3], vals["B_fold"][:3])
print(f"SF={SF}")
for name, ts in results.items():
    print(f"{name}: min={min(ts):.2f}s trials={[round(t, 2) for t in ts]}")
print("top-3 identical:", vals["A_semi_join"][:3])
