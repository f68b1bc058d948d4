"""Paired same-session A/B: r10 pagerank (edges re-derived per consumer,
no co-partitioning) vs r11 (persist-once normalized edges, co-partitioned
iteration join) on the part_authority_pagerank workload.

Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python scripts/ab_pagerank_persist.py
"""
import os
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

SF = os.environ.get("AB_SF", os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
spark = (SparkSession.builder.master(f"local[{CPUS}]")
         .config("spark.sql.shuffle.partitions", CPUS)
         .config("spark.ui.enabled", "false")
         .config("spark.driver.memory", "16g")
         .appName("ab-pagerank").getOrCreate())


def pagerank_r10(edges, src="src", dst="dst", weight="w", iters=3,
                 damping=0.85, round_dp=9):
    from openai_vector_search_demo_spark.caching import scoped_persist
    nodes = scoped_persist(
        edges.select(F.col(src).alias("node"))
        .union(edges.select(F.col(dst).alias("node"))).distinct())
    n = nodes.count()
    outw = edges.groupBy(src).agg(F.sum(weight).alias("_tw"))
    e = scoped_persist(
        edges.join(outw, src)
        .select(F.col(src).alias("_src"), F.col(dst).alias("_dst"),
                (F.col(weight) / F.col("_tw")).alias("_p")))
    tele = (1.0 - damping) / n
    ranks = nodes.select("node",
                         F.round(F.lit(1.0) / F.lit(n), round_dp).alias("pr"))
    for _ in range(iters):
        contrib = (e.join(ranks, e["_src"] == ranks["node"])
                   .groupBy("_dst")
                   .agg(F.sum(F.col("pr") * F.col("_p")).alias("_s"))
                   .withColumnRenamed("_dst", "node"))
        ranks = (nodes.join(contrib, "node", "left")
                 .select("node",
                         F.round(F.lit(tele) + F.lit(damping)
                                 * F.coalesce(F.col("_s"), F.lit(0.0)),
                                 round_dp).alias("pr")))
    return ranks


def edges_df():
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    items = li.select("l_orderkey", "l_partkey").distinct()
    a = items.select("l_orderkey", F.col("l_partkey").alias("src"))
    b = items.select("l_orderkey", F.col("l_partkey").alias("dst"))
    return (a.join(b, "l_orderkey")
            .filter(F.col("src") != F.col("dst"))
            .groupBy("src", "dst").agg(F.count(F.lit(1)).alias("w")))


def run(fn):
    from openai_vector_search_demo_spark.caching import cache_scope
    t0 = time.perf_counter()
    with cache_scope():
        ranks = fn(edges_df(), iters=3)
        top = (ranks.orderBy(F.col("pr").desc(), F.col("node").asc())
               .limit(20))
        rows = top.collect()
    return time.perf_counter() - t0, [(r.node, r.pr) for r in rows]


from openai_vector_search_demo_spark.operators.pagerank import pagerank

# warmup (JIT/IO) once with the new path at tiny scale
_ = run(pagerank)
results = {"r10": [], "r11": []}
vals = {}
for trial in range(3):
    t, v = run(pagerank_r10); results["r10"].append(round(t, 3)); vals["r10"] = v
    t, v = run(pagerank); results["r11"].append(round(t, 3)); vals["r11"] = v
print("values identical:", vals["r10"] == vals["r11"])
print({k: (min(v), sorted(v)) for k, v in results.items()})
