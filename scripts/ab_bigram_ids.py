#!/usr/bin/env python
"""Paired same-session A/B: r9 string-keyed bigram window vs r10
dictionary-id window (BASELINE.md method — one JVM, alternating runs,
both orders, min-of-N).  The shared doc_pair_counts cache is warmed
first so the comparison isolates the shuffle/window difference.

Usage: python scripts/ab_bigram_ids.py [sf_dir] [n_rounds]
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

sys.path.insert(0, ".")

from openai_vector_search_demo_spark.functions.text_analysis import (  # noqa: E402
    bigram_lm_scores,
    doc_pair_counts,
)

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
N = int(sys.argv[2]) if len(sys.argv) > 2 else 5


def bigram_old(df, id_col="doc_id", lam=0.7):
    """The r9 implementation verbatim: string-keyed window + post-window
    vocab join."""
    dbc = doc_pair_counts(df, "text", id_col, cache=True)
    dbc.count()
    vocab = dbc.groupBy("tk").agg(F.sum("ct").alias("c"))
    stats = vocab.agg(F.sum("c").alias("n"), F.count("*").alias("v"))
    ptot = (dbc.filter(F.col("prev").isNotNull())
            .groupBy("prev").agg(F.sum("ct").alias("pc")))
    uni_p = (F.col("c") + F.lit(1)) / (F.col("n") + F.col("v"))
    lp = F.when(
        F.col("prev").isNull(), F.log(uni_p)
    ).otherwise(F.log(F.lit(lam) * F.coalesce(F.col("bc") / F.col("pc"),
                                              F.lit(0.0))
                      + F.lit(1.0 - lam) * uni_p))
    w_bt = Window.partitionBy("prev", "tk")
    return (dbc.withColumn("bc", F.sum("ct").over(w_bt))
            .join(F.broadcast(vocab), "tk")
            .crossJoin(F.broadcast(stats))
            .join(F.broadcast(ptot), ["prev"], "left")
            .groupBy(id_col)
            .agg(F.sum("ct").alias("n_tokens"),
                 F.round(F.sum(F.col("ct") * lp) / F.sum("ct"), 6)
                 .alias("avg_logprob")))


def bigram_new2(df, id_col="doc_id", lam=0.7):
    """Refined id variant: vmap persisted (built once), ptot from dbc."""
    dbc = doc_pair_counts(df, "text", id_col, cache=True)
    dbc.count()
    vocab = dbc.groupBy("tk").agg(F.sum("ct").alias("c"))
    stats = vocab.agg(F.sum("c").alias("n"), F.count("*").alias("v"))
    vmap = vocab.select(
        "tk", F.row_number().over(Window.orderBy("tk")).alias("tid"),
        "c").persist()
    vmap.count()
    ptot = (dbc.filter(F.col("prev").isNotNull())
            .groupBy("prev").agg(F.sum("ct").alias("pc"))
            .join(vmap.select(F.col("tk").alias("prev"),
                              F.col("tid").alias("pid")), "prev")
            .select("pid", "pc"))
    stream = (dbc.join(F.broadcast(vmap), "tk")
              .join(F.broadcast(vmap.select(F.col("tk").alias("prev"),
                                            F.col("tid").alias("pid"))),
                    ["prev"], "left")
              .select(id_col, "pid", "tid", "ct", "c"))
    uni_p = (F.col("c") + F.lit(1)) / (F.col("n") + F.col("v"))
    lp = F.when(
        F.col("pid").isNull(), F.log(uni_p)
    ).otherwise(F.log(F.lit(lam) * F.coalesce(F.col("bc") / F.col("pc"),
                                              F.lit(0.0))
                      + F.lit(1.0 - lam) * uni_p))
    w_bt = Window.partitionBy("pid", "tid")
    out = (stream.withColumn("bc", F.sum("ct").over(w_bt))
           .crossJoin(F.broadcast(stats))
           .join(F.broadcast(ptot), ["pid"], "left")
           .groupBy(id_col)
           .agg(F.sum("ct").alias("n_tokens"),
                F.round(F.sum(F.col("ct") * lp) / F.sum("ct"), 6)
                .alias("avg_logprob")))
    return out


def bigram_new3(df, id_col="doc_id", lam=0.7):
    """r9 string plan, but the window partitions by
    (xxhash64(prev,tk), prev, tk) — identical groups (the hash is a
    function of the keys), int-first sort comparisons."""
    dbc = doc_pair_counts(df, "text", id_col, cache=True)
    dbc.count()
    vocab = dbc.groupBy("tk").agg(F.sum("ct").alias("c"))
    stats = vocab.agg(F.sum("c").alias("n"), F.count("*").alias("v"))
    ptot = (dbc.filter(F.col("prev").isNotNull())
            .groupBy("prev").agg(F.sum("ct").alias("pc")))
    uni_p = (F.col("c") + F.lit(1)) / (F.col("n") + F.col("v"))
    lp = F.when(
        F.col("prev").isNull(), F.log(uni_p)
    ).otherwise(F.log(F.lit(lam) * F.coalesce(F.col("bc") / F.col("pc"),
                                              F.lit(0.0))
                      + F.lit(1.0 - lam) * uni_p))
    w_bt = Window.partitionBy(F.xxhash64("prev", "tk"), F.col("prev"),
                              F.col("tk"))
    return (dbc.withColumn("bc", F.sum("ct").over(w_bt))
            .join(F.broadcast(vocab), "tk")
            .crossJoin(F.broadcast(stats))
            .join(F.broadcast(ptot), ["prev"], "left")
            .groupBy(id_col)
            .agg(F.sum("ct").alias("n_tokens"),
                 F.round(F.sum(F.col("ct") * lp) / F.sum("ct"), 6)
                 .alias("avg_logprob")))


def main():
    spark = (SparkSession.builder.master("local[32]")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.ui.enabled", "false")
             .config("spark.driver.memory", "16g")
             .appName("ab-bigram").getOrCreate())
    docs = spark.read.parquet(f"{SF}/documents.parquet")

    # warm the shared pair-count cache + JIT both plans once
    r_old = sorted((r.doc_id, r.n_tokens, r.avg_logprob)
                   for r in bigram_old(docs).collect())
    r_new = sorted((r.doc_id, r.n_tokens, r.avg_logprob)
                   for r in bigram_lm_scores(docs).collect())
    assert r_old == r_new, "A/B variants disagree on values!"
    print(f"values identical over {len(r_old)} docs", flush=True)

    def run(fn):
        # bench.py protocol: cold caches each timed run — several
        # operators persist() reused subtrees, and the driver's bench
        # clears the cache before every run, so the honest comparison
        # includes the cache-population cost
        spark.catalog.clearCache()
        t0 = time.monotonic()
        fn(docs).collect()
        return time.monotonic() - t0

    r_new3 = sorted((r.doc_id, r.n_tokens, r.avg_logprob)
                    for r in bigram_new3(docs).collect())
    assert r_old == r_new3, "new3 disagrees on values!"

    accs = {"old(strings)": [], "new3(hash1st)": []}
    fns = {"old(strings)": bigram_old, "new3(hash1st)": bigram_new3}
    for i in range(N):
        order = list(accs)
        if i % 2:
            order = order[::-1]
        for key in order:
            accs[key].append(run(fns[key]))
    fmt = lambda xs: "[" + ", ".join(f"{x:.3f}" for x in xs) + "]"
    print(f"SF={SF} N={N}")
    for key, xs in accs.items():
        print(f"{key}: min={min(xs):.3f} med={sorted(xs)[N//2]:.3f} "
              f"all={fmt(xs)}")


if __name__ == "__main__":
    main()
