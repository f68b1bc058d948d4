#!/usr/bin/env python
"""Training-data curation demo — the LLM-pipeline side of the engine.

Walks a corpus through the round-7 data-prep stages and prints what each
one did, ending with the packed training layout:

1. exact-substring scrub (corpus-repeated 5-grams removed — the
   arXiv:2107.06499 pass at n-gram granularity),
2. unigram-LM fluency scoring retrained on the scrubbed text,
3. decontamination against a held-out eval split,
4. fluency/length gates,
5. sequence packing into fixed token-budget bins,
6. deterministic shard manifest for the packed survivors.

Run:  python examples/curation_demo.py [sf_dir]
Defaults to /root/testdata/sf0.001.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from openai_vector_search_demo_spark.functions.text_analysis import (  # noqa: E402
    token_count,
    unigram_lm_scores,
)
from openai_vector_search_demo_spark.operators.dedup import (  # noqa: E402
    decontaminate,
)
from openai_vector_search_demo_spark.operators.packing import (  # noqa: E402
    pack_sequences,
    pack_stats,
)
from openai_vector_search_demo_spark.operators.sharding import (  # noqa: E402
    shard_manifest,
)
from openai_vector_search_demo_spark.operators.substrings import (  # noqa: E402
    repeated_ngram_dedup,
)
from openai_vector_search_demo_spark.caching import (  # noqa: E402
    cache_scope,
    scoped_persist,
)
from openai_vector_search_demo_spark.session import get_spark  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("curation-demo")
    spark.sparkContext.setLogLevel("ERROR")
    # One batch, one cache scope: every persist the operators take below
    # (the scrub buffer, the LM counts, decontamination shingles) is
    # released when the block exits — the per-batch storage contract a
    # long-lived curation service would use (caching.cache_scope).
    with cache_scope():
        rc = _run(spark, sf_dir)
    spark.stop()
    return rc


def _run(spark, sf_dir: str) -> int:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id", "text")
    n0 = docs.count()
    print(f"corpus: {n0} documents from {sf_dir}")

    scrub = repeated_ngram_dedup(docs, n=5, min_df=2)
    removed = scrub.agg(F.sum("n_removed"), F.sum("n_tokens")).first()
    scrubbed = scoped_persist(
        scrub.filter(F.col("cleaned") != "")
             .select(F.col("id").alias("doc_id"),
                     F.col("cleaned").alias("text")))
    n1 = scrubbed.count()
    print(f"1. substring scrub: removed {removed[0]}/{removed[1]} tokens; "
          f"{n0 - n1} docs fully scrubbed, {n1} remain")

    lm = unigram_lm_scores(scrubbed)
    q = lm.agg(F.min("avg_logprob"), F.expr("median(avg_logprob)"),
               F.max("avg_logprob")).first()
    print(f"2. unigram-LM scores (retrained on scrubbed): "
          f"min {q[0]:.3f} / median {q[1]:.3f} / max {q[2]:.3f}")

    bench = docs.filter(F.col("doc_id") % 97 == 0)
    corp = scrubbed.filter(F.col("doc_id") % 97 != 0)
    cont = decontaminate(corp, bench, k=3, min_hits=1)
    n_cont = cont.filter("contaminated").count()
    print(f"3. decontamination: eval split {bench.count()} docs; "
          f"{n_cont} corpus docs flagged")

    surv = (lm.join(cont.filter(~F.col("contaminated")).select("doc_id"),
                    "doc_id")
            .filter((F.col("n_tokens") >= 20)
                    & (F.col("avg_logprob") >= -3.5)))
    n2 = surv.count()
    print(f"4. gates (>=20 tokens, avg_logprob >= -3.5): {n2} survivors")

    packed = pack_sequences(surv.select("doc_id", "n_tokens"),
                            budget=512, num_groups=8)
    stats = pack_stats(packed, budget=512)
    nbins = stats.count()
    tok = surv.agg(F.sum("n_tokens")).first()[0]
    print(f"5. packing: {tok} tokens -> {nbins} bins of 512 "
          f"across 8 groups")

    manifest = shard_manifest(
        surv.join(docs, "doc_id").select("doc_id", "text"),
        "doc_id", 4, salt="ep1", token_count=token_count("text"))
    print("6. shard manifest (4 shards, epoch-1 permutation):")
    for r in manifest.orderBy("shard").collect():
        print(f"   shard {r.shard}: {r.n_docs} docs, {r.n_tokens} tokens")

    # 7. (r12) the named curation stages on the scrubbed corpus:
    #    Gopher rule audit + CCNet head/middle/tail LM bucketing
    from pyspark.sql import Window

    from openai_vector_search_demo_spark.functions.text_analysis import (
        tokens as _toks,
    )
    toks = _toks("text")  # scrubbed carries the cleaned text as `text`
    gop = (scrubbed
           .select(F.size(toks).alias("nw"),
                   F.size(F.array_distinct(F.filter(
                       toks, lambda t: t.isin("the", "be", "to", "of",
                                              "and", "that", "have",
                                              "with")))).alias("ns"))
           .agg(F.sum((F.col("nw").between(20, 100000)
                       & (F.col("ns") >= 1)).cast("int")).alias("ok"),
                F.count(F.lit(1)).alias("n")).first())
    print(f"7. gopher gate (>=20 words post-scrub + stop-word rule): "
          f"{gop.ok}/{gop.n} pass")
    buck = (lm.join(scrubbed.select("doc_id"), "doc_id")
            .withColumn("b", F.ntile(3).over(
                Window.orderBy(F.col("avg_logprob").desc(),
                               F.col("doc_id").asc())))
            .groupBy("b").agg(F.count(F.lit(1)).alias("n"),
                              F.round(F.avg("avg_logprob"), 3).alias("lp"))
            .orderBy("b").collect())
    names = {1: "head", 2: "middle", 3: "tail"}
    print("8. ccnet buckets:",
          ", ".join(f"{names[r.b]}={r.n} (lp {r.lp})" for r in buck))
    return 0


if __name__ == "__main__":
    sys.exit(main())
