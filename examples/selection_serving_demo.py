#!/usr/bin/env python
"""Data-selection + index-serving demo — the round-11 families end to end.

1. DSIR importance resampling (arXiv:2302.03169's hashed-n-gram data
   selection): score every pool doc by how target-like its feature
   profile is, then draw a Gumbel-top-k sample,
2. template-family detection: triangle density over the near-dup graph,
3. Z-order the selected corpus for multi-key scan pruning,
4. build the IVFADC vector index on half the corpus, then MERGE the
   rest in incrementally (upsert + cell-local tombstones) and show the
   upserted store serves the same top-k a full rebuild would,
5. (late r11) the curation gate suite: PSI/JSD snapshot drift, the
   per-source quota cap, mixture-allocation planning, and the
   split-leakage audit,
6. (late r11) the 8-byte binary-signature serving tier: write the
   signature store, serve Hamming-shortlist + exact-refine top-k,
7. (late r11) the composed cell-pruned binary rung,
8. (r12) the SQ8 byte-per-dim tier: min/max train + code store,
9. (r12) the NSW graph tier incl. an insert-only upsert that serves
   the full-rebuild answer (merge-on-read adjacency),
10. (r12) the lexical side: stored inverted index + bucket-pruned BM25.

Run:  python examples/selection_serving_demo.py [sf_dir]
Defaults to /root/testdata/sf0.001.
"""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from openai_vector_search_demo_spark.ann_pretrained import (  # noqa: E402
    IVF_TRAINED_CENTROIDS,
)
from openai_vector_search_demo_spark.caching import cache_scope  # noqa: E402
from openai_vector_search_demo_spark.operators.dedup import (  # noqa: E402
    ngram_jaccard_pairs,
)
from openai_vector_search_demo_spark.operators.dsir import (  # noqa: E402
    dsir_resample,
)
from openai_vector_search_demo_spark.operators.layout import (  # noqa: E402
    zorder_write,
)
from openai_vector_search_demo_spark.operators.pq import (  # noqa: E402
    ivfpq_stored_knn,
    upsert_ivfpq_index,
    write_ivfpq_index,
)
from openai_vector_search_demo_spark.operators.triangles import (  # noqa: E402
    triangle_counts,
    undirected_edges,
)
from openai_vector_search_demo_spark.pq_residual_pretrained import (  # noqa: E402
    PQR_CODEBOOKS,
)
from openai_vector_search_demo_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("selection-serving-demo", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")

    with cache_scope():
        # 1. DSIR: target = the English slice, pool = everything
        picked = dsir_resample(docs, docs.where(F.col("lang") == "en"),
                               k=30, target_within_pool=True)
        rows = picked.join(docs.select("doc_id", "lang"), "doc_id").collect()
        n_en = sum(r.lang == "en" for r in rows)
        print(f"1. DSIR drew 30 of {docs.count()} docs; "
              f"{n_en} are 'en' (target-likeness pulls the draw)")

        # 2. triangle density over the near-dup graph
        pairs = (ngram_jaccard_pairs(docs.select("doc_id", "text"),
                                     k=3, threshold=0.4,
                                     max_shingle_df=None)
                 .select(F.col("id_a").alias("a"), F.col("id_b").alias("b")))
        tri = triangle_counts(undirected_edges(pairs))
        dense = tri.where(F.col("triangles") > 0)
        print(f"2. near-dup graph: {tri.count()} nodes, "
              f"{dense.count()} sit in template families (triangles > 0)")

    with tempfile.TemporaryDirectory() as tmp:
        # 3. Z-order layout on (doc_id % 64, n_chars): scans filtered on
        #    EITHER key prune files via footer stats
        laid = docs.withColumn("bucket",
                               (F.col("doc_id") % 64).cast("long"))
        zorder_write(laid, f"{tmp}/docs_z", ["bucket", "n_chars"],
                     num_files=8)
        print(f"3. z-ordered corpus written to 8 curve-segment files")

        # 4. incremental IVFADC: write half, upsert the rest, serve
        base = emb.filter(F.col("vec_id") != 0)
        qvec = emb.filter(F.col("vec_id") == 0).first().embedding
        store = f"{tmp}/ivfpq"
        write_ivfpq_index(base.filter(F.col("vec_id") % 2 == 1), store,
                          IVF_TRAINED_CENTROIDS, PQR_CODEBOOKS)
        upsert_ivfpq_index(spark, base.filter(F.col("vec_id") % 2 == 0),
                           store, IVF_TRAINED_CENTROIDS, PQR_CODEBOOKS)
        top = ivfpq_stored_knn(spark, store, qvec, IVF_TRAINED_CENTROIDS,
                               PQR_CODEBOOKS, nprobe=24, k=5).collect()
        print("4. upserted IVFADC store serves top-5:",
              [(r.vec_id, round(r.adc_dist, 4)) for r in top])

        # 5. the curation gate suite in one pass
        from openai_vector_search_demo_spark.functions import (
            text_analysis as ta,
        )
        from openai_vector_search_demo_spark.operators.drift import (
            drift_report,
        )
        scored = ta.with_quality_score(docs)
        feats = {"lang": F.col("lang"),
                 "len_b": F.least(F.floor(F.length("text") / 500.0),
                                  F.lit(20))}
        rep = {r.feature: r.psi for r in drift_report(
            scored, F.col("doc_id") % 2, feats).collect()}
        worst = max(rep, key=rep.get)
        print(f"5. drift gate: worst feature {worst!r} PSI={rep[worst]:.4f}"
              f" ({'STABLE' if rep[worst] < 0.1 else 'ALERT'}"
              " at the 0.1 line)")

        # 6. binary serving tier: 8 B/vector signature store + refine
        from openai_vector_search_demo_spark.operators.hamming import (
            hamming_stored_knn,
            write_hamming_index,
        )
        sig_store = f"{tmp}/sigs"
        write_hamming_index(base, sig_store, dim=len(qvec))
        btop = hamming_stored_knn(spark, sig_store, base, qvec,
                                  k=5, shortlist=100).collect()
        print("6. binary store (8 B/vec, zero training) serves top-5:",
              [(r.vec_id, round(r.similarity, 4)) for r in btop])

        # 7. the composed rung: cell-pruned binary store (the cheapest
        #    read path — ~(nprobe/nlist) x 8 B/row)
        from openai_vector_search_demo_spark.operators.hamming import (
            ivf_hamming_stored_knn,
            write_ivf_hamming_index,
        )
        comp_store = f"{tmp}/ivfham"
        write_ivf_hamming_index(base, comp_store, IVF_TRAINED_CENTROIDS)
        ctop = ivf_hamming_stored_knn(spark, comp_store, base, qvec,
                                      IVF_TRAINED_CENTROIDS, nprobe=24,
                                      k=5, shortlist=100).collect()
        print("7. cell-pruned binary store (24/64 cells) serves top-5:",
              [(r.vec_id, round(r.similarity, 4)) for r in ctop])

        # 8. (r12) SQ8 byte-per-dim tier: min/max train, code store,
        #    codes-only scan + exact refine
        from openai_vector_search_demo_spark.operators.sq import (
            sq8_stored_knn,
            sq8_train,
            write_sq8_index,
        )
        mins, maxs = sq8_train(base)
        sq_store = f"{tmp}/sq8"
        write_sq8_index(base, sq_store, mins, maxs)
        stop_ = sq8_stored_knn(spark, sq_store, base, qvec, mins, maxs,
                               k=5).collect()
        print("8. SQ8 code store (64 B/vec, min/max train) serves top-5:",
              [(r.vec_id, round(r.similarity, 4)) for r in stop_])

        # 9. (r12) graph tier: kNN-graph store, beam serving, then
        #    insert-only upsert that provably equals a full rebuild
        from openai_vector_search_demo_spark.operators.nsw import (
            nsw_stored_knn,
            upsert_nsw_index,
            write_nsw_index,
        )
        gstore = f"{tmp}/nsw"
        corpus = base.filter(F.col("vec_id") % 5 != 3)
        write_nsw_index(corpus, gstore)
        upsert_nsw_index(spark, gstore, base.filter(F.col("vec_id") % 5 == 3),
                         corpus)
        gtop = nsw_stored_knn(spark, gstore, base, qvec, k=5).collect()
        print("9. NSW graph store (post-upsert, merge-on-read) serves"
              " top-5:",
              [(r.vec_id, round(r.similarity, 4)) for r in gtop])

        # 10. (r12) the lexical side: stored inverted index + BM25
        from openai_vector_search_demo_spark.operators.bm25_index import (
            bm25_stored_topk,
            write_bm25_index,
        )
        bstore = f"{tmp}/bm25"
        write_bm25_index(docs, bstore)
        ltop = bm25_stored_topk(spark, bstore,
                                ["hash", "join", "spark"], k=5).collect()
        print("10. inverted-index BM25 (bucket-pruned postings) top-5:",
              [(r.doc_id, round(r.bm25, 4)) for r in ltop])

    spark.stop()


if __name__ == "__main__":
    main()
