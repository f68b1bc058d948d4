"""Stored-BM25 invariants: stored == inline values, Python-side bucket
derivation matches the stored column, pruned read misses nothing."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_stored_equals_inline_slot(spark, tmp_path):
    from openai_vector_search_demo_spark.operators.bm25_index import (
        bm25_stored_topk,
        write_bm25_index,
    )
    from openai_vector_search_demo_spark.queries import (
        _BM25_TERMS,
        _bm25_scores,
    )
    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    store = str(tmp_path / "bm25")
    write_bm25_index(docs, store, n_buckets=8)
    stored = [(r.doc_id, r.bm25) for r in
              bm25_stored_topk(spark, store, _BM25_TERMS, k=20,
                               n_buckets=8).collect()]
    inline = [(r.doc_id, round(r.score, 6)) for r in
              _bm25_scores(spark, sf)
              .orderBy(F.round("score", 6).desc(), F.col("doc_id").asc())
              .limit(20).collect()]
    assert stored == inline


def test_python_bucket_matches_stored_column(spark, tmp_path):
    """The serving path derives bucket ids driver-side (hashlib md5);
    the store derives them with _hash60 — they must agree token by
    token or pruning would silently drop postings."""
    import hashlib

    from openai_vector_search_demo_spark.operators.bm25_index import (
        write_bm25_index,
    )
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "beta delta epsilon zeta")],
        "doc_id long, text string")
    store = str(tmp_path / "bm25")
    write_bm25_index(docs, store, n_buckets=8)
    post = spark.read.parquet(f"{store}/postings").collect()
    assert post, "empty postings"
    for r in post:
        want = int(hashlib.md5(r.token.encode()).hexdigest()[:15], 16) % 8
        assert r.bucket == want, r.token
