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


def test_bm25_tenant_store_isolation(spark, tmp_path):
    """Tenant-scoped lexical store (VERDICT r14 #7): a tenant's serve
    equals a dedicated single-tenant index (its OWN df/avgdl/n_docs,
    not filtered shared stats), and its read's input set never leaves
    the tenant subtree."""
    from pyspark.sql import functions as F

    from openai_vector_search_demo_spark.operators.bm25_index import (
        bm25_stored_topk,
        bm25_tenant_path,
        write_bm25_index,
    )

    rows = [(i, f"alpha beta {'gamma ' * (i % 3)}doc {i}", str(i % 2))
            for i in range(40)]
    docs = spark.createDataFrame(rows, "doc_id long, text string,"
                                       " tenant string")
    store = str(tmp_path / "bm25ten")
    write_bm25_index(docs, store, tenant_col="tenant")
    # dedicated single-tenant index over the same docs
    solo = str(tmp_path / "bm25solo")
    write_bm25_index(docs.filter(F.col("tenant") == "0").drop("tenant"),
                     solo)
    terms = ["alpha", "gamma"]
    got = [(r.doc_id, r.bm25) for r in
           bm25_stored_topk(spark, store, terms, k=10,
                            tenant="0").collect()]
    want = [(r.doc_id, r.bm25) for r in
            bm25_stored_topk(spark, solo, terms, k=10).collect()]
    assert got == want and got
    files0 = spark.read.parquet(
        f"{bm25_tenant_path(store, '0')}/postings").inputFiles()
    assert files0 and all("tenant=0" in f for f in files0)


def test_bm25_tenant_path_escapes(spark):
    from openai_vector_search_demo_spark.operators.bm25_index import (
        bm25_tenant_path,
    )
    assert bm25_tenant_path("/s", "a/b") == "/s/tenant=a%2Fb"
