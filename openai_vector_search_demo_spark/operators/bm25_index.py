"""Stored inverted index for BM25: bucket-partitioned postings + stats.

The lexical twin of the ANN stored tiers: `bm25_top_docs` tokenizes the
corpus per query (the right shape for ad-hoc analytics, wrong for a
serving path); this module persists the classic IR artifacts once —

- POSTINGS (token, doc_id, tf, dl), partitioned by ``bucket =
  pmod(h60(token), n_buckets)`` so a query reads only its terms'
  bucket directories (partition pruning at discovery time, the
  stored-LSH pattern applied to text),
- DF (token, dfc) — the document-frequency table, vocabulary-sized,
- STATS (n_docs, avgdl) — one row,

and serves Okapi BM25 (k1=1.2, b=0.75 — Robertson/Walker, public) by
scanning ~|query terms| / n_buckets of the postings, joining the
(broadcast) per-term df, and one TakeOrderedAndProject.  Scoring
arithmetic is IDENTICAL to the inline form, so both share one oracle.

Scale posture (100 TB): the postings relation is corpus-tokens-sized
but written once; per query the scan is partition-pruned to the query
terms' buckets and filtered to the terms before any shuffle — the only
exchange is the per-doc score sum, keyed by doc_id over query-term hits
only.  df/stats ride broadcasts.  At web scale the same layout sharded
by (bucket, doc-range) is a textbook distributed inverted index.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from openai_vector_search_demo_spark.functions.text_analysis import (
    _hash60,
    tokens,
)

BM25_K1, BM25_B = 1.2, 0.75
BM25_BUCKETS = 16


def bm25_tenant_path(path: str, tenant) -> str:
    """A tenant's physical subtree inside a tenant-scoped BM25 store
    (Hive-escaped value — the ``nsw_tenant_path`` contract)."""
    from openai_vector_search_demo_spark.stores import (
        escape_partition_value,
    )
    return f"{path.rstrip('/')}/tenant={escape_partition_value(tenant)}"


def write_bm25_index(df: DataFrame, path: str,
                     id_col: str = "doc_id", text_col: str = "text",
                     n_buckets: int = BM25_BUCKETS,
                     tenant_col: str | None = None) -> None:
    """Persist postings/df/stats under ``path``.  Two tokenize passes:
    postings come from the in-row ``doc_term_counts`` (zero-shuffle TF;
    zero-token docs contribute nothing), stats from a separate pass
    whose n_docs/avgdl must INCLUDE zero-token docs; df re-reads the
    written postings.  Postings land one directory per token bucket.

    With ``tenant_col`` the store is TENANT-SCOPED (the reference's
    per-alias physical isolation, the ``write_nsw_index_tenants``
    pattern): one subtree per tenant, each holding postings AND its
    own df/stats built from that tenant's documents only — so a
    tenant's BM25 scores (idf, avgdl, n_docs) equal a dedicated
    single-tenant index by construction, and a tenant's serve never
    lists other tenants' directories."""
    if tenant_col is not None:
        from openai_vector_search_demo_spark.stores import tenant_values
        for tv in tenant_values(df, tenant_col):
            write_bm25_index(
                df.filter(F.col(tenant_col) == tv).drop(tenant_col),
                bm25_tenant_path(path, tv), id_col=id_col,
                text_col=text_col, n_buckets=n_buckets)
        return
    toks = (df.select(F.col(id_col).alias("doc_id"),
                      tokens(text_col).alias("toks"))
            .withColumn("dl", F.size("toks")))
    # (doc, token, tf) is computed IN-ROW (doc_term_counts: sorted
    # run-length, zero shuffle) — the explode → groupBy(doc, dl, token)
    # form is value-identical but pays a corpus-vocabulary-sized
    # exchange before the bucket repartition, i.e. the build shuffles
    # the postings twice instead of once
    from openai_vector_search_demo_spark.functions.text_analysis import (
        doc_term_counts,
    )
    post = (doc_term_counts(df, text_col=text_col, id_col=id_col,
                            with_dl=True)
            .withColumn("bucket",
                        F.pmod(_hash60(F.col("token")),
                               F.lit(n_buckets)).cast("int")))
    (post.repartition(F.col("bucket"))
     .write.mode("overwrite").partitionBy("bucket")
     .parquet(f"{path}/postings"))
    postings = post.sparkSession.read.parquet(f"{path}/postings")
    (postings.groupBy("token").agg(F.count(F.lit(1)).alias("dfc"))
     .coalesce(1).write.mode("overwrite").parquet(f"{path}/df"))
    (toks.agg(F.count(F.lit(1)).alias("n_docs"),
              F.avg("dl").alias("avgdl"))
     .coalesce(1).write.mode("overwrite").parquet(f"{path}/stats"))


def bm25_stored_topk(spark, path: str, terms: list[str], k: int = 20,
                     k1: float = BM25_K1, b: float = BM25_B,
                     n_buckets: int = BM25_BUCKETS,
                     score_col: str = "bm25",
                     tenant=None) -> DataFrame:
    """Serve BM25 top-k for ``terms`` off a ``write_bm25_index`` store:
    partition-pruned postings read (the terms' buckets only), broadcast
    df join, one per-doc sum, one TakeOrderedAndProject.  ``n_buckets``
    must match the write.  With ``tenant`` the read descends into that
    tenant's subtree (its own postings/df/stats — structural isolation;
    other tenants' files are never listed)."""
    if tenant is not None:
        path = bm25_tenant_path(path, tenant)
    from openai_vector_search_demo_spark.functions.text_analysis import (
        _hash60 as _h60,  # noqa: F401 (documented: bucket derivation)
    )
    import hashlib

    def _bucket(tok: str) -> int:
        return int(hashlib.md5(tok.encode()).hexdigest()[:15], 16) \
            % n_buckets

    buckets = sorted({_bucket(t) for t in terms})
    n_docs, avgdl = spark.read.parquet(f"{path}/stats").first()
    post = (spark.read.parquet(f"{path}/postings")
            .filter(F.col("bucket").isin(buckets)
                    & F.col("token").isin(terms)))
    dfq = (spark.read.parquet(f"{path}/df")
           .filter(F.col("token").isin(terms)))
    idf = F.log((F.lit(n_docs) - F.col("dfc") + 0.5)
                / (F.col("dfc") + 0.5) + 1.0)
    denom = (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / avgdl))
    return (post.join(F.broadcast(dfq), "token")
            .withColumn("part", idf * F.col("tf") * (k1 + 1.0) / denom)
            .groupBy("doc_id")
            .agg(F.round(F.sum("part"), 6).alias(score_col))
            .orderBy(F.col(score_col).desc(), F.col("doc_id").asc())
            .limit(k))
