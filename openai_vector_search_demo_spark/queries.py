"""The engine's query registry — the correctness gate surface.

Every implemented operator from SURVEY.md §2 (plus the M6 scale extensions)
ships here as a named query: a Spark callable ``(spark, sf_dir) -> DataFrame``
in ``SPARK_QUERIES`` and, when SQL-expressible, a DuckDB oracle string in
``ORACLE_SQL`` computing the identical result on the same parquet tables.

Parity conventions (FIXTURES.md):
- identical column aliases on both sides (the driver sorts columns by name);
- floats rounded on both sides — 6 dp for bounded values (similarities,
  ratios, averages), 2 dp for large money sums where cross-engine summation
  order costs ~1e-8 absolute;
- all vector math in float64 on both sides (DuckDB's native
  list_cosine_similarity is fp32 — NOT used in oracles);
- deterministic tie-breaks whenever the operator under test is a sort/top-k.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from openai_vector_search_demo_spark.config import (
    HIGHLIGHT_PREFIX,
    HIGHLIGHT_SUFFIX,
    KEYWORD_STOPWORDS,
)

SPARK_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE_SQL: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    def deco(fn):
        SPARK_QUERIES[name] = fn
        if oracle is not None:
            ORACLE_SQL[name] = oracle
        return fn
    return deco


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        return load_events(spark, sf_dir)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`events.ts` is parquet TIMESTAMP(NANOS), which Spark 4 refuses by
    default (PARQUET_TYPE_ILLEGAL).  Read it as epoch-nanos long
    (`nanosAsLong`, runtime-settable) and derive:

    - ``ts_us``  bigint epoch microseconds — the oracle-parity column
      (DuckDB truncates parquet nanos to its micros TIMESTAMP, so
      ``epoch_us(ts)`` on the DuckDB side matches ``ts div 1000`` here);
    - ``ts``     a real timestamp (micros) for window/streaming operators.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    # integer `div`, not `/`: double division rounds at ~1.7e18 ns magnitudes
    ts_us = F.expr("ts div 1000")
    return (raw.withColumn("ts_us", ts_us)
            .withColumn("ts", F.timestamp_micros(ts_us)))


def _sql_stoplist() -> str:
    return "[" + ", ".join("'" + w.replace("'", "''") + "'" for w in KEYWORD_STOPWORDS) + "]"


# ---------------------------------------------------------------------------
# §2.2 scalar surface
# ---------------------------------------------------------------------------

@query("p1_cleanse_text", oracle="""
SELECT doc_id,
       regexp_replace(regexp_replace(text, '\\n', ' ', 'g'), '  ', ' ', 'g') AS cleansed
FROM documents
""")
def p1_cleanse_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    from openai_vector_search_demo_spark.functions.text import cleanse_text
    return (t(spark, sf_dir, "documents")
            .select("doc_id", cleanse_text("text").alias("cleansed")))


@query("p2_filter_non_empty", oracle="""
WITH c AS (
  SELECT doc_id,
         regexp_replace(regexp_replace(text, '\\n', ' ', 'g'), '  ', ' ', 'g') AS cleansed
  FROM documents
)
SELECT doc_id, cleansed FROM c
WHERE cleansed IS NOT NULL AND length(cleansed) > 0
""")
def p2_filter_non_empty(spark: SparkSession, sf_dir: str) -> DataFrame:
    from openai_vector_search_demo_spark.functions.text import cleanse_text, non_empty
    df = (t(spark, sf_dir, "documents")
          .select("doc_id", cleanse_text("text").alias("cleansed")))
    return df.filter(non_empty("cleansed"))


@query("p4_p9_path_parts", oracle="""
SELECT doc_id,
       (string_split(source, '/'))[-1] AS base,
       lower((string_split((string_split(source, '/'))[-1], '.'))[-1]) AS ext
FROM documents
""")
def p4_p9_path_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from openai_vector_search_demo_spark.functions.text import (
        basename,
        document_extension,
    )
    return (t(spark, sf_dir, "documents")
            .select("doc_id",
                    basename("source").alias("base"),
                    document_extension("source").alias("ext")))


@query("p5_keywords", oracle=f"""
SELECT doc_id, unnest(
  list_filter(
    list_transform(
      list_filter(regexp_split_to_array(trim(translate(text, '.-=?!', '     ')), '\\s+'),
                  x -> x != ''),
      x -> lower(x)),
    x -> NOT list_contains({_sql_stoplist()}, x))) AS keyword
FROM documents
""")
def p5_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    from openai_vector_search_demo_spark.functions.text import keyword_list
    return (t(spark, sf_dir, "documents")
            .select("doc_id", F.explode(keyword_list("text")).alias("keyword")))


_HL_QUESTION = "how does the fast hash-join work on a spark table?"


@query("p6_highlight", oracle=f"""
WITH kw AS (
  SELECT list_filter(
           list_transform(
             list_filter(regexp_split_to_array(trim(translate('{_HL_QUESTION}', '.-=?!', '     ')), '\\s+'),
                         x -> x != ''),
             x -> lower(x)),
           x -> NOT list_contains({_sql_stoplist()}, x)) AS kws
)
SELECT doc_id,
       array_to_string(
         list_transform(string_split(text, ' '),
           tok -> CASE WHEN list_contains(kw.kws, lower(tok))
                       THEN '{HIGHLIGHT_PREFIX.replace("'", "''")}' || tok || '{HIGHLIGHT_SUFFIX}'
                       ELSE tok END),
         ' ') AS highlighted
FROM documents, kw
""")
def p6_highlight(spark: SparkSession, sf_dir: str) -> DataFrame:
    from openai_vector_search_demo_spark.functions.text import (
        highlight_keywords,
        keyword_list,
    )
    kw = keyword_list(F.lit(_HL_QUESTION))
    return (t(spark, sf_dir, "documents")
            .select("doc_id", highlight_keywords(kw, "text").alias("highlighted")))


@query("s9_record_key")  # DuckDB has no sha1 → rows-only check; sha1 itself is
def s9_record_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    # unit-tested against hashlib in tests/test_functions.py
    from openai_vector_search_demo_spark.functions.hashing import record_key
    from openai_vector_search_demo_spark.operators.chunking import chunk_documents
    docs = t(spark, sf_dir, "documents").select("doc_id", "source", "text")
    chunked = chunk_documents(docs, text_col="text")
    return chunked.select(
        "doc_id", "page_no", record_key("source", "page_no").alias("id"))


@query("p3_md5_key", oracle="""
SELECT doc_id, md5(source || '_' || CAST(doc_id AS VARCHAR)) AS key
FROM documents
""")
def p3_md5_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    from openai_vector_search_demo_spark.functions.hashing import md5_key
    return (t(spark, sf_dir, "documents")
            .select("doc_id", md5_key("source", "doc_id").alias("key")))


# ---------------------------------------------------------------------------
# §2.3 chunking
# ---------------------------------------------------------------------------

@query("c3_chunk_words", oracle="""
WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents)
SELECT doc_id, CAST(i AS INTEGER) AS page_no,
       array_to_string(list_slice(words, i*300 + 1, i*300 + 300), ' ') AS chunk
FROM w, UNNEST(range(0, len(words)//300 + 1)) AS u(i)
""")
def c3_chunk_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    from openai_vector_search_demo_spark.operators.chunking import chunk_documents
    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    return (chunk_documents(docs, text_col="text")
            .select("doc_id", F.col("page_no").cast("int").alias("page_no"), "chunk"))


# ---------------------------------------------------------------------------
# §2.5 query-side relational core
# ---------------------------------------------------------------------------

_KNN_ORACLE = """
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
s AS (
  SELECT e.vec_id, e.label,
    list_aggregate(list_transform(range(1, len(e.embedding) + 1),
                                  i -> CAST(e.embedding[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE)),
                   'sum')
    / (sqrt(list_aggregate(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))
     * sqrt(list_aggregate(list_transform(qv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))) AS sim
  FROM embeddings e, q
  WHERE e.vec_id <> 0
)
SELECT vec_id, label, ROUND(sim, 6) AS similarity
FROM s ORDER BY sim DESC, vec_id ASC LIMIT 10
"""


@query("q2_knn_exact", oracle=_KNN_ORACLE)
def q2_knn_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2–Q5: exact cosine top-10 to vec_id 0's vector, SQL (codegen) path."""
    from openai_vector_search_demo_spark.operators.knn import knn
    emb = t(spark, sf_dir, "embeddings")
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    top = knn(emb.filter(F.col("vec_id") != 0), qvec, k=10,
              sim_col="sim", tie_break="vec_id")
    return top.select("vec_id", "label", F.round("sim", 6).alias("similarity"))


@query("q2_knn_numpy", oracle=_KNN_ORACLE)
def q2_knn_numpy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same query through the Arrow/numpy fast path — proves the two scoring
    paths agree bit-for-bit at 6 dp (the 100 TB path, SURVEY §4.3)."""
    from openai_vector_search_demo_spark.operators.knn import knn
    emb = t(spark, sf_dir, "embeddings")
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    top = knn(emb.filter(F.col("vec_id") != 0), qvec, k=10,
              sim_col="sim", tie_break="vec_id", method="numpy")
    return top.select("vec_id", "label", F.round("sim", 6).alias("similarity"))


@query("q7_q9_rerank", oracle="""
WITH cand AS (
  SELECT doc_id, text, source,
         ((doc_id * 7919) % 1000) / 1000.0 AS similarity
  FROM documents
),
knn AS (
  SELECT *, CAST(ROW_NUMBER() OVER (ORDER BY similarity DESC, doc_id ASC) AS INTEGER) - 1
            AS retrieval_idx
  FROM cand
  ORDER BY similarity DESC, doc_id ASC LIMIT 10
),
scored AS (
  SELECT *,
         substr(text, 1, 160) AS answer,
         CAST((doc_id * 37 + length(text)) % 101 AS INTEGER) AS score
  FROM knn
)
SELECT answer AS "Answer", score AS "Score", text AS "Content",
       source AS "Source", ROUND(similarity, 6) AS "Similarity",
       CAST(retrieval_idx AS INTEGER) + 1 AS "Page"
FROM (SELECT * FROM scored ORDER BY score DESC, retrieval_idx DESC, answer DESC LIMIT 10)
WHERE score >= 50
""")
def q7_q9_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 3-key desc sort → Q8 limit+threshold → Q9 assembly, with an
    arithmetic deterministic scorer so DuckDB can recompute it."""
    from openai_vector_search_demo_spark.operators.rerank import rerank, rerank_order
    docs = t(spark, sf_dir, "documents")
    cand = docs.select(
        "doc_id", "text", "source",
        (((F.col("doc_id") * 7919) % 1000) / 1000.0).alias("similarity"))
    from pyspark.sql import Window
    w = Window.orderBy(F.col("similarity").desc(), F.col("doc_id").asc())
    hits = (cand.withColumn("retrieval_idx", (F.row_number().over(w) - 1).cast("int"))
            .orderBy(F.col("similarity").desc(), F.col("doc_id").asc()).limit(10))
    scored = hits.select(
        "*",
        F.substring("text", 1, 160).alias("answer"),
        ((F.col("doc_id") * 37 + F.length("text")) % 101).cast("int").alias("score"))
    out = (scored.orderBy(*rerank_order(scored)).limit(10)
           .filter(F.col("score") >= 50)
           .select(F.col("answer").alias("Answer"),
                   F.col("score").alias("Score"),
                   F.col("text").alias("Content"),
                   F.col("source").alias("Source"),
                   F.round("similarity", 6).alias("Similarity"),
                   (F.col("retrieval_idx") + 1).alias("Page")))
    return out


@query("q11_history_top1", oracle="""
SELECT user_id, event_id, event_type, value, epoch_us(ts) AS ts_us
FROM (
  SELECT user_id, event_id, event_type, value, ts,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY value DESC, event_id DESC) AS rn
  FROM events
)
WHERE rn = 1
""")
def q11_history_top1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 — newest-first/top-1-per-question window, mapped onto events."""
    from openai_vector_search_demo_spark.operators.history import top1_per_key
    ev = t(spark, sf_dir, "events")
    return top1_per_key(ev, key="user_id", order=[F.col("value").desc(),
                                                  F.col("event_id").desc()],
                        select=["user_id", "event_id", "event_type", "value", "ts_us"])


@query("flagship_search")  # embed UDF → not SQL-expressible → rows-only check
def flagship_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§3.1 + §3.2 end-to-end: documents → chunk → cleanse → embed → KNN
    top-10 → rerank → answer shape.  The bench's pipeline headline."""
    from openai_vector_search_demo_spark.plans.pipeline import (
        ingest_documents,
        search,
    )
    docs = t(spark, sf_dir, "documents")
    chunks = ingest_documents(docs, text_col="text", path_col="source")
    return search(chunks, "how does a hash join work on a spark table",
                  k=10, score_threshold=0)


# ---------------------------------------------------------------------------
# Standard relational surface (joins/aggs/windows Spark provides natively;
# included because a reference user switching engines runs these too, and the
# bench exercises them at sf0.1)
# ---------------------------------------------------------------------------

@query("tpch_q1_pricing_summary", oracle="""
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 2) AS sum_qty,
       ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
       ROUND(AVG(l_quantity), 6) AS avg_qty,
       ROUND(AVG(l_extendedprice), 6) AS avg_price,
       ROUND(AVG(l_discount), 6) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
""")
def tpch_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return (li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
            .groupBy("l_returnflag", "l_linestatus")
            .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
                 F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
                 F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
                 F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
                 F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
                 F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
                 F.round(F.avg("l_discount"), 6).alias("avg_disc"),
                 F.count(F.lit(1)).alias("count_order")))


@query("join_top_customers", oracle="""
SELECT c.c_custkey, c.c_name, n.n_name,
       ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
       COUNT(*) AS n_items
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
GROUP BY c.c_custkey, c.c_name, n.n_name
ORDER BY revenue DESC, c.c_custkey ASC
LIMIT 20
""")
def join_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-way join + agg + top-k.  Dimension sides (customer, nation) are
    broadcast — no shuffle of lineitem beyond the final group-by."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    n = t(spark, sf_dir, "nation")
    joined = (li.join(o, li.l_orderkey == o.o_orderkey)
              .join(F.broadcast(c), o.o_custkey == c.c_custkey)
              .join(F.broadcast(n), c.c_nationkey == n.n_nationkey))
    return (joined.groupBy("c_custkey", "c_name", "n_name")
            .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
                 F.count(F.lit(1)).alias("n_items"))
            .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
            .limit(20))
