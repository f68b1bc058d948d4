# Split from the single-file registry (r14); see _shared for the
# registry, decorator, and parity conventions.
from __future__ import annotations

from openai_vector_search_demo_spark.queries._shared import *  # noqa: F401,F403

# §2.2 scalar surface
# ---------------------------------------------------------------------------

@query("p1_cleanse_text", oracle="""
SELECT doc_id,
       regexp_replace(regexp_replace(text, '\\n', ' ', 'g'), '  ', ' ', 'g') AS cleansed
FROM documents
""")
def p1_cleanse_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1: newline→space then ONE double-space collapse — the reference's exact single-pass cleanse (modules/utilities.py:135-136), not a loop-to-fixpoint."""
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
    """P2: the effective non-empty predicate (length > 0 after cleanse) — implementing the intent, not the `.strip` method-reference bug at modules/utilities.py:198."""
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
    """P4/P9: extension (lowercased last dot-token of the basename) and basename extraction, pure string ops."""
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
    """P5: punctuation translate → whitespace split → lowercase → 30-verbatim-stopword removal, duplicate-KEEPING (array_except would dedup; the reference list filter does not — app/app.py:49-56)."""
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
    """P6: per-whitespace-token span markup when the lowercased token is in the keyword list (app/app.py:58-62)."""
    from openai_vector_search_demo_spark.functions.text import (
        highlight_keywords,
        keyword_list,
    )
    kw = keyword_list(F.lit(_HL_QUESTION))
    return (t(spark, sf_dir, "documents")
            .select("doc_id", highlight_keywords(kw, "text").alias("highlighted")))


def _s9_domain() -> list[tuple[int, int, str]]:
    """Deterministic (doc_id, page_no, source) domain for the S9 key check —
    includes multi-block (>64-byte) paths and non-ASCII so sha1's block
    handling and UTF-8 encoding are both exercised."""
    rows = []
    for i in range(100):
        if i >= 95:
            src = "/very/long/" + "nested/sub/directory/" * 4 + f"doc_{i:03d}.pdf"
        elif i >= 90:
            src = f"/data/docs/naïve_résumé_{i:03d}.docx"
        else:
            src = f"/data/docs/doc_{i:03d}.pdf"
        rows.extend((i, p, src) for p in range(5))
    return rows


def _s9_oracle() -> str:
    """Literal expected-key table, precomputed with hashlib — DuckDB 1.x has
    no sha1 function, but the derivation (modules/utilities.py:344) is
    input-content-independent, so a checked literal domain value-verifies
    the exact Column expression ingest uses."""
    import hashlib
    vals = ", ".join(
        f"({i}, {p}, '{hashlib.sha1(f'{s}_{p}'.encode()).hexdigest()}')"
        for i, p, s in _s9_domain())
    return (f"SELECT doc_id, page_no, id "
            f"FROM (VALUES {vals}) AS t(doc_id, page_no, id)")


@query("s9_record_key", oracle=_s9_oracle())
def s9_record_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S9 key derivation value-checked against hashlib-precomputed sha1
    literals (the idempotency linchpin — modules/utilities.py:344).  The
    same ``record_key`` expression runs over real data in ingest_pages and
    s1_s2_doc_crack; here the input domain is deterministic so the oracle
    can carry exact expected hashes."""
    from openai_vector_search_demo_spark.functions.hashing import record_key
    dom = _s9_domain()
    n_pages = max(p for _, p, _ in dom) + 1
    # rebuild the domain JVM-side from range(): same derivation path a real
    # ingest plan uses (no driver-collected data in the checked expression)
    base = (spark.range(len(dom))
            .select((F.col("id") / n_pages).cast("int").alias("doc_id"),
                    (F.col("id") % n_pages).cast("int").alias("page_no")))
    long_tail = "/very/long/" + "nested/sub/directory/" * 4
    source = (F.when(F.col("doc_id") >= 95,
                     F.concat(F.lit(long_tail),
                              F.format_string("doc_%03d.pdf", "doc_id")))
              .when(F.col("doc_id") >= 90,
                    F.format_string("/data/docs/naïve_résumé_%03d.docx",
                                    "doc_id"))
              .otherwise(F.format_string("/data/docs/doc_%03d.pdf", "doc_id")))
    return (base.withColumn("source", source)
            .select("doc_id", "page_no",
                    record_key("source", "page_no").alias("id")))


@query("p3_md5_key", oracle="""
SELECT doc_id, md5(source || '_' || CAST(doc_id AS VARCHAR)) AS key
FROM documents
""")
def p3_md5_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3 (oracle-portable digest): md5 of the underscore-joined parts — same key shape as S9's sha1, checkable in DuckDB."""
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
    """C3: 300-word chunking with the reference's exact `len//300+1` slice count — a doc with an exact multiple of 300 words emits one trailing empty chunk (modules/utilities.py:59-73)."""
    from openai_vector_search_demo_spark.operators.chunking import chunk_documents
    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    return (chunk_documents(docs, text_col="text")
            .select("doc_id", F.col("page_no").cast("int").alias("page_no"), "chunk"))


@query("c3_chunk_words_sliding", oracle=r"""
WITH w AS (SELECT doc_id,
                  list_filter(regexp_split_to_array(text, '\s+'),
                              x -> x != '') AS words
           FROM documents),
n AS (SELECT doc_id, words,
             GREATEST(1, CAST(CEIL((len(words) - 300) / 150.0 + 1)
                              AS INTEGER)) AS n_wins
      FROM w)
SELECT doc_id, CAST(i AS INTEGER) AS page_no,
       array_to_string(list_slice(words, i*150 + 1, i*150 + 300), ' ')
         AS chunk
FROM n, UNNEST(range(0, n_wins)) AS u(i)
""")
def c3_chunk_words_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window chunking — 300-word windows advancing 150 words
    (50 % overlap), the RAG-ingestion variant of C3; map-only, no
    shuffle (``operators/chunking.py:sliding_word_chunks``)."""
    from openai_vector_search_demo_spark.operators.chunking import (
        chunk_documents_sliding,
    )
    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    return (chunk_documents_sliding(docs, text_col="text",
                                    size=300, stride=150)
            .select("doc_id",
                    F.col("page_no").cast("int").alias("page_no"), "chunk"))


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


_WIDE_TILE = 16  # 64-dim fixture × 16 = dim 1024 (real-embedding width)

_KNN_WIDE_ORACLE = f"""
WITH wide AS (
  SELECT vec_id, label,
         flatten(list_transform(range({_WIDE_TILE}), i -> embedding)) AS embedding
  FROM embeddings),
q AS (SELECT embedding AS qv FROM wide WHERE vec_id = 0),
s AS (
  SELECT e.vec_id, e.label,
    list_aggregate(list_transform(range(1, len(e.embedding) + 1),
                                  i -> CAST(e.embedding[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE)),
                   'sum')
    / (sqrt(list_aggregate(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))
     * sqrt(list_aggregate(list_transform(qv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))) AS sim
  FROM wide e, q
  WHERE e.vec_id <> 0
)
SELECT vec_id, label, ROUND(sim, 6) AS similarity
FROM s ORDER BY sim DESC, vec_id ASC LIMIT 10
"""


def _wide_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic wide-dim fixture: tile the 64-dim embedding 16× →
    dim 1024 (the width of real sentence embeddings; the reference's default
    model is even wider — 12288d, modules/utilities.py:420-475).  Tiling
    preserves cosine exactly, so the oracle stays value-checkable."""
    from openai_vector_search_demo_spark.plans.pipeline import (
        spread_for_python,
    )
    # spread before the 16× tiling + 1024-dim scoring (r15, guide §2.5):
    # the single-row-group fixture otherwise runs the whole derivation
    # on one task; no-op on a multi-split real corpus
    emb = spread_for_python(t(spark, sf_dir, "embeddings"), factor=4)
    return emb.select(
        "vec_id", "label",
        F.flatten(F.array_repeat(F.col("embedding"), _WIDE_TILE))
        .alias("embedding"))


@query("q2_knn_sql_wide1024", oracle=_KNN_WIDE_ORACLE)
def q2_knn_sql_wide1024(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL-codegen cosine at production dim 1024 — benched against the
    numpy sibling below so the 'BLAS wins at real dims' claim (SURVEY §4.3)
    is a measured number per round, not an assertion."""
    from openai_vector_search_demo_spark.operators.knn import knn
    emb = _wide_embeddings(spark, sf_dir)
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    top = knn(emb.filter(F.col("vec_id") != 0), qvec, k=10,
              sim_col="sim", tie_break="vec_id")
    return top.select("vec_id", "label", F.round("sim", 6).alias("similarity"))


@query("q2_knn_numpy_wide1024", oracle=_KNN_WIDE_ORACLE)
def q2_knn_numpy_wide1024(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow/numpy BLAS cosine at dim 1024 — the Arrow transfer cost is
    fixed per row while per-element codegen cost grows with dim, so this
    path must beat the SQL sibling here (it loses at dim 64)."""
    from openai_vector_search_demo_spark.operators.knn import knn
    emb = _wide_embeddings(spark, sf_dir)
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    top = knn(emb.filter(F.col("vec_id") != 0), qvec, k=10,
              sim_col="sim", tie_break="vec_id", method="numpy")
    return top.select("vec_id", "label", F.round("sim", 6).alias("similarity"))


@query("q2_knn_auto", oracle=_KNN_ORACLE)
def q2_knn_auto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """method='auto' at dim 64 — resolves to the SQL codegen path (below the
    measured crossover KNN_AUTO_NUMPY_MIN_DIM) and must match the same
    oracle: auto is a physical choice, never a semantic one."""
    from openai_vector_search_demo_spark.operators.knn import knn
    emb = t(spark, sf_dir, "embeddings")
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    top = knn(emb.filter(F.col("vec_id") != 0), qvec, k=10,
              sim_col="sim", tie_break="vec_id", method="auto")
    return top.select("vec_id", "label", F.round("sim", 6).alias("similarity"))


@query("q2_knn_auto_wide1024", oracle=_KNN_WIDE_ORACLE)
def q2_knn_auto_wide1024(spark: SparkSession, sf_dir: str) -> DataFrame:
    """method='auto' at dim 1024 — resolves to the BLAS matvec (at/above the
    crossover); benched so 'auto ≈ best-of-both' stays a measured number."""
    from openai_vector_search_demo_spark.operators.knn import knn
    emb = _wide_embeddings(spark, sf_dir)
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    top = knn(emb.filter(F.col("vec_id") != 0), qvec, k=10,
              sim_col="sim", tie_break="vec_id", method="auto")
    return top.select("vec_id", "label", F.round("sim", 6).alias("similarity"))


@query("q2_knn_prenormalized", oracle="""
WITH raw AS (
  SELECT vec_id, label, embedding,
         sqrt(list_aggregate(list_transform(embedding,
              x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')) AS nrm
  FROM embeddings),
unit AS (
  SELECT vec_id, label,
         list_transform(embedding,
              x -> CAST(CAST(CAST(x AS DOUBLE) / nrm AS REAL) AS DOUBLE)) AS u
  FROM raw WHERE nrm > 0),
q AS (SELECT u AS qu FROM unit WHERE vec_id = 0),
s AS (
  SELECT e.vec_id, e.label,
         list_aggregate(list_transform(range(1, len(e.u) + 1),
              i -> (e.u)[i] * (qu)[i]), 'sum') AS sim
  FROM unit e, q WHERE e.vec_id <> 0)
SELECT vec_id, label, ROUND(sim, 6) AS similarity
FROM s ORDER BY sim DESC, vec_id ASC LIMIT 10
""")
def q2_knn_prenormalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§4.3 storage-layout option: unit vectors persisted at write time
    (fp32) degrade query-time cosine to a plain dot product — half the
    arithmetic and no per-row norms.  The normalize-then-dot chain incl.
    the fp32 round-trip is mirrored exactly in the oracle."""
    from openai_vector_search_demo_spark.functions.vectors import (
        dot_product,
        l2_normalize,
        vector_lit,
    )
    emb = t(spark, sf_dir, "embeddings")
    unit = (emb.select("vec_id", "label",
                       l2_normalize("embedding").alias("u"))
            .filter(F.col("u").isNotNull()))  # zero vectors: oracle's nrm > 0
    qu = unit.filter(F.col("vec_id") == 0).select("u").first()[0]
    top = (unit.filter(F.col("vec_id") != 0)
           .withColumn("sim", dot_product(F.col("u"), vector_lit(qu)))
           .orderBy(F.col("sim").desc(), F.col("vec_id").asc()).limit(10))
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


# ---------------------------------------------------------------------------
