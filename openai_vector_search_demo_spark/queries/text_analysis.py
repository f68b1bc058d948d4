# Split from the single-file registry (r14); see _shared for the
# registry, decorator, and parity conventions.
from __future__ import annotations

from openai_vector_search_demo_spark.queries._shared import *  # noqa: F401,F403

# Training-data pipeline: text analysis (north star / BASELINE.json)
# ---------------------------------------------------------------------------

# shared DuckDB fragments mirroring functions.text_analysis bit-for-bit
_SQL_TOKS = r"list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x != '')"
_SQL_H60 = "CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT)"
_SQL_NORM_TEXT = r"trim(regexp_replace(lower(text), '\s+', ' ', 'g'))"
_SQL_FINGERPRINT = _SQL_H60.format(expr=_SQL_NORM_TEXT)
def _sql_derived_lines(w: int) -> str:
    """CTE pair (linw, lins) deriving the w-token line structure — the
    DuckDB twin of ``_shared.derived_token_lines`` (one source for the
    arithmetic both engines must share)."""
    return f"""linw AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents
              WHERE len({_SQL_TOKS}) > 0),
lins AS (SELECT doc_id,
                list_transform(
                  range(0, CAST(CEIL(len(toks) / {w}.0) AS BIGINT)),
                  i -> array_to_string(
                         list_slice(toks, i * {w} + 1,
                                    i * {w} + {w}), ' '))
                  AS lines
         FROM linw)"""


_SQL_SHINGLE_CTE = rf"""
tok AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
sh AS (SELECT doc_id,
         CASE WHEN len(toks) >= 3
              THEN list_distinct(list_transform(range(1, len(toks) - 1),
                     i -> array_to_string(list_slice(toks, i, i + 2), ' ')))
              ELSE [] END AS shs
       FROM tok),
hs AS (SELECT doc_id,
         list_distinct(list_transform(shs,
           s -> {_SQL_H60.format(expr='s')})) AS hs
       FROM sh)
"""


@query("ta_token_stats", oracle=rf"""
SELECT doc_id,
       len({_SQL_TOKS}) AS n_tokens,
       len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS n_bpe,
       {_SQL_FINGERPRINT} AS fingerprint
FROM documents
""")
def ta_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting (whitespace + BPE-ish) and document fingerprinting."""
    from openai_vector_search_demo_spark.functions import text_analysis as ta
    return (t(spark, sf_dir, "documents")
            .select("doc_id",
                    ta.token_count("text").alias("n_tokens"),
                    ta.bpe_token_estimate("text").alias("n_bpe"),
                    ta.fingerprint64("text").alias("fingerprint")))


@query("ta_repetition_signals", oracle=rf"""
WITH tok AS (SELECT doc_id, {_SQL_TOKS} AS w FROM documents),
g AS (SELECT doc_id, len(w) AS n_words, len(list_distinct(w)) AS ndw,
             unnest(list_transform(range(1, len(w)),
                                   i -> w[i] || ' ' || w[i + 1])) AS gram
      FROM tok WHERE len(w) >= 5),
pg AS (SELECT doc_id, n_words, ndw, gram, COUNT(*) AS c
       FROM g GROUP BY ALL),
pd AS (SELECT doc_id, n_words, ndw, SUM(c) AS ng, COUNT(*) AS ndg,
              MAX(c) AS top_c
       FROM pg GROUP BY ALL)
SELECT doc_id, n_words,
       ROUND(1 - ndw / CAST(n_words AS DOUBLE), 6) AS dup_word_frac,
       ROUND(1 - ndg / CAST(ng AS DOUBLE), 6) AS dup_2gram_frac,
       ROUND(top_c / CAST(ng AS DOUBLE), 6) AS top_2gram_frac
FROM pd
""")
def ta_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style within-document repetition gates (duplicate-word /
    duplicate-2-gram / top-2-gram fractions) — see
    ``functions.text_analysis.repetition_signals`` for the scale notes."""
    from openai_vector_search_demo_spark.functions.text_analysis import (
        repetition_signals,
    )
    return repetition_signals(t(spark, sf_dir, "documents"))


def _langid_oracle() -> str:
    from openai_vector_search_demo_spark.functions.text_analysis import LANG_MARKERS
    hits = {
        lang: ("len(list_filter(toks, t -> list_contains(["
               + ", ".join("'" + m.replace("'", "''") + "'" for m in marks)
               + "], t)))")
        for lang, marks in sorted(LANG_MARKERS.items())
    }
    gr = "greatest(" + ", ".join(f"h_{lg}" for lg in hits) + ")"
    whens = "\n       ".join(
        f"WHEN h_{lg} = {gr} THEN '{lg}'" for lg in hits)
    cols = ",\n         ".join(f"{expr} AS h_{lg}" for lg, expr in hits.items())
    return rf"""
WITH tok AS (SELECT doc_id, lang, {_SQL_TOKS} AS toks FROM documents),
h AS (SELECT doc_id, lang,
         {cols}
      FROM tok)
SELECT doc_id, lang,
  CASE WHEN {gr} = 0 THEN 'und'
       {whens}
       END AS lang_detected
FROM h
"""


@query("ta_language_id", oracle=_langid_oracle())
def ta_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-heuristic language ID next to the fixture's true lang."""
    from openai_vector_search_demo_spark.functions import text_analysis as ta
    return (t(spark, sf_dir, "documents")
            .select("doc_id", "lang",
                    ta.language_id("text").alias("lang_detected")))


def _quality_oracle() -> str:
    from openai_vector_search_demo_spark.functions.text_analysis import LANG_MARKERS
    en = ", ".join("'" + m + "'" for m in LANG_MARKERS["en"])
    return rf"""
WITH tok AS (SELECT doc_id, text, {_SQL_TOKS} AS toks FROM documents),
f AS (SELECT doc_id,
        len(toks) AS n,
        len(list_filter(toks, t -> list_contains([{en}], t))) AS sw,
        CASE WHEN len(toks) > 0
             THEN list_aggregate(list_transform(toks, t -> len(t)), 'sum') / len(toks)
             ELSE 0.0 END AS mwl,
        length(text) AS nc,
        length(text) - length(regexp_replace(text, '[!-/:-@\[-`{{-~]', '', 'g')) AS np
      FROM tok)
SELECT doc_id,
  ROUND((least(n / 50.0, 1.0)
       + least((CASE WHEN n > 0 THEN sw / n ELSE 0.0 END) / 0.4, 1.0)
       + (CASE WHEN mwl >= 3.0 AND mwl <= 10.0 THEN 1.0 ELSE 0.0 END)
       + (1.0 - least((CASE WHEN nc > 0 THEN np / nc ELSE 0.0 END) * 4.0, 1.0)))
      / 4.0, 6) AS quality
FROM f
"""


@query("ta_quality_score", oracle=_quality_oracle())
def ta_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite Gopher/C4-style quality heuristic, pure codegen SQL
    (DataFrame form — tokenizes once per row)."""
    from openai_vector_search_demo_spark.functions import text_analysis as ta
    from openai_vector_search_demo_spark.plans.pipeline import (
        spread_for_python,
    )
    # spread before the regexp-heavy scoring pass (r15, guide §2.5)
    scored = ta.with_quality_score(
        spread_for_python(t(spark, sf_dir, "documents"), factor=1))
    return scored.select("doc_id", F.round("quality", 6).alias("quality"))


# ---------------------------------------------------------------------------


@query("unicode_nfc_repair", oracle=f"""
WITH c AS (
  SELECT doc_id, source,
         CASE WHEN doc_id % 3 = 0
              THEN replace(text, 'e', 'e' || chr(769)) || chr(8491)
              ELSE text END AS corrupt
  FROM documents),
r AS (SELECT source, corrupt, nfc_normalize(corrupt) AS rep FROM c)
SELECT source, COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN rep != corrupt THEN 1 ELSE 0 END) AS BIGINT)
         AS n_repaired,
       CAST(SUM(length(corrupt)) AS BIGINT) AS chars_corrupt,
       CAST(SUM(length(rep)) AS BIGINT) AS chars_repaired,
       CAST(SUM({_SQL_H60.format(expr='rep')} % 1000000000) AS BIGINT)
         AS content_digest
FROM r GROUP BY source ORDER BY source
""")
def unicode_nfc_repair(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ENCODING REPAIR (UAX#15 NFC) — the normalize-before-hash stage of
    every multilingual pipeline (C4/mC4, CCNet): decomposed accents
    ('e'+U+0301) and compatibility singletons (U+212B ANGSTROM SIGN)
    are byte-different spellings of identical graphemes that defeat
    every downstream exact-dup / line-dedup / fingerprint pass.  The
    fixture corpus is ASCII, so — the multimodal-stub convention: real
    plumbing, synthetic payload — every third document is
    deterministically mojibake'd IN-PLAN (accents decomposed, an
    angstrom appended) in BOTH engines, then repaired by the engine's
    ``functions.text.unicode_normalize`` (Arrow-batched
    ``unicodedata.normalize`` — Spark has no built-in normalizer; the
    E1 UDF contract class) and by DuckDB's utf8proc ``nfc_normalize``
    on the oracle side: two INDEPENDENT UAX#15 implementations must
    agree on every byte, which is precisely what the per-source md5
    content digest receipts.  Map-only until the final small agg;
    composition SHRINKS the text (chars_repaired < chars_corrupt on
    corrupted sources — the combining marks fold into precomposed
    codepoints)."""
    from openai_vector_search_demo_spark.functions.text import (
        unicode_normalize,
    )
    from openai_vector_search_demo_spark.functions.text_analysis import (
        _hash60,
    )

    docs = t(spark, sf_dir, "documents")
    corrupt = F.when(
        F.col("doc_id") % 3 == 0,
        F.concat(F.regexp_replace("text", "e", "e\u0301"),
                 F.lit("\u212B"))).otherwise(F.col("text"))
    d = docs.select("source", corrupt.alias("corrupt"))
    d = d.withColumn("rep", unicode_normalize("corrupt"))
    return (d.groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum((F.col("rep") != F.col("corrupt")).cast("long"))
                 .alias("n_repaired"),
                 F.sum(F.length("corrupt").cast("long"))
                 .alias("chars_corrupt"),
                 F.sum(F.length("rep").cast("long")).alias("chars_repaired"),
                 F.sum(F.pmod(_hash60(F.col("rep")), F.lit(1_000_000_000)))
                 .alias("content_digest"))
            .orderBy("source"))
