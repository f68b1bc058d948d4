"""Intra-document repetition signals — the Gopher repetition filters
(Rae et al. 2021 §A1.1 Table A1, public method description only).

The curation family's other half: `gopher_quality_rules` gates on
quality HEURISTICS (word counts, alphabetic fraction, stop words);
these gate on REPETITION — machine-generated and boilerplate text
repeats itself, and the paper removes documents whose

- most frequent n-gram covers too many characters
  (``top_{n}gram_char_frac`` > threshold, n = 2..4), or
- duplicated n-grams (count ≥ 2) cover too many characters
  (``dup_{n}gram_char_frac`` > threshold, n = 5..10).  "Coverage"
  counts the occurrences BEYOND the first — (count − 1) × length —
  matching the public reference reproductions of the rules (a fully
  once-duplicated document scores 0.5, not 1.0), so the published
  thresholds remove what the paper's rule removes.

- duplicated LINES cover too many of the lines or characters
  (``dup_line_frac`` > 0.30 / ``dup_line_char_frac`` > 0.20 —
  ``line_repetition_signals``; the paragraph rules are the same
  computation with a paragraph separator).  The test fixture is
  single-line, so the registered slot derives a deterministic line
  structure from the token stream (both engines replay the same
  derivation) — on real corpora pass the raw text.

Scale: one explode over the token n-grams (linear in corpus bytes),
one partial-aggregated ``groupBy(doc, n, gram)`` — keys are
document-local so the shuffle is uniform by construction — then a
doc-level conditional aggregation.  No UDF anywhere; every step is
codegen'd built-ins, and the whole thing replays in ANSI SQL for the
DuckDB correctness gate.

Char fractions are defined deterministically: the TOP fraction is the
most frequent n-gram's full coverage (``count × length(gram as
written, single-space joined)``); DUP fractions count repeats beyond
the first (``(count − 1) × length``); both over ``length(raw text)``,
clamped to 1.0 (overlapping occurrences can still push the naive sum
past the document length).  Fractions are rounded to 6 dp BEFORE
threshold comparison so pass/fail replays bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from openai_vector_search_demo_spark.functions.text_analysis import tokens

__all__ = ["ngram_repetition_signals", "line_repetition_signals",
           "GOPHER_REP_THRESHOLDS"]

# Table A1's published thresholds (fail when the fraction EXCEEDS):
GOPHER_REP_THRESHOLDS: dict[str, float] = {
    "dup_line_frac": 0.30,
    "dup_line_char_frac": 0.20,
    "top_2gram_char_frac": 0.20,
    "top_3gram_char_frac": 0.18,
    "top_4gram_char_frac": 0.16,
    "dup_5gram_char_frac": 0.15,
    "dup_6gram_char_frac": 0.14,
    "dup_7gram_char_frac": 0.13,
    "dup_8gram_char_frac": 0.12,
    "dup_9gram_char_frac": 0.11,
    "dup_10gram_char_frac": 0.10,
}


def _ngrams(toks, n: int):
    """Single-space-joined token n-grams, [] when the doc is shorter."""
    return F.when(
        F.size(toks) >= n,
        F.transform(F.sequence(F.lit(1), F.size(toks) - (n - 1)),
                    lambda i: F.array_join(F.slice(toks, i, n), " "))
    ).otherwise(F.array().cast("array<string>"))


def ngram_repetition_signals(df: DataFrame,
                             text_col: str = "text",
                             id_col: str = "doc_id",
                             ns: tuple[int, ...] = (2, 3, 4, 5)
                             ) -> DataFrame:
    """Long-form per-document repetition signals: one row per
    ``(doc_id, n)`` with ``top_char_frac`` (most frequent n-gram's
    character coverage) and ``dup_char_frac`` (repeat occurrences —
    beyond the first — of all n-grams occurring ≥ 2 times), both 6-dp
    rounded.  Documents shorter than
    ``n`` tokens emit no row for that n — absent means "cannot repeat",
    which every consumer must coalesce to 0 (the slot does)."""
    toks = tokens(text_col)
    base = df.select(F.col(id_col).alias("doc_id"),
                     F.length(text_col).alias("n_chars"),
                     toks.alias("toks"))
    def _tag(n: int):
        # NOT a default-arg lambda: pyspark passes (element, INDEX) to
        # any 2-parameter callable in F.transform, which would shadow n
        def tag(g):
            return F.struct(F.lit(n).alias("n"), g.alias("gram"))
        return tag

    grams = F.concat(*[F.transform(_ngrams(F.col("toks"), n), _tag(n))
                       for n in ns])
    ex = (base.select("doc_id", "n_chars", F.explode(grams).alias("s"))
          .select("doc_id", "n_chars", "s.n", "s.gram"))
    counts = (ex.groupBy("doc_id", "n_chars", "n", "gram")
              .agg(F.count(F.lit(1)).alias("c")))
    cost = F.col("c") * F.length("gram")
    # "most frequent n-gram" = max by COUNT (the paper's rule), ties by
    # coverage — NOT max coverage over all grams (a long rare gram must
    # not outscore a short frequent one).  One struct-max aggregate:
    # lexicographic max over (count, coverage) IS max-by-count with the
    # coverage tie-break — no window pass, map-side partials intact.
    return (counts.groupBy("doc_id", "n_chars", "n")
            .agg(F.max(F.struct(F.col("c"), cost.alias("cost")))
                 .alias("_m"),
                 F.sum(F.when(F.col("c") >= 2,
                              (F.col("c") - 1) * F.length("gram"))
                       .otherwise(0))
                 .alias("_dup"))
            .withColumn("_top", F.col("_m.cost"))
            .select(
                "doc_id", "n",
                F.round(F.least(F.lit(1.0),
                                F.col("_top") / F.col("n_chars")), 6)
                .alias("top_char_frac"),
                F.round(F.least(F.lit(1.0),
                                F.col("_dup") / F.col("n_chars")), 6)
                .alias("dup_char_frac")))


def line_repetition_signals(df: DataFrame,
                            text_col: str = "text",
                            id_col: str = "doc_id",
                            line_sep: str = "\n") -> DataFrame:
    """The Gopher duplicate-LINE rules (Rae et al. 2021 Table A1): per
    document, ``dup_line_frac`` = fraction of lines that are REPEATS of
    an earlier identical line (occurrences beyond the first — the
    reference-reproduction counting; a fully once-duplicated doc scores
    0.5), ``dup_line_char_frac`` = those repeat lines' characters over
    the document's characters.  Lines cannot overlap, so no clamp is
    needed; both fractions 6-dp-rounded.  Documents with no non-empty
    line emit no row (nothing to gate).  Same physical shape as the
    n-gram form: explode → doc-local groupBy (uniform shuffle) →
    doc-level agg, no UDF, ANSI-replayable.  ``line_sep`` is a literal
    separator (regex-escaped before the split)."""
    import re
    lines = F.filter(F.split(F.col(text_col), re.escape(line_sep)),
                     lambda x: x != "")
    base = (df.select(F.col(id_col).alias("doc_id"),
                      F.length(text_col).alias("n_chars"),
                      lines.alias("lines"))
            .filter(F.size("lines") > 0)
            .withColumn("n_lines", F.size("lines")))
    ex = base.select("doc_id", "n_chars", "n_lines",
                     F.explode("lines").alias("line"))
    counts = (ex.groupBy("doc_id", "n_chars", "n_lines", "line")
              .agg(F.count(F.lit(1)).alias("c")))
    dup_lines = F.when(F.col("c") >= 2, F.col("c") - 1).otherwise(0)
    dup_chars = F.when(F.col("c") >= 2,
                       (F.col("c") - 1) * F.length("line")).otherwise(0)
    return (counts.groupBy("doc_id", "n_chars", "n_lines")
            .agg(F.sum(dup_lines).alias("_dl"),
                 F.sum(dup_chars).alias("_dc"))
            .select(
                "doc_id",
                F.round(F.col("_dl") / F.col("n_lines"), 6)
                .alias("dup_line_frac"),
                F.round(F.col("_dc") / F.col("n_chars"), 6)
                .alias("dup_line_char_frac")))
