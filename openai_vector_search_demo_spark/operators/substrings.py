"""Exact-substring deduplication at n-gram granularity (the distributed
form of Lee et al. 2021, "Deduplicating Training Data Makes Language
Models Better", arXiv:2107.06499 — public).

The paper removes every substring of ≥ k tokens that occurs twice
anywhere in the corpus, found with a suffix array — inherently a
single-machine index.  The relational form used here: slide a fixed
``n``-token window over every document, count each n-gram corpus-wide,
and remove every TOKEN COVERED by an n-gram occurring ≥ ``min_df``
times.  Adjacent repeated grams merge into spans automatically because
coverage is a POSITION-SET UNION, not a per-gram cut — a repeated run of
m ≥ n tokens is covered end-to-end by its m−n+1 overlapping grams,
which is exactly the suffix-array span at gram granularity (repeats
shorter than ``n`` are kept; that is the documented approximation).

Every step is relational and linear: tokenize → gram-hash (map-only),
corpus gram counts (ONE map-side-combinable groupBy — the analogue of
the suffix array), an equi-join back on the gram hash, a positional
explode of covered windows, and an anti-join of token positions against
the covered set.  Nothing quadratic, nothing driver-side; hot
boilerplate grams are a join-key skew that AQE splits (each gram row
meets exactly one count row).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from openai_vector_search_demo_spark.functions.text_analysis import (
    _hash60,
    tokens,
)

__all__ = ["repeated_ngram_dedup"]


def repeated_ngram_dedup(df: DataFrame, text_col: str = "text",
                         id_col: str = "doc_id", n: int = 5,
                         min_df: int = 2) -> DataFrame:
    """Per document: ``(id, n_tokens, n_removed, cleaned)`` where
    ``cleaned`` is the text with every token inside a corpus-repeated
    n-gram removed (single-space rejoined).  ``min_df`` counts
    OCCURRENCES (within-document repeats count, like the suffix array
    does), not distinct documents.
    """
    if n < 1:
        raise ValueError("n must be >= 1")
    toks = (df.select(F.col(id_col).alias("id"),
                      tokens(text_col).alias("toks"))
              .withColumn("n_tokens", F.size("toks")))

    # gram start positions are 1-based; sequence() descends when the doc is
    # shorter than n, so guard to an empty gram list there
    gram_hashes = F.when(
        F.col("n_tokens") >= n,
        F.transform(F.sequence(F.lit(1), F.col("n_tokens") - (n - 1)),
                    lambda i: _hash60(
                        F.concat_ws(" ", F.slice("toks", i, n))))
    ).otherwise(F.array().cast("array<long>"))
    grams = (toks.select("id", F.posexplode(gram_hashes)
                         .alias("gpos0", "gh"))
                 .select("id", (F.col("gpos0") + 1).alias("gpos"), "gh"))

    repeated = (grams.groupBy("gh").agg(F.count("*").alias("c"))
                     .filter(F.col("c") >= min_df).select("gh"))
    rep_occurrences = grams.join(repeated, "gh").select("id", "gpos")

    covered = (rep_occurrences
               .select("id", F.explode(
                   F.sequence(F.col("gpos"),
                              F.col("gpos") + (n - 1))).alias("pos"))
               .distinct())

    tokpos = (toks.select("id", F.posexplode("toks").alias("pos0", "tok"))
                  .select("id", (F.col("pos0") + 1).alias("pos"), "tok"))
    kept = tokpos.join(covered, ["id", "pos"], "left_anti")
    cleaned = kept.groupBy("id").agg(
        F.array_join(
            F.transform(F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                        lambda x: x["tok"]), " ").alias("cleaned"))
    removed = covered.groupBy("id").agg(F.count("*").alias("n_removed"))

    base = toks.select("id", "n_tokens")
    return (base.join(removed, "id", "left")
                .join(cleaned, "id", "left")
                .select("id", "n_tokens",
                        F.coalesce("n_removed", F.lit(0)).alias("n_removed"),
                        F.coalesce("cleaned", F.lit("")).alias("cleaned")))
