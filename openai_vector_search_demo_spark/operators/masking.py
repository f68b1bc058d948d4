"""Span corruption — materializing a masked-LM pretraining objective
over a corpus (the data-side of T5/BERT span masking, Raffel et al. 2020
/ Devlin et al. 2018, public): pick spans deterministically, emit the
masked input text and the target tokens.

Real pipelines do this on the fly in the data loader; materializing it
relationally matters when the objective is part of the corpus contract
(fixed eval masks, reproducible ablations, masks audited offline).
Randomness is the usual trick here and the usual bug — ``rand()`` masks
differ per run/partitioning and cannot be value-checked.  This operator
derives every mask from the salted md5-60bit hash of (doc, position):
the same corpus + seed always masks the same spans, on any engine.

Plan: tokenize → position explode (map-only) → hash-pick span STARTS →
coverage union of each start's ``span_len`` window (the same
position-set-union machinery as ``operators.substrings``) → one
per-doc rebuild aggregate.  Linear, shuffle only on the doc id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from openai_vector_search_demo_spark.functions.text_analysis import (
    _hash60,
    tokens,
)

__all__ = ["mask_spans"]

_BUCKETS = 1_000_000


def mask_spans(df: DataFrame, text_col: str = "text",
               id_col: str = "doc_id", span_len: int = 3,
               start_rate: float = 0.05, seed: int = 13,
               sentinel: str = "<mask>") -> DataFrame:
    """Per document: ``(id, n_tokens, n_masked, masked_text, targets)``.

    A token position STARTS a span iff its salted (doc, pos) hash lands
    under ``start_rate`` of the bucket space; each start masks
    ``span_len`` consecutive tokens (overlapping spans union, windows
    clip at the document end).  ``masked_text`` replaces every masked
    token with ``sentinel``; ``targets`` is the masked tokens in
    position order — exactly the (input, label) pair a span-corruption
    objective trains on.  E[n_masked] ≈ start_rate·span_len·n_tokens at
    low rates (overlap makes it sub-linear as rate grows).

    Zero-token documents (empty/whitespace text) still emit a row —
    ``(id, 0, 0, '', '')`` — via the left join back onto the token base;
    posexplode alone would silently drop them from the output and a
    downstream join against the corpus would misread that as "document
    missing", not "document empty"."""
    if span_len < 1:
        raise ValueError("span_len must be >= 1")
    if not 0.0 <= start_rate <= 1.0:
        raise ValueError("start_rate must be in [0, 1]")
    cut = int(round(start_rate * _BUCKETS))

    toks = (df.select(F.col(id_col).alias("id"),
                      tokens(text_col).alias("toks"))
              .withColumn("n_tokens", F.size("toks")))
    tokpos = (toks.select("id", "n_tokens",
                          F.posexplode("toks").alias("pos0", "tok"))
                  .select("id", "n_tokens",
                          (F.col("pos0") + 1).alias("pos"), "tok"))

    h = F.pmod(_hash60(F.concat_ws(":", F.lit(str(seed)),
                                   F.col("id").cast("string"),
                                   F.col("pos").cast("string"))),
               F.lit(_BUCKETS))
    starts = tokpos.filter(h < cut).select("id", "pos", "n_tokens")
    covered = (starts.select("id", F.explode(F.sequence(
                   F.col("pos"),
                   F.least(F.col("pos") + (span_len - 1),
                           F.col("n_tokens")))).alias("pos"))
               .distinct())

    marked = (tokpos.join(covered.withColumn("m", F.lit(True)),
                          ["id", "pos"], "left")
              .withColumn("m", F.coalesce("m", F.lit(False))))
    rebuilt = marked.groupBy("id").agg(
        F.first("n_tokens").alias("n_tokens"),
        F.sum(F.col("m").cast("long")).alias("n_masked"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "m", "tok"))),
                lambda x: F.when(x["m"], F.lit(sentinel))
                           .otherwise(x["tok"])), " ").alias("masked_text"),
        F.array_join(
            F.transform(
                F.filter(
                    F.array_sort(F.collect_list(F.struct("pos", "m", "tok"))),
                    lambda x: x["m"]),
                lambda x: x["tok"]), " ").alias("targets"))
    # id-only base: the left join restores zero-token docs WITHOUT a
    # second tokenizing scan (carrying n_tokens through `toks` would
    # re-run the regex tokenizer over the whole corpus — r8 review #4);
    # empty docs take n_tokens = 0 by the same coalesce as the rest
    base = df.select(F.col(id_col).alias("id"))
    return (base.join(rebuilt, "id", "left")
            .select(F.col("id"),
                    F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
                    F.coalesce("n_masked", F.lit(0)).alias("n_masked"),
                    F.coalesce("masked_text", F.lit("")).alias("masked_text"),
                    F.coalesce("targets", F.lit("")).alias("targets")))
