"""DSIR-style data selection — importance resampling over hashed
n-gram features (Xie et al., "Data Selection for Language Models via
Importance Resampling", NeurIPS 2023 — public method description only).

Why this lives in a training-data engine: given a small TARGET corpus
(the domain you want more of — curated reference text) and a large raw
POOL (the crawl), select the pool examples whose hashed-n-gram profile
looks most target-like.  This is the standard pretraining-mix lever one
step up from the per-domain rate knob
(``functions.hashing.stratified_sample_predicate``): instead of fixed
per-source rates, every document is scored by how much the target
distribution likes its features relative to the pool distribution, and
selection is a Gumbel-top-k draw over those log-weights.

Spark-first shape — every stage is built-in-expression codegen; no UDFs:

- **Features**: unigram + bigram bag counts, each n-gram hashed into
  ``buckets`` buckets with the engine's oracle-portable 60-bit md5 hash
  (``text_analysis._hash60`` — bit-stable across Spark/DuckDB), i.e.
  the paper's hashed n-gram featurization.  One explode + one
  (doc, bucket) hash-aggregation.
- **Distributions**: bucket totals per side are two B-row aggregations;
  the smoothed log-ratio table λ_b = ln(p̂_target(b)) − ln(p̂_pool(b))
  is a B-row frame — joined back to per-doc counts via **broadcast**
  (B ≤ a few thousand; never a shuffle on the corpus side).  The two
  grand totals enter the plan as driver-collected literals (the
  engine's bounded-collect pattern: 2 scalars).
- **Weights**: w(d) = Σ_b c_db·λ_b — one map-side-combinable keyed
  aggregation over the per-doc bucket counts.
- **Resampling**: Gumbel-top-k without replacement: key(d) = w(d) +
  g(d) with g = −ln(−ln(u)) and u a hash-derived uniform in (0,1) —
  deterministic across runs/partitionings/engines (no ``rand()``), so
  the DuckDB oracle reproduces the exact selected set.

Determinism contract: λ is rounded at 9 dp and w / the Gumbel key at
6 dp IN-ENGINE (``F.round`` = HALF_UP = DuckDB ``ROUND``), clipping
cross-engine libm drift in ``ln`` the same way the iterative family
(kmeans / pagerank / hits) clips per-round float drift.

At 100 TB: the pool is touched by exactly two linear passes (count
features; score+select), both map-side-combined on (doc, bucket); the
only non-broadcast shuffle key is ``doc_id``.  The target corpus is
small by definition.  B stays fixed (paper uses 10k), so the λ table
broadcast is O(B) regardless of corpus size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["hashed_ngram_counts", "dsir_log_ratios",
           "dsir_importance_weights", "dsir_resample"]

_SALT = "dsir"


def _ngrams(toks: Column) -> Column:
    """Unigram + bigram bag (NOT distinct — DSIR counts occurrences).
    ``toks`` must be a MATERIALIZED column reference, not the tokenizer
    expression: built from two ``slice``s zipped pairwise, which is
    O(n) per doc — an ``element_at``-indexed ``transform`` over the raw
    tokenizer expression re-evaluates the regexp split per access,
    O(n²) splits per doc (measured: ~7 s/pass at sf0.1 vs ~1 s).
    Bigram guard mirrors ``text_analysis.shingles``: ``sequence(1, 0)``
    counts *down*, so short docs need an explicit empty array."""
    n = F.size(toks)
    m = F.greatest(n - 1, F.lit(0))  # slice() rejects negative lengths
    bigrams = F.when(n >= 2, F.zip_with(
        F.slice(toks, 1, m), F.slice(toks, 2, m),
        lambda a, b: F.concat_ws(" ", a, b))
    ).otherwise(F.array().cast("array<string>"))
    return F.concat(toks, bigrams)


def hashed_ngram_counts(df: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text",
                        buckets: int = 4096) -> DataFrame:
    """Per-document hashed-feature bag: ``(id, bucket, cnt)``.
    Bucket = 60-bit md5 hash of the salted n-gram, mod ``buckets``."""
    from openai_vector_search_demo_spark.functions.text_analysis import (
        _hash60, tokens)

    tk = df.select(F.col(id_col).alias("_id"),
                   tokens(text_col).alias("_tk"))
    g = tk.select("_id", F.explode(_ngrams(F.col("_tk"))).alias("g"))
    return (g.select("_id", F.pmod(
                _hash60(F.concat_ws(":", F.lit(_SALT), F.col("g"))),
                F.lit(buckets)).alias("bucket"))
            .groupBy("_id", "bucket").agg(F.count(F.lit(1)).alias("cnt"))
            .withColumnRenamed("_id", id_col))


def dsir_log_ratios(target_counts: DataFrame, pool_counts: DataFrame,
                    buckets: int = 4096, alpha: float = 1.0,
                    round_dp: int = 9) -> DataFrame:
    """Smoothed per-bucket log-ratio table ``(bucket, lam)`` —
    λ_b = ln((t_b+α)/(T+αB)) − ln((q_b+α)/(Q+αB)).  B rows; the two
    grand totals are driver-collected scalars (bounded-collect
    pattern), so the frame stays broadcastable."""
    t = target_counts.groupBy("bucket").agg(F.sum("cnt").alias("t"))
    q = pool_counts.groupBy("bucket").agg(F.sum("cnt").alias("q"))
    t_total = t.agg(F.sum("t")).first()[0] or 0
    q_total = q.agg(F.sum("q")).first()[0] or 0
    tz = float(t_total + alpha * buckets)
    qz = float(q_total + alpha * buckets)
    # Full outer: a bucket seen on one side only still needs its
    # smoothed λ (pool-only buckets get a negative pull — exactly the
    # "not target-like" signal).
    j = t.join(q, "bucket", "full_outer")
    return j.select(
        "bucket",
        F.round(
            F.log((F.coalesce(F.col("t"), F.lit(0)) + F.lit(alpha))
                  / F.lit(tz))
            - F.log((F.coalesce(F.col("q"), F.lit(0)) + F.lit(alpha))
                    / F.lit(qz)),
            round_dp).alias("lam"))


def dsir_importance_weights(pool: DataFrame, target: DataFrame,
                            id_col: str = "doc_id",
                            text_col: str = "text",
                            buckets: int = 4096, alpha: float = 1.0,
                            round_dp: int = 6,
                            target_within_pool: bool = False) -> DataFrame:
    """Score every pool document: ``(id, weight)`` with
    w(d) = Σ_b c_db·λ_b, rounded ``round_dp`` in-engine.  The λ table
    is broadcast (B rows); the pool side shuffles only on (doc,
    bucket) → doc — both map-side-combinable.  Both feature frames are
    ``scoped_persist``-ed — three consumers each (side total, λ agg,
    weight join); without the persist the tokenize→hash→explode pass
    recomputes per consumer (releasable under ``cache_scope``).

    ``target_within_pool=True`` declares the target rows a subset of
    the pool (the common "my reference domain is part of the crawl"
    case): target features are then a semi-join of the already-computed
    pool features instead of a second tokenize→hash pass over the
    target text."""
    from openai_vector_search_demo_spark.caching import scoped_persist

    pc = scoped_persist(
        hashed_ngram_counts(pool, id_col, text_col, buckets))
    if target_within_pool:
        ids = target.select(id_col).distinct()
        tc = scoped_persist(pc.join(ids, id_col, "left_semi"))
    else:
        tc = scoped_persist(
            hashed_ngram_counts(target, id_col, text_col, buckets))
    lam = dsir_log_ratios(tc, pc, buckets, alpha)
    return (pc.join(F.broadcast(lam), "bucket")
            .groupBy(id_col)
            .agg(F.round(F.sum(F.col("cnt") * F.col("lam")),
                         round_dp).alias("weight")))


def gumbel_key(id_col: Column | str, weight: Column | str,
               seed: int = 42, round_dp: int = 6) -> Column:
    """Deterministic Gumbel-perturbed selection key:
    key = w + (−ln(−ln(u))) with u = (h60(seed‖id)%2^53 + 0.5)/2^53
    — strictly inside (0,1), and both the +0.5 and the
    division-by-a-power-of-two are EXACT in ieee754 doubles, so the
    uniform is bit-identical in Spark and the DuckDB oracle before
    ``ln`` ever runs.  Hash-derived (no ``rand()``): the draw is
    reproducible across runs, partitionings, and engines."""
    from openai_vector_search_demo_spark.functions.text_analysis import _hash60

    ident = F.col(id_col) if isinstance(id_col, str) else id_col
    w = F.col(weight) if isinstance(weight, str) else weight
    two53 = 2 ** 53
    u = ((F.pmod(_hash60(F.concat_ws(
        ":", F.lit("gumbel"), F.lit(str(seed)), ident.cast("string"))),
        F.lit(two53)) + F.lit(0.5)) / F.lit(float(two53)))
    return F.round(w + (-F.log(-F.log(u))), round_dp)


def dsir_resample(pool: DataFrame, target: DataFrame, k: int,
                  id_col: str = "doc_id", text_col: str = "text",
                  buckets: int = 4096, alpha: float = 1.0,
                  seed: int = 42,
                  target_within_pool: bool = False) -> DataFrame:
    """Gumbel-top-k selection of ``k`` pool documents (without
    replacement, ∝ exp(w)): ``(id, weight, key)`` — the ``k`` rows
    with the largest perturbed keys, ties broken by id.  One
    TakeOrderedAndProject over the scored pool; no global sort
    materialization."""
    w = dsir_importance_weights(pool, target, id_col, text_col,
                                buckets, alpha,
                                target_within_pool=target_within_pool)
    keyed = w.select(id_col, "weight",
                     gumbel_key(id_col, "weight", seed).alias("key"))
    return keyed.orderBy(F.col("key").desc(), F.col(id_col).asc()).limit(k)
