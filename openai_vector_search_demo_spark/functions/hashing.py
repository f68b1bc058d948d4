"""Key hashing (SURVEY.md §2.2 P3, §2.1 S9).

The reference keys every chunk row by ``sha1(f'{doc_path}_{page_no}')``
(modules/utilities.py:344) and upserts by that key — deterministic keys are
what make re-ingestion idempotent.  ``record_key`` reproduces that exactly
with Spark's built-in ``sha1``.

``md5_key`` is the portable variant used wherever a DuckDB oracle must
recompute the same digest (DuckDB ships md5 but not sha1).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def record_key(doc_path: Column | str, page_no: Column | str) -> Column:
    """S9 key derivation — sha1(doc_path || '_' || page_no)
    (modules/utilities.py:344)."""
    p = F.col(doc_path) if isinstance(doc_path, str) else doc_path
    n = F.col(page_no) if isinstance(page_no, str) else page_no
    return F.sha1(F.concat_ws("_", p, n.cast("string")))


def md5_key(*cols: Column | str) -> Column:
    """Oracle-portable digest of '_'-joined parts (DuckDB: md5(concat_ws(...)))."""
    parts = [F.col(c).cast("string") if isinstance(c, str) else c.cast("string")
             for c in cols]
    return F.md5(F.concat_ws("_", *parts))


def hash_sample_predicate(key: Column | str, fraction: float,
                          seed: int = 42,
                          buckets: int = 1_000_000) -> Column:
    """Deterministic sampling predicate: keep a row iff its KEY hashes into
    the first ``fraction`` of ``buckets`` md5 buckets.

    Why not ``df.sample()``: rand()-based sampling is nondeterministic
    across runs/partitionings, and two tables sampled independently share
    no keys — a sampled fact can't join a sampled dim.  Hashing the JOIN
    KEY fixes both: the same key is kept everywhere (consistent sampling),
    re-runs are identical, and the DuckDB oracle reproduces the exact row
    set (md5 arithmetic mirrors ``queries._SQL_H60``).  The hash is
    seed-salted so independent samples can be drawn from one corpus.
    """
    if not 0.0 <= fraction <= 1.0:
        raise ValueError("fraction must be in [0, 1]")
    from openai_vector_search_demo_spark.functions.text_analysis import _hash60
    k = F.col(key) if isinstance(key, str) else key
    h = _hash60(F.concat_ws(":", F.lit(str(seed)), k.cast("string")))
    return F.pmod(h, F.lit(buckets)) < int(fraction * buckets)


def stratified_sample_predicate(strata: Column | str,
                                key: Column | str,
                                fractions: dict[str, float],
                                default: float = 0.0,
                                seed: int = 42,
                                buckets: int = 1_000_000) -> Column:
    """Per-stratum deterministic sampling — the DATA-MIXING primitive: keep
    e.g. 100% of one source, 25% of another, ``default`` of the rest, with
    the same hash-the-key determinism as ``hash_sample_predicate`` (rows
    keep/drop identically across runs, partitionings, and engines).

    A training mix is exactly this shape: per-domain target rates over one
    corpus.  ``fractions`` is a small literal map (domains are few) —
    inlined into the plan, broadcast by value, no join.  Cutoffs use
    ``floor(frac·buckets)`` so the DuckDB oracle reproduces the row set
    bit-for-bit (double→int casts round differently across engines; an
    explicit floor doesn't).
    """
    for s, f in fractions.items():
        if not 0.0 <= f <= 1.0:
            raise ValueError(f"fraction for {s!r} must be in [0, 1]")
    if not 0.0 <= default <= 1.0:
        raise ValueError("default fraction must be in [0, 1]")
    from openai_vector_search_demo_spark.functions.text_analysis import _hash60
    s = F.col(strata) if isinstance(strata, str) else strata
    k = F.col(key) if isinstance(key, str) else key
    frac = F.lit(float(default))
    for name, f in sorted(fractions.items()):
        frac = F.when(s == name, F.lit(float(f))).otherwise(frac)
    h = _hash60(F.concat_ws(":", F.lit(str(seed)), k.cast("string")))
    return F.pmod(h, F.lit(buckets)) < F.floor(frac * buckets).cast("long")


def resample_with_weights(df, strata: str, key: str,
                          weights: dict[str, float],
                          default: float = 1.0, seed: int = 42,
                          buckets: int = 1_000_000,
                          copy_col: str = "copy"):
    """Deterministic sampling WITH replacement — the UPSAMPLING half of
    data mixing (``stratified_sample_predicate`` is the keep/drop half):
    a stratum with weight w contributes ⌊w⌋ full copies of every row plus
    one more iff the salted key-hash lands under frac(w) of the bucket
    space.  E[rows] = w·n per stratum, exactly the GPT-3/LLaMA-style
    domain sampling weights, and the SAME key always resolves the same
    way — re-runs, repartitionings, and the DuckDB oracle all emit the
    identical multiset.

    Integer copy counts and cutoffs are computed driver-side per stratum
    (no float arithmetic in the plan), inlined as a when-chain — no join,
    no shuffle; the explode is the only row-count change.  ``copy_col``
    (1-based) disambiguates the copies downstream (e.g. as part of a
    packing or shard key).
    """
    for name, w in list(weights.items()) + [("default", default)]:
        if w < 0:
            raise ValueError(f"weight for {name!r} must be >= 0")
    from openai_vector_search_demo_spark.functions.text_analysis import _hash60
    s = F.col(strata)

    def chain(value_of):
        expr = F.lit(value_of(default))
        for name, w in sorted(weights.items()):
            expr = F.when(s == name, F.lit(value_of(w))).otherwise(expr)
        return expr

    base = chain(lambda w: int(w))
    cut = chain(lambda w: int(round((w - int(w)) * buckets)))
    h = F.pmod(_hash60(F.concat_ws(":", F.lit(str(seed)),
                                   F.col(key).cast("string"))),
               F.lit(buckets))
    n = (base + (h < cut).cast("int")).alias("_n_copies")
    copies = F.when(n >= 1, F.sequence(F.lit(1), n)) \
              .otherwise(F.array().cast("array<int>"))
    return df.withColumn(copy_col, F.explode(copies))


def dataset_split(df, key: str, fractions: dict[str, float],
                  seed: int = 42, buckets: int = 1_000_000,
                  split_col: str = "split"):
    """Deterministic train/val/test assignment: the salted key-hash lands
    in one of the cumulative ``fractions`` ranges (insertion order), and
    the SAME key lands in the same split everywhere — re-runs, engines,
    repartitionings, and (because the hash is keyed, not positional)
    additions to the corpus never reshuffle existing assignments, the
    property random ``randomSplit`` cannot give.  Fractions must sum to
    1 (±1e-9); cutoffs are integer bucket boundaries so engines agree at
    the edges."""
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    if any(f < 0 for f in fractions.values()):
        raise ValueError("fractions must be >= 0")
    from openai_vector_search_demo_spark.functions.text_analysis import _hash60
    h = F.pmod(_hash60(F.concat_ws(":", F.lit(str(seed)),
                                   F.col(key).cast("string"))),
               F.lit(buckets))
    names = list(fractions)
    cum, bounds = 0.0, []
    for name in names:
        cum += fractions[name]
        bounds.append(int(round(cum * buckets)))
    bounds[-1] = buckets                      # close the last range exactly
    if len(names) == 1:
        return df.withColumn(split_col, F.lit(names[0]))
    # ordered when-chain: the FIRST satisfied `h < bound` wins
    expr = F.when(h < bounds[0], F.lit(names[0]))
    for name, hi in zip(names[1:-1], bounds[1:-1]):
        expr = expr.when(h < hi, F.lit(name))
    return df.withColumn(split_col, expr.otherwise(F.lit(names[-1])))


def sample_priority(key: Column | str, seed: int | str = 42) -> Column:
    """The bottom-k / quota sampling PRIORITY: a salted 60-bit md5 hash
    of the key.  Ordering rows by (priority, key) yields a uniform
    random permutation that every engine reproduces bit-for-bit —
    the deterministic stand-in for ``rand()`` that makes exact-k
    sampling oracle-checkable and re-run-stable."""
    from openai_vector_search_demo_spark.functions.text_analysis import _hash60
    k = F.col(key) if isinstance(key, str) else key
    return _hash60(F.concat_ws(":", F.lit(str(seed)), k.cast("string")))


def bottomk_sample(df, key: str, k: int, seed: int = 42,
                   priority_col: str | None = None):
    """Global EXACT-k uniform sample: the k rows with the smallest salted
    key-hashes — a bottom-k (priority) sample, the distributed form of
    reservoir sampling.  ``hash_sample_predicate`` trades exactness for
    a map-only plan (E[n] = frac·N, zero coordination); this is the
    other point on that curve: exactly k rows, still deterministic,
    still engine-portable.

    Physical shape is the whole point: ``orderBy(priority, key).limit(k)``
    compiles to ``TakeOrderedAndProject`` — every scan partition keeps a
    k-row heap, the driver merges the per-partition heaps.  NO exchange,
    NO global sort, memory Θ(k·partitions) at the driver and Θ(k) per
    task, so the plan survives a 100 TB scan unchanged as long as k is
    driver-mergeable (k ≤ ~10⁶).  Ties (md5 collisions) break on the raw
    key, so the result is a set, not a sample-of-a-sample.
    """
    if k < 0:
        raise ValueError("k must be >= 0")
    pri = sample_priority(key, seed)
    if priority_col is not None:
        df = df.withColumn(priority_col, pri)
        pri = F.col(priority_col)
    return df.orderBy(pri.asc(), F.col(key).asc()).limit(k)


def _per_stratum_literal(strata: str, mapping: dict[str, int],
                         default: int, what: str) -> Column:
    """Validated per-stratum integer literal as an inlined when-chain —
    the shared scaffolding of the exact-count samplers (quota counts,
    token budgets): tiny literal map, broadcast by value, no join."""
    for name, v in list(mapping.items()) + [("default", default)]:
        if v < 0:
            raise ValueError(f"{what} for {name!r} must be >= 0")
    s = F.col(strata)
    lit = F.lit(int(default))
    for name, v in sorted(mapping.items()):
        lit = F.when(s == name, F.lit(int(v))).otherwise(lit)
    return lit


def _stratum_order(key: str, seed: int) -> list[Column]:
    """The samplers' shared total order: (salted key-hash, key)."""
    return [sample_priority(key, seed).asc(), F.col(key).asc()]


def stratified_quota_sample(df, strata: str, key: str,
                            quotas: dict[str, int], default: int = 0,
                            seed: int = 42, rank_col: str | None = None,
                            two_phase: bool = True):
    """Per-stratum EXACT quotas — the sampling dual of
    ``stratified_sample_predicate`` (rates → expected counts) and the
    plan you need when the mixture spec says "exactly 100k docs of
    src0", not "about 10% of it": rank each stratum's rows by salted
    key-hash and keep the first ``quota`` (a stratum smaller than its
    quota contributes everything — min(quota, |stratum|), never
    resampled repeats).

    Scale posture: a naive ``row_number() OVER (PARTITION BY strata)``
    hash-partitions the FULL corpus by the stratum column — with few
    strata that is one reducer per stratum holding terabytes.  The
    default two-phase plan prunes first: rank within
    (``spark_partition_id()``, stratum) — thousands of distinct groups,
    each bounded by one scan split, hashed across all reducers — keep
    per-group top-``quota`` (a superset of every stratum's global
    top-``quota``, since a global winner wins its own partition too),
    THEN rank the ≤ quota·n_partitions survivors per stratum.  The
    second exchange moves quota-bounded rows, not the corpus: the skew
    is gone and the answer is value-identical (the final rank is
    computed over a pruned superset of the kept set, so ranks equal the
    single-phase ranks).  DuckDB oracle: the single-phase window — the
    two plans agree row-for-row by construction.
    """
    from pyspark.sql import Window

    quota = _per_stratum_literal(strata, quotas, default, "quota")
    order = _stratum_order(key, seed)
    if two_phase:
        pruned = (df.withColumn("_pid", F.spark_partition_id())
                  .withColumn("_prn", F.row_number().over(
                      Window.partitionBy("_pid", strata).orderBy(*order)))
                  .filter(F.col("_prn") <= quota).drop("_pid", "_prn"))
    else:
        pruned = df
    rn = F.row_number().over(Window.partitionBy(strata).orderBy(*order))
    out = pruned.withColumn("_rn", rn).filter(F.col("_rn") <= quota)
    if rank_col is not None:
        return out.withColumnRenamed("_rn", rank_col)
    return out.drop("_rn")


def weighted_priority(key: Column | str, weight: Column,
                      seed: int = 42) -> Column:
    """Integer-exact Efraimidis–Spirakis priority: the MAX of ``w``
    salted 60-bit hashes of the key.  ES weighted sampling without
    replacement keeps the k smallest of Exp(w) draws per key; the min
    of w i.i.d. Exp(1) draws IS Exp(w) exactly, and -ln(u) is a
    monotone map, so "k smallest of min(-ln(u_c))" ≡ "k LARGEST of
    max_c u_c" — every comparison collapses onto the integer hash
    values themselves.  No ln/pow in the plan: the scheme is bit-exact
    across engines (float transcendentals differ in the last ulp
    across libms, which can flip a rank at the sample boundary —
    unacceptable for an oracle-gated sampler).

    Cost: Θ(w) hash evaluations per row via ``transform(sequence(1,w))``
    + ``array_max`` — map-only, no explode, no shuffle.  Integer
    weights only (replicate-the-draw semantics); keep w small
    (domain-mixing weights are single digits) — for large weights scale
    them down to the same ratios first.
    """
    from openai_vector_search_demo_spark.functions.text_analysis import _hash60
    k = F.col(key) if isinstance(key, str) else key
    ks = k.cast("string")
    w = weight.cast("int")
    # w < 1 → NULL priority (never sampled); an unguarded sequence(1, 0)
    # would DESCEND ([1, 0]) and hand weight-0 rows a real draw
    return F.when(w >= 1, F.array_max(F.transform(
        F.sequence(F.lit(1), w),
        lambda c: _hash60(F.concat_ws(
            ":", F.lit(str(seed)), ks, c.cast("string"))))))


def weighted_bottomk_sample(df, key: str, weight: Column, k: int,
                            seed: int = 42):
    """Weighted sample WITHOUT replacement, exactly k rows — the fourth
    rung of the sampling family (uniform bottom-k / stratified quota /
    weighted WITH replacement are the other three): inclusion is
    ES-distributed ∝ weight (a weight-8 doc is ~8× as likely in the
    sample as a weight-1 doc at k ≪ n), deterministic, engine-portable,
    and — like ``bottomk_sample`` — a ``TakeOrderedAndProject`` plan:
    per-partition k-row heaps, no exchange, no global sort."""
    if k < 0:
        raise ValueError("k must be >= 0")
    pri = weighted_priority(key, weight, seed)
    return (df.withColumn("_pri", pri)
            .filter(F.col("_pri").isNotNull())   # weight < 1: never sampled
            .orderBy(F.col("_pri").desc(), F.col(key).asc()).limit(k)
            .drop("_pri"))


def token_budget_fill(df, strata: str, key: str, tokens_col: str,
                      budgets: dict[str, int], default: int = 0,
                      seed: int = 42, cum_col: str | None = None,
                      two_phase: bool = True):
    """Fill each stratum to a TOKEN budget — the materialization half of
    mixture planning (``mixture_allocation`` computes per-source token
    targets; this consumes them): walk the stratum in salted key-hash
    order and keep a row iff the tokens BEFORE it are still under
    budget (so the boundary-crossing doc is included — every stratum
    with a positive budget contributes at least one doc, and overshoot
    is bounded by one document).  Deterministic, engine-portable, and
    composes with the other sampling rungs (same salted key order).

    Two-phase for the same reason as ``stratified_quota_sample``: a
    per-stratum running sum is one reducer per stratum.  Phase 1 runs
    the cumulative sum within (scan-split, stratum) and keeps rows
    whose WITHIN-SPLIT prefix is under budget — a value-identical
    superset of the answer: a globally-kept row's every predecessor
    survives (its split prefix is bounded by the global one), and a
    row the global rule drops is still dropped over survivors (any
    pruned predecessor's split already contributes ≥ budget surviving
    tokens ahead of it).  Phase 2's per-stratum window then sums
    budget-bounded survivors, not the corpus.
    """
    from pyspark.sql import Window

    budget = _per_stratum_literal(strata, budgets, default, "budget")
    order = _stratum_order(key, seed)
    tok = F.col(tokens_col).cast("long")

    def cum_before(*part):
        w = (Window.partitionBy(*part).orderBy(*order)
             .rowsBetween(Window.unboundedPreceding, -1))
        return F.coalesce(F.sum(tok).over(w), F.lit(0))

    if two_phase:
        df = (df.withColumn("_pid", F.spark_partition_id())
              .withColumn("_pcum", cum_before("_pid", strata))
              .filter(F.col("_pcum") < budget).drop("_pid", "_pcum"))
    out = (df.withColumn("_cum", cum_before(strata))
           .filter(F.col("_cum") < budget))
    if cum_col is not None:
        return out.withColumnRenamed("_cum", cum_col)
    return out.drop("_cum")
