"""Skew-aware aggregation and join helpers (100 TB posture, SURVEY §4.4).

AQE's skew-join splitting handles *join* skew at runtime; aggregation skew
over low-cardinality hot keys (5 event types across 10¹¹ events) still
serializes each hot key through one reducer under a naive one-phase plan.
``salted_aggregate`` is the classic two-phase rewrite: salt the key,
pre-aggregate per (key, salt) — map-side combine ensures each partition
contributes one row per (key, salt) — then merge the partials.

Works for any algebraic aggregate (decomposable into partial + merge);
results are exactly equal to the one-phase form, so it is oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_aggregate(df: DataFrame, keys: list[str],
                     aggs: dict[str, tuple[Column, Column]],
                     salt_buckets: int = 32) -> DataFrame:
    """Two-phase aggregation over possibly-skewed ``keys``.

    ``aggs`` maps output column name → (partial_expr, merge_expr) where
    ``partial_expr`` aggregates the raw rows (phase 1, keyed by key+salt)
    and ``merge_expr`` combines the partials (phase 2, keyed by key),
    referring to the phase-1 output by its alias, e.g.::

        {"n":   (F.count(F.lit(1)),  F.sum("n")),
         "s":   (F.sum("value"),     F.sum("s")),
         "mx":  (F.max("value"),     F.max("mx"))}

    The salt column is a uniform hash of a high-cardinality pseudo-random
    source (monotonically_increasing_id), so each hot key fans out over
    ``salt_buckets`` reducers in phase 1; phase 2 touches only
    |keys|·salt_buckets rows.
    """
    salted = df.withColumn(
        "_salt", F.pmod(F.hash(F.monotonically_increasing_id()),
                        F.lit(salt_buckets)))
    phase1 = (salted.groupBy(*keys, "_salt")
              .agg(*[p.alias(name) for name, (p, _) in aggs.items()]))
    return (phase1.groupBy(*keys)
            .agg(*[m.alias(name) for name, (_, m) in aggs.items()]))


def salted_join(big: DataFrame, small: DataFrame, key: str,
                salt_buckets: int = 16) -> DataFrame:
    """Skew-safe equi-join: salt the big side's key, explode the small side
    across every salt value, join on (key, salt).  Each hot key's rows
    spread over ``salt_buckets`` tasks instead of one straggler.

    (With AQE's skew-join splitting enabled this is rarely needed — kept as
    the explicit form for engines/configs without AQE, and for joins whose
    skew AQE cannot see, e.g. post-explode intermediates.)
    """
    big_salted = big.withColumn(
        "_salt", F.pmod(F.hash(F.monotonically_increasing_id()),
                        F.lit(salt_buckets)))
    small_exploded = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1))))
    out = big_salted.join(small_exploded, [key, "_salt"])
    return out.drop("_salt")
