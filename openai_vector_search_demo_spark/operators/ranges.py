"""Banded range join — point-in-interval matching without a cross product.

The reference has no join operator at all (SURVEY §2.6); this is part of the
engine's standard relational surface for large-scale pipelines (score →
quality band, price → tier, timestamp → maintenance window, ...).

Spark plans a raw non-equi join ``lo <= p AND p < hi`` as a broadcast
nested-loop join: fine when the band side is tiny, O(n·m) when it is not.
The scale-safe plan used here is the classic bucketed range join (the same
"bin the range predicate" rewrite Databricks' range-join optimization and
Flink's interval join apply, and what SNIPPETS.md's interval patterns show):

1. pick a bucket width ``w``;
2. each point lands in exactly ONE bucket ``floor(p / w)``;
3. each band ``[lo, hi)`` explodes to its covered buckets
   ``floor(lo/w) .. floor(hi/w)`` (bounded fan-out, checked);
4. shuffle-equi-join on the bucket key, then apply the exact predicate.

A (point, band) match shares exactly one bucket — the point's own — so the
join emits no duplicates and needs no distinct.  Shuffle volume is
``n + m · buckets_per_band`` rows instead of the nested loop's ``n · m``
comparisons, and the equi-join parallelizes over buckets on any cluster
size.  Bands may overlap arbitrarily; a point matching k bands yields k
rows, same as the naive join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_MAX_BUCKETS_PER_BAND = 4096


def band_join(points: DataFrame, bands: DataFrame, point_col: str,
              lo_col: str = "lo", hi_col: str = "hi",
              bucket_width: float | None = None,
              max_buckets_per_band: int = DEFAULT_MAX_BUCKETS_PER_BAND,
              ) -> DataFrame:
    """Inner-join ``points`` to every band whose ``[lo, hi)`` interval
    contains ``point_col``.  Output = all point columns + all band columns.

    ``bucket_width=None`` derives the width from the widest band (one
    scalar aggregate — every band then spans ≤ 2 buckets).  Pass an
    explicit width when band sizes are heavily skewed: a width near the
    TYPICAL band keeps the fan-out of narrow bands at 1–2 while the guard
    below catches any band whose fan-out would explode the plan.
    """
    overlap = set(points.columns) & set(bands.columns)
    if overlap:
        raise ValueError(f"point/band column name collision: {sorted(overlap)}")

    if bucket_width is None:
        row = bands.agg(F.max(F.col(hi_col) - F.col(lo_col))).first()
        bucket_width = float(row[0]) if row and row[0] else 1.0
    if bucket_width <= 0:
        raise ValueError("bucket_width must be positive")

    w = F.lit(float(bucket_width))
    lo_b = F.floor(F.col(lo_col) / w)
    hi_b = F.floor(F.col(hi_col) / w)

    # fan-out guard: a single [0, inf)-ish band would otherwise explode
    # into millions of rows silently
    worst = bands.agg(F.max(hi_b - lo_b + 1)).first()[0]
    if worst is not None and worst > max_buckets_per_band:
        raise ValueError(
            f"a band spans {worst} buckets at width {bucket_width} "
            f"(cap {max_buckets_per_band}); pass a larger bucket_width")

    banded = bands.withColumn("_bucket", F.explode(F.sequence(lo_b, hi_b)))
    pointed = points.withColumn(
        "_bucket", F.floor(F.col(point_col) / w))
    return (pointed.join(banded, "_bucket")
            .filter((F.col(point_col) >= F.col(lo_col))
                    & (F.col(point_col) < F.col(hi_col)))
            .drop("_bucket"))
