"""Z-order (Morton-curve) data layout — multi-dimensional clustering
for scan pruning, the 100 TB *storage-layout* lever next to the engine's
partition-pruning stored indexes (``stores.py``).

Why this lives in a training-data engine: a petabyte corpus is read by
many query shapes — by source, by date, by quality band, by shard key.
A file sorted on one key skips beautifully on that key and not at all
on any other; interleaving the bits of several keys (the Morton/Z curve
— Morton 1966; the same layout lever Delta Lake/Iceberg expose as
``ZORDER BY``/sort orders, public docs) makes every file's min/max
envelope tight on ALL interleaved dimensions at once, so parquet
row-group/file statistics prune scans with predicates on ANY of them.

Spark-first shape:

- per-column min/max enter the plan as driver-collected literals (the
  engine's bounded-collect pattern — 2 scalars per column, one agg);
- each column is scaled to ``[0, 2^bits)`` with
  ``floor((x−min)·(2^bits−1) / (max−min))`` — for non-negative integer
  operands below 2^53 the double divide + floor is EXACTLY the integer
  quotient in ieee754 (the remainder either is 0 or exceeds the
  half-ulp), so Spark and the DuckDB oracle agree bit-for-bit;
- the z-value is a pure bitwise expression (``bits × ncols``
  shift/and/or terms, whole-stage-codegen — no UDF);
- ``zorder_write`` range-partitions on the z-value and sorts within
  partitions, so every output file owns a contiguous curve segment —
  tight min/max envelopes on every interleaved column.

At 100 TB this is a one-shuffle layout job whose payoff is every later
scan: predicates on any interleaved column prune at file granularity
via footer statistics, before a single row is read.  The engine's own
demonstration (``tests/test_layout.py``) measures it: with a
selective predicate on the SECOND key, the z-ordered layout's
overlapping-file count drops to a fraction of a single-key-sorted
layout's, on the same data and file count.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["zvalue_expr", "with_zvalue", "zorder_write"]


def zvalue_expr(scaled: list[Column], bits: int = 16) -> Column:
    """Interleave ``bits`` low bits of each already-scaled non-negative
    integer column into one Morton key (column *i* owns bit positions
    ``j·ncols + i``).  Pure shift/and/or — whole-stage codegen."""
    n = len(scaled)
    if n * bits > 62:
        raise ValueError("zvalue would overflow a signed 64-bit long")
    terms = [
        F.shiftleft(F.shiftright(c, j).bitwiseAND(F.lit(1)), j * n + i)
        for j in range(bits) for i, c in enumerate(scaled)
    ]
    return reduce(Column.bitwiseOR, terms)


def with_zvalue(df: DataFrame, cols: list[str], bits: int = 16,
                out: str = "zkey") -> DataFrame:
    """Append the Morton key of ``cols`` as ``out``.  Min/max per column
    are collected once as plan literals (bounded collect: 2·ncols
    scalars); constant columns scale to 0."""
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"_mn_{c}"), F.max(c).alias(f"_mx_{c}")]
    row = df.agg(*aggs).first()
    mask = (1 << bits) - 1
    scaled = []
    for c in cols:
        mn, mx = row[f"_mn_{c}"], row[f"_mx_{c}"]
        rng = int(mx) - int(mn)
        if rng == 0:
            scaled.append(F.lit(0).cast("long"))
        else:
            dx = F.col(c).cast("long") - F.lit(int(mn))
            scaled.append(F.floor(dx * F.lit(mask) / F.lit(rng))
                          .cast("long"))
    return df.withColumn(out, zvalue_expr(scaled, bits))


def zorder_write(df: DataFrame, path: str, cols: list[str],
                 num_files: int = 16, bits: int = 16) -> None:
    """Write ``df`` as parquet z-ordered on ``cols``: range-partition on
    the Morton key into ``num_files`` curve segments, sort within each,
    drop the helper key.  One shuffle; every output file's min/max
    envelope is tight on every interleaved column."""
    keyed = with_zvalue(df, cols, bits, out="__z")
    (keyed.repartitionByRange(num_files, F.col("__z"))
     .sortWithinPartitions("__z")
     .drop("__z")
     .write.mode("overwrite").parquet(path))
