"""Single-scan table profiling — the data-engineering "what is in this
table" operator: per column, row/null/distinct counts plus numeric
min/max/mean.

100 TB story: EVERY statistic for EVERY column computes in ONE scan and
ONE aggregate (all the per-column aggregates live in a single ``agg`` —
Spark evaluates them in the same partial-aggregation pass, map-side
combined), then a constant-width unpivot of the 1-row result.  No
per-column jobs, no sampling surprises; exact distincts are the oracle-
checkable default, and callers profiling genuinely wide-cardinality
columns at scale swap in ``approx_count_distinct`` (the same trade
``corpus_approx_stats`` documents).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["profile_table"]

_NUMERIC = {"tinyint", "smallint", "int", "bigint", "float", "double",
            "decimal"}


def profile_table(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """``(column, n_rows, n_nulls, n_distinct, min_num, max_num, mean)``
    — one output row per profiled column; the numeric stats are NULL for
    non-numeric columns (values are cast to double so the output schema
    is column-independent and engine-comparable — string min/max would
    drag engine-specific float formatting into the contract)."""
    names = cols if cols is not None else df.columns
    missing = [c for c in names if c not in df.columns]
    if missing:
        raise ValueError(f"unknown columns: {missing}")
    dtypes = dict(df.dtypes)

    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in names:
        base = dtypes[c].split("(")[0]
        aggs.append(F.count(F.col(c)).alias(f"nn_{c}"))
        aggs.append(F.count_distinct(F.col(c)).alias(f"nd_{c}"))
        if base in _NUMERIC:
            num = F.col(c).cast("double")
            aggs.append(F.min(num).alias(f"mn_{c}"))
            aggs.append(F.max(num).alias(f"mx_{c}"))
            aggs.append(F.avg(num).alias(f"av_{c}"))
        else:
            null = F.lit(None).cast("double")
            aggs.append(F.min(null).alias(f"mn_{c}"))
            aggs.append(F.max(null).alias(f"mx_{c}"))
            aggs.append(F.min(null).alias(f"av_{c}"))
    one = df.agg(*aggs)

    rows = [F.struct(F.lit(c).alias("column"),
                     F.col("__n").alias("n_rows"),
                     (F.col("__n") - F.col(f"nn_{c}")).alias("n_nulls"),
                     F.col(f"nd_{c}").alias("n_distinct"),
                     F.col(f"mn_{c}").alias("min_num"),
                     F.col(f"mx_{c}").alias("max_num"),
                     F.round(F.col(f"av_{c}"), 6).alias("mean"))
            for c in names]
    return (one.select(F.explode(F.array(*rows)).alias("r"))
            .select("r.*"))


def robust_outliers(df: DataFrame, value_col: str, group_cols: list[str],
                    k: float = 3.0) -> DataFrame:
    """Robust per-group outlier accounting: a value is an outlier when
    ``|x − median| > k · 1.4826 · MAD`` (the modified z-score — median
    and MAD shrug off the very outliers that poison mean/stddev gates,
    which is why data-quality monitors use this form).

    Two grouped exact medians (Spark's interpolated ``median`` ≡ DuckDB
    ``quantile_cont(0.5)``, the parity `events_value_percentiles`
    already pins) + one broadcast-sized join of per-group stats back
    onto the rows; at 100 TB swap the exact medians for
    ``approx_percentile`` — same plan shape, sketch-mergeable.
    """
    med = df.groupBy(*group_cols).agg(
        F.median(value_col).alias("_med"))
    dev = (df.join(med, group_cols)
           .withColumn("_ad", F.abs(F.col(value_col) - F.col("_med"))))
    mad = dev.groupBy(*group_cols).agg(
        F.median("_ad").alias("_mad"), F.first("_med").alias("_med"))
    flagged = (dev.drop("_med").join(mad, group_cols)
               .withColumn("_out",
                           F.col("_ad") > k * 1.4826 * F.col("_mad")))
    return (flagged.groupBy(*group_cols)
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum(F.col("_out").cast("long")).alias("n_outliers"),
                 F.round(F.first("_med"), 6).alias("median"),
                 F.round(F.first("_mad"), 6).alias("mad")))


def numeric_histogram(df: DataFrame, value_col: str,
                      bins: int = 10) -> DataFrame:
    """Equal-width histogram of a numeric column:
    ``(bin, lo, hi, n)`` over ``bins`` buckets spanning [min, max] —
    the last bucket is closed so the max lands inside it.

    One pass for the bounds (1-row aggregate, broadcast by crossJoin —
    the range enters the plan as a literal-like scalar, not a shuffle
    key) and one map-side-combinable groupBy for the counts.  Empty
    buckets emit no row (dense output is a ``sequence`` join away);
    a constant column collapses to one bucket holding everything.
    """
    if bins < 1:
        raise ValueError("bins must be >= 1")
    bounds = df.agg(F.min(value_col).alias("_lo"),
                    F.max(value_col).alias("_hi"))
    width = (F.col("_hi") - F.col("_lo")) / F.lit(bins)
    b = F.when(F.col("_hi") == F.col("_lo"), F.lit(0)).otherwise(
        F.least(F.floor((F.col(value_col) - F.col("_lo")) / width)
                .cast("int"), F.lit(bins - 1)))
    return (df.crossJoin(bounds)
            .withColumn("bin", b)
            .groupBy("bin")
            .agg(F.round(F.min(F.col("_lo")
                               + F.col("bin") * width), 6).alias("lo"),
                 F.round(F.min(F.col("_lo")
                               + (F.col("bin") + 1) * width), 6).alias("hi"),
                 F.count(F.lit(1)).alias("n")))
