"""As-of (point-in-time) join — an operator Spark lacks natively.

For each left row, the single most recent right row with
``right.ts <= left.ts`` within the same key — the temporal join behind
feature lookups ("the user's latest order as of this event"), slowly-
changing-dimension reads, and time-series alignment.

Spark-first implementation: the **union + running last_value trick** —
tag both sides, union them, and take a running ``last_value(..., ignore
nulls)`` over ``(key) ORDER BY (ts, side)`` so every left row sees the
latest preceding right payload.  One shuffle on the key (the window),
no range explosion, no per-row probe: at 100 TB this is a single
hash-partitioned sort per key — the same cost class as any window, and
strictly better than the naive inequality join Catalyst would plan as a
broadcast-nested-loop.

Ties: a right row AT the left timestamp matches (≤ semantics) — the sort
places right (side 0) before left (side 1) at equal ts.  Duplicate right
rows on (key, ts) are collapsed to the max tie-break first, keeping the
operator deterministic (DuckDB's native ASOF JOIN, the oracle, requires
the same normalization).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def as_of_join(left: DataFrame, right: DataFrame,
               key: str, ts: str,
               payload: list[str],
               right_tie_break: str | None = None,
               tolerance: int | float | None = None) -> DataFrame:
    """Left as-of join: ``left`` rows + ``payload`` columns of the latest
    ``right`` row with ``right.ts <= left.ts`` per ``key`` (nulls when no
    right row precedes).

    ``right_tie_break``: column choosing among right rows sharing (key, ts)
    — the max wins; required for determinism if duplicates are possible.

    ``tolerance``: maximum staleness in ``ts`` units (pandas
    ``merge_asof`` semantics) — a preceding right row OLDER than
    ``left.ts − tolerance`` does not match and the payload comes back
    NULL.  Feature lookups almost always want this ("the last price,
    but only if it is fresh"); implemented as a post-window null-out of
    the carried struct, so the plan shape (one keyed window) is
    unchanged.

    Right rows with a NULL ``ts`` are dropped before the union — ASOF
    semantics never match an undated row (NULLs otherwise sort first in the
    window and would be carried as a bogus "earliest" payload).  Payload
    names colliding with left columns raise instead of silently producing
    duplicate output columns; ``'_rts'`` is reserved (the carried struct
    stores the matched right timestamp under it for the tolerance check).
    ``tolerance`` requires a NUMERIC ``ts`` column — on a timestamp-typed
    ``ts`` the subtraction yields an INTERVAL and the comparison against a
    numeric tolerance fails; callers with timestamps pass epoch
    micros/seconds (e.g. the ``ts_us`` convention) — enforced with a loud
    TypeError rather than an analysis-time surprise.
    """
    clash = set(payload) & set(left.columns)
    if clash:
        raise ValueError(
            f"payload column(s) {sorted(clash)} already exist in left; "
            f"rename before joining")
    if "_rts" in payload:
        raise ValueError(
            "payload column '_rts' collides with the reserved matched-"
            "timestamp field of the carried struct; rename it")
    if tolerance is not None:
        ts_type = dict(left.dtypes).get(ts) or ""
        if not (ts_type in ("bigint", "int", "smallint", "tinyint",
                            "double", "float", "long")
                or ts_type.startswith("decimal")):
            raise TypeError(
                f"tolerance requires a numeric ts column; {ts!r} is "
                f"{ts_type!r} — pass epoch micros (ts_us) instead of a "
                f"timestamp")
    r = right.select(key, ts, *payload).filter(F.col(ts).isNotNull())
    if right_tie_break:
        w_dedup = Window.partitionBy(key, ts).orderBy(
            F.col(right_tie_break).desc())
        r = (r.withColumn("_rn", F.row_number().over(w_dedup))
             .filter(F.col("_rn") == 1).drop("_rn"))

    l_tagged = left.withColumn("_side", F.lit(1))
    r_tagged = r.withColumn("_side", F.lit(0))
    for c in left.columns:
        if c not in r_tagged.columns:
            r_tagged = r_tagged.withColumn(c, F.lit(None))
    for c in payload:
        if c not in l_tagged.columns:
            l_tagged = l_tagged.withColumn(c, F.lit(None))
    unioned = l_tagged.unionByName(r_tagged.select(l_tagged.columns))

    w = (Window.partitionBy(key)
         .orderBy(F.col(ts).asc(), F.col("_side").asc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    # carry the whole right row as one struct: a right row whose payload
    # column is legitimately NULL must still supersede older rows (a
    # per-column last(ignorenulls) would skip it)
    marker = F.when(F.col("_side") == 0,
                    F.struct(F.col(ts).alias("_rts"),
                             *[F.col(c) for c in payload]))
    carried = unioned.select(
        *left.columns, "_side",
        F.last(marker, ignorenulls=True).over(w).alias("_asof"))
    asof = F.col("_asof")
    if tolerance is not None:
        asof = F.when(F.col(ts) - F.col("_asof._rts") <= F.lit(tolerance),
                      F.col("_asof"))
    return (carried.filter(F.col("_side") == 1)
            .withColumn("_asof", asof)
            .select(*left.columns,
                    *[F.col(f"_asof.{c}").alias(c) for c in payload]))
