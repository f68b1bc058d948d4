"""Time-window aggregations over the events stream (SURVEY §2.6: streaming
is an engine extension, not reference behavior — flagged as such).

The same logical window definitions serve batch (these functions) and
Structured Streaming (`streaming.jobs` wraps them over readStream inputs) —
one definition, two execution modes, which is exactly Spark's model.

Window starts are emitted as epoch-microsecond bigints (``*_us``) so results
hash identically against the DuckDB oracle (see queries.load_events on nanos).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_counts(events: DataFrame, width: str = "1 hour",
                    ts_col: str = "ts") -> DataFrame:
    """Per (tumbling window, event_type): count + value sum/avg.

    1970-epoch-aligned windows (Spark default), matching DuckDB
    ``time_bucket`` for whole-hour widths.
    """
    return (events
            .groupBy(F.window(ts_col, width).alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.round(F.sum("value"), 6).alias("sum_value"),
                 F.round(F.avg("value"), 6).alias("avg_value"))
            .select(F.unix_micros("w.start").alias("window_start_us"),
                    "event_type", "n_events", "sum_value", "avg_value"))


def sliding_counts(events: DataFrame, width: str = "1 hour",
                   slide: str = "30 minutes", ts_col: str = "ts") -> DataFrame:
    """Sliding windows: each event lands in width/slide overlapping windows."""
    return (events
            .groupBy(F.window(ts_col, width, slide).alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.round(F.sum("value"), 6).alias("sum_value"))
            .select(F.unix_micros("w.start").alias("window_start_us"),
                    "event_type", "n_events", "sum_value"))


def session_windows(events: DataFrame, gap: str = "5 minutes",
                    key: str = "user_id", ts_col: str = "ts") -> DataFrame:
    """Per-key session windows with inactivity gap: a new session starts when
    the time since the previous event is ≥ gap (Spark ``session_window``
    merges events strictly inside the gap)."""
    return (events
            .groupBy(F.session_window(ts_col, gap).alias("w"), key)
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.round(F.sum("value"), 6).alias("sum_value"))
            .select(F.unix_micros("w.start").alias("session_start_us"),
                    key, "n_events", "sum_value"))
