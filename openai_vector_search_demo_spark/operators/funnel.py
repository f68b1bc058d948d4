"""Funnel (sequential-pattern) analysis — the classic event-analytics
operator: how many users performed step 1, then step 2 STRICTLY LATER,
then step 3, … (view → click → purchase).

Semantics: per user, t₁ = earliest step-1 event; tᵢ = earliest step-i
event with ts > tᵢ₋₁ (the greedy earliest chain — equivalent to the
nested ``MIN(ts) WHERE ts > previous`` formulation the oracle uses).

Plan shape: ONE shuffle.  Events fold per user inside a single
``aggregate()`` higher-order function over the time-sorted event list —
the N-step state is a struct of N timestamps, each event advances the
first step it can — instead of the textbook N-fold chain of
``filter → groupBy → join`` (N shuffles + N joins of a per-user
relation).  Per-user event lists bound task memory (the same contract as
``session_window``); whale users with millions of events would use the
N-join form — that trade is the docstring's, not hidden.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["funnel_counts", "funnel_counts_njoin"]


def funnel_counts(events: DataFrame, steps: list[str],
                  user_col: str = "user_id",
                  type_col: str = "event_type",
                  ts_col: str = "ts_us") -> DataFrame:
    """``(step, event_type, users, conversion)`` — one row per funnel
    step; ``conversion`` = users at this step / users at step 1
    (rounded 6dp; step 1's is 1.0 by construction when any user enters).
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    n = len(steps)

    ev = F.array_sort(F.collect_list(F.struct(
        F.col(ts_col).alias("ts"), F.col(type_col).alias("et"))))

    init = F.struct(*[F.lit(None).cast("long").alias(f"t{i}")
                      for i in range(n)])

    def advance(acc, e):
        fields = []
        for i, step in enumerate(steps):
            hit = (e["et"] == step)
            if i > 0:
                # strict ordering vs the PRE-update previous step: one
                # event can never satisfy two consecutive steps at once
                hit = hit & acc[f"t{i-1}"].isNotNull() \
                          & (e["ts"] > acc[f"t{i-1}"])
            fields.append(F.coalesce(
                acc[f"t{i}"],
                F.when(hit, e["ts"])).alias(f"t{i}"))
        return F.struct(*fields)

    per_user = (events.groupBy(user_col)
                .agg(F.aggregate(ev, init, advance).alias("s")))

    counts = per_user.agg(*[
        F.count(F.col(f"s.t{i}")).alias(f"c{i}") for i in range(n)])
    rows = [F.struct(F.lit(i + 1).alias("step"),
                     F.lit(steps[i]).alias("event_type"),
                     F.col(f"c{i}").alias("users"))
            for i in range(n)]
    return (counts.select(F.explode(F.array(*rows)).alias("r"),
                          F.col("c0").alias("base"))
            .select("r.step", "r.event_type", "r.users",
                    F.round(F.when(F.col("base") > 0,
                                   F.col("r.users") / F.col("base"))
                            .otherwise(F.lit(0.0)), 6).alias("conversion")))


def funnel_counts_njoin(events: DataFrame, steps: list[str],
                        user_col: str = "user_id",
                        type_col: str = "event_type",
                        ts_col: str = "ts_us") -> DataFrame:
    """The WHALE-SAFE funnel form — identical semantics and output shape
    to ``funnel_counts`` (the greedy earliest chain; same oracle), built
    as the textbook chain of N−1 keyed min-aggregates and equi-joins
    instead of one per-user event-list fold.

    The trade the module docstring promises, delivered: the fold form
    shuffles the corpus ONCE but materializes each user's full sorted
    event list in task memory — a whale user with 100M events is a
    multi-GB task.  This form runs N shuffles over per-step relations,
    but every aggregate is a map-side-combinable MIN and no per-user
    state beyond one timestamp ever exists, so memory is flat regardless
    of skew.  Each join's right side is the previous step's
    ``(user, t)`` relation — at most one row per surviving user,
    shrinking monotonically down the funnel."""
    if not steps:
        raise ValueError("steps must be non-empty")
    n = len(steps)
    e = events.select(F.col(user_col).alias("u"),
                      F.col(type_col).alias("et"),
                      F.col(ts_col).alias("ts"))
    prev = (e.filter(F.col("et") == steps[0])
            .groupBy("u").agg(F.min("ts").alias("t")))
    frames = [prev]
    for i in range(1, n):
        prev = (e.filter(F.col("et") == steps[i])
                .join(prev.select("u", F.col("t").alias("pt")), "u")
                .filter(F.col("ts") > F.col("pt"))
                .groupBy("u").agg(F.min("ts").alias("t")))
        frames.append(prev)
    counts = frames[0].agg(F.count(F.lit(1)).alias("c0"))
    for i in range(1, n):
        counts = counts.crossJoin(
            frames[i].agg(F.count(F.lit(1)).alias(f"c{i}")))
    rows = [F.struct(F.lit(i + 1).alias("step"),
                     F.lit(steps[i]).alias("event_type"),
                     F.col(f"c{i}").alias("users"))
            for i in range(n)]
    return (counts.select(F.explode(F.array(*rows)).alias("r"),
                          F.col("c0").alias("base"))
            .select("r.step", "r.event_type", "r.users",
                    F.round(F.when(F.col("base") > 0,
                                   F.col("r.users") / F.col("base"))
                            .otherwise(F.lit(0.0)), 6).alias("conversion")))
