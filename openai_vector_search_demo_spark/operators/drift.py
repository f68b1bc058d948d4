"""Corpus snapshot drift monitoring — PSI and Jensen-Shannon divergence.

The pipeline-gating stage of a production training-data flow: before a
new corpus snapshot replaces the last one (or a new crawl is merged), the
per-feature distributions (language mix, length profile, quality-score
profile, …) are compared against the reference snapshot, and the job
fails — or a human is paged — when a Population Stability Index crosses
the conventional alert thresholds (PSI < 0.1 stable / 0.1–0.25 drifting /
> 0.25 broken — the standard credit-scoring rule of thumb, e.g. Siddiqi,
"Credit Risk Scorecards", 2006).  The reference pipeline
(MaheshSQL/openai-vector-search-demo, app/app.py:225 ingest path) has no
monitoring stage at all; at 100 TB, shipping an unmonitored snapshot into
a training run is how a silent crawler regression becomes a bad model.

Design — one scan, two tiny shuffles, all codegen:

- Every feature is a *bucketizer expression* (deterministic: fixed-width
  floors, clamped deciles, raw categorical values — never data-dependent
  quantile edges, so the same row always lands in the same bucket and the
  DuckDB oracle replays bit-for-bit).  All features unpivot into
  (snapshot, feature, bucket) rows via one ``explode(array(struct…))`` —
  a single pass over the corpus regardless of feature count.
- ``groupBy(feature, bucket)`` with map-side combine produces the
  contingency table: |features| × |buckets| rows — KBs, independent of
  corpus size.  Everything after operates on that table: per-feature
  totals/bucket-counts via a window over ``feature`` (second tiny
  shuffle), Laplace-smoothed shares (the +0.5 rule keeps ln() finite for
  buckets present in only one snapshot), per-bucket PSI/JSD terms rounded
  9 dp IN-ENGINE (the iterative-family determinism contract — summation
  order across engines must not move the 6 dp output), and a final
  per-feature sum rounded 6 dp.
- PSI uses natural log (Σ (p_a − p_b)·ln(p_a/p_b)); JSD is the
  symmetrized KL against the midpoint, bounded by ln 2.

At 100× data the contingency table is the same size — drift monitoring
is one of the few operators whose cost is a pure scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def feature_buckets(df: DataFrame,
                    features: dict[str, Column]) -> DataFrame:
    """Unpivot every feature's bucketizer into (feature, bucket) rows —
    ONE pass over ``df`` regardless of feature count.  Stateless, so it
    applies unchanged to a streaming DataFrame (``stream_drift_gate``)."""
    structs = [F.struct(F.lit(name).alias("feature"),
                        expr.cast("string").alias("bucket"))
               for name, expr in sorted(features.items())]
    return (df.select(F.explode(F.array(*structs)).alias("fb"))
            .select("fb.feature", "fb.bucket"))


def drift_from_counts(counts: DataFrame) -> DataFrame:
    """The PSI/JSD math over a prepared contingency table
    ``(feature, bucket, ca, cb)`` — the shared tail of the batch
    ``drift_report`` and the streaming ``stream_drift_gate`` (which
    joins its per-micro-batch candidate counts against static reference
    counts into this exact shape).  Missing buckets must arrive as
    ``ca/cb = 0`` rows, not absent rows — the Laplace ``+0.5`` smoothing
    and the per-feature bucket count ``k`` depend on the union bucket
    set."""
    w = Window.partitionBy("feature")
    shares = (counts
              .withColumn("na", F.sum("ca").over(w))
              .withColumn("nb", F.sum("cb").over(w))
              .withColumn("k", F.count(F.lit(1)).over(w))
              .withColumn("pa", (F.col("ca") + 0.5)
                          / (F.col("na") + 0.5 * F.col("k")))
              .withColumn("pb", (F.col("cb") + 0.5)
                          / (F.col("nb") + 0.5 * F.col("k"))))
    m = (F.col("pa") + F.col("pb")) / 2.0
    terms = shares.select(
        "feature", "k",
        F.round((F.col("pa") - F.col("pb"))
                * F.log(F.col("pa") / F.col("pb")), 9).alias("psi_t"),
        F.round(0.5 * F.col("pa") * F.log(F.col("pa") / m)
                + 0.5 * F.col("pb") * F.log(F.col("pb") / m), 9)
        .alias("jsd_t"))
    return (terms.groupBy("feature").agg(
        F.max("k").alias("n_buckets"),
        F.round(F.sum("psi_t"), 6).alias("psi"),
        F.round(F.sum("jsd_t"), 6).alias("jsd"))
        .orderBy("feature"))


def drift_report(df: DataFrame, snapshot: Column,
                 features: dict[str, Column]) -> DataFrame:
    """Per-feature distribution drift between the two snapshots of ``df``.

    ``snapshot`` must evaluate to 0 (reference) or 1 (candidate);
    ``features`` maps feature name → deterministic bucketizer expression
    (cast to string internally, so categorical and binned-numeric
    features mix freely).  Returns one row per feature:
    ``(feature, n_buckets, psi, jsd)``, ordered by feature name.
    """
    structs = [F.struct(F.lit(name).alias("feature"),
                        expr.cast("string").alias("bucket"))
               for name, expr in sorted(features.items())]
    base = (df.select(snapshot.cast("int").alias("snap"),
                      F.explode(F.array(*structs)).alias("fb"))
            .select("snap", "fb.feature", "fb.bucket"))
    counts = base.groupBy("feature", "bucket").agg(
        F.sum(F.when(F.col("snap") == 0, 1).otherwise(0)).alias("ca"),
        F.sum(F.when(F.col("snap") == 1, 1).otherwise(0)).alias("cb"))
    return drift_from_counts(counts)
