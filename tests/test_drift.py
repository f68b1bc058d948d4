"""Drift-report invariants: PSI/JSD are exactly 0 on identical
distributions, positive and ordered under injected drift, JSD ≤ ln 2,
single-snapshot-only buckets stay finite (Laplace smoothing), and the
output shape is the scalar-typed gate contract."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from openai_vector_search_demo_spark.operators.drift import drift_report


@pytest.fixture(scope="module")
def frame(spark):
    # id parity is the snapshot; cat is identically distributed across
    # snapshots, skewed drifts mildly, broken drifts hard.
    rows = []
    for i in range(200):
        snap = i % 2
        rows.append((
            i,
            ["a", "b"][i % 4 // 2],                        # identical mix
            ["x", "y"][1 if (i % 10 < (7 if snap else 3)) else 0],
            "only_b" if snap else "only_a",                # disjoint
        ))
    return spark.createDataFrame(
        rows, "id long, cat string, skewed string, broken string")


def test_identical_distribution_is_exactly_zero(frame):
    out = {r.feature: r for r in drift_report(
        frame, F.col("id") % 2,
        {"cat": F.col("cat")}).collect()}
    assert out["cat"].psi == 0.0
    assert out["cat"].jsd == 0.0
    assert out["cat"].n_buckets == 2


def test_drift_ordering_and_bounds(frame):
    out = {r.feature: r for r in drift_report(
        frame, F.col("id") % 2,
        {"cat": F.col("cat"), "skewed": F.col("skewed"),
         "broken": F.col("broken")}).collect()}
    assert out["cat"].psi < out["skewed"].psi < out["broken"].psi
    for r in out.values():
        assert r.psi >= 0.0
        assert 0.0 <= r.jsd <= math.log(2) + 1e-9


def test_one_sided_buckets_stay_finite(frame):
    """'broken' has buckets present in exactly one snapshot — smoothing
    must keep ln() finite (no NaN/inf/NULL in the report)."""
    row = drift_report(frame, F.col("id") % 2,
                       {"broken": F.col("broken")}).collect()[0]
    assert row.n_buckets == 2
    assert math.isfinite(row.psi) and math.isfinite(row.jsd)
    assert row.psi > 1.0  # hard drift reads far above the 0.25 alert


def test_numeric_bucketizers_and_scalar_schema(frame):
    out = drift_report(frame, F.col("id") % 2,
                       {"id_bucket": F.least(F.floor(F.col("id") / 50.0),
                                             F.lit(3))})
    from pyspark.sql.types import (
        DoubleType,
        IntegerType,
        LongType,
        StringType,
    )
    for f in out.schema.fields:  # driver-gate shape contract: atomic only
        assert isinstance(f.dataType,
                          (DoubleType, LongType, IntegerType, StringType))
    rows = out.collect()
    assert len(rows) == 1 and rows[0].n_buckets == 4


def test_stream_gate_equals_batch_report(spark, frame, tmp_path):
    """A completed stream's final report equals the batch drift_report
    of (reference, streamed candidate) — the streaming layer is wiring
    only."""
    import os

    from openai_vector_search_demo_spark.streaming.jobs import (
        reference_feature_counts,
        stream_drift_gate,
    )

    feats = {"cat": F.col("cat"), "skewed": F.col("skewed")}
    src = str(tmp_path / "docs")
    frame.write.parquet(src)
    batch = spark.read.parquet(src)
    ref = batch.filter(F.col("id") % 2 == 0)
    ref_counts = reference_feature_counts(ref, feats)

    stream = (spark.readStream.schema(batch.schema)
              .format("parquet").load(src))
    cand = stream.filter(F.col("id") % 2 == 1)
    reports = []
    q = (stream_drift_gate(cand, ref_counts, feats,
                           lambda df, bid: reports.append(df.collect()))
         .option("checkpointLocation", os.path.join(str(tmp_path), "ck"))
         .start())
    q.awaitTermination(120)

    got = sorted(tuple(r) for r in reports[-1])
    want = sorted(tuple(r) for r in drift_report(
        frame, F.col("id") % 2, feats).collect())
    assert got == want


@pytest.mark.slow
def test_stream_gate_multi_batch_converges(spark, frame, tmp_path):
    """With one file per micro-batch, each report reflects everything
    seen SO FAR (complete-mode cumulative counts) and the final report
    equals the batch form — the mid-ingest alerting semantics."""
    import os

    from openai_vector_search_demo_spark.streaming.jobs import (
        reference_feature_counts,
        stream_drift_gate,
    )

    feats = {"cat": F.col("cat"), "broken": F.col("broken")}
    src = str(tmp_path / "docs")
    cand_rows = frame.filter(F.col("id") % 2 == 1)
    # two physical files => two availableNow micro-batches
    cand_rows.filter(F.col("id") < 100).coalesce(1) \
        .write.mode("overwrite").parquet(src)
    cand_rows.filter(F.col("id") >= 100).coalesce(1) \
        .write.mode("append").parquet(src)
    ref = frame.filter(F.col("id") % 2 == 0)
    ref_counts = reference_feature_counts(ref, feats)

    stream = (spark.readStream.schema(frame.schema)
              .option("maxFilesPerTrigger", 1)
              .format("parquet").load(src))
    reports = []
    q = (stream_drift_gate(stream, ref_counts, feats,
                           lambda df, bid: reports.append(df.collect()))
         .option("checkpointLocation", os.path.join(str(tmp_path), "ck2"))
         .start())
    q.awaitTermination(120)

    assert len(reports) >= 2, "expected one report per micro-batch"
    final = sorted(tuple(r) for r in reports[-1])
    want = sorted(tuple(r) for r in drift_report(
        frame, F.col("id") % 2, feats).collect())
    assert final == want
    # the interim report is a valid 2-feature report too (gate emits
    # continuously, not only at end-of-stream)
    assert len(reports[0]) == 2


def test_blocklist_gate_mechanism(spark):
    """Hits count with multiplicity, case-insensitive; max_hits moves
    the gate; empty blocklist blocks nothing."""
    from openai_vector_search_demo_spark.functions.text_analysis import (
        with_blocklist_flag,
    )
    df = spark.createDataFrame(
        [(1, "Bad BAD thing"), (2, "all clean here"), (3, "bad once")],
        "doc_id long, text string")
    out = {r.doc_id: (r.blocklist_hits, r.blocked)
           for r in with_blocklist_flag(df, ["bad"]).collect()}
    assert out == {1: (2, True), 2: (0, False), 3: (1, True)}
    lax = {r.doc_id: r.blocked
           for r in with_blocklist_flag(df, ["bad"], max_hits=1).collect()}
    assert lax == {1: True, 2: False, 3: False}
    none = with_blocklist_flag(df, []).filter("blocked").count()
    assert none == 0
