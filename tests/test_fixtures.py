"""Fixture schema contract (fixtures.py) — drift fails loudly, in ONE place.

Round-5 post-mortem: the driver regenerated the fixtures with ``events.ts``
re-encoded TIMESTAMP(NANOS) → timestamp[us]; the old loader assumed the
physical encoding and seven query slots went red (one silently WRONG) before
anything complained.  These tests are the tripwire: a future re-encoding the
adaptive loaders cannot handle shows up here as a named dtype violation, not
as seven scattered analysis errors.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from openai_vector_search_demo_spark.fixtures import (
    EXPECTED_SCHEMAS,
    check_fixture_schemas,
)

SF = "/root/testdata/sf0.001"


def test_fixture_schemas_match_contract(spark):
    problems = check_fixture_schemas(spark, SF)
    assert problems == [], "\n".join(problems)


def test_contract_covers_all_tables():
    assert set(EXPECTED_SCHEMAS) == {
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings"}


def test_load_events_derives_parity_columns(spark):
    """Whatever the physical ts encoding, load_events must expose
    ts_us (bigint epoch-micros, DuckDB epoch_us parity) and ts (timestamp)."""
    from openai_vector_search_demo_spark.queries import load_events

    ev = load_events(spark, SF)
    dt = dict(ev.dtypes)
    assert dt["ts_us"] == "bigint"
    assert dt["ts"] == "timestamp"

    lo, hi = ev.agg(F.min("ts_us"), F.max("ts_us")).first()
    import duckdb
    olo, ohi = duckdb.sql(
        f"SELECT epoch_us(MIN(ts)), epoch_us(MAX(ts)) "
        f"FROM read_parquet('{SF}/events.parquet')").fetchone()
    assert (lo, hi) == (olo, ohi)


def test_stream_read_sees_same_timestamps_as_batch(spark):
    """Regression for the silent round-5 failure: a hardcoded stream schema
    misread timestamp[us] as raw int64 and compressed every timestamp 1000x
    with no error.  The streaming read path (batch-derived schema + shared
    ts logic) must see the exact batch min/max event time."""
    from openai_vector_search_demo_spark.queries import (
        _events_ts_us,
        _read_events_raw,
        load_events,
    )

    batch = load_events(spark, SF)
    want = batch.agg(F.min("ts"), F.max("ts")).first()

    raw = _read_events_raw(spark, SF)
    stream = (spark.readStream.schema(raw.schema)
              .format("parquet").option("pathGlobFilter", "events.parquet")
              .load(SF)
              .withColumn("ts", F.timestamp_micros(_events_ts_us(raw))))
    q = (stream.groupBy()
         .agg(F.min("ts").alias("lo"), F.max("ts").alias("hi"))
         .writeStream.format("memory").queryName("ts_parity_test")
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination(120)
    try:
        got = spark.table("ts_parity_test").first()
        assert (got["lo"], got["hi"]) == tuple(want)
    finally:
        spark.catalog.dropTempView("ts_parity_test")
