"""Interchange round-trip invariants: the CSV slot's non-lossy timestamp
claim (default rendering truncates sub-second precision — the pinned
format does not), and JSONL row/field fidelity."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_csv_default_timestamp_format_is_lossy_and_pinned_format_is_not(
        spark, tmp_path):
    """The reason csv_export_roundtrip pins timestampNTZFormat: Spark's
    default CSV rendering truncates TIMESTAMP_NTZ to milliseconds,
    silently corrupting µs data on re-read; the pinned format
    round-trips exactly."""
    fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    df = spark.createDataFrame(
        [(1, "2024-03-01 10:11:12.345678")],
        "id long, s string").select(
        "id", F.col("s").cast("timestamp_ntz").alias("ts"))

    lossy = str(tmp_path / "lossy")
    df.write.option("header", True).csv(lossy)
    back_lossy = (spark.read.schema(df.schema).option("header", True)
                  .csv(lossy).first())
    # the silent default loss: 345678 µs come back as 345000
    assert back_lossy.ts != df.first().ts
    assert back_lossy.ts.microsecond == 345000

    exact = str(tmp_path / "exact")
    df.write.option("header", True).option("timestampNTZFormat", fmt) \
        .csv(exact)
    back = (spark.read.schema(df.schema).option("header", True)
            .option("timestampNTZFormat", fmt).csv(exact).first())
    assert back.ts == df.first().ts
    assert back.ts.microsecond == 345678


def test_jsonl_roundtrip_preserves_rows_and_text(spark, tmp_path):
    rows = [(1, 'quote " backslash \\ newline-free ünïcødé', "en"),
            (2, "tabs\tand | pipes", "de")]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    path = str(tmp_path / "jsonl")
    df.write.json(path)
    back = spark.read.schema(df.schema).json(path)
    assert sorted(map(tuple, back.collect())) == sorted(rows)
