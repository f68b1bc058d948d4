"""Table maintenance operators — the operational side of 100 TB pipelines.

Streaming ingest (foreachBatch appends) and per-tenant upserts accumulate
small parquet files; scan cost then scales with file COUNT (task scheduling,
footer reads), not bytes.  Compaction bin-packs a table back to
target-sized files.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def table_bytes(path: str) -> int:
    total = 0
    for root, _, files in os.walk(path):
        total += sum(os.path.getsize(os.path.join(root, f))
                     for f in files if not f.startswith(("_", ".")))
    return total


def _listing(path: str) -> dict[str, tuple[int, int]]:
    """Data-file snapshot (relpath → size, mtime_ns) used to detect
    concurrent writers between the staging write and the swap."""
    snap: dict[str, tuple[int, int]] = {}
    for root, _, files in os.walk(path):
        for f in files:
            if f.startswith(("_", ".")):
                continue
            full = os.path.join(root, f)
            st = os.stat(full)
            snap[os.path.relpath(full, path)] = (st.st_size, st.st_mtime_ns)
    return snap


def compact_parquet(spark: SparkSession, path: str,
                    target_mb: int = 128,
                    partition_cols: list[str] | None = None) -> int:
    """Rewrite a parquet location into ~``target_mb``-bounded files; returns
    the output file count.

    Staged write + two-rename swap (Spark cannot overwrite a location it is
    reading).  The swap is NOT atomic on a POSIX directory — a crash between
    the renames leaves the data in ``<path>._compact_old``; this function
    refuses to start while such leftovers exist and tells the operator how
    to recover.  On object stores / managed tables the same two-phase shape
    runs through a manifest commit instead of renames.

    Partitioned tables: rows are hash-co-located by the partition columns
    before the write (a plain round-robin ``repartition(n)`` would emit up
    to n files per partition value — fragmentation, not compaction), and
    partition-column type inference is disabled for the read so values like
    ``tenant=0123`` round-trip byte-identically instead of becoming INT 123.
    """
    staging = path.rstrip("/") + "._compact_tmp"
    backup = path.rstrip("/") + "._compact_old"
    for leftover in (staging, backup):
        if os.path.exists(leftover):
            raise RuntimeError(
                f"leftover {leftover} from an interrupted compaction; "
                f"inspect it (it may hold the only copy of the table), "
                f"restore or delete it, then re-run")

    infer_key = "spark.sql.sources.partitionColumnTypeInference.enabled"
    prev_infer = spark.conf.get(infer_key, None)
    spark.conf.set(infer_key, "false")
    before = _listing(path)
    try:
        df = spark.read.parquet(path)
        # ceiling division: floor would pack up to 2x target_mb per file
        n_files = max(1, -(-table_bytes(path) // (target_mb * 1024 * 1024)))
        if partition_cols:
            compacted = df.repartition(n_files, *partition_cols)
        else:
            compacted = df.repartition(n_files)
        writer = compacted.write.mode("overwrite")
        if partition_cols:
            writer = writer.partitionBy(*partition_cols)
        writer.parquet(staging)
    finally:
        if prev_infer is None:
            spark.conf.unset(infer_key)
        else:
            spark.conf.set(infer_key, prev_infer)

    # concurrent-writer guard: rows appended between the source read and the
    # swap (e.g. by a streaming foreachBatch targeting this path) would be
    # silently deleted by the rename — refuse instead of losing them.
    # Compaction requires exclusive write access; stop active writers first.
    if _listing(path) != before:
        shutil.rmtree(staging, ignore_errors=True)
        raise RuntimeError(
            f"{path} changed during compaction (concurrent writer?); "
            f"staging discarded, source untouched — stop writers and re-run")

    os.rename(path, backup)
    try:
        os.rename(staging, path)
    except OSError:
        os.rename(backup, path)  # roll back
        raise
    shutil.rmtree(backup)
    return sum(1 for root, _, files in os.walk(path)
               for f in files if f.endswith(".parquet"))


def snapshot_diff(old: DataFrame, new: DataFrame, key_cols: list[str],
                  compare_cols: list[str] | None = None) -> DataFrame:
    """Change-data capture between two table snapshots: one row per key
    present in either side, tagged ``change_type ∈ {added, removed,
    changed, unchanged}`` (unchanged rows filtered out — emit only deltas).

    Plan: ONE full-outer shuffle join on the key columns; change detection
    is null-safe column comparison (``<=>``), so NULL→value and
    value→NULL transitions count as changes and NULL==NULL does not.  At
    scale this is the standard incremental-pipeline primitive: downstream
    jobs consume the (small) delta instead of re-reading the snapshot.

    ``compare_cols=None`` compares every non-key column shared by both
    sides.
    """
    if compare_cols is None:
        compare_cols = sorted((set(old.columns) & set(new.columns))
                              - set(key_cols))
    o = old.select(*key_cols, *[F.col(c).alias(f"_old_{c}")
                                for c in compare_cols])
    n = new.select(*key_cols, *[F.col(c).alias(f"_new_{c}")
                                for c in compare_cols])
    # full-outer on keys; presence detected via a non-null marker column,
    # NOT the key itself (keys survive the coalesced join output)
    o = o.withColumn("_in_old", F.lit(1))
    n = n.withColumn("_in_new", F.lit(1))
    j = o.join(n, key_cols, "full_outer")
    same = F.lit(True)
    for c in compare_cols:
        same = same & F.col(f"_old_{c}").eqNullSafe(F.col(f"_new_{c}"))
    change = (F.when(F.col("_in_old").isNull(), F.lit("added"))
              .when(F.col("_in_new").isNull(), F.lit("removed"))
              .when(same, F.lit("unchanged"))
              .otherwise(F.lit("changed")))
    return (j.withColumn("change_type", change)
            .filter(F.col("change_type") != "unchanged")
            .select(*key_cols, "change_type"))


def read_evolving(spark: SparkSession, path: str) -> DataFrame:
    """Read a parquet table whose files were written under EVOLVING schemas
    (columns added over time): ``mergeSchema`` unions the footers so old
    files surface the new columns as NULL.  The flag costs a footer read
    per file — leave it off for frozen-schema tables (the default) and on
    only for landing zones that append from changing producers."""
    return spark.read.option("mergeSchema", "true").parquet(path)


def append_evolved(df: DataFrame, path: str,
                   allow_missing: bool = False) -> None:
    """Append a batch whose schema may have MORE columns than earlier
    files (additive evolution).  Column renames/drops are rejected BY
    DEFAULT by comparing against the current merged schema: additive
    evolution is the only kind a reader with ``mergeSchema`` can
    reconcile — a rename (drop+add) would silently fork the data into two
    half-NULL columns forever.  ``allow_missing=True`` opts IN to
    appending batches that omit existing columns (legitimate for sparse
    producers that never carry every column)."""
    spark = df.sparkSession
    try:
        current = read_evolving(spark, path).schema
    except Exception:
        current = None  # first write
    if current is not None:
        old = {f.name for f in current.fields}
        new = {f.name for f in df.schema.fields}
        dropped = old - new
        if dropped and not allow_missing:
            raise ValueError(f"schema evolution dropped columns {sorted(dropped)}; "
                             f"only additive evolution is supported")
    df.write.mode("append").parquet(path)
