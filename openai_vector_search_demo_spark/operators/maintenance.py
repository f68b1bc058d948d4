"""Table maintenance operators — the operational side of 100 TB pipelines.

Streaming ingest (foreachBatch appends) and per-tenant upserts accumulate
small parquet files; scan cost then scales with file COUNT (task scheduling,
footer reads), not bytes.  Compaction bin-packs a table back to
target-sized files.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import SparkSession


def table_bytes(path: str) -> int:
    total = 0
    for root, _, files in os.walk(path):
        total += sum(os.path.getsize(os.path.join(root, f))
                     for f in files if not f.startswith(("_", ".")))
    return total


def compact_parquet(spark: SparkSession, path: str,
                    target_mb: int = 128,
                    partition_cols: list[str] | None = None) -> int:
    """Rewrite a parquet location into ~``target_mb`` files; returns the
    output file count.

    Staged write + swap (Spark cannot overwrite a location it is reading):
    write compacted data next to the original, then atomically replace.
    Partitioned tables keep their partition columns.  Local-filesystem
    implementation; on object stores the same two-phase shape applies with
    a manifest/rename-service instead of os.replace.
    """
    from pyspark.sql import functions as F  # noqa: F401

    df = spark.read.parquet(path)
    n_files = max(1, table_bytes(path) // (target_mb * 1024 * 1024))
    staging = path.rstrip("/") + "._compact_tmp"
    writer = df.repartition(int(n_files)).write.mode("overwrite")
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(staging)

    backup = path.rstrip("/") + "._compact_old"
    os.rename(path, backup)
    try:
        os.rename(staging, path)
    except OSError:
        os.rename(backup, path)  # roll back
        raise
    shutil.rmtree(backup)
    out = sum(1 for root, _, files in os.walk(path)
              for f in files if f.endswith(".parquet"))
    return out
