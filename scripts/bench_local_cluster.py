#!/usr/bin/env python
"""Full headline run under local-cluster[4,8,4096] (VERDICT r13 #7):
4 REAL executor JVMs (8 cores / 4 GiB each), real serialized
broadcasts, Python workers importing the package over executorEnv
PYTHONPATH — the process-isolation smoke for every headline query, not
just the r13 12-family sample.  One rep per query (this is a
correctness + cliff check, not the latency record — local[32]'s
min-of-3 in BENCH_r{N}.json is that); per-query seconds print as one
JSON line for the BASELINE.md table.

    python scripts/bench_local_cluster.py [sf_dir]
"""
from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

ROOT = str(Path(__file__).resolve().parent.parent)
sys.path.insert(0, ROOT)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from pyspark.sql import SparkSession
    spark = (
        SparkSession.builder.appName("bench-local-cluster")
        .master("local-cluster[4,8,4096]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.autoBroadcastJoinThreshold",
                str(64 * 1024 * 1024))
        .config("spark.driver.memory", "6g")
        .config("spark.executorEnv.PYTHONPATH", ROOT)
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod
    from bench import HEADLINE

    registry = entry_mod.queries()
    spark.read.parquet(f"{sf_dir}/region.parquet").count()  # warm-up

    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name in [n for n in HEADLINE if n in registry]:
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        try:
            registry[name](spark, sf_dir).collect()
            timings[name] = round(time.perf_counter() - t0, 3)
        except Exception as exc:  # noqa: BLE001 — isolate and report
            errors[name] = f"{type(exc).__name__}: {exc}"[:200]
        print(f"  {name}: {timings.get(name, 'ERR')}", file=sys.stderr)
    print(json.dumps({
        "metric": "local_cluster_headline_total",
        "value": round(sum(timings.values()), 3), "unit": "sec",
        "master": "local-cluster[4,8,4096]",
        "queries": timings, "errors": errors,
        "sf": float(os.path.basename(sf_dir.rstrip("/"))[2:] or -1)}))


if __name__ == "__main__":
    main()
