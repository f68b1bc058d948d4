#!/usr/bin/env python
"""Subset bench runner for paired A/B measurements (r15): bench.py's
exact methodology (same session confs, min-of-3, clearCache between
runs) over an explicit query list, printing one JSON line.

Usage: python scripts/bench_subset.py q1 q2 ...
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main() -> None:
    names = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from openai_vector_search_demo_spark.session import get_spark
    spark = get_spark("bench-subset")
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod
    registry = entry_mod.queries()

    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    timings, medians = {}, {}
    for name in names:
        if name not in registry:
            print(f"!! unknown: {name}", file=sys.stderr)
            continue
        runs = []
        for _ in range(3):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            registry[name](spark, sf_dir).collect()
            runs.append(time.perf_counter() - t0)
        runs.sort()
        timings[name] = round(runs[0], 3)
        medians[name] = round(runs[len(runs) // 2], 3)
    print(json.dumps({"total_min": round(sum(timings.values()), 3),
                      "queries": timings, "queries_median": medians}))


if __name__ == "__main__":
    main()
