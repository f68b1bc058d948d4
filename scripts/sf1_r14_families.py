#!/usr/bin/env python
"""sf1 scaling points for the r14 families (VERDICT r13 #1/#3/#4/#6):
the v3 hierarchical NSW serving slots, the filtered-selectivity curve,
the tenant-scoped stores, and the re-digested SCD2 splice, timed at
sf0.1 vs sf1-scaled (10x data, min-of-3, cold cache per run).

Run after `python scripts/gen_sf1_scaled.py`:
    python scripts/sf1_r14_families.py
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from openai_vector_search_demo_spark.session import get_spark  # noqa: E402
from openai_vector_search_demo_spark import queries as Q  # noqa: E402

SFS = [("sf0.1", "/root/testdata/sf0.1"), ("sf1", "/tmp/sf1_scaled")]
BATCH = [
    "scd2_incremental_splice",       # digest form — prices the MERGE now
    "ann_nsw_stored_knn",            # v3 single-query serving latency
    "ann_nsw_mean_recall_at_10",     # batch beam + recall receipt
    "ann_nsw_filtered_recall_curve",  # selectivity ladder (3 beams)
    "ann_nsw_tenant_knn",            # tenant-subtree serving
]
REPS = 3


def main() -> None:
    spark = get_spark("sf1-r14")
    spark.sparkContext.setLogLevel("ERROR")
    Q.SPARK_QUERIES["tpch_q6_revenue_forecast"](spark, SFS[0][1]).collect()
    for name in BATCH:
        times = []
        rows_out = None
        for _, sf_dir in SFS:
            # pay store builds once outside the timing (the serving
            # number is the receipt; the build is the one-time cost)
            Q.SPARK_QUERIES[name](spark, sf_dir).collect()
            runs = []
            for _ in range(REPS):
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                rows_out = Q.SPARK_QUERIES[name](spark, sf_dir).collect()
                runs.append(time.perf_counter() - t0)
            times.append(round(min(runs), 3))
        ratio = round(times[1] / times[0], 2) if times[0] else float("nan")
        print(f"{name}: sf0.1={times[0]}s sf1={times[1]}s "
              f"ratio={ratio}x rows={len(rows_out)}")
        if name in ("ann_nsw_mean_recall_at_10",
                    "ann_nsw_filtered_recall_curve"):
            for r in rows_out:
                print("   ", tuple(r))


if __name__ == "__main__":
    main()
