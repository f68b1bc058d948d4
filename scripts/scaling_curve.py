#!/usr/bin/env python
"""Measured scaling curve: headline queries at sf0.001/0.01/0.1 (100x on
the TPC-H/events tables), min-of-N per point.  Produces the markdown table
recorded in SCALE.md — run after plan changes to refresh it."""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from openai_vector_search_demo_spark.session import get_spark  # noqa: E402
from openai_vector_search_demo_spark import queries as Q  # noqa: E402

QUERIES = [
    "tpch_q1_pricing_summary", "tpch_q5_local_supplier_volume",
    "join_top_customers", "events_session_window", "events_funnel",
    "events_funnel_njoin", "dedup_minhash_lsh", "ta_quality_score",
    "ta_unigram_lm_score", "ta_bigram_lm_score", "q2_knn_exact",
    "ann_ivf_trained_knn", "curation_pipeline", "pareto_abc_quantile",
]
SFS = ["0.001", "0.01", "0.1"]
REPS = 3


def main() -> None:
    spark = get_spark("scaling")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet("/root/testdata/sf0.1/region.parquet").count()
    rows = []
    for name in QUERIES:
        times = []
        for sf in SFS:
            runs = []
            for _ in range(REPS):
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                Q.SPARK_QUERIES[name](spark, f"/root/testdata/sf{sf}").collect()
                runs.append(time.perf_counter() - t0)
            times.append(round(min(runs), 3))
        ratio = round(times[2] / times[1], 2) if times[1] else float("nan")
        rows.append((name, *times, ratio))
        print(f"| `{name}` | {times[0]} | {times[1]} | {times[2]} | {ratio}x |",
              flush=True)


if __name__ == "__main__":
    main()
