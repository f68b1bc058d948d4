#!/usr/bin/env python
"""sf1 scaling points for the r11/r12 heavy families (VERDICT r11 #5):
`supplier_part_pagerank_dangling`, `dsir_resample_topk`,
`neardup_triangle_counts` timed at sf0.1 vs sf1-scaled (same protocol as
the r9/r10 family tables: one session, local[32], clearCache before
every run, warm run first, min-of-3), plus the streaming drift gate's
STATE-SIZE claim checked by reading `stateOperators.numRowsTotal` from
the streaming query's progress at both scales — the claim is that state
is the bucket contingency table (bounded by the feature set), never the
stream.

Run after `python scripts/gen_sf1_scaled.py`:
    python scripts/sf1_r12_families.py
"""
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from openai_vector_search_demo_spark.session import get_spark  # noqa: E402
from openai_vector_search_demo_spark import queries as Q  # noqa: E402

SFS = [("sf0.1", "/root/testdata/sf0.1"), ("sf1", "/tmp/sf1_scaled")]
BATCH = ["supplier_part_pagerank_dangling", "dsir_resample_topk",
         "neardup_triangle_counts"]
REPS = 3


def drift_gate_state_rows(spark, sf_dir: str):
    """Run the streaming drift gate and return (state rows, report rows,
    input rows) from the final progress — the bounded-state receipt."""
    from openai_vector_search_demo_spark.functions import text_analysis as ta
    from openai_vector_search_demo_spark.streaming.jobs import (
        reference_feature_counts,
        stream_drift_gate,
    )
    feats = Q._drift_features()
    batch = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ref = ta.with_quality_score(batch.filter(F.col("doc_id") % 2 == 0))
    ref_counts = reference_feature_counts(ref, feats) \
        .localCheckpoint(eager=True)
    stream = (spark.readStream.schema(batch.schema).format("parquet")
              .option("pathGlobFilter", "documents.parquet").load(sf_dir))
    cand = ta.with_quality_score(stream.filter(F.col("doc_id") % 2 == 1))
    reports: list = []
    # r15 hook contract: the gate hands the callback the per-batch
    # result DATAFRAME — the callback decides to collect
    q = (stream_drift_gate(cand, ref_counts, feats,
                           lambda rdf, bid: reports.append(rdf.collect()))
         .option("checkpointLocation", tempfile.mkdtemp(prefix="driftsz_"))
         .start())
    q.awaitTermination(600)
    ref_counts.unpersist()
    state_rows = None
    n_input = 0
    for p in q.recentProgress:
        n_input += int(p.get("numInputRows", 0))
        for op in p.get("stateOperators", []):
            if op.get("numRowsTotal") is not None:
                state_rows = int(op["numRowsTotal"])
    return state_rows, len(reports[-1]), n_input


def main() -> None:
    spark = get_spark("sf1-r12")
    spark.sparkContext.setLogLevel("ERROR")
    # warm: JIT + parquet footer caches, excluded from measurement
    Q.SPARK_QUERIES[BATCH[0]](spark, SFS[0][1]).collect()
    for name in BATCH:
        times = []
        for _, sf_dir in SFS:
            runs = []
            for _ in range(REPS):
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                Q.SPARK_QUERIES[name](spark, sf_dir).collect()
                runs.append(time.perf_counter() - t0)
            times.append(round(min(runs), 3))
        ratio = round(times[1] / times[0], 2)
        print(f"| `{name}` | {times[0]} | {times[1]} | {ratio}x |",
              flush=True)
    for sf_name, sf_dir in SFS:
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        state, nrep, nin = drift_gate_state_rows(spark, sf_dir)
        sec = round(time.perf_counter() - t0, 3)
        print(f"driftgate {sf_name}: state_rows={state} report_rows={nrep} "
              f"input_rows={nin} wall={sec}s", flush=True)


if __name__ == "__main__":
    main()
