#!/usr/bin/env python
"""r16 optimization-round profiler: per-query wall time, Spark job count,
and per-stage task-time breakdown via the UI REST API (guide §1/§7).

Usage::

    python scripts/profile_r16_queries.py ann_nsw_stored_knn rag_serving_pipeline
    python scripts/profile_r16_queries.py --explain ann_nsw_stored_knn

Runs each named query once (after one warmup of the whole session) in its
own job group, then reports:
  wall seconds, number of jobs, number of stages, sum of task time,
  and the 5 slowest stages (name, tasks, task time).
With --explain, also writes plans/r16/<name>_<tag>.txt with
``explain('formatted')`` of the returned DataFrame.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    do_explain = "--explain" in sys.argv
    tag = "before"
    for a in sys.argv[1:]:
        if a.startswith("--tag="):
            tag = a.split("=", 1)[1]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    # Same session conventions as bench.py (session.get_spark), but with
    # the UI on so the REST API can report per-stage metrics.
    from pyspark.sql import SparkSession

    from openai_vector_search_demo_spark.session import default_parallelism
    cores = default_parallelism()
    spark = (
        SparkSession.builder.appName("profile-r16")
        .master(f"local[{cores}]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(cores))
        .config("spark.sql.autoBroadcastJoinThreshold",
                str(64 * 1024 * 1024))
        .config("spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "true")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.leafNodeDefaultParallelism", "4")
        .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod
    registry = entry_mod.queries()

    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    app_id = spark.sparkContext.applicationId
    ui = spark.sparkContext.uiWebUrl  # None if UI off

    def rest(path: str):
        if not ui:
            return None
        try:
            with urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}{path}",
                                        timeout=10) as r:
                return json.loads(r.read())
        except Exception:
            return None

    report = {}
    for name in args:
        if name not in registry:
            print(f"!! unknown query: {name}")
            continue
        spark.catalog.clearCache()
        group = f"prof_{name}"
        spark.sparkContext.setJobGroup(group, name)
        jobs_before = {j["jobId"] for j in (rest("/jobs") or [])}
        t0 = time.perf_counter()
        df = registry[name](spark, sf_dir)
        df.collect()
        wall = time.perf_counter() - t0
        spark.sparkContext.setJobGroup(None, None)
        jobs = [j for j in (rest("/jobs") or [])
                if j["jobId"] not in jobs_before]
        stage_ids = sorted({s for j in jobs for s in j.get("stageIds", [])})
        stages = []
        for sid in stage_ids:
            info = rest(f"/stages/{sid}")
            if info:
                a = info[0]
                stages.append((a.get("name", "?")[:70], a.get("numTasks", 0),
                               a.get("executorRunTime", 0) / 1000.0))
        stages.sort(key=lambda s: -s[2])
        report[name] = {
            "wall_s": round(wall, 3),
            "n_jobs": len(jobs),
            "n_stages": len(stage_ids),
            "task_time_s": round(sum(s[2] for s in stages), 2),
            "top_stages": stages[:6],
        }
        print(f"== {name}: wall={wall:.3f}s jobs={len(jobs)} "
              f"stages={len(stage_ids)} "
              f"task_time={sum(s[2] for s in stages):.2f}s")
        for nm, nt, tt in stages[:6]:
            print(f"     {tt:7.2f}s  {nt:4d}t  {nm}")
        if do_explain:
            os.makedirs("plans/r16", exist_ok=True)
            with open(f"plans/r16/{name}_{tag}.txt", "w") as fh:
                fh.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
            print(f"     plan -> plans/r16/{name}_{tag}.txt")

    print(json.dumps({k: {kk: vv for kk, vv in v.items()
                          if kk != "top_stages"}
                      for k, v in report.items()}, indent=1))


if __name__ == "__main__":
    main()
