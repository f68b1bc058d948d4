"""Table profiling (operators/profile.py) + cohort-retention semantics."""

from __future__ import annotations

import pytest

from openai_vector_search_demo_spark.operators.profile import profile_table


def test_profile_counts_nulls_and_distincts(spark):
    df = spark.createDataFrame(
        [(1, "a", 2.0), (2, "a", None), (3, None, 4.0), (3, "b", 4.0)],
        "k long, s string, x double")
    out = {r.column: r for r in profile_table(df).collect()}
    assert out["k"].n_rows == 4 and out["k"].n_nulls == 0
    assert out["k"].n_distinct == 3
    assert out["s"].n_nulls == 1 and out["s"].n_distinct == 2
    assert out["x"].n_nulls == 1
    assert out["x"].min_num == 2.0 and out["x"].max_num == 4.0
    assert out["x"].mean == pytest.approx(10.0 / 3, abs=1e-6)
    # non-numeric columns carry NULL numeric stats, same schema
    assert out["s"].min_num is None and out["s"].mean is None


def test_profile_subset_and_validation(spark):
    df = spark.createDataFrame([(1, "a")], "k long, s string")
    assert [r.column for r in profile_table(df, ["s"]).collect()] == ["s"]
    with pytest.raises(ValueError, match="unknown columns"):
        profile_table(df, ["nope"])


def test_cohort_retention_semantics(spark):
    from openai_vector_search_demo_spark.queries import (
        events_cohort_retention,
    )
    import openai_vector_search_demo_spark.queries as q

    wk = q._WEEK_US
    rows = [
        # cohort week 0: users 1, 2.  u1 returns weeks 1 and 3; u2 never.
        (1, 0), (1, wk + 5), (1, 3 * wk + 5),
        (2, 10),
        # cohort week 1: user 3, returns week 2 (offset 1)
        (3, wk + 1), (3, 2 * wk + 1),
    ]
    df = spark.createDataFrame(
        [(u, ts) for u, ts in rows], "user_id long, ts_us long")

    # drive the same dataflow as the registered query, on the toy frame
    from pyspark.sql import functions as F
    e = df.select("user_id", F.expr(f"ts_us div {wk}").alias("wk"))
    first_wk = e.groupBy("user_id").agg(F.min("wk").alias("cohort_wk"))
    activity = e.distinct()
    size = first_wk.groupBy("cohort_wk").agg(F.count("*").alias("size"))
    r = (activity.join(first_wk, "user_id")
         .groupBy("cohort_wk",
                  (F.col("wk") - F.col("cohort_wk")).alias("week_offset"))
         .agg(F.count_distinct("user_id").alias("users")))
    out = {(x.cohort_wk, x.week_offset): x.users
           for x in r.join(size, "cohort_wk").collect()}
    assert out[(0, 0)] == 2          # both cohort-0 users active at offset 0
    assert out[(0, 1)] == 1          # only u1 returned in week 1
    assert out[(0, 3)] == 1
    assert (0, 2) not in out         # gap week emits no row
    assert out[(1, 0)] == 1 and out[(1, 1)] == 1


def test_robust_outliers_flags_the_planted_point(spark):
    from openai_vector_search_demo_spark.operators.profile import (
        robust_outliers,
    )
    rows = [("a", float(v)) for v in range(1, 20)] + [("a", 1000.0)]
    rows += [("b", 5.0)] * 10                      # MAD 0: nothing flaggable
    df = spark.createDataFrame(rows, "g string, v double")
    out = {r.g: r for r in robust_outliers(df, "v", ["g"]).collect()}
    assert out["a"].n == 20 and out["a"].n_outliers == 1
    assert out["a"].median == 10.5
    # constant group: MAD 0 -> threshold 0, no value exceeds it strictly
    assert out["b"].n_outliers == 0 and out["b"].mad == 0.0


def test_robust_outliers_immune_to_the_outlier_itself(spark):
    from openai_vector_search_demo_spark.operators.profile import (
        robust_outliers,
    )
    # mean/std z-score would be dragged by the 1e6 point; median/MAD is not
    rows = [("a", float(v)) for v in [10, 11, 12, 13, 14, 1e6]]
    df = spark.createDataFrame(rows, "g string, v double")
    r = robust_outliers(df, "v", ["g"]).first()
    assert r.n_outliers == 1
    assert r.median == 12.5


def test_label_embedding_profile_hand_computed(spark):
    from openai_vector_search_demo_spark.queries import (
        label_embedding_profile,
    )
    import tempfile, os, math
    # two labels: a-mean = [1, 0], b-mean = [1, 1] -> cos = 1/sqrt(2)
    rows = [(1, 0, [2.0, 0.0]), (2, 0, [0.0, 0.0]),
            (3, 1, [1.0, 1.0])]
    df = spark.createDataFrame(rows,
                               "vec_id long, label int, embedding array<double>")
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(os.path.join(d, "embeddings.parquet"))
        out = label_embedding_profile(spark, d).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.label_a, r.label_b) == (0, 1)
    assert r.cosine == round(1 / math.sqrt(2), 6)


def test_embedding_dim_stats_flags_dead_and_rogue_dims(spark):
    from openai_vector_search_demo_spark.queries import embedding_dim_stats
    import tempfile, os
    rows = [(i, 0, [1.0, float(i), 100.0 * i]) for i in range(10)]
    df = spark.createDataFrame(rows,
                               "vec_id long, label int, embedding array<double>")
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(os.path.join(d, "embeddings.parquet"))
        out = {r.dim: r for r in embedding_dim_stats(spark, d).collect()}
    assert out[1].variance == 0.0                  # dead dimension
    assert out[1].mean == 1.0
    assert out[2].mean == 4.5 and out[2].variance == 8.25
    assert out[3].max_v == 900.0                   # rogue range visible


def test_correlation_matrix_hand_computed(spark):
    from openai_vector_search_demo_spark.queries import (
        lineitem_correlation_matrix,
    )
    import tempfile, os
    # qty and price perfectly correlated; discount anti-correlated w/ qty
    rows = [(i, 1, 1, 1, float(q), 2.0 * q, 10.0 - q, 1.0, "N", "O", None)
            for i, q in enumerate([1, 2, 3, 4, 5])]
    df = spark.createDataFrame(rows, """l_orderkey long, l_partkey long,
        l_suppkey long, l_linenumber int, l_quantity double,
        l_extendedprice double, l_discount double, l_tax double,
        l_returnflag string, l_linestatus string, l_shipdate timestamp""")
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(os.path.join(d, "lineitem.parquet"))
        out = {(r.col_a, r.col_b): r.pearson_r
               for r in lineitem_correlation_matrix(spark, d).collect()}
    assert out[("l_quantity", "l_extendedprice")] == 1.0
    assert out[("l_quantity", "l_discount")] == -1.0
    # constant column: zero variance -> r is NULL (0/0), not a crash
    assert out[("l_quantity", "l_tax")] is None


def test_numeric_histogram_edges_and_max_inclusion(spark):
    from openai_vector_search_demo_spark.operators.profile import (
        numeric_histogram,
    )
    df = spark.createDataFrame([(float(v),) for v in range(0, 101)],
                               "x double")
    out = {r.bin: r for r in numeric_histogram(df, "x", bins=10).collect()}
    assert len(out) == 10
    assert out[0].lo == 0.0 and out[0].hi == 10.0 and out[0].n == 10
    # the max (100) lands in the LAST bucket, not an 11th
    assert out[9].n == 11
    assert sum(r.n for r in out.values()) == 101
    # constant column: one bucket holding everything
    const = numeric_histogram(
        spark.createDataFrame([(5.0,)] * 7, "x double"), "x", 4).collect()
    assert len(const) == 1 and const[0].n == 7
    import pytest as _pytest
    with _pytest.raises(ValueError, match="bins"):
        numeric_histogram(df, "x", 0)
