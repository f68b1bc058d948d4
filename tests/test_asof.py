"""As-of join edge semantics: <= ties, no-predecessor nulls, duplicate
right timestamps, null payload values."""

from __future__ import annotations


def test_asof_basics_and_ties(spark):
    from openai_vector_search_demo_spark.operators.asof import as_of_join
    left = spark.createDataFrame(
        [(1, 10, "l10"), (1, 20, "l20"), (1, 5, "l5"), (2, 50, "l50")],
        ["k", "ts", "lval"])
    right = spark.createDataFrame(
        [(1, 10, "r10"), (1, 15, "r15"), (2, 60, "r60")],
        ["k", "ts", "rval"])
    out = {r.lval: r.rval for r in
           as_of_join(left, right, key="k", ts="ts", payload=["rval"]).collect()}
    assert out == {
        "l5": None,     # nothing at or before ts=5
        "l10": "r10",   # equal timestamp matches (<= semantics)
        "l20": "r15",   # latest preceding
        "l50": None,    # right row is in the future
    }


def test_asof_duplicate_right_ts_tie_break(spark):
    from openai_vector_search_demo_spark.operators.asof import as_of_join
    left = spark.createDataFrame([(1, 10, "l")], ["k", "ts", "lval"])
    right = spark.createDataFrame(
        [(1, 10, 1, "first"), (1, 10, 2, "second")],
        ["k", "ts", "rid", "rval"])
    out = as_of_join(left, right, key="k", ts="ts",
                     payload=["rid", "rval"], right_tie_break="rid").first()
    assert (out.rid, out.rval) == (2, "second")  # max tie-break wins


def test_asof_null_right_ts_never_matches(spark):
    from openai_vector_search_demo_spark.operators.asof import as_of_join
    left = spark.createDataFrame([(1, 10, "l")], ["k", "ts", "lval"])
    right = spark.createDataFrame(
        [(1, None, "undated"), (1, 5, "dated")],
        "k int, ts int, rval string")
    out = as_of_join(left, right, key="k", ts="ts", payload=["rval"]).first()
    # ASOF semantics: a NULL-timestamp right row never matches (it would
    # otherwise sort first in the window and be carried as a bogus payload)
    assert out.rval == "dated"
    only_null = right.filter("ts is null")
    out2 = as_of_join(left, only_null, key="k", ts="ts", payload=["rval"]).first()
    assert out2.rval is None


def test_asof_payload_collision_raises(spark):
    import pytest

    from openai_vector_search_demo_spark.operators.asof import as_of_join
    left = spark.createDataFrame([(1, 10, "x")], ["k", "ts", "rval"])
    right = spark.createDataFrame([(1, 5, "y")], ["k", "ts", "rval"])
    with pytest.raises(ValueError, match="rval"):
        as_of_join(left, right, key="k", ts="ts", payload=["rval"])


def test_asof_null_payload_still_supersedes(spark):
    from openai_vector_search_demo_spark.operators.asof import as_of_join
    left = spark.createDataFrame([(1, 30, "l")], ["k", "ts", "lval"])
    right = spark.createDataFrame(
        [(1, 10, "old"), (1, 20, None)], ["k", "ts", "rval"])
    out = as_of_join(left, right, key="k", ts="ts", payload=["rval"]).first()
    # the newer right row wins even though its payload is NULL — struct
    # carrier semantics, not per-column last(ignorenulls)
    assert out.rval is None


def test_tolerance_nulls_stale_matches(spark):
    from openai_vector_search_demo_spark.operators.asof import as_of_join
    left = spark.createDataFrame([(1, 100), (1, 500), (2, 100)],
                                 "k long, ts long")
    right = spark.createDataFrame([(1, 90, "fresh"), (2, 10, "stale")],
                                  "k long, ts long, p string")
    out = {(r.k, r.ts): r.p
           for r in as_of_join(left, right, key="k", ts="ts",
                               payload=["p"], tolerance=50).collect()}
    assert out[(1, 100)] == "fresh"     # 10 units old, within 50
    assert out[(1, 500)] is None        # 410 units old, nulled
    assert out[(2, 100)] is None        # 90 units old, nulled
    # same data without tolerance: everything preceding matches
    out2 = {(r.k, r.ts): r.p
            for r in as_of_join(left, right, key="k", ts="ts",
                                payload=["p"]).collect()}
    assert out2[(1, 500)] == "fresh" and out2[(2, 100)] == "stale"


def test_tolerance_boundary_is_inclusive(spark):
    from openai_vector_search_demo_spark.operators.asof import as_of_join
    left = spark.createDataFrame([(1, 100)], "k long, ts long")
    right = spark.createDataFrame([(1, 50, "edge")], "k long, ts long, p string")
    r = as_of_join(left, right, key="k", ts="ts", payload=["p"],
                   tolerance=50).first()
    assert r.p == "edge"                # ts diff == tolerance matches
