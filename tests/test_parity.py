"""Local replica of the driver's correctness gate: run every Spark query in
``queries()`` and its DuckDB ``oracle_sql()`` side by side at sf0.001 and
compare row count, column names, and order-insensitive values (driver
semantics per __spark_entry__.py docstring).
"""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def duck_con(sf_dir: str):
    con = duckdb.connect()
    for tbl in TABLES:
        con.execute(
            f"CREATE VIEW {tbl} AS SELECT * FROM read_parquet('{sf_dir}/{tbl}.parquet')")
    return con


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.9g}"
    if isinstance(v, (list, tuple, dict, set)):
        # Driver-gate parity: the real gate's pandas canonicalizer crashes
        # on non-atomic cells (CORRECTNESS_r10 kmeans_cluster_profile:
        # "unhashable type: 'list'").  Tuple-izing here was the false-green
        # hole that let an array-typed slot ship in r10 — raise instead.
        raise TypeError(
            f"non-atomic cell ({type(v).__name__}): the driver gate rejects "
            "list/map/struct outputs — emit scalar columns")
    return v


_ATOMIC_BANNED = ("ArrayType", "MapType", "StructType", "NullType")


def assert_atomic_schema(name, sdf):
    """Gate-shape contract: every registered query must emit ONLY atomic
    column types — the driver's pandas canonicalizer (sort_values →
    factorize) cannot hash list/map/struct cells (r10 escape)."""
    for f in sdf.schema.fields:
        tname = type(f.dataType).__name__
        assert tname not in _ATOMIC_BANNED, (
            f"{name}: column '{f.name}' is {f.dataType.simpleString()} — "
            "driver gate requires atomic types (explode or digest it)")


def canon_rows(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(canon(r[i]) for i in idx) for r in rows)


ORACLES = entrymod.oracle_sql()
ALL = list(entrymod.queries().items())


@pytest.mark.parametrize("name,fn", ALL, ids=[n for n, _ in ALL])
def test_query_matches_oracle(spark, name, fn):
    sdf = fn(spark, SF)
    assert_atomic_schema(name, sdf)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    if name not in ORACLES:
        # rows-only check (driver's weaker path): query must run
        assert isinstance(srows, list)
        return
    con = duck_con(SF)
    res = con.execute(ORACLES[name])
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()
    assert sorted(scols) == sorted(ocols), f"{name}: column mismatch {scols} vs {ocols}"
    assert len(srows) == len(orows), f"{name}: row count {len(srows)} vs {len(orows)}"
    assert canon_rows(scols, srows) == canon_rows(ocols, orows), f"{name}: value mismatch"


# ---------------------------------------------------------------------------
# The proof window — the driver records the FIRST 50 registrations, so their
# identity is release-critical: every operator family must keep a green row
# inside it (VERDICT r3 item #1).


def test_first_50_registrations_are_the_proof_window():
    from openai_vector_search_demo_spark import queries as Q
    names = list(entrymod.queries())
    assert names[:50] == Q.PROOF_WINDOW
    assert len(Q.PROOF_WINDOW) == len(set(Q.PROOF_WINDOW)) == 50


def test_window_entries_all_oracled():
    # Since r7 even the two binary slots carry oracles: their inputs are
    # deterministic constants, so the expected outputs are pinned as VALUES
    # literals (not SQL-expressible, but SQL-checkable).  r11: the two
    # rows-only-BY-NATURE slots (embed-UDF flagship, HLL sketches) rotate
    # through once for their ledger receipt — explicitly allowlisted, each
    # with an oracled twin (see PROOF_WINDOW_ROWS_ONLY).
    from openai_vector_search_demo_spark import queries as Q
    oracled = entrymod.oracle_sql()
    rows_only = [n for n in Q.PROOF_WINDOW if n not in oracled]
    assert sorted(rows_only) == sorted(Q.PROOF_WINDOW_ROWS_ONLY)
    for twin in ("flagship_search_oracled", "corpus_distinct_stats"):
        assert twin in oracled


def test_battery_members_are_all_registered_and_oracled():
    from openai_vector_search_demo_spark import queries as Q
    oracled = entrymod.oracle_sql()
    for fam in (Q._TPCH_BATTERY, Q._ANALYTICS_BATTERY, Q._RETRIEVAL_BATTERY,
                Q._EVENTS_WINDOWS_BATTERY, Q._CURATION_BATTERY,
                Q._DEDUP_BATTERY, Q._PROFILE_EVENTS_BATTERY):
        for m in fam:
            assert m in Q.SPARK_QUERIES and m in oracled, m
    for m in Q._MULTIMODAL_BATTERY:
        assert m in Q.SPARK_QUERIES


def test_battery_specs_match_live_schemas(spark):
    """The DuckDB side of each battery canonicalizes from _BATTERY_SPECS;
    the Spark side canonicalizes from the live member schema.  They must
    describe the same columns with the same canon kinds or the digests
    diverge structurally rather than by value."""
    from openai_vector_search_demo_spark import queries as Q
    for m, spec in Q._BATTERY_SPECS.items():
        df = Q.SPARK_QUERIES[m](spark, SF)
        live = sorted((c, Q._canon_kind(t)) for c, t in df.dtypes)
        assert live == sorted(spec), m


def test_battery_digest_is_value_sensitive(spark):
    """One changed value in one member row must flip that member's digest —
    the battery is as strict as running the member through the gate alone."""
    from pyspark.sql import functions as F

    from openai_vector_search_demo_spark import queries as Q
    base = Q.SPARK_QUERIES["tpch_q1_pricing_summary"](spark, SF)
    d1 = Q._digest_member(base, "m").first()
    d2 = Q._digest_member(
        base.withColumn("sum_qty", F.col("sum_qty") + 0.01), "m").first()
    assert d1.digest != d2.digest and d1.n_rows == d2.n_rows


# ---------------------------------------------------------------------------
# Gate-shape contract (VERDICT r10 #2): the r10 kmeans escape must be
# impossible to re-ship.  The pre-fix slot emitted `centroid array<double>`;
# both layers of the local gate replica must reject that shape.


def test_gate_shape_rejects_array_columns(spark):
    """A frame shaped like the pre-fix r10 kmeans_cluster_profile output
    fails the schema contract AND the canonicalizer — the two checks that
    were silent when the r10 slot shipped."""
    df = spark.createDataFrame(
        [(0, 3, [0.1, 0.2]), (1, 5, [0.3, 0.4])],
        "cid int, n_members bigint, centroid array<double>")
    with pytest.raises(AssertionError, match="atomic"):
        assert_atomic_schema("prefix_kmeans_shape", df)
    with pytest.raises(TypeError, match="non-atomic"):
        canon_rows(df.columns, [tuple(r) for r in df.collect()])


def test_gate_shape_every_registered_query_is_atomic_typed():
    """Every SPARK_QUERIES entry goes through assert_atomic_schema inside
    test_query_matches_oracle (it builds each frame anyway, so the schema
    contract costs nothing extra).  This pin guards the wiring: the
    assertion call must stay in the per-query gate replica."""
    import inspect
    src = inspect.getsource(test_query_matches_oracle)
    assert "assert_atomic_schema(name, sdf)" in src
