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


_INTEGRAL_SPARK = ("ByteType", "ShortType", "IntegerType", "LongType")


def assert_oracle_pandas_dtypes(name, sdf, srows, con, sql):
    """Driver-dtype parity (VERDICT r11 #2): the real driver fetches the
    oracle via pandas (``.df()``), where DuckDB HUGEINT — e.g. an un-CAST
    ``SUM()`` over integers — lands as float64 while Spark emits int64,
    so the value hash mismatches even when every cell is equal
    (CORRECTNESS_r11: source_quota_cap / ta_blocklist_gate).  fetchall()
    hides this (HUGEINT -> plain int), so this check goes through
    ``.df()`` exactly like the driver: any oracle column that is
    pandas-float where the Spark schema is integral (and the Spark rows
    are null-free, since nullable ints legitimately float through
    pandas on BOTH sides) is a gate failure waiting for its rotation."""
    import pandas as pd

    odf = con.execute(sql).df()
    spark_kind = {f.name: type(f.dataType).__name__ for f in sdf.schema.fields}
    for j, col in enumerate(sdf.columns):
        if spark_kind[col] not in _INTEGRAL_SPARK:
            continue
        if any(r[j] is None for r in srows):
            continue
        if col in odf.columns and pd.api.types.is_float_dtype(odf[col].dtype):
            raise AssertionError(
                f"{name}: oracle column '{col}' is {odf[col].dtype} under "
                "pandas (.df(), the driver's path) but the Spark schema is "
                "integral — likely an un-CAST integer SUM() (DuckDB HUGEINT); "
                "wrap it in CAST(... AS BIGINT)")


ORACLES = entrymod.oracle_sql()
ALL = list(entrymod.queries().items())


@pytest.mark.parametrize("name,fn", ALL, ids=[n for n, _ in ALL])
@pytest.mark.slow
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
    assert_oracle_pandas_dtypes(name, sdf, srows, con, ORACLES[name])


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
                Q._DEDUP_BATTERY, Q._PROFILE_EVENTS_BATTERY,
                Q._VARIANTS_BATTERY):
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


def test_dtype_gate_catches_hugeint_oracle(spark):
    """A slot shaped like the pre-fix r11 source_quota_cap — Spark bigint
    vs an oracle whose un-CAST integer SUM() returns HUGEINT (float64
    through pandas) — must fail the dtype layer even though fetchall()
    values match bit-for-bit (exactly how 46/50 shipped)."""
    sdf = spark.createDataFrame([("a", 10)], "k string, total bigint")
    srows = [tuple(r) for r in sdf.collect()]
    con = duckdb.connect()
    bad = "SELECT 'a' AS k, SUM(x) AS total FROM (SELECT UNNEST([1,2,3,4]) x)"
    assert con.execute(bad).fetchall() == [("a", 10)]  # fetchall hides it
    with pytest.raises(AssertionError, match="HUGEINT"):
        assert_oracle_pandas_dtypes("prefix_r11_shape", sdf, srows, con, bad)
    good = bad.replace("SUM(x)", "CAST(SUM(x) AS BIGINT)")
    assert_oracle_pandas_dtypes("fixed_r11_shape", sdf, srows, con, good)


def test_dtype_gate_is_wired_into_the_query_gate():
    """The dtype layer must stay inside the per-query gate replica, so
    every oracled registration is dtype-checked from birth (r12 rotation
    hygiene: 'receipted from birth' means dtype-checked birth)."""
    import inspect
    src = inspect.getsource(test_query_matches_oracle)
    assert "assert_oracle_pandas_dtypes(name, sdf, srows, con," in src


def test_gate_shape_every_registered_query_is_atomic_typed():
    """Every SPARK_QUERIES entry goes through assert_atomic_schema inside
    test_query_matches_oracle (it builds each frame anyway, so the schema
    contract costs nothing extra).  This pin guards the wiring: the
    assertion call must stay in the per-query gate replica."""
    import inspect
    src = inspect.getsource(test_query_matches_oracle)
    assert "assert_atomic_schema(name, sdf)" in src
