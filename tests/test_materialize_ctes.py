"""`queries._materialize_ctes` — the oracle CTE-materialization rewrite
(DuckDB inlines per reference; iterative/battery oracles measured
2^rounds blowups without it).  ADVICE r11 hardened it from a whole-string
regex to a grammar-anchored scan; these pin the cases the regex got
wrong and the behaviors the registry depends on."""

from __future__ import annotations

import duckdb

from openai_vector_search_demo_spark.queries import (
    ORACLE_SQL,
    RAW_ORACLE_SQL,
    _materialize_ctes,
)


def test_plain_cte_list_is_annotated():
    sql = "WITH a AS (SELECT 1 x), b AS (SELECT 2 y) SELECT * FROM a, b"
    out = _materialize_ctes(sql)
    assert "a AS MATERIALIZED (" in out and "b AS MATERIALIZED (" in out


def test_string_literal_as_paren_is_untouched():
    # the ADVICE scenario: '<word> AS (' inside a string literal
    sql = "WITH a AS (SELECT 'alias AS (trap)' s) SELECT * FROM a"
    out = _materialize_ctes(sql)
    assert "'alias AS (trap)'" in out
    assert out.count("MATERIALIZED") == 1


def test_recursive_in_literal_or_comment_does_not_disable():
    sql = ("-- RECURSIVE appears in this comment only\n"
           "WITH a AS (SELECT 'RECURSIVE' kw) SELECT * FROM a")
    out = _materialize_ctes(sql)
    assert "a AS MATERIALIZED (" in out
    assert "-- RECURSIVE appears in this comment only" in out


def test_real_recursive_list_left_plain():
    sql = ("WITH RECURSIVE r AS (SELECT 1 n UNION ALL "
           "SELECT n + 1 FROM r WHERE n < 3) SELECT * FROM r")
    assert "MATERIALIZED" not in _materialize_ctes(sql)


def test_nested_with_inside_recursive_body_is_annotated():
    # the dedup_clusters shape: outer RECURSIVE list plain, inner plain
    # list materialized (the old code skipped the whole statement — these
    # were the 2^rounds blowup victims)
    sql = ("WITH RECURSIVE pairs AS (WITH t AS (SELECT 1 x) "
           "SELECT x FROM t UNION ALL SELECT x + 1 FROM pairs WHERE x < 2) "
           "SELECT * FROM pairs")
    out = _materialize_ctes(sql)
    assert "pairs AS (" in out and "t AS MATERIALIZED (" in out


def test_named_window_clause_untouched_without_global_guard():
    sql = ("WITH a AS (SELECT 1 x) "
           "SELECT x, SUM(x) OVER w FROM a WINDOW w AS (ORDER BY x)")
    out = _materialize_ctes(sql)
    assert "a AS MATERIALIZED (" in out  # old code skipped even this
    assert "WINDOW w AS (ORDER BY x)" in out


def test_cte_with_column_alias_list():
    sql = "WITH q(a, b) AS (VALUES (1, 2)) SELECT * FROM q"
    assert "q(a, b) AS MATERIALIZED (" in _materialize_ctes(sql)


def test_derived_table_and_cast_parens_untouched():
    sql = ("WITH a AS (SELECT 1 x) "
           "SELECT * FROM (SELECT x FROM a) sub "
           "WHERE CAST(x AS BIGINT) > 0")
    out = _materialize_ctes(sql)
    assert out.count("MATERIALIZED") == 1


def test_every_registered_oracle_still_parses_in_duckdb():
    """The verify-recipe assertion, as a pinned test: the transformed SQL
    of every registered oracle must remain parseable.  Oracles whose
    read_parquet targets are runtime-materialized /tmp artifacts (stored
    ANN indexes, the 100k scale fixture — written by the QUERY before the
    driver runs the oracle) get a parse-only check via
    json_serialize_sql when the artifact isn't on disk yet (fresh
    container); everything else gets the stronger EXPLAIN (parse+bind)."""
    import glob
    import re

    con = duckdb.connect()
    for tbl in ["region", "nation", "customer", "supplier", "part",
                "orders", "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {tbl} AS SELECT * FROM "
            f"read_parquet('/root/testdata/sf0.001/{tbl}.parquet')")
    path_re = re.compile(r"read_parquet\('(/tmp/[^']+)'")
    for name, sql in ORACLE_SQL.items():
        materialized = all(
            glob.glob(p) for p in path_re.findall(sql))
        try:
            if materialized:
                con.execute(f"EXPLAIN {sql}")
            else:
                err = con.execute(
                    "SELECT json_serialize_sql(?::VARCHAR)",
                    [sql]).fetchone()[0]
                assert '"error":false' in err.replace(" ", ""), \
                    f"{name}: {err[:400]}"
        except AssertionError:
            raise
        except Exception as e:  # pragma: no cover - failure reporting
            raise AssertionError(f"{name}: transformed oracle no longer "
                                 f"parses: {e}") from e


def test_transform_is_value_preserving_on_a_rewritten_oracle():
    """MATERIALIZED must only change the plan, never values: run one
    formerly-skipped oracle (nested-WITH-in-RECURSIVE shape) both plain
    and transformed and compare full results."""
    raw = RAW_ORACLE_SQL["dedup_clusters"]
    con = duckdb.connect()
    for tbl in ["documents"]:
        con.execute(
            f"CREATE VIEW {tbl} AS SELECT * FROM "
            f"read_parquet('/root/testdata/sf0.001/{tbl}.parquet')")
    plain = con.execute(raw).fetchall()
    mat = con.execute(_materialize_ctes(raw)).fetchall()
    assert sorted(plain) == sorted(mat) and len(plain) > 0
