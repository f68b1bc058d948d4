"""Exact-k sampling: bottom-k (distributed reservoir) + stratified
exact quotas.

The rate-based samplers (`hash_sample_predicate`,
`stratified_sample_predicate`) are tested in test_functions/parity;
these cover the exact-COUNT duals: the bottom-k priority sample and
the two-phase quota window, whose contracts are (a) exactness, (b)
partitioning-invariance, (c) the plan shape that survives 100 TB.
"""

from __future__ import annotations

import contextlib
import hashlib
import io

from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from openai_vector_search_demo_spark.functions.hashing import (
    bottomk_sample,
    sample_priority,
    stratified_quota_sample,
)

SF = "/root/testdata/sf0.001"


def _pri(seed: int, key) -> int:
    """Python twin of sample_priority: 60-bit md5 of '<seed>:<key>'."""
    return int(hashlib.md5(f"{seed}:{key}".encode()).hexdigest()[:15], 16)


def _docs(spark, n=97, n_src=5):
    rows = [(i, f"src{i % n_src}") for i in range(n)]
    return spark.createDataFrame(rows, "doc_id long, source string")


def test_bottomk_matches_python_twin(spark):
    df = _docs(spark)
    got = sorted(r.doc_id for r in bottomk_sample(df, "doc_id", 10).collect())
    want = sorted(sorted(range(97), key=lambda i: (_pri(42, i), i))[:10])
    assert got == want


def test_bottomk_partitioning_invariant_and_prefix_nested(spark):
    df = _docs(spark)
    base = set(r.doc_id for r in bottomk_sample(df, "doc_id", 20).collect())
    rep = set(r.doc_id
              for r in bottomk_sample(df.repartition(7), "doc_id", 20)
              .collect())
    assert base == rep                       # layout never changes the set
    small = set(r.doc_id for r in bottomk_sample(df, "doc_id", 5).collect())
    assert small < base                      # bottom-k samples are nested


def test_bottomk_edge_k(spark):
    df = _docs(spark, n=7)
    assert bottomk_sample(df, "doc_id", 0).count() == 0
    assert bottomk_sample(df, "doc_id", 99).count() == 7   # k > n: all rows


def test_quota_exact_counts_and_clip(spark):
    df = _docs(spark, n=50, n_src=3)        # src0:17, src1:17, src2:16
    out = stratified_quota_sample(
        df, "source", "doc_id", {"src0": 5, "src1": 1_000_000}, default=0)
    counts = {r.source: r.n for r in
              out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert counts == {"src0": 5, "src1": 17}   # exact; clip; default-0 drops


def test_quota_rank_contiguous_and_hash_ordered(spark):
    df = _docs(spark, n=60, n_src=2)
    out = stratified_quota_sample(
        df, "source", "doc_id", {"src0": 7, "src1": 4}, rank_col="rn")
    rows = out.collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r.source, []).append((r.rn, r.doc_id))
    for src, picked in by_src.items():
        picked.sort()
        assert [rn for rn, _ in picked] == list(range(1, len(picked) + 1))
        # the kept rows ARE the stratum's smallest-priority rows, in order
        stratum = [i for i in range(60) if f"src{i % 2}" == src]
        want = sorted(stratum, key=lambda i: (_pri(42, i), i))[:len(picked)]
        assert [d for _, d in picked] == want


def test_quota_two_phase_equals_single_phase(spark):
    df = _docs(spark, n=80, n_src=4).repartition(9)
    a = stratified_quota_sample(df, "source", "doc_id",
                                {"src0": 6, "src1": 3}, default=2,
                                rank_col="rn", two_phase=True)
    b = stratified_quota_sample(df, "source", "doc_id",
                                {"src0": 6, "src1": 3}, default=2,
                                rank_col="rn", two_phase=False)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_priority_is_salted(spark):
    df = _docs(spark, n=40)
    s1 = set(r.doc_id for r in bottomk_sample(df, "doc_id", 10, seed=1)
             .collect())
    s2 = set(r.doc_id for r in bottomk_sample(df, "doc_id", 10, seed=2)
             .collect())
    assert s1 != s2                          # independent draws per seed
    # and each matches its own twin
    want1 = set(sorted(range(40), key=lambda i: (_pri(1, i), i))[:10])
    assert s1 == want1


def test_bottomk_slot_plan_is_takeordered_no_global_sort(spark):
    df = entrymod.queries()["bottomk_uniform_sample"](spark, SF)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    p = buf.getvalue()
    assert "TakeOrderedAndProject" in p      # per-partition heap + merge
    assert "Exchange rangepartitioning" not in p   # never a global sort


def test_validation_errors(spark):
    df = _docs(spark, n=5)
    import pytest
    with pytest.raises(ValueError):
        bottomk_sample(df, "doc_id", -1)
    with pytest.raises(ValueError):
        stratified_quota_sample(df, "source", "doc_id", {"src0": -2})


def test_weighted_bottomk_matches_python_twin(spark):
    from openai_vector_search_demo_spark.functions.hashing import (
        weighted_bottomk_sample,
    )
    import hashlib

    def pri(key, w):
        return max(int(hashlib.md5(f"42:{key}:{c}".encode())
                       .hexdigest()[:15], 16) for c in range(1, w + 1))

    df = _docs(spark, n=90, n_src=3)
    w = (F.when(F.col("source") == "src0", 5)
         .when(F.col("source") == "src1", 2).otherwise(1))
    got = sorted(r.doc_id
                 for r in weighted_bottomk_sample(df, "doc_id", w, 15)
                 .collect())
    wmap = {0: 5, 1: 2, 2: 1}
    want = sorted(sorted(range(90),
                         key=lambda i: (-pri(i, wmap[i % 3]), i))[:15])
    assert got == want


def test_weighted_bottomk_weight_one_equals_uniform_ordering(spark):
    """w=1 collapses to a plain salted-hash bottom-k over the ':1'
    salt — the ES construction's base case."""
    from openai_vector_search_demo_spark.functions.hashing import (
        weighted_bottomk_sample,
    )
    import hashlib

    df = _docs(spark, n=60, n_src=1)
    got = set(r.doc_id for r in
              weighted_bottomk_sample(df, "doc_id", F.lit(1), 10).collect())
    want = set(sorted(
        range(60),
        key=lambda i: -int(hashlib.md5(f"42:{i}:1".encode())
                           .hexdigest()[:15], 16))[:10])
    assert got == want


def test_weighted_bottomk_higher_weight_dominates(spark):
    from openai_vector_search_demo_spark.functions.hashing import (
        weighted_bottomk_sample,
    )
    df = _docs(spark, n=200, n_src=2)        # 100 docs each stratum
    w = F.when(F.col("source") == "src0", 8).otherwise(1)
    kept = weighted_bottomk_sample(df, "doc_id", w, 40).collect()
    n0 = sum(1 for r in kept if r.source == "src0")
    assert n0 > 25                            # w=8 must dominate a fair split


def test_token_budget_fill_rule_and_clip(spark):
    from openai_vector_search_demo_spark.functions.hashing import (
        token_budget_fill,
    )
    rows = [(i, f"src{i % 2}", 10 + (i % 7)) for i in range(80)]
    df = spark.createDataFrame(rows, "doc_id long, source string, toks long")
    out = token_budget_fill(df, "source", "doc_id", "toks",
                            {"src0": 100, "src1": 10_000_000},
                            cum_col="cb").collect()
    # python twin: per stratum, hash order, keep while cum_before < budget
    budgets = {"src0": 100, "src1": 10_000_000}
    want = {}
    for srcv in ("src0", "src1"):
        docs = sorted((i for i in range(80) if f"src{i % 2}" == srcv),
                      key=lambda i: (_pri(42, i), i))
        cum = 0
        for i in docs:
            tok = 10 + (i % 7)
            if cum < budgets[srcv]:
                want[i] = cum
            cum += tok
    got = {r.doc_id: r.cb for r in out}
    assert got == want
    # src1's huge budget keeps the whole stratum
    assert sum(1 for i in got if i % 2 == 1) == 40
    # overshoot bounded by one doc: max cum_before < budget per stratum
    for r in out:
        assert r.cb < budgets[r.source]


def test_token_budget_two_phase_equals_single_phase(spark):
    from openai_vector_search_demo_spark.functions.hashing import (
        token_budget_fill,
    )
    rows = [(i, f"s{i % 3}", 5 + (i % 11)) for i in range(120)]
    df = spark.createDataFrame(
        rows, "doc_id long, source string, toks long").repartition(9)
    kw = dict(budgets={"s0": 60, "s1": 9}, default=200, cum_col="cb")
    a = token_budget_fill(df, "source", "doc_id", "toks",
                          two_phase=True, **kw)
    b = token_budget_fill(df, "source", "doc_id", "toks",
                          two_phase=False, **kw)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_token_budget_zero_and_validation(spark):
    from openai_vector_search_demo_spark.functions.hashing import (
        token_budget_fill,
    )
    import pytest
    df = spark.createDataFrame([(1, "a", 5)],
                               "doc_id long, source string, toks long")
    assert token_budget_fill(df, "source", "doc_id", "toks",
                             {}, default=0).count() == 0
    with pytest.raises(ValueError):
        token_budget_fill(df, "source", "doc_id", "toks", {"a": -1})


def test_weighted_bottomk_zero_weight_excluded(spark):
    from openai_vector_search_demo_spark.functions.hashing import (
        weighted_bottomk_sample,
    )
    df = _docs(spark, n=30, n_src=2)
    w = F.when(F.col("source") == "src0", 0).otherwise(3)
    kept = weighted_bottomk_sample(df, "doc_id", w, 25).collect()
    assert kept and all(r.source == "src1" for r in kept)


def test_exact_quantiles_empty_input(spark):
    from openai_vector_search_demo_spark.operators.quantiles import (
        exact_quantiles,
    )
    df = spark.createDataFrame([], "g string, v double")
    assert exact_quantiles(df, "v", ["g"], [0.5]).count() == 0
