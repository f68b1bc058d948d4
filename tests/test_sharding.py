"""Deterministic training-shard export (operators/sharding.py) and the
round-7 text-analysis additions (strip_html, unigram_lm_scores)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from openai_vector_search_demo_spark.operators.sharding import (
    assign_shards,
    shard_manifest,
    write_shards,
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(i, f"doc number {i} body " + "word " * (i % 5)) for i in range(100)],
        "doc_id long, text string")


def test_assign_shards_is_deterministic_and_complete(docs):
    a = assign_shards(docs, "doc_id", 8).collect()
    b = assign_shards(docs, "doc_id", 8).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    shards = {r.shard for r in a}
    assert shards <= set(range(8))
    assert all(r.shard == r.sort_key % 8 for r in a)
    assert len({r.doc_id for r in a}) == 100      # nothing lost or duped


def test_salt_changes_the_permutation(docs):
    a = {r.doc_id: r.sort_key for r in assign_shards(docs, "doc_id", 8,
                                                     salt="ep1").collect()}
    b = {r.doc_id: r.sort_key for r in assign_shards(docs, "doc_id", 8,
                                                     salt="ep2").collect()}
    assert a != b                                  # different epoch order
    assert set(a) == set(b)                        # same documents


def test_write_shards_layout_and_order(spark, docs, tmp_path):
    path = str(tmp_path / "shards")
    write_shards(docs, path, "doc_id", 4)
    dirs = sorted(p.name for p in (tmp_path / "shards").iterdir()
                  if p.name.startswith("shard="))
    assert dirs == [f"shard={k}" for k in range(4)]
    # one data file per shard (repartition routed each shard to one task)
    for d in dirs:
        files = [p for p in (tmp_path / "shards" / d).glob("*.parquet")]
        assert len(files) == 1
    back = spark.read.parquet(path)
    assert back.count() == 100
    assert {r.doc_id for r in back.collect()} == set(range(100))
    # within-shard physical order is the hash order (read preserves file order)
    for k in range(4):
        keys = [r.sort_key for r in
                spark.read.parquet(f"{path}/shard={k}").collect()]
        assert keys == sorted(keys)


def test_shard_manifest_accounts_for_everything(docs):
    from openai_vector_search_demo_spark.functions.text_analysis import (
        token_count,
    )
    m = shard_manifest(docs, "doc_id", 4,
                       token_count=token_count("text")).collect()
    assert sum(r.n_docs for r in m) == 100
    total_tok = docs.select(F.sum(token_count("text"))).first()[0]
    assert sum(r.n_tokens for r in m) == total_tok
    assert all(r.min_key <= r.max_key for r in m)


def test_num_shards_validation(docs):
    with pytest.raises(ValueError, match="num_shards"):
        assign_shards(docs, "doc_id", 0)


# ---------------------------------------------------------------------------
# strip_html
# ---------------------------------------------------------------------------

def test_strip_html_drops_boilerplate_keeps_prose(spark):
    from openai_vector_search_demo_spark.functions.text_analysis import (
        strip_html,
    )
    html = ('<html><head><title>T</title><style>p {a: 1}</style>'
            '<script>if (1 < 2 && x > 0) run();</script></head>'
            '<body><!-- note --><h1>Head</h1><p>body &amp; soul'
            '&nbsp;&lt;x&gt; &#39;q&#39;</p></body></html>')
    df = spark.createDataFrame([(html,)], "h string")
    out = df.select(strip_html("h").alias("p")).first().p
    assert out == "T Head body & soul <x> 'q'"
    # the script body ('1 < 2') must not survive as prose
    assert "run" not in out and "1" not in out


def test_strip_html_plain_text_passthrough(spark):
    from openai_vector_search_demo_spark.functions.text_analysis import (
        strip_html,
    )
    df = spark.createDataFrame([("just   plain\n text",)], "h string")
    assert df.select(strip_html("h").alias("p")).first().p == "just plain text"


# ---------------------------------------------------------------------------
# unigram_lm_scores — hand-computed miniature corpus
# ---------------------------------------------------------------------------

def test_unigram_lm_scores_hand_computed(spark):
    from openai_vector_search_demo_spark.functions.text_analysis import (
        unigram_lm_scores,
    )
    # corpus: "a a b" and "b c" → counts a:2 b:2 c:1, N=5, |V|=3
    df = spark.createDataFrame([(1, "a a b"), (2, "b c")],
                               "doc_id long, text string")
    out = {r.doc_id: r for r in unigram_lm_scores(df, cache=False).collect()}
    lp = {tk: math.log((c + 1) / (5 + 3)) for tk, c in
          {"a": 2, "b": 2, "c": 1}.items()}
    exp1 = round((2 * lp["a"] + lp["b"]) / 3, 6)
    exp2 = round((lp["b"] + lp["c"]) / 2, 6)
    assert out[1].n_tokens == 3 and out[2].n_tokens == 2
    assert out[1].avg_logprob == pytest.approx(exp1, abs=1e-9)
    assert out[2].avg_logprob == pytest.approx(exp2, abs=1e-9)
    # higher-frequency tokens ⇒ less negative score
    assert out[1].avg_logprob > out[2].avg_logprob


# ---------------------------------------------------------------------------
# resample_with_weights (the upsampling half of data mixing)
# ---------------------------------------------------------------------------

def test_resample_integer_weights_exact(spark):
    from openai_vector_search_demo_spark.functions.hashing import (
        resample_with_weights,
    )
    df = spark.createDataFrame(
        [(i, "a" if i < 50 else "b") for i in range(100)],
        "doc_id long, src string")
    out = resample_with_weights(df, "src", "doc_id",
                                {"a": 3.0, "b": 1.0}).collect()
    a = [r for r in out if r.src == "a"]
    b = [r for r in out if r.src == "b"]
    assert len(a) == 150 and len(b) == 50       # integer weights are exact
    assert {r.copy for r in a} == {1, 2, 3}
    assert all(r.copy == 1 for r in b)


def test_resample_zero_weight_drops_and_fraction_approximates(spark):
    from openai_vector_search_demo_spark.functions.hashing import (
        resample_with_weights,
    )
    df = spark.createDataFrame(
        [(i, "keep" if i % 2 else "drop") for i in range(2000)],
        "doc_id long, src string")
    out = resample_with_weights(df, "src", "doc_id",
                                {"drop": 0.0, "keep": 1.5}).collect()
    assert not [r for r in out if r.src == "drop"]
    kept = [r for r in out if r.src == "keep"]
    assert 1400 <= len(kept) <= 1600             # E = 1500, hash-binomial
    # deterministic: same call, same multiset
    out2 = resample_with_weights(df, "src", "doc_id",
                                 {"drop": 0.0, "keep": 1.5}).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, out2))


def test_resample_negative_weight_raises(spark):
    from openai_vector_search_demo_spark.functions.hashing import (
        resample_with_weights,
    )
    df = spark.createDataFrame([(1, "a")], "doc_id long, src string")
    import pytest as _pytest
    with _pytest.raises(ValueError, match="weight"):
        resample_with_weights(df, "src", "doc_id", {"a": -0.5})


# ---------------------------------------------------------------------------
# dataset_split (deterministic train/val/test)
# ---------------------------------------------------------------------------

def test_dataset_split_stable_under_corpus_growth(spark):
    from openai_vector_search_demo_spark.functions.hashing import (
        dataset_split,
    )
    small = spark.createDataFrame([(i,) for i in range(200)], "doc_id long")
    big = spark.createDataFrame([(i,) for i in range(400)], "doc_id long")
    fr = {"train": 0.9, "val": 0.05, "test": 0.05}
    a = {r.doc_id: r.split for r in dataset_split(small, "doc_id",
                                                  fr).collect()}
    b = {r.doc_id: r.split for r in dataset_split(big, "doc_id",
                                                  fr).collect()}
    # keyed assignment: growing the corpus never moves existing docs
    assert all(b[k] == v for k, v in a.items())
    assert set(b.values()) == {"train", "val", "test"}


def test_dataset_split_partitions_everything_and_validates(spark):
    from openai_vector_search_demo_spark.functions.hashing import (
        dataset_split,
    )
    df = spark.createDataFrame([(i,) for i in range(1000)], "doc_id long")
    out = dataset_split(df, "doc_id", {"train": 0.8, "test": 0.2}).collect()
    assert len(out) == 1000
    n_train = sum(1 for r in out if r.split == "train")
    assert 750 <= n_train <= 850                  # E = 800
    with pytest.raises(ValueError, match="sum to 1"):
        dataset_split(df, "doc_id", {"a": 0.5, "b": 0.4})
    single = dataset_split(df, "doc_id", {"all": 1.0}).collect()
    assert all(r.split == "all" for r in single)


def test_rendezvous_matches_python_twin(docs):
    from openai_vector_search_demo_spark.operators.sharding import (
        rendezvous_shard,
    )
    import hashlib

    def h(key, s):
        return int(hashlib.md5(f"0:{key}:{s}".encode())
                   .hexdigest()[:15], 16)

    shards = ["s0", "s1", "s2"]
    out = {r.doc_id: r.shard
           for r in rendezvous_shard(docs, "doc_id", shards).collect()}
    for k, got in out.items():
        want = max(shards, key=lambda s: (h(k, s), s))
        assert got == want


def test_rendezvous_minimal_remap_on_grow_and_shrink(docs):
    """THE property: growing N -> N+1 moves EXACTLY the keys the new
    shard wins (nothing else may change), and removing a shard moves
    only its own keys."""
    from openai_vector_search_demo_spark.operators.sharding import (
        rendezvous_shard,
    )
    five = [f"s{i}" for i in range(5)]
    d = rendezvous_shard(docs, "doc_id", five, out="s5")
    d = rendezvous_shard(d, "doc_id", five + ["s5"], out="s6")
    rows = d.collect()
    for r in rows:
        if r.s5 != r.s6:
            assert r.s6 == "s5"            # a mover went to the new shard
    # shrink: drop s0 — only s0's keys move
    d2 = rendezvous_shard(docs, "doc_id", five, out="a")
    d2 = rendezvous_shard(d2, "doc_id", [s for s in five if s != "s0"],
                          out="b")
    for r in d2.collect():
        if r.a != "s0":
            assert r.b == r.a              # survivors keep their shard


def test_rendezvous_validation(docs):
    from openai_vector_search_demo_spark.operators.sharding import (
        rendezvous_shard,
    )
    with pytest.raises(ValueError):
        rendezvous_shard(docs, "doc_id", [])
    with pytest.raises(ValueError):
        rendezvous_shard(docs, "doc_id", ["a", "a"])
