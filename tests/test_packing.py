"""Sequence packing (concat-and-chunk) — layout properties."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from openai_vector_search_demo_spark.operators.packing import (
    pack_sequences,
    pack_stats,
)


@pytest.fixture(scope="module")
def docs(spark):
    # (id, n_tokens): group 0 gets ids 0,2,4..., group 1 gets 1,3,5...
    rows = [(i, 100 + (i * 37) % 400) for i in range(40)]
    return spark.createDataFrame(rows, ["doc_id", "n_tokens"])


def test_offsets_are_contiguous_per_group(docs):
    packed = pack_sequences(docs, budget=512, num_groups=2).collect()
    by_grp: dict[int, list] = {}
    for r in sorted(packed, key=lambda r: (r.grp, r.start_offset)):
        by_grp.setdefault(r.grp, []).append(r)
    for grp, rows in by_grp.items():
        off = 0
        for r in rows:  # concat layout: each doc starts where the last ended
            assert r.start_offset == off, (grp, r)
            assert r.bin_in_grp == off // 512
            off += r.n_tokens


def test_string_ids_pack_like_numeric(spark):
    """String doc keys (the real-corpus shape) group via the md5-60bit hash
    and keep every layout invariant: total assignment, contiguous offsets,
    hashlib-reproducible group ids."""
    import hashlib

    rows = [(f"doc-{i}", 100 + (i * 37) % 400) for i in range(40)]
    df = spark.createDataFrame(rows, ["doc_key", "n_tokens"])
    packed = pack_sequences(df, budget=512, id_col="doc_key",
                            num_groups=4).collect()
    assert len(packed) == 40
    for r in packed:  # grp = md5-60bit(key) % 4, independently recomputed
        expect = int(hashlib.md5(r.doc_key.encode()).hexdigest()[:15], 16) % 4
        assert r.grp == expect, r
    by_grp: dict[int, list] = {}
    for r in sorted(packed, key=lambda r: (r.grp, r.start_offset)):
        by_grp.setdefault(r.grp, []).append(r)
    for grp, grows in by_grp.items():
        off = 0
        for r in grows:
            assert r.start_offset == off, (grp, r)
            off += r.n_tokens


def test_deterministic_and_total(docs):
    a = sorted(map(tuple, pack_sequences(docs, 512, num_groups=4).collect()))
    b = sorted(map(tuple, pack_sequences(docs, 512, num_groups=4).collect()))
    assert a == b
    assert len(a) == 40  # every doc assigned exactly once


def test_oversized_doc_keeps_stream_layout(spark):
    df = spark.createDataFrame(
        [(0, 1500), (2, 10), (4, 10)], ["doc_id", "n_tokens"])
    out = {r.doc_id: r for r in
           pack_sequences(df, budget=512, num_groups=1).collect()}
    assert out[0].start_offset == 0 and out[0].bin_in_grp == 0
    # the long doc spills across bins; the next doc starts at 1500 → bin 2
    assert out[2].start_offset == 1500 and out[2].bin_in_grp == 2
    assert out[4].start_offset == 1510 and out[4].bin_in_grp == 2


def test_pack_stats_accounts_every_doc(docs):
    packed = pack_sequences(docs, 512, num_groups=2)
    stats = pack_stats(packed, 512)
    agg = stats.agg(F.sum("n_docs"), F.sum("tokens_starting")).first()
    want = docs.agg(F.count(F.lit(1)), F.sum("n_tokens")).first()
    assert (agg[0], agg[1]) == (want[0], want[1])


def test_budget_validation(docs):
    with pytest.raises(ValueError):
        pack_sequences(docs, budget=0)
