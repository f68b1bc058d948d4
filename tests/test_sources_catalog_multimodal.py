"""Tests: doc-cracking sources (S1-S3), catalog lifecycle (S5-S7), and the
multimodal column stages."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# doc cracking
# ---------------------------------------------------------------------------

def test_docx_extract_real_bytes():
    from openai_vector_search_demo_spark.sources.doc_crack import (
        docx_extract,
        make_docx,
    )
    data = make_docx(["hello world", "second paragraph"])
    assert docx_extract(data) == ["hello world\nsecond paragraph"]


def test_crack_documents_distributed(spark, tmp_path):
    from openai_vector_search_demo_spark.sources.doc_crack import (
        FAKE_PAGE_SEP,
        crack_documents,
        make_docx,
        read_raw,
    )
    (tmp_path / "a.fake").write_bytes(
        b"page zero" + FAKE_PAGE_SEP + b"page one")
    (tmp_path / "b.docx").write_bytes(make_docx(["from docx"]))
    (tmp_path / "c.xyz").write_bytes(b"ignored format")

    pages = crack_documents(read_raw(spark, str(tmp_path))).collect()
    by_doc = {}
    for r in pages:
        by_doc.setdefault(r.doc_path.rsplit("/", 1)[-1], []).append(
            (r.page_no, r.text))
    assert sorted(by_doc["a.fake"]) == [(0, "page zero"), (1, "page one")]
    assert by_doc["b.docx"] == [(0, "from docx")]
    assert "c.xyz" not in by_doc


def test_pdf_extract_works_without_pypdf():
    """pdf_extract is backed by the built-in extractor when pypdf is absent
    (this environment) — a malformed PDF fails loudly, a valid one parses."""
    from openai_vector_search_demo_spark.sources.doc_crack import pdf_extract
    from tests.test_pdf_text import _page, make_pdf
    with pytest.raises(ValueError, match="PDF"):
        pdf_extract(b"not a pdf at all")
    assert pdf_extract(make_pdf([_page(b"(hi) Tj")])) == ["hi"]


def test_crack_to_chunks_pipeline(spark, tmp_path):
    """S1/S2→P1→P2→E1 with reference page semantics: multi-page formats keep
    their physical page index; DOCX is repaginated into 300-word pages; ids
    stay unique across pages of one document."""
    from openai_vector_search_demo_spark.plans.pipeline import crack_and_ingest
    from openai_vector_search_demo_spark.sources.doc_crack import (
        FAKE_PAGE_SEP,
        make_docx,
        read_raw,
    )
    (tmp_path / "p.fake").write_bytes(
        b"first page words" + FAKE_PAGE_SEP + b"second page words")
    (tmp_path / "w.docx").write_bytes(
        make_docx([" ".join(f"w{i}" for i in range(650))]))
    rows = crack_and_ingest(read_raw(spark, str(tmp_path))).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_path.rsplit("/", 1)[-1], []).append(r)
    assert sorted(r.page_no for r in by_doc["p.fake"]) == [0, 1]   # S1: physical pages
    assert sorted(r.page_no for r in by_doc["w.docx"]) == [0, 1, 2]  # S2: 300-word pages
    assert len({r.id for r in rows}) == len(rows)                  # no key collisions
    assert all(len(r.embedding) == 64 for r in rows)


def test_doc_crack_oracle_pins_are_hand_derivable():
    """The non-PDF rows of the s1_s2_doc_crack VALUES oracle re-derived from
    the literal input strings with hashlib — the pins are facts about the
    inputs, not echoes of the implementation.  (The c.pdf rows pin the
    extractor's verified output on the reference's fixed sample document and
    are regression-checked by the parity/driver gate instead.)"""
    import hashlib

    from openai_vector_search_demo_spark.queries import ORACLE_SQL
    expected = {
        # a.fake: one physical page per FAKE_PAGE_SEP segment (S1)
        ("a.fake", 0): b"alpha beta gamma",
        ("a.fake", 1): b"delta epsilon",
        # b.docx: paragraphs joined by '\n', repaginated per 300 words (S2);
        # page_content stores the ORIGINAL chunk text (pre-cleanse, like the
        # reference's stored content) so the newline survives
        ("b.docx", 0): b"one paragraph of text\nand a second one",
    }
    sql = ORACLE_SQL["s1_s2_doc_crack"]
    for (doc, page), raw in expected.items():
        pin = f"('{doc}', {page}, {len(raw)}, '{hashlib.md5(raw).hexdigest()}')"
        assert pin in sql, pin


def test_multimodal_battery_digests_pinned(spark):
    """Recompute both member digests and compare to _MULTIMODAL_PINNED —
    fails loudly (with the new values) if an intentional change to the
    seeded inputs or the feature code forgets to re-pin the oracle."""
    from openai_vector_search_demo_spark import queries as Q
    live = [(r.query_name, r.n_rows, r.digest)
            for r in Q._battery(spark, "/root/testdata/sf0.001",
                                Q._MULTIMODAL_BATTERY).collect()]
    assert live == Q._MULTIMODAL_PINNED, (
        f"multimodal member digests changed — re-pin _MULTIMODAL_PINNED to: {live}")


# ---------------------------------------------------------------------------
# catalog lifecycle
# ---------------------------------------------------------------------------

def test_index_lifecycle_external_semantics(spark, tmp_path):
    from openai_vector_search_demo_spark import catalog
    loc = str(tmp_path / "chunks_tbl")
    name = "tenant_abc"

    assert not catalog.index_exists(spark, name)
    assert catalog.create_index(spark, name, loc) is True
    assert catalog.create_index(spark, name, loc) is False  # idempotent
    assert catalog.index_exists(spark, name)

    chunks = spark.createDataFrame(
        [("k1", "/d.pdf", 0, "text a", [0.1] * 4, "t1"),
         ("k2", "/d.pdf", 1, "text b", [0.2] * 4, "t1")],
        "id string, doc_path string, page_no int, page_content string, "
        "embedding array<float>, tenant string")
    catalog.upsert_chunks(spark, chunks, name)
    assert spark.table(name).count() == 2

    # upsert: same keys, new content -> overwrite not duplicate (HSET parity)
    chunks2 = spark.createDataFrame(
        [("k1", "/d.pdf", 0, "text a v2", [0.3] * 4, "t1")],
        chunks.schema)
    catalog.upsert_chunks(spark, chunks2, name)
    t = spark.table(name)
    assert t.count() == 2
    assert t.filter(F.col("page_no") == 0).first().page_content == "text a v2"

    # drop keeps data files (external-table semantics, S7)
    catalog.drop_index(spark, name)
    assert not catalog.index_exists(spark, name)
    assert spark.read.parquet(loc).count() == 2

    # S5 recreate over the surviving data: partitions must be recovered —
    # without MSCK REPAIR the recreated table silently reads empty
    assert catalog.create_index(spark, name, loc) is True
    assert spark.table(name).count() == 2
    catalog.drop_index(spark, name)


def test_catalog_rejects_injection_identifiers(spark, tmp_path):
    from openai_vector_search_demo_spark import catalog
    with pytest.raises(ValueError):
        catalog.create_index(spark, "evil` (x int); DROP TABLE t; --",
                             str(tmp_path / "x"))
    with pytest.raises(ValueError):
        catalog.drop_index(spark, "`")
    # a quote in the path must not break the LOCATION literal
    loc = str(tmp_path / "o'brien")
    assert catalog.create_index(spark, "quoted_loc_tbl", loc) is True
    catalog.drop_index(spark, "quoted_loc_tbl")


def test_encrypted_index_name(spark, tmp_path):
    from openai_vector_search_demo_spark import catalog
    name, loc = "secret_alias", str(tmp_path / "enc_tbl")
    catalog.create_index(spark, name, loc, encrypt_name=True)
    assert not spark.catalog.tableExists(name)
    assert catalog.index_exists(spark, name, encrypt_name=True)
    catalog.drop_index(spark, name, encrypt_name=True)


def test_upsert_refuses_concurrent_partition_writer(spark, tmp_path,
                                                    monkeypatch):
    """A row landing in an affected tenant partition between the merge read
    and the partition overwrite would be deleted by the swap — the upsert
    must detect the change and abort with the table untouched."""
    import os

    import pytest as _pytest

    from openai_vector_search_demo_spark import catalog

    loc = str(tmp_path / "race_tbl")
    name = "race_tbl"
    catalog.create_index(spark, name, loc)
    schema = ("id string, doc_path string, page_no int, page_content string, "
              "embedding array<float>, tenant string")
    base = spark.createDataFrame(
        [("k1", "/d.pdf", 0, "text a", [0.1] * 4, "t1")], schema)
    catalog.upsert_chunks(spark, base, name)
    assert spark.table(name).count() == 1

    real_stage = catalog._stage_write

    def racing_stage(resolved, staging):
        real_stage(resolved, staging)
        # another writer appends into the tenant partition mid-upsert
        extra = spark.createDataFrame(
            [("k9", "/late.pdf", 9, "late row", [0.9] * 4, "t1")], schema)
        extra.write.mode("append").partitionBy("tenant").parquet(loc)

    monkeypatch.setattr(catalog, "_stage_write", racing_stage)
    update = spark.createDataFrame(
        [("k1", "/d.pdf", 0, "text a v2", [0.2] * 4, "t1")], schema)
    with _pytest.raises(RuntimeError, match="changed during upsert"):
        catalog.upsert_chunks(spark, update, name)
    monkeypatch.undo()
    spark.catalog.refreshTable(name)   # external append → invalidate listing

    # table untouched by the aborted upsert: old row + the racing row survive
    rows = {r.id: r.page_content for r in spark.table(name).collect()}
    assert rows == {"k1": "text a", "k9": "late row"}
    # with no concurrent writer the same upsert applies cleanly
    catalog.upsert_chunks(spark, update, name)
    rows = {r.id: r.page_content for r in spark.table(name).collect()}
    assert rows == {"k1": "text a v2", "k9": "late row"}
    catalog.drop_index(spark, name)
    assert os.path.isdir(loc)


def test_hyphenated_alias_via_encryption_full_lifecycle(spark, tmp_path):
    """A tenant alias the metastore cannot hold as an identifier (hyphens)
    is refused loudly in plain mode with a pointer to encrypt_name — and the
    full create→write→drop→recreate-with-recovery round trip works through
    the SHA-1 name path, the reference's own mechanism for arbitrary
    aliases (modules/utilities.py:234-235)."""
    from openai_vector_search_demo_spark import catalog
    name, loc = "my-tenant-index", str(tmp_path / "hyph_tbl")
    with pytest.raises(ValueError, match="encrypt_name"):
        catalog.create_index(spark, name, loc)
    assert catalog.create_index(spark, name, loc, encrypt_name=True) is True
    chunks = spark.createDataFrame(
        [("k1", "/d.pdf", 0, "text a", [0.1] * 4, "t1")],
        "id string, doc_path string, page_no int, page_content string, "
        "embedding array<float>, tenant string")
    chunks.write.mode("append").partitionBy("tenant").parquet(loc)
    catalog.drop_index(spark, name, encrypt_name=True)
    # recreate over surviving data: partitions recovered through MSCK
    assert catalog.create_index(spark, name, loc, encrypt_name=True) is True
    assert spark.table(catalog.encode_name(name)).count() == 1
    catalog.drop_index(spark, name, encrypt_name=True)


# ---------------------------------------------------------------------------
# multimodal
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def images(spark):
    from openai_vector_search_demo_spark.operators.multimodal import (
        encode_synthetic_image,
    )
    rng = np.random.RandomState(42)
    rows = [(f"img{i}",
             bytearray(encode_synthetic_image(8 + i, 4 + i,
                                              rng.randint(0, 256, (4 + i, 8 + i)))))
            for i in range(5)]
    rows.append(("bad", bytearray(b"not an image")))
    return spark.createDataFrame(rows, "media_id string, data binary")


def test_image_metadata_and_error_rows(images):
    from openai_vector_search_demo_spark.operators.multimodal import image_metadata
    out = {r.media_id: r for r in image_metadata(images).collect()}
    assert out["img0"].width == 8 and out["img0"].height == 4
    assert out["img4"].width == 12 and out["img4"].height == 8
    assert out["bad"].ok == "error" and out["bad"].width is None


def test_image_features_shape_and_determinism(images):
    from openai_vector_search_demo_spark.operators.multimodal import (
        FEATURE_DIM,
        image_features,
    )
    a = {r.media_id: r.features for r in image_features(images).collect()}
    b = {r.media_id: r.features for r in image_features(images).collect()}
    assert set(a) == {f"img{i}" for i in range(5)}  # bad row skipped
    assert all(len(v) == FEATURE_DIM for v in a.values())
    assert all(abs(sum(v) - 1.0) < 1e-5 for v in a.values())
    assert a == b


def test_resize_roundtrip(images):
    from openai_vector_search_demo_spark.operators.multimodal import (
        decode_synthetic_image,
        resize_images,
    )
    out = {r.media_id: bytes(r.data)
           for r in resize_images(images, 4, 2).collect()}
    w, h, px = decode_synthetic_image(out["img0"])
    assert (w, h) == (4, 2) and px.shape == (2, 4)


def test_sample_frames_jvm_side(spark):
    from openai_vector_search_demo_spark.operators.multimodal import sample_frames
    df = spark.createDataFrame(
        [("v1", [bytearray([i]) for i in range(6)])],
        "media_id string, frames array<binary>")
    out = sample_frames(df, every_n=2).first()
    assert [bytes(b)[0] for b in out.sampled_frames] == [0, 2, 4]


def test_decode_image_real_gated():
    from openai_vector_search_demo_spark.operators.multimodal import (
        decode_image_real,
    )
    with pytest.raises(ImportError, match="Pillow"):
        decode_image_real(b"\x89PNG fake")


def test_compact_parquet_reduces_files_preserves_rows(spark, tmp_path):
    from openai_vector_search_demo_spark.operators.maintenance import (
        compact_parquet,
    )
    path = str(tmp_path / "fragmented")
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    docs.repartition(40).write.parquet(path)     # simulate small-file buildup
    import os
    before_files = sum(1 for r, _, fs in os.walk(path)
                       for f in fs if f.endswith(".parquet"))
    assert before_files >= 40
    before = {tuple(r) for r in spark.read.parquet(path).collect()}
    n = compact_parquet(spark, path, target_mb=128)
    after = {tuple(r) for r in spark.read.parquet(path).collect()}
    assert n <= 2
    assert after == before                       # content-identical


def test_compact_partitioned_one_file_per_partition(spark, tmp_path):
    """Regression: round-robin repartition before partitionBy emitted up to
    n_files PER partition value — fragmentation, not compaction."""
    import os

    from openai_vector_search_demo_spark.operators.maintenance import (
        compact_parquet,
    )
    path = str(tmp_path / "part_frag")
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    (docs.withColumn("pt", F.col("doc_id") % 3)
     .repartition(20).write.partitionBy("pt").parquet(path))
    before = {tuple(sorted(tuple(r) for r in spark.read.parquet(path).collect()))}
    n = compact_parquet(spark, path, target_mb=128, partition_cols=["pt"])
    assert n <= 3                       # one file per partition value
    after = {tuple(sorted(tuple(r) for r in spark.read.parquet(path).collect()))}
    assert after == before


def test_compact_refuses_leftover_dirs(spark, tmp_path):
    import os

    import pytest as _pytest

    from openai_vector_search_demo_spark.operators.maintenance import (
        compact_parquet,
    )
    path = str(tmp_path / "t")
    spark.range(10).write.parquet(path)
    os.makedirs(path + "._compact_old")
    with _pytest.raises(RuntimeError, match="interrupted compaction"):
        compact_parquet(spark, path)


def test_compact_aborts_on_concurrent_writer(spark, tmp_path, monkeypatch):
    """Rows appended between the source read and the swap must never be
    silently deleted — the listing guard aborts and leaves the source as-is."""
    import os

    import pytest as _pytest

    from openai_vector_search_demo_spark.operators import maintenance
    path = str(tmp_path / "racy")
    spark.range(100).write.parquet(path)

    real_table_bytes = maintenance.table_bytes

    def racing_table_bytes(p):
        # simulate a concurrent writer landing a file mid-compaction
        with open(os.path.join(path, "part-concurrent.parquet"), "wb") as f:
            f.write(b"late arrival")
        return real_table_bytes(p)

    monkeypatch.setattr(maintenance, "table_bytes", racing_table_bytes)
    with _pytest.raises(RuntimeError, match="changed during compaction"):
        maintenance.compact_parquet(spark, path)
    # source untouched (late file still present), staging cleaned up
    assert os.path.exists(os.path.join(path, "part-concurrent.parquet"))
    assert not os.path.exists(path + "._compact_tmp")
    os.remove(os.path.join(path, "part-concurrent.parquet"))
    assert spark.read.parquet(path).count() == 100


def test_retrieval_idx_guard_refuses_large_unpartitioned(spark):
    import pytest as _pytest

    from openai_vector_search_demo_spark.operators import rerank
    big = spark.range(0, 20_000).select(
        F.col("id"), (F.col("id") % 100).alias("similarity"))
    with _pytest.raises(ValueError, match="partition_col"):
        rerank.with_retrieval_idx(big, sim_col="similarity", tie_break="id")
    # per-group ranking stays allowed at any size
    out = rerank.with_retrieval_idx(big.withColumn("q", F.col("id") % 7),
                                    sim_col="similarity", tie_break="id",
                                    partition_col="q")
    assert out.filter("retrieval_idx = 0").count() == 7
    # small unpartitioned input (the KNN candidate list) still works
    small = big.limit(10)
    assert rerank.with_retrieval_idx(
        small, sim_col="similarity", tie_break="id").count() == 10


def test_l2_normalize_zero_vector_is_null(spark):
    from openai_vector_search_demo_spark.functions.vectors import l2_normalize
    df = spark.createDataFrame([(1, [0.0, 0.0]), (2, [3.0, 4.0])],
                               ["i", "v"])
    out = {r.i: r.u for r in
           df.select("i", l2_normalize("v").alias("u")).collect()}
    assert out[1] is None
    assert abs(out[2][0] - 0.6) < 1e-6 and abs(out[2][1] - 0.8) < 1e-6


# ---------------------------------------------------------------------------
# snapshot_diff (CDC) — null-safe change semantics
# ---------------------------------------------------------------------------

def test_snapshot_diff_null_safe_compare(spark):
    from openai_vector_search_demo_spark.operators.maintenance import (
        snapshot_diff,
    )
    old = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "c"), (4, "d"), (5, None)],
        "k int, v string")
    new = spark.createDataFrame(
        [(1, "a"), (2, "now"), (3, None), (5, None), (6, "new")],
        "k int, v string")
    got = {r.k: r.change_type
           for r in snapshot_diff(old, new, ["k"]).collect()}
    # 1: unchanged (filtered); 2: NULL→value = changed; 3: value→NULL =
    # changed; 4: removed; 5: NULL==NULL = unchanged; 6: added
    assert got == {2: "changed", 3: "changed", 4: "removed", 6: "added"}


def test_snapshot_diff_multi_key_and_explicit_cols(spark):
    from openai_vector_search_demo_spark.operators.maintenance import (
        snapshot_diff,
    )
    old = spark.createDataFrame([(1, "x", "p", 10), (1, "y", "q", 20)],
                                "a int, b string, payload string, ignored int")
    new = spark.createDataFrame([(1, "x", "p", 99), (1, "z", "r", 30)],
                                "a int, b string, payload string, ignored int")
    got = {(r.a, r.b): r.change_type
           for r in snapshot_diff(old, new, ["a", "b"],
                                  compare_cols=["payload"]).collect()}
    # (1,x): payload equal, 'ignored' differs but is not compared
    assert got == {(1, "y"): "removed", (1, "z"): "added"}


def test_redact_pii_patterns(spark):
    from openai_vector_search_demo_spark.functions.text_analysis import (
        redact_pii,
    )
    df = spark.createDataFrame([
        ("mail bob.smith+x@sub.example.co.uk here",),
        ("see https://a.b/c?d=1&e=2 now",),
        ("call +1 (415) 555-0199 today",),
        ("node 192.168.0.1 up",),
        ("clean text stays untouched",),
    ], ["t"])
    got = [r.r for r in df.select(redact_pii("t").alias("r")).collect()]
    assert got[0] == "mail <EMAIL> here"
    assert got[1] == "see <URL> now"
    assert got[2] == "call <PHONE> today"
    assert got[3] == "node <IP> up"
    assert got[4] == "clean text stays untouched"


# ---------------------------------------------------------------------------
# audio (REAL stdlib WAV path — no stub)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def clips(spark):
    from openai_vector_search_demo_spark.operators.multimodal import encode_wav
    rng = np.random.RandomState(3)
    rows = []
    for i, sr in enumerate([8000, 16000, 44100]):
        samples = (rng.randn(sr // 2) * 8000)       # 0.5 s of noise
        rows.append((f"clip{i}", bytearray(encode_wav(sr, samples))))
    silent = np.zeros(8000)                          # 1 s of silence @ 8k
    rows.append(("silent", bytearray(encode_wav(8000, silent))))
    rows.append(("bad", bytearray(b"RIFFgarbage")))
    return spark.createDataFrame(rows, "media_id string, data binary")


def test_audio_metadata_real_wav(clips):
    from openai_vector_search_demo_spark.operators.multimodal import (
        audio_metadata,
    )
    out = {r.media_id: r for r in audio_metadata(clips).collect()}
    assert out["clip0"].sample_rate == 8000 and out["clip0"].channels == 1
    assert out["clip2"].sample_rate == 44100
    assert abs(out["clip1"].duration_s - 0.5) < 1e-3
    assert out["silent"].n_samples == 8000
    assert out["bad"].ok == "error" and out["bad"].sample_rate is None


def test_audio_features_energy_profile(clips):
    from openai_vector_search_demo_spark.operators.multimodal import (
        audio_features,
    )
    out = {r.media_id: r for r in audio_features(clips, window_ms=250).collect()}
    assert "bad" not in out                          # corrupt clip skipped
    assert len(out["silent"].rms_windows) == 4       # 1 s / 250 ms
    assert all(v == 0.0 for v in out["silent"].rms_windows)
    assert out["silent"].peak == 0.0
    assert all(v > 0.0 for v in out["clip0"].rms_windows)
    assert 0.0 < out["clip0"].peak <= 1.0


def test_audio_resample_roundtrip(spark):
    from openai_vector_search_demo_spark.operators.multimodal import (
        audio_metadata,
        encode_wav,
        resample_audio,
    )
    t = np.arange(16000) / 16000.0
    tone = np.sin(2 * np.pi * 440 * t) * 16000      # 1 s, 440 Hz @ 16 kHz
    df = spark.createDataFrame([("tone", bytearray(encode_wav(16000, tone)))],
                               "media_id string, data binary")
    down = resample_audio(df, 8000)
    meta = audio_metadata(down).collect()[0]
    assert meta.sample_rate == 8000
    assert abs(meta.duration_s - 1.0) < 1e-2         # duration preserved


def test_schema_evolution_additive_merge(spark, tmp_path):
    """Files written under evolving schemas read back as one table: old
    rows surface the new column as NULL; non-additive appends are refused."""
    from openai_vector_search_demo_spark.operators.maintenance import (
        append_evolved,
        read_evolving,
    )
    path = str(tmp_path / "landing")
    v1 = spark.createDataFrame([(1, "a"), (2, "b")], "id int, payload string")
    append_evolved(v1, path)
    v2 = spark.createDataFrame([(3, "c", 0.5)],
                               "id int, payload string, score double")
    append_evolved(v2, path)

    merged = read_evolving(spark, path)
    assert set(merged.columns) == {"id", "payload", "score"}
    rows = {r.id: r.score for r in merged.collect()}
    assert rows == {1: None, 2: None, 3: 0.5}

    import pytest as _pytest
    v3 = spark.createDataFrame([(4, 1.0)], "id int, score double")  # drops payload
    with _pytest.raises(ValueError, match="additive"):
        append_evolved(v3, path)          # refused BY DEFAULT (a rename =
    # drop+add would fork the table into two half-NULL columns forever)
    append_evolved(v3, path, allow_missing=True)   # sparse producer opts in
    assert read_evolving(spark, path).count() == 4


def test_index_exists_illegal_name_returns_false(spark):
    """A name the metastore would refuse can never exist — the probe answers
    False instead of raising (create/exists/drop stay consistent; r3 ADVICE)."""
    from openai_vector_search_demo_spark import catalog
    assert catalog.index_exists(spark, "my-hyphenated-alias") is False
    assert catalog.index_exists(spark, "sneaky`; DROP TABLE x; --") is False
    # the same illegal alias IS probeable through name encryption
    assert catalog.index_exists(spark, "my-hyphenated-alias",
                                encrypt_name=True) is False


def test_table_location_accepts_qualified_names(spark, tmp_path):
    """db.table names that spark.table/insertInto accept must resolve in
    table_location too (each dot-part quoted separately; r3 ADVICE)."""
    import pytest as _pytest

    from openai_vector_search_demo_spark import catalog
    spark.sql("CREATE DATABASE IF NOT EXISTS qualdb")
    try:
        spark.sql(f"CREATE TABLE IF NOT EXISTS qualdb.qt (i INT) USING parquet "
                  f"LOCATION '{tmp_path}/qt'")
        loc = catalog.table_location(spark, "qualdb.qt")
        assert loc is not None and loc.endswith("/qt")
        with _pytest.raises(ValueError):
            catalog.table_location(spark, "qualdb.bad-part")
    finally:
        spark.sql("DROP TABLE IF EXISTS qualdb.qt")
        spark.sql("DROP DATABASE IF EXISTS qualdb")


def test_retrieval_idx_unbounded_input_passes_guard_once(spark, tmp_path):
    """An unbounded (parquet-scan) input under the cap must rank correctly —
    and the guard's materialization is capped at probe+1 rows, so the
    oversized path never persists the whole upstream (r3 ADVICE, medium)."""
    from openai_vector_search_demo_spark.operators import rerank

    p = str(tmp_path / "cands")
    spark.range(0, 50).select(
        F.col("id"), (F.col("id") % 7).cast("double").alias("similarity")
    ).write.parquet(p)
    hits = spark.read.parquet(p)          # no static row bound
    out = rerank.with_retrieval_idx(hits, sim_col="similarity", tie_break="id")
    rows = out.orderBy("retrieval_idx").collect()
    assert len(rows) == 50
    assert rows[0].similarity == 6.0 and rows[0].retrieval_idx == 0
    assert [r.retrieval_idx for r in rows] == list(range(50))
