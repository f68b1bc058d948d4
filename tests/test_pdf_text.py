"""S1 — the dependency-free PDF extractor, proven against the reference's
own sample document (sample_docs/Easy_recipes_Boston_University.pdf — the
input modules/utilities.py:31-45 reads via PyPDFLoader) plus synthetic
fixtures that pin parser semantics format-feature by feature."""

from __future__ import annotations

import shutil
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from openai_vector_search_demo_spark.sources.pdf_text import (
    PdfError,
    extract_pdf_pages,
    parse_tounicode,
)

SAMPLE = Path("/root/reference/sample_docs/Easy_recipes_Boston_University.pdf")


# ---------------------------------------------------------------------------
# Synthetic fixture builder — uncompressed classic-xref PDF
# ---------------------------------------------------------------------------

def make_pdf(page_contents: list[bytes]) -> bytes:
    """Minimal valid single-font PDF, one content stream per page."""
    objs: list[bytes] = []
    npages = len(page_contents)
    kids = " ".join(f"{3 + 2 * i} 0 R" for i in range(npages))
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objs.append(f"<< /Type /Pages /Kids [{kids}] /Count {npages} "
                f"/Resources << /Font << /F1 {3 + 2 * npages} 0 R >> >> "
                f">>".encode())
    for i, content in enumerate(page_contents):
        objs.append(f"<< /Type /Page /Parent 2 0 R "
                    f"/MediaBox [0 0 612 792] "
                    f"/Contents {4 + 2 * i} 0 R >>".encode())
        objs.append(b"<< /Length %d >>\nstream\n%s\nendstream"
                    % (len(content), content))
    objs.append(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
                b"/Encoding /WinAnsiEncoding >>")
    out = bytearray(b"%PDF-1.4\n")
    for n, body in enumerate(objs, start=1):
        out += b"%d 0 obj\n%s\nendobj\n" % (n, body)
    out += b"trailer << /Root 1 0 R >>\n%%EOF\n"
    return bytes(out)


def _page(text_ops: bytes) -> bytes:
    return b"BT /F1 12 Tf 72 720 Td " + text_ops + b" ET"


# ---------------------------------------------------------------------------
# The reference's own sample document
# ---------------------------------------------------------------------------

@pytest.mark.skipif(not SAMPLE.exists(), reason="reference sample not present")
def test_sample_pdf_all_pages_nonempty():
    pages = extract_pdf_pages(SAMPLE.read_bytes())
    assert len(pages) == 15
    assert all(p.strip() for p in pages)


@pytest.mark.skipif(not SAMPLE.exists(), reason="reference sample not present")
def test_sample_pdf_text_quality():
    """Known phrases survive ToUnicode subset-font decoding with word
    boundaries intact (no per-glyph space splatter, no glued words)."""
    pages = extract_pdf_pages(SAMPLE.read_bytes())
    assert "Quick and easy recipes" in pages[0]
    assert "Bon app" in pages[0]                    # accented é decodes
    assert "Chilli con Carne" in pages[2]
    assert "Ingredients" in pages[2]
    joined = "\n".join(pages)
    assert "r e c i p e s" not in joined            # glyph-splatter regression
    assert "http://www.studentrecipes.com" in joined


@pytest.mark.skipif(not SAMPLE.exists(), reason="reference sample not present")
def test_sample_pdf_through_distributed_pipeline(spark, tmp_path):
    """The verdict's S1 gate: the actual reference PDF cracks into page rows
    with nonempty text end-to-end through read_raw → crack_and_ingest."""
    from openai_vector_search_demo_spark.plans.pipeline import crack_and_ingest
    from openai_vector_search_demo_spark.sources.doc_crack import read_raw

    shutil.copy(SAMPLE, tmp_path / "recipes.pdf")
    chunks = crack_and_ingest(read_raw(spark, str(tmp_path)), tenant="t1")
    rows = chunks.collect()
    assert len(rows) == 15                          # one row per PDF page
    assert {r.page_no for r in rows} == set(range(15))
    assert all(r.page_content for r in rows)        # cleansed, nonempty
    assert all(r.embedding is not None for r in rows)
    assert all(len(r.id) == 40 for r in rows)       # sha1 keys (S9)


# ---------------------------------------------------------------------------
# Synthetic parser semantics
# ---------------------------------------------------------------------------

def test_minimal_pdf_text_and_line_breaks():
    pdf = make_pdf([_page(b"(Hello World) Tj 0 -14 Td (Second line) Tj")])
    pages = extract_pdf_pages(pdf)
    assert pages == ["Hello World\nSecond line"]


def test_multi_page_order_follows_page_tree():
    pdf = make_pdf([_page(b"(page one) Tj"), _page(b"(page two) Tj"),
                    _page(b"(page three) Tj")])
    assert extract_pdf_pages(pdf) == ["page one", "page two", "page three"]


def test_tj_array_kerning_becomes_word_space():
    """Large negative TJ kerns (> 0.18 em) are encoded inter-word spaces;
    small ones are letter kerning and must NOT split words."""
    pdf = make_pdf([_page(b"[ (Hel) -20 (lo) -400 (World) ] TJ")])
    assert extract_pdf_pages(pdf) == ["Hello World"]


def test_escapes_and_hex_strings():
    pdf = make_pdf([_page(rb"(paren \( close \) oct \101) Tj "
                          rb"0 -14 Td <48657821> Tj")])
    assert extract_pdf_pages(pdf) == ["paren ( close ) oct A\nHex!"]


def test_encrypted_pdf_with_dangling_encrypt_raises():
    pdf = make_pdf([_page(b"(secret) Tj")]).replace(
        b"trailer << /Root 1 0 R >>",
        b"trailer << /Root 1 0 R /Encrypt 9 0 R >>")
    with pytest.raises(PdfError, match="Encrypt"):
        extract_pdf_pages(pdf)


# ---------------------------------------------------------------------------
# Encryption — RC4 standard security handler (empty user password)
# ---------------------------------------------------------------------------

def _md5(b: bytes) -> bytes:
    import hashlib
    return hashlib.md5(b).digest()


def _encrypt_pdf(pdf: bytes, owner_pw: bytes = b"hunter2",
                 user_pw: bytes = b"", r: int = 3,
                 length: int = 128,
                 file_id: bytes = b"\x01" * 16) -> bytes:
    """Independent test-side encryptor: PDF 1.7 §7.6.3 Algorithms 2-5
    written from the spec (NOT reusing the parser's derivation), so a
    derivation bug cannot cancel out across encrypt/decrypt."""
    import re as _re

    from openai_vector_search_demo_spark.sources.pdf_text import (
        _ENC_PAD,
        _rc4,
    )
    n = length // 8 if r == 3 else 5
    pad = lambda pw: (pw + _ENC_PAD)[:32]  # noqa: E731
    # Algorithm 3: /O from the owner password over the padded user password
    h = _md5(pad(owner_pw))
    if r == 3:
        for _ in range(50):
            h = _md5(h)
    okey = h[:n]
    o = _rc4(okey, pad(user_pw))
    if r == 3:
        for i in range(1, 20):
            o = _rc4(bytes(b ^ i for b in okey), o)
    # Algorithm 2: file key (from the USER password)
    p = (-1) & 0xFFFFFFFF
    key = _md5(pad(user_pw) + o + p.to_bytes(4, "little") + file_id)
    if r == 3:
        for _ in range(50):
            key = _md5(key[:n])
    key = key[:n]
    # Algorithms 4/5: /U
    if r == 2:
        u = _rc4(key, _ENC_PAD)
    else:
        u = _rc4(key, _md5(_ENC_PAD + file_id))
        for i in range(1, 20):
            u = _rc4(bytes(b ^ i for b in key), u)
        u += b"\x00" * 16
    # encrypt every stream payload with its per-object RC4 key (strings in
    # this fixture live inside content streams, so streams cover them)
    def enc_obj(m):
        num = int(m.group(1))
        body = m.group(2)
        sm = _re.search(rb"stream\n(.*?)\nendstream", body, _re.S)
        if sm:
            ok = _md5(key + num.to_bytes(3, "little") + b"\x00\x00")
            ok = ok[:min(n + 5, 16)]
            body = (body[:sm.start(1)] + _rc4(ok, sm.group(1))
                    + body[sm.end(1):])
        return b"%d 0 obj\n%s\nendobj" % (num, body)

    out = _re.sub(rb"(\d+) 0 obj\n(.*?)\nendobj", enc_obj, pdf, flags=_re.S)
    v = 2 if r == 3 else 1
    encnum = 90
    enc_obj_bytes = (
        b"%d 0 obj\n<< /Filter /Standard /V %d /R %d /Length %d "
        b"/O <%s> /U <%s> /P -1 >>\nendobj\n"
        % (encnum, v, r, length, o.hex().encode(), u.hex().encode()))
    idhex = file_id.hex().encode()
    out = out.replace(
        b"trailer << /Root 1 0 R >>",
        enc_obj_bytes
        + b"trailer << /Root 1 0 R /Encrypt %d 0 R /ID [<%s> <%s>] >>"
        % (encnum, idhex, idhex))
    return out


def test_rc4_known_vectors():
    from openai_vector_search_demo_spark.sources.pdf_text import _rc4
    assert _rc4(b"Key", b"Plaintext").hex() == "bbf316e8d940af0ad3"
    assert _rc4(b"Secret", b"Attack at dawn").hex() == \
        "45a01f645fc35b383552544b9bf5"
    assert _rc4(b"Key", _rc4(b"Key", b"roundtrip")) == b"roundtrip"


@pytest.mark.parametrize("r,length", [(3, 128), (2, 40)])
def test_encrypted_pdf_decrypts_with_empty_user_password(r, length):
    plain = make_pdf([_page(b"(the secret text) Tj")])
    enc = _encrypt_pdf(plain, r=r, length=length)
    assert b"the secret text" not in enc      # really encrypted
    assert extract_pdf_pages(enc) == extract_pdf_pages(plain)


def test_encrypted_pdf_with_real_user_password_raises():
    enc = _encrypt_pdf(make_pdf([_page(b"(locked) Tj")]), user_pw=b"pw")
    with pytest.raises(PdfError, match="password"):
        extract_pdf_pages(enc)


def test_public_key_handler_raises_unsupported():
    pdf = make_pdf([_page(b"(x) Tj")])
    pdf = pdf.replace(
        b"trailer << /Root 1 0 R >>",
        b"90 0 obj\n<< /Filter /Adobe.PubSec /V 4 /R 4 /Length 128 "
        b"/O <00> /U <00> /P -1 >>\nendobj\n"
        b"trailer << /Root 1 0 R /Encrypt 90 0 R >>")
    with pytest.raises(PdfError, match="unsupported encryption handler"):
        extract_pdf_pages(pdf)


def test_unknown_crypt_filter_method_raises():
    pdf = make_pdf([_page(b"(x) Tj")])
    pdf = pdf.replace(
        b"trailer << /Root 1 0 R >>",
        b"90 0 obj\n<< /Filter /Standard /V 4 /R 4 /Length 128 "
        b"/CF << /StdCF << /CFM /AESV1 >> >> /StmF /StdCF /StrF /StdCF "
        b"/O <00> /U <00> /P -1 >>\nendobj\n"
        b"trailer << /Root 1 0 R /Encrypt 90 0 R >>")
    with pytest.raises(PdfError, match="crypt filter method"):
        extract_pdf_pages(pdf)


# ---------------------------------------------------------------------------
# Encryption — AES crypt filters (V4 /AESV2, V5 /AESV3), empty password.
# The block cipher itself is validated against FIPS-197's published
# known-answer vectors (Appendix C) — spec-independent ground truth —
# and the PDF-side derivations below are written from the spec in the
# tests, separately from the parser's implementations, so a derivation
# bug cannot cancel out across encrypt/decrypt.
# ---------------------------------------------------------------------------

def test_aes_fips197_known_answer_vectors():
    from openai_vector_search_demo_spark.sources.aes import (
        aes_decrypt_block,
        aes_encrypt_block,
        key_expansion,
    )
    pt = bytes.fromhex("00112233445566778899aabbccddeeff")
    key_hex = "000102030405060708090a0b0c0d0e0f1011121314151617"\
              "18191a1b1c1d1e1f"
    for nk, exp in [(16, "69c4e0d86a7b0430d8cdb78070b4c55a"),
                    (24, "dda97ca4864cdfe06eaf70a0ec0d7191"),
                    (32, "8ea2b7ca516745bfeafc49904b496089")]:
        rk = key_expansion(bytes.fromhex(key_hex)[:nk])
        ct = aes_encrypt_block(rk, pt)
        assert ct.hex() == exp
        assert aes_decrypt_block(rk, ct) == pt


def _sha256(b: bytes) -> bytes:
    import hashlib
    return hashlib.sha256(b).digest()


def _aes_cbc_pad_encrypt(key: bytes, iv: bytes, pt: bytes) -> bytes:
    """Test-side Algorithm-1 stream payload: IV ‖ CBC(PKCS#7-padded pt)."""
    from openai_vector_search_demo_spark.sources.aes import cbc_encrypt
    n = 16 - len(pt) % 16
    return iv + cbc_encrypt(key, iv, pt + bytes([n]) * n)


def _encrypt_streams(pdf: bytes, enc_payload) -> bytes:
    """Rewrite every object's stream payload via ``enc_payload(num, raw)``."""
    import re as _re

    def enc_obj(m):
        num, body = int(m.group(1)), m.group(2)
        sm = _re.search(rb"stream\n(.*?)\nendstream", body, _re.S)
        if sm:
            body = (body[:sm.start(1)] + enc_payload(num, sm.group(1))
                    + body[sm.end(1):])
        return b"%d 0 obj\n%s\nendobj" % (num, body)

    return _re.sub(rb"(\d+) 0 obj\n(.*?)\nendobj", enc_obj, pdf, flags=_re.S)


def _encrypt_pdf_aesv2(pdf: bytes, owner_pw: bytes = b"hunter2",
                       user_pw: bytes = b"",
                       file_id: bytes = b"\x02" * 16) -> bytes:
    """Independent V4 R4 /AESV2 encryptor (PDF 1.7 §7.6.2-7.6.4: the R3
    key derivation + the AES 'sAlT' object-key extension)."""
    from openai_vector_search_demo_spark.sources.pdf_text import (
        _ENC_PAD,
        _rc4,
    )
    pad = lambda pw: (pw + _ENC_PAD)[:32]  # noqa: E731
    h = _md5(pad(owner_pw))
    for _ in range(50):
        h = _md5(h)
    okey = h[:16]
    o = _rc4(okey, pad(user_pw))
    for i in range(1, 20):
        o = _rc4(bytes(b ^ i for b in okey), o)
    p = (-1) & 0xFFFFFFFF
    key = _md5(pad(user_pw) + o + p.to_bytes(4, "little") + file_id)
    for _ in range(50):
        key = _md5(key[:16])
    key = key[:16]
    u = _rc4(key, _md5(_ENC_PAD + file_id))
    for i in range(1, 20):
        u = _rc4(bytes(b ^ i for b in key), u)
    u += b"\x00" * 16

    def enc_payload(num: int, raw: bytes) -> bytes:
        ok = _md5(key + num.to_bytes(3, "little") + b"\x00\x00" + b"sAlT")[:16]
        return _aes_cbc_pad_encrypt(ok, _md5(b"iv%d" % num)[:16], raw)

    out = _encrypt_streams(pdf, enc_payload)
    encnum, idhex = 90, file_id.hex().encode()
    return out.replace(
        b"trailer << /Root 1 0 R >>",
        b"%d 0 obj\n<< /Filter /Standard /V 4 /R 4 /Length 128 "
        b"/CF << /StdCF << /CFM /AESV2 /Length 16 >> >> "
        b"/StmF /StdCF /StrF /StdCF /O <%s> /U <%s> /P -1 >>\nendobj\n"
        b"trailer << /Root 1 0 R /Encrypt %d 0 R /ID [<%s> <%s>] >>"
        % (encnum, o.hex().encode(), u.hex().encode(), encnum, idhex, idhex))


def _hash_2b_test(pw: bytes, salt: bytes, udata: bytes = b"") -> bytes:
    """Test-side ISO 32000-2 Algorithm 2.B, written from the published
    algorithm text (round count ≥ 64, stop when last byte ≤ round − 32)."""
    import hashlib

    from openai_vector_search_demo_spark.sources.aes import cbc_encrypt
    k = hashlib.sha256(pw + salt + udata).digest()
    rounds = 0
    while rounds < 64 or e[-1] > rounds - 32:  # noqa: F821
        k1 = (pw + k + udata) * 64
        e = cbc_encrypt(k[:16], k[16:32], k1)
        digest = [hashlib.sha256, hashlib.sha384,
                  hashlib.sha512][sum(e[:16]) % 3]
        k = digest(e).digest()
        rounds += 1
    return k[:32]


def _encrypt_pdf_v5(pdf: bytes, r: int = 6, owner_pw: bytes = b"hunter2",
                    user_pw: bytes = b"") -> bytes:
    """Independent V5 /AESV3 encryptor (ISO 32000-2 §7.6.4 Algorithms
    8/9: U/UE from the user password, O/OE over U from the owner's)."""
    from openai_vector_search_demo_spark.sources.aes import cbc_encrypt
    hsh = _hash_2b_test if r == 6 else \
        (lambda pw, s, ud=b"": _sha256(pw + s + ud))
    file_key = _sha256(b"fixture-file-key-seed")          # any 32 bytes
    uvs, uks = b"UVALSALT", b"UKEYSALT"
    u = hsh(user_pw, uvs) + uvs + uks
    ue = cbc_encrypt(hsh(user_pw, uks), b"\x00" * 16, file_key)
    ovs, oks = b"OVALSALT", b"OKEYSALT"
    o = hsh(owner_pw, ovs, u) + ovs + oks
    oe = cbc_encrypt(hsh(owner_pw, oks, u), b"\x00" * 16, file_key)

    def enc_payload(num: int, raw: bytes) -> bytes:
        return _aes_cbc_pad_encrypt(file_key, _md5(b"iv%d" % num)[:16], raw)

    out = _encrypt_streams(pdf, enc_payload)
    encnum = 90
    return out.replace(
        b"trailer << /Root 1 0 R >>",
        b"%d 0 obj\n<< /Filter /Standard /V 5 /R %d /Length 256 "
        b"/CF << /StdCF << /CFM /AESV3 /Length 32 >> >> "
        b"/StmF /StdCF /StrF /StdCF "
        b"/O <%s> /U <%s> /OE <%s> /UE <%s> /P -1 >>\nendobj\n"
        b"trailer << /Root 1 0 R /Encrypt %d 0 R >>"
        % (encnum, r, o.hex().encode(), u.hex().encode(),
           oe.hex().encode(), ue.hex().encode(), encnum))


def test_aesv2_pdf_decrypts_with_empty_user_password():
    plain = make_pdf([_page(b"(aes secret text) Tj")])
    enc = _encrypt_pdf_aesv2(plain)
    assert b"aes secret text" not in enc
    assert extract_pdf_pages(enc) == extract_pdf_pages(plain)


def test_aesv2_pdf_with_real_user_password_raises():
    enc = _encrypt_pdf_aesv2(make_pdf([_page(b"(locked) Tj")]), user_pw=b"pw")
    with pytest.raises(PdfError, match="password"):
        extract_pdf_pages(enc)


@pytest.mark.parametrize("r", [5, 6])
def test_aesv3_pdf_decrypts_with_empty_user_password(r):
    plain = make_pdf([_page(b"(v5 secret text) Tj"),
                      _page(b"(second page) Tj")])
    enc = _encrypt_pdf_v5(plain, r=r)
    assert b"v5 secret text" not in enc
    assert extract_pdf_pages(enc) == extract_pdf_pages(plain)


def test_aesv3_empty_owner_password_unlocks_user_locked_file():
    """V5 files where the USER password is set but the owner password is
    empty still open (Algorithm 2.A falls through to the owner check)."""
    plain = make_pdf([_page(b"(owner route) Tj")])
    enc = _encrypt_pdf_v5(plain, r=6, owner_pw=b"", user_pw=b"realpw")
    assert extract_pdf_pages(enc) == extract_pdf_pages(plain)


def test_aesv3_pdf_with_both_passwords_set_raises():
    enc = _encrypt_pdf_v5(make_pdf([_page(b"(locked) Tj")]),
                          r=6, owner_pw=b"opw", user_pw=b"upw")
    with pytest.raises(PdfError, match="password"):
        extract_pdf_pages(enc)


def test_not_a_pdf_raises():
    with pytest.raises(PdfError, match="PDF"):
        extract_pdf_pages(b"PK\x03\x04 this is a zip")


def test_flate_compressed_stream_roundtrip():
    import zlib
    content = _page(b"(compressed text) Tj")
    comp = zlib.compress(content)
    pdf = make_pdf([b""])  # placeholder page, then patch its stream object
    pdf = pdf.replace(
        b"<< /Length 0 >>\nstream\n\nendstream",
        b"<< /Length %d /Filter /FlateDecode >>\nstream\n%s\nendstream"
        % (len(comp), comp))
    assert extract_pdf_pages(pdf) == ["compressed text"]


def test_tounicode_bfchar_and_both_bfrange_forms():
    cmap = b"""
    1 begincodespacerange <00><FF> endcodespacerange
    1 beginbfchar <41> <0058> endbfchar
    2 beginbfrange
    <61><63><0070>
    <70><71>[<0041><0042>]
    endbfrange
    """
    mapping, lengths = parse_tounicode(cmap)
    assert lengths == {1}
    assert mapping[0x41] == "X"
    assert (mapping[0x61], mapping[0x62], mapping[0x63]) == ("p", "q", "r")
    assert (mapping[0x70], mapping[0x71]) == ("A", "B")


def test_tounicode_whitespace_cluster_collapses():
    # Quartz subset quirk: one glyph → several same-appearance codepoints
    cmap = b"1 beginbfchar <32> < 0009 000d 0020 00a0 > endbfchar"
    mapping, _ = parse_tounicode(cmap)
    assert mapping[0x32] == " "


def test_winansi_encoding_decodes_high_bytes():
    # 0xE9 is é in WinAnsi (cp1252)
    pdf = make_pdf([_page(b"(caf\xe9) Tj")])
    assert extract_pdf_pages(pdf) == ["café"]


def test_corrupt_document_becomes_error_row_not_failure(spark, tmp_path):
    """One truncated PDF and one garbage DOCX in the directory: the job
    still succeeds, healthy files crack normally, and each bad document
    surfaces as ONE (doc_path, error) row — countable and reportable, not
    a silent gap (the reference's try/except→None at
    modules/utilities.py:43-45 loses the failure entirely)."""
    from openai_vector_search_demo_spark.plans.pipeline import crack_and_ingest
    from openai_vector_search_demo_spark.sources.doc_crack import (
        crack_documents,
        make_docx,
        read_raw,
    )
    good = make_pdf([_page(b"(fine) Tj")])
    (tmp_path / "good.pdf").write_bytes(good)
    (tmp_path / "trunc.pdf").write_bytes(good[:40])       # cut mid-object
    (tmp_path / "junk.docx").write_bytes(b"not a zip at all")
    (tmp_path / "ok.docx").write_bytes(make_docx(["hello"]))
    raw = read_raw(spark, str(tmp_path))
    rows = crack_documents(raw).collect()
    good_docs = {r.doc_path.rsplit("/", 1)[-1] for r in rows if r.error is None}
    bad = {r.doc_path.rsplit("/", 1)[-1]: r for r in rows if r.error is not None}
    assert good_docs == {"good.pdf", "ok.docx"}
    assert set(bad) == {"trunc.pdf", "junk.docx"}
    for r in bad.values():                  # error rows carry no page payload
        assert r.page_no is None and r.text is None and r.error
    # and the ingest pipeline consumes only the clean pages
    chunks = crack_and_ingest(raw).collect()
    assert {c.doc_path.rsplit("/", 1)[-1] for c in chunks} == \
        {"good.pdf", "ok.docx"}


# ---------------------------------------------------------------------------
# Spark 4 Python DataSource: spark.read.format("pdfpages")
# ---------------------------------------------------------------------------

def test_pdfpages_datasource_reads_directory(spark, tmp_path):
    from openai_vector_search_demo_spark.sources.pdf_datasource import (
        PdfPagesDataSource,
    )
    spark.dataSource.register(PdfPagesDataSource)
    (tmp_path / "a.pdf").write_bytes(
        make_pdf([_page(b"(alpha) Tj"), _page(b"(beta) Tj")]))
    (tmp_path / "b.pdf").write_bytes(make_pdf([_page(b"(gamma) Tj")]))
    (tmp_path / "broken.pdf").write_bytes(b"%PDF-1.4 truncated")
    (tmp_path / "note.txt").write_bytes(b"not a pdf, not listed")

    df = spark.read.format("pdfpages").load(str(tmp_path))
    rows = {(r.doc_path.rsplit("/", 1)[-1], r.page_no, r.text)
            for r in df.collect()}
    assert rows == {("a.pdf", 0, "alpha"), ("a.pdf", 1, "beta"),
                    ("b.pdf", 0, "gamma")}          # broken → 0 rows
    # one input partition per document = per-file parallelism
    assert df.rdd.getNumPartitions() == 3


@pytest.mark.skipif(not SAMPLE.exists(), reason="reference sample not present")
def test_pdfpages_datasource_sql_surface(spark, tmp_path):
    """The format works from pure SQL — PDF as a first-class table."""
    from openai_vector_search_demo_spark.sources.pdf_datasource import (
        PdfPagesDataSource,
    )
    spark.dataSource.register(PdfPagesDataSource)
    shutil.copy(SAMPLE, tmp_path / "recipes.pdf")
    spark.sql(f"CREATE OR REPLACE TEMPORARY VIEW pdf_pages "
              f"USING pdfpages OPTIONS (path '{tmp_path}')")
    n = spark.sql("SELECT COUNT(*) AS n FROM pdf_pages "
                  "WHERE length(text) > 0").first().n
    spark.catalog.dropTempView("pdf_pages")
    assert n == 15
