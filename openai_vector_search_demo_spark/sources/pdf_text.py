"""S1 — dependency-free PDF text extraction (pure stdlib: re + zlib).

The reference's primary input format is PDF, read one record per page via
LangChain's PyPDFLoader (modules/utilities.py:31-45; the uploader restricts
to pdf|docx at app/app.py:225).  This environment has no pypdf, so the
engine ships its own minimal extractor with the same *observable* contract:
``extract_pdf_pages(bytes) -> list[str]`` — one text string per physical
page, in page-tree order.

Scope (deliberately bounded, loud on anything outside it):

- Classic cross-reference PDFs AND object streams (PDF 1.5+ ``/ObjStm``) —
  objects are recovered by a full-file scan, so broken/incremental xref
  tables don't matter.
- Filters: FlateDecode (with PNG predictors), ASCIIHexDecode,
  ASCII85Decode, RunLengthDecode.  Anything else (DCT, JBIG2, CCITT) only
  ever carries images, which page text extraction skips.
- Text operators Tj ' " TJ with full graphics-state tracking (q/Q/cm,
  Tm/Td/TD/T*, Tf/Tc/Tw/TL) so line breaks come from *device-space* y
  movement and inter-word spaces from width-accounted x gaps — the same
  approach pypdf's layout extraction takes.
- Glyph decode precedence: /ToUnicode CMap (bfchar + bfrange, array and
  incrementing forms) → /Encoding (MacRoman/WinAnsi/Differences with an
  Adobe-Glyph-List subset) → Latin-1 fallback.  Composite (Type0) fonts
  decode 2-byte codes through their CMap codespace.
- Encryption: the FULL standard security handler with an EMPTY user (or
  empty owner, V5) password — RC4 V 1/2 (R 2/3, the classic 40/128-bit
  scheme), V 4 crypt filters (/CFM /V2 RC4 and /AESV2 AES-128-CBC,
  incl. /EncryptMetadata false key salting), and V 5 /AESV3 AES-256
  (R 5 simple-SHA-256 and R 6 iterated Algorithm-2.B derivations).  The
  block cipher is this package's own FIPS-197 implementation
  (``sources/aes.py``).  Documents that actually require a password, and
  non-Standard handlers (public-key /Adobe.PubSec), raise ``PdfError`` —
  loud failure, never garbage.

This is an original implementation against the public PDF 1.7 spec
(ISO 32000-1); the reference contains no PDF-parsing code to port.
"""

from __future__ import annotations

import re
import zlib

__all__ = ["extract_pdf_pages", "PdfError"]


class PdfError(ValueError):
    pass


# ---------------------------------------------------------------------------
# Object model + parser (PDF 1.7 §7.3 syntax)
# ---------------------------------------------------------------------------

_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"


class Name(str):
    """A /Name — distinct from a string value."""


class Ref:
    __slots__ = ("num", "gen")

    def __init__(self, num: int, gen: int):
        self.num, self.gen = num, gen

    def __repr__(self):  # pragma: no cover
        return f"{self.num} {self.gen} R"


class Stream:
    __slots__ = ("dict", "raw")

    def __init__(self, d: dict, raw: bytes):
        self.dict, self.raw = d, raw


def _skip_ws(data: bytes, i: int) -> int:
    n = len(data)
    while i < n:
        c = data[i]
        if c in _WS:
            i += 1
        elif c == 0x25:  # % comment → end of line
            while i < n and data[i] not in b"\r\n":
                i += 1
        else:
            break
    return i


_NUM_RE = re.compile(rb"[+-]?(?:\d+\.?\d*|\.\d+)")
_REF_RE = re.compile(rb"(\d+)[\x00\t\n\x0c\r ]+(\d+)[\x00\t\n\x0c\r ]+R\b")


def _parse_object(data: bytes, i: int):
    """Parse one object starting at ``i``; return (value, next_pos)."""
    i = _skip_ws(data, i)
    if i >= len(data):
        raise PdfError("unexpected EOF")
    c = data[i]
    if data.startswith(b"<<", i):
        return _parse_dict(data, i)
    if c == 0x3C:  # '<' hex string
        j = data.index(b">", i + 1)
        hx = re.sub(rb"[^0-9A-Fa-f]", b"", data[i + 1:j])
        if len(hx) % 2:
            hx += b"0"
        return bytes.fromhex(hx.decode("ascii")), j + 1
    if c == 0x28:  # '(' literal string
        return _parse_litstring(data, i)
    if c == 0x2F:  # '/' name
        j = i + 1
        while j < len(data) and data[j] not in _WS and data[j] not in _DELIM:
            j += 1
        return Name(_decode_name(data[i + 1:j])), j
    if c == 0x5B:  # '['
        out = []
        i += 1
        while True:
            i = _skip_ws(data, i)
            if data[i] == 0x5D:
                return out, i + 1
            v, i = _parse_object(data, i)
            out.append(v)
    m = _REF_RE.match(data, i)
    if m:
        return Ref(int(m.group(1)), int(m.group(2))), m.end()
    m = _NUM_RE.match(data, i)
    if m:
        s = m.group(0)
        v = float(s) if b"." in s else int(s)
        return v, m.end()
    for kw, v in ((b"true", True), (b"false", False), (b"null", None)):
        if data.startswith(kw, i):
            return v, i + len(kw)
    raise PdfError(f"cannot parse object at byte {i}: {data[i:i+20]!r}")


def _decode_name(raw: bytes) -> str:
    # #xx hex escapes inside names (PDF 1.7 §7.3.5)
    return re.sub(rb"#([0-9A-Fa-f]{2})",
                  lambda m: bytes([int(m.group(1), 16)]), raw) \
        .decode("latin-1")


def _parse_litstring(data: bytes, i: int):
    out = bytearray()
    depth = 0
    i += 1
    n = len(data)
    while i < n:
        c = data[i]
        if c == 0x5C:  # backslash
            i += 1
            e = data[i]
            if e in b"nrtbf":
                out += {0x6E: b"\n", 0x72: b"\r", 0x74: b"\t",
                        0x62: b"\b", 0x66: b"\x0c"}[e]
                i += 1
            elif 0x30 <= e <= 0x37:  # octal, up to 3 digits
                j = i
                while j < i + 3 and j < n and 0x30 <= data[j] <= 0x37:
                    j += 1
                out.append(int(data[i:j], 8) & 0xFF)
                i = j
            elif e in b"\r\n":  # line continuation
                i += 1
                if e == 0x0D and i < n and data[i] == 0x0A:
                    i += 1
            else:
                out.append(e)
                i += 1
        elif c == 0x28:
            depth += 1
            out.append(c)
            i += 1
        elif c == 0x29:
            if depth == 0:
                return bytes(out), i + 1
            depth -= 1
            out.append(c)
            i += 1
        else:
            out.append(c)
            i += 1
    raise PdfError("unterminated string")


def _parse_dict(data: bytes, i: int):
    d: dict = {}
    i += 2
    while True:
        i = _skip_ws(data, i)
        if data.startswith(b">>", i):
            return d, i + 2
        if data[i] != 0x2F:
            raise PdfError(f"dict key is not a name at byte {i}")
        k, i = _parse_object(data, i)
        v, i = _parse_object(data, i)
        d[str(k)] = v


# ---------------------------------------------------------------------------
# Filters (PDF 1.7 §7.4)
# ---------------------------------------------------------------------------

def _png_unpredict(data: bytes, columns: int, colors: int, bpc: int) -> bytes:
    rowlen = max(1, (columns * colors * bpc + 7) // 8)
    stride = max(1, colors * bpc // 8)
    out = bytearray()
    prev = bytearray(rowlen)
    pos = 0
    while pos + 1 <= len(data):
        ft = data[pos]
        row = bytearray(data[pos + 1:pos + 1 + rowlen])
        pos += 1 + rowlen
        for x in range(len(row)):
            a = row[x - stride] if x >= stride else 0
            b = prev[x]
            c = prev[x - stride] if x >= stride else 0
            if ft == 1:
                row[x] = (row[x] + a) & 0xFF
            elif ft == 2:
                row[x] = (row[x] + b) & 0xFF
            elif ft == 3:
                row[x] = (row[x] + (a + b) // 2) & 0xFF
            elif ft == 4:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                row[x] = (row[x] + pred) & 0xFF
        out += row
        prev = row
    return bytes(out)


def _apply_filter(name: str, data: bytes, parms: dict) -> bytes:
    if name in ("FlateDecode", "Fl"):
        try:
            data = zlib.decompress(data)
        except zlib.error:
            data = zlib.decompressobj().decompress(data)  # tolerate tail junk
        pred = int(parms.get("Predictor", 1) or 1)
        if pred >= 10:
            data = _png_unpredict(data, int(parms.get("Columns", 1)),
                                  int(parms.get("Colors", 1)),
                                  int(parms.get("BitsPerComponent", 8)))
        return data
    if name in ("ASCIIHexDecode", "AHx"):
        hx = re.sub(rb"[^0-9A-Fa-f>]", b"", data).split(b">")[0]
        if len(hx) % 2:
            hx += b"0"
        return bytes.fromhex(hx.decode("ascii"))
    if name in ("ASCII85Decode", "A85"):
        body = re.sub(rb"\s", b"", data)
        body = body.removeprefix(b"<~").split(b"~>")[0]
        import base64
        return base64.a85decode(body)
    if name in ("RunLengthDecode", "RL"):
        out = bytearray()
        i = 0
        while i < len(data):
            l = data[i]
            if l == 128:
                break
            if l < 128:
                out += data[i + 1:i + 2 + l]
                i += 2 + l
            else:
                out += data[i + 1:i + 2] * (257 - l)
                i += 2
        return bytes(out)
    raise PdfError(f"unsupported stream filter {name}")


# ---------------------------------------------------------------------------
# Document: object store, page tree
# ---------------------------------------------------------------------------

_OBJ_RE = re.compile(rb"(\d+)[\x00\t\n\x0c\r ]+(\d+)[\x00\t\n\x0c\r ]+obj\b")


# ---------------------------------------------------------------------------
# Encryption — standard security handler, RC4 (PDF 1.7 §7.6.2-7.6.4)
# ---------------------------------------------------------------------------

_ENC_PAD = bytes.fromhex(
    "28BF4E5E4E758A4164004E56FFFA01082E2E00B6D0683E802F0CA9FE6453697A")


def _rc4(key: bytes, data: bytes) -> bytes:
    """RC4 stream cipher (public algorithm; symmetric encrypt/decrypt)."""
    S = list(range(256))
    j = 0
    klen = len(key)
    for i in range(256):
        j = (j + S[i] + key[i % klen]) & 0xFF
        S[i], S[j] = S[j], S[i]
    out = bytearray(len(data))
    i = j = 0
    for n, c in enumerate(data):
        i = (i + 1) & 0xFF
        j = (j + S[i]) & 0xFF
        S[i], S[j] = S[j], S[i]
        out[n] = c ^ S[(S[i] + S[j]) & 0xFF]
    return bytes(out)


def _hash_2b(pw: bytes, salt: bytes, udata: bytes = b"") -> bytes:
    """ISO 32000-2 Algorithm 2.B (the R 6 iterated password hash):
    SHA-256 seed, then rounds of AES-128-CBC over 64 repetitions of
    (password ‖ K ‖ udata) with the digest algorithm chosen by the
    ciphertext — at least 64 rounds, stopping when the last ciphertext
    byte ≤ round − 32."""
    import hashlib

    from .aes import cbc_encrypt

    k = hashlib.sha256(pw + salt + udata).digest()
    i = 0
    while True:
        k1 = (pw + k + udata) * 64
        e = cbc_encrypt(k[:16], k[16:32], k1)
        k = (hashlib.sha256, hashlib.sha384, hashlib.sha512)[
            sum(e[:16]) % 3](e).digest()
        i += 1
        if i >= 64 and e[-1] <= i - 32:
            return k[:32]


class _StandardDecryptor:
    """File-key derivation + per-object decryption for the standard
    security handler with an EMPTY password (PDF 1.7 §7.6.3 Algorithms
    1-6; PDF 2.0 §7.6.4 Algorithms 2.A/2.B for V 5).

    Supported: V 1/2 RC4 (R 2/3), V 4 crypt filters (/CFM /V2 RC4 and
    /AESV2 AES-128-CBC, R 4), and V 5 /AESV3 AES-256-CBC (R 5/6 — both
    the empty *user* password and, V5 only, the empty *owner* password
    unlock).  Non-Standard handlers (e.g. public-key /Adobe.PubSec),
    split /StmF≠/StrF filters, and documents needing a real password
    raise ``PdfError`` with an explicit reason.
    """

    def __init__(self, enc: dict, file_id: bytes):
        import hashlib

        filt = str(enc.get("Filter") or "")
        v = int(enc.get("V") or 0)
        r = int(enc.get("R") or 0)
        o, u = enc.get("O"), enc.get("U")
        if not isinstance(o, bytes) or not isinstance(u, bytes):
            raise PdfError("malformed /Encrypt dictionary (O/U not strings)")
        if filt != "Standard":
            raise PdfError(
                f"unsupported encryption handler {filt!r}: only the "
                "Standard security handler is implemented")

        self.mode = "rc4"  # "rc4" | "aesv2" | "aesv3" | "identity"
        encrypt_metadata = enc.get("EncryptMetadata", True) is not False

        if v in (1, 2) and r in (2, 3):
            nbytes = (int(enc.get("Length") or 40) // 8) if v == 2 else 5
        elif v == 4 and r == 4:
            # crypt filters: this decryptor applies ONE transform to every
            # string and stream, so /StmF and /StrF must agree
            cf = enc.get("CF") or {}
            stmf, strf = (str(enc.get(k) or "Identity")
                          for k in ("StmF", "StrF"))
            if stmf != strf:
                raise PdfError(
                    f"unsupported split crypt filters StmF={stmf} StrF={strf}")
            if stmf == "Identity":
                self.mode = "identity"
                self.key = b""
                return
            cfd = cf.get(stmf)
            if not isinstance(cfd, dict):
                raise PdfError(f"crypt filter {stmf!r} not in /CF")
            cfm = str(cfd.get("CFM") or "")
            if cfm == "AESV2":
                self.mode = "aesv2"
            elif cfm != "V2":
                raise PdfError(f"unsupported crypt filter method {cfm!r}")
            # /Length is bytes in CF dicts (5..16) but bits (40..128) in
            # the top-level dict and in some writers' CF dicts — disambiguate
            length = int(cfd.get("Length") or enc.get("Length") or 128)
            nbytes = length // 8 if length >= 40 else length
        elif v == 5 and r in (5, 6):
            self._init_v5(enc, r, o, u)
            return
        else:
            raise PdfError(
                f"unsupported encryption (Filter={filt!r} V={v} R={r})")

        if not 5 <= nbytes <= 16:
            raise PdfError(f"illegal key length {nbytes * 8}")
        p = int(enc.get("P", -1)) & 0xFFFFFFFF
        # Algorithm 2: file key from the (empty, padded) user password
        seed = (_ENC_PAD + o[:32] + p.to_bytes(4, "little") + file_id
                + (b"" if encrypt_metadata else b"\xff\xff\xff\xff"))
        h = hashlib.md5(seed).digest()
        if r >= 3:
            for _ in range(50):
                h = hashlib.md5(h[:nbytes]).digest()
        self.key = h[:nbytes]
        # Algorithms 4/5 + 6: does the empty user password open this file?
        if r == 2:
            ok = _rc4(self.key, _ENC_PAD) == u[:32]
        else:
            d = hashlib.md5(_ENC_PAD + file_id).digest()
            d = _rc4(self.key, d)
            for i in range(1, 20):
                d = _rc4(bytes(b ^ i for b in self.key), d)
            ok = d == u[:16]
        if not ok:
            raise PdfError("encrypted PDF requires a password "
                           "(empty user password rejected)")

    def _init_v5(self, enc: dict, r: int, o: bytes, u: bytes) -> None:
        """V 5 /AESV3: Algorithm 2.A — validate the empty password against
        /U (user) or /O (owner), then unwrap the 256-bit file key from
        /UE / /OE with unpadded AES-CBC (iv = 0)."""
        import hashlib

        from .aes import cbc_decrypt

        self.mode = "aesv3"
        ue, oe = enc.get("UE"), enc.get("OE")
        if len(u) < 48 or not isinstance(ue, bytes):
            raise PdfError("malformed V5 /Encrypt dictionary (U/UE)")
        hsh = (_hash_2b if r == 6
               else lambda pw, s, ud=b"": hashlib.sha256(pw + s + ud).digest())
        if hsh(b"", u[32:40]) == u[:32]:                    # user password
            ik = hsh(b"", u[40:48])
            wrapped = ue
        elif (len(o) >= 48 and isinstance(oe, bytes)
              and hsh(b"", o[32:40], u[:48]) == o[:32]):    # owner password
            ik = hsh(b"", o[40:48], u[:48])
            wrapped = oe
        else:
            raise PdfError("encrypted PDF requires a password "
                           "(empty user/owner password rejected)")
        self.key = cbc_decrypt(ik, b"\x00" * 16, wrapped[:32])[:32]

    def obj_key(self, num: int, gen: int) -> bytes:
        import hashlib
        salt = b"sAlT" if self.mode == "aesv2" else b""  # §7.6.2 step (b)
        d = hashlib.md5(self.key + num.to_bytes(3, "little")
                        + gen.to_bytes(2, "little") + salt).digest()
        return d[:min(len(self.key) + 5, 16)]

    def decrypt(self, num: int, gen: int, data: bytes) -> bytes:
        if self.mode == "identity":
            return data
        if self.mode == "rc4":
            return _rc4(self.obj_key(num, gen), data)
        from .aes import cbc_decrypt
        key = self.key if self.mode == "aesv3" else self.obj_key(num, gen)
        if len(data) < 16:
            return b""      # malformed: no room for the leading IV
        body = data[16:]
        body = body[:len(body) // 16 * 16]
        if not body:
            return b""
        out = cbc_decrypt(key, data[:16], body)
        pad = out[-1]       # PKCS#7-style padding (§7.6.2: 1..16 always)
        return out[:-pad] if 1 <= pad <= 16 else out


class PdfDocument:
    def __init__(self, data: bytes):
        self.data = data
        self.objects: dict[int, object] = {}
        self._gens: dict[int, int] = {}
        self._scan()
        # decrypt BEFORE ObjStm expansion: members live inside encrypted
        # container streams and are plaintext once those are decrypted
        self._setup_decryption()
        self._expand_object_streams()

    # -- object recovery ---------------------------------------------------
    def _scan(self) -> None:
        """Recover every ``N G obj`` in file order (later wins — that is
        exactly incremental-update semantics, and it sidesteps damaged or
        exotic xref tables entirely)."""
        data = self.data
        for m in _OBJ_RE.finditer(data):
            num = int(m.group(1))
            self._gens[num] = int(m.group(2))
            try:
                val, end = _parse_object(data, m.end())
            except (PdfError, ValueError, IndexError):
                continue
            if isinstance(val, dict):
                j = _skip_ws(data, end)
                if data.startswith(b"stream", j):
                    j += 6
                    if data.startswith(b"\r\n", j):
                        j += 2
                    elif data.startswith(b"\n", j) or data.startswith(b"\r", j):
                        j += 1
                    length = val.get("Length")
                    raw = None
                    if isinstance(length, int):
                        cand = data[j:j + length]
                        if data[j + length:].lstrip(bytes(_WS)) \
                                .startswith(b"endstream"):
                            raw = cand
                    if raw is None:  # indirect/wrong Length → scan
                        e = data.find(b"endstream", j)
                        if e < 0:
                            continue
                        raw = data[j:e].rstrip(b"\r\n")
                    val = Stream(val, raw)
            self.objects[num] = val

    def _expand_object_streams(self) -> None:
        """PDF 1.5 compressed objects: /Type/ObjStm holds N first-class
        objects; parse them out so lookup is uniform."""
        for num in list(self.objects):
            v = self.objects[num]
            if not (isinstance(v, Stream)
                    and v.dict.get("Type") == "ObjStm"):
                continue
            try:
                body = self.stream_data(v)
                n = int(self.resolve(v.dict["N"]))
                first = int(self.resolve(v.dict["First"]))
                header = body[:first].split()
                for k in range(n):
                    onum = int(header[2 * k])
                    off = int(header[2 * k + 1])
                    if onum in self.objects and not isinstance(
                            self.objects.get(onum), Stream):
                        # a full-file-scan object of the same number exists;
                        # ObjStm members are only reachable via xref streams
                        # we did not read, so scanned objects win
                        if onum in self.objects:
                            continue
                    val, _ = _parse_object(body, first + off)
                    self.objects.setdefault(onum, val)
            except (PdfError, ValueError, KeyError, IndexError):
                continue

    def _setup_decryption(self) -> None:
        """Find /Encrypt (classic ``trailer`` dicts AND xref-stream dicts),
        derive the file key, and decrypt every string and stream in place.
        No-op for unencrypted files."""
        enc_src: dict | None = None
        for m in re.finditer(rb"trailer", self.data):
            try:
                d, _ = _parse_object(self.data, m.end())
            except (PdfError, ValueError, IndexError):
                continue
            if isinstance(d, dict) and "Encrypt" in d:
                enc_src = d
                break
        if enc_src is None:  # PDF 1.5+: trailer fields live on /Type/XRef
            for v in self.objects.values():
                if (isinstance(v, Stream) and v.dict.get("Type") == "XRef"
                        and "Encrypt" in v.dict):
                    enc_src = v.dict
                    break
        if enc_src is None:
            return
        enc_ref = enc_src["Encrypt"]
        enc_num = enc_ref.num if isinstance(enc_ref, Ref) else None
        enc = self.resolve(enc_ref)
        if not isinstance(enc, dict):
            raise PdfError("unresolvable /Encrypt dictionary")
        ids = self.resolve(enc_src.get("ID")) or []
        file_id = ids[0] if (isinstance(ids, list) and ids
                             and isinstance(ids[0], bytes)) else b""
        dec = _StandardDecryptor({k: self.resolve(v) for k, v in enc.items()},
                                 file_id)

        def dec_strings(v, num: int, gen: int):
            if isinstance(v, bytes):
                return dec.decrypt(num, gen, v)
            if isinstance(v, list):
                return [dec_strings(x, num, gen) for x in v]
            if isinstance(v, dict):
                return {k: dec_strings(x, num, gen) for k, x in v.items()}
            return v

        for num, val in self.objects.items():
            if num == enc_num:
                continue  # O/U in the encrypt dict are never encrypted
            gen = self._gens.get(num, 0)
            if isinstance(val, Stream):
                if val.dict.get("Type") == "XRef":
                    continue  # xref streams are never encrypted (§7.5.8.2)
                val.dict = dec_strings(val.dict, num, gen)
                val.raw = dec.decrypt(num, gen, val.raw)
            else:
                self.objects[num] = dec_strings(val, num, gen)

    # -- access ------------------------------------------------------------
    def resolve(self, v):
        seen = 0
        while isinstance(v, Ref):
            v = self.objects.get(v.num)
            seen += 1
            if seen > 32:
                raise PdfError("reference cycle")
        return v

    def stream_data(self, s: Stream) -> bytes:
        filters = self.resolve(s.dict.get("Filter"))
        parms = self.resolve(s.dict.get("DecodeParms")) or {}
        if filters is None:
            return s.raw
        if not isinstance(filters, list):
            filters, parms = [filters], [parms]
        elif not isinstance(parms, list):
            parms = [parms] * len(filters)
        data = s.raw
        for f, p in zip(filters, parms):
            data = _apply_filter(str(f), data, self.resolve(p) or {})
        return data

    def catalog(self) -> dict:
        for v in self.objects.values():
            v = v.dict if isinstance(v, Stream) else v
            if isinstance(v, dict) and v.get("Type") == "Catalog":
                cat = v
        try:
            return cat
        except UnboundLocalError:
            raise PdfError("no document catalog found") from None

    def pages(self) -> list[tuple[dict, dict]]:
        """Page-tree order walk → [(page_dict, inherited_attrs)]."""
        out: list[tuple[dict, dict]] = []
        root = self.resolve(self.catalog().get("Pages"))
        if not isinstance(root, dict):
            raise PdfError("catalog has no /Pages tree")

        def walk(node: dict, inherited: dict, depth: int) -> None:
            if depth > 64:
                raise PdfError("page tree too deep")
            inh = dict(inherited)
            for k in ("Resources", "MediaBox", "Rotate"):
                if k in node:
                    inh[k] = node[k]
            if node.get("Type") == "Page":
                out.append((node, inh))
                return
            for kid in self.resolve(node.get("Kids")) or []:
                kid = self.resolve(kid)
                if isinstance(kid, dict):
                    walk(kid, inh, depth + 1)

        walk(root, {}, 0)
        return out

    def page_content(self, page: dict) -> bytes:
        c = self.resolve(page.get("Contents"))
        parts = c if isinstance(c, list) else [c]
        chunks = []
        for p in parts:
            p = self.resolve(p)
            if isinstance(p, Stream):
                chunks.append(self.stream_data(p))
        return b"\n".join(chunks)


# ---------------------------------------------------------------------------
# Glyph decoding: ToUnicode CMaps, base encodings, AGL subset
# ---------------------------------------------------------------------------

_HEX_RE = re.compile(rb"<([0-9A-Fa-f\s]*)>")


def _hex_bytes(tok: bytes) -> bytes:
    hx = re.sub(rb"\s", b"", tok)
    if len(hx) % 2:
        hx += b"0"
    return bytes.fromhex(hx.decode("ascii"))


_WS_CHARS = set(" \t\r\n ")
_HYPHENS = set("-­‐‑‒–—")


def _utf16(b: bytes) -> str:
    try:
        s = b.decode("utf-16-be")
    except UnicodeDecodeError:
        s = b.decode("utf-16-be", "ignore")
    # Quartz subset fonts map one glyph to a CLUSTER of same-appearance
    # codepoints (e.g. <32> → tab CR space nbsp) — collapse those to one
    # character; genuine multi-char targets (ligatures: ffi) pass through
    if len(s) > 1:
        if set(s) <= _WS_CHARS:
            return " "
        if set(s) <= _HYPHENS:
            return "-"
    return s


def parse_tounicode(data: bytes) -> tuple[dict[int, str], set[int]]:
    """CMap → (code → text, code byte-lengths).  Handles bfchar, both
    bfrange forms, and multi-UTF16-unit targets (Quartz subset fonts map one
    code to several candidate codepoints; the full mapped string is kept,
    per spec)."""
    mapping: dict[int, str] = {}
    lengths: set[int] = set()
    for m in re.finditer(rb"begincodespacerange(.*?)endcodespacerange",
                         data, re.S):
        for h in _HEX_RE.findall(m.group(1)):
            lengths.add(len(_hex_bytes(h)))
    for m in re.finditer(rb"beginbfchar(.*?)endbfchar", data, re.S):
        toks = _HEX_RE.findall(m.group(1))
        for src, dst in zip(toks[0::2], toks[1::2]):
            sb = _hex_bytes(src)
            lengths.add(len(sb))
            mapping[int.from_bytes(sb, "big")] = _utf16(_hex_bytes(dst))
    for m in re.finditer(rb"beginbfrange(.*?)endbfrange", data, re.S):
        body = m.group(1)
        i = 0
        while True:
            toks = []
            j = i
            # one range = <lo> <hi> then either <dst> or [ <d> ... ]
            mm = _HEX_RE.search(body, j)
            if not mm:
                break
            lo_b = _hex_bytes(mm.group(1))
            mm2 = _HEX_RE.search(body, mm.end())
            if not mm2:
                break
            hi_b = _hex_bytes(mm2.group(1))
            lengths.add(len(lo_b))
            lo = int.from_bytes(lo_b, "big")
            hi = int.from_bytes(hi_b, "big")
            k = _skip_ws(body, mm2.end())
            if k < len(body) and body[k] == 0x5B:  # array form
                end = body.index(b"]", k)
                dsts = _HEX_RE.findall(body[k:end])
                for off, d in enumerate(dsts):
                    if lo + off <= hi:
                        mapping[lo + off] = _utf16(_hex_bytes(d))
                i = end + 1
            else:
                mm3 = _HEX_RE.search(body, k)
                if not mm3:
                    break
                base = _hex_bytes(mm3.group(1))
                base_i = int.from_bytes(base, "big") if base else 0
                span = min(hi - lo, 0xFFFF)
                for off in range(span + 1):
                    mapping[lo + off] = _utf16(
                        (base_i + off).to_bytes(max(len(base), 2), "big"))
                i = mm3.end()
            del toks, j
    return mapping, (lengths or {1})


# Adobe Glyph List subset — covers Latin text PDFs' /Differences arrays.
_AGL: dict[str, str] = {
    "space": " ", "exclam": "!", "quotedbl": '"', "numbersign": "#",
    "dollar": "$", "percent": "%", "ampersand": "&", "quotesingle": "'",
    "parenleft": "(", "parenright": ")", "asterisk": "*", "plus": "+",
    "comma": ",", "hyphen": "-", "period": ".", "slash": "/",
    "zero": "0", "one": "1", "two": "2", "three": "3", "four": "4",
    "five": "5", "six": "6", "seven": "7", "eight": "8", "nine": "9",
    "colon": ":", "semicolon": ";", "less": "<", "equal": "=",
    "greater": ">", "question": "?", "at": "@", "bracketleft": "[",
    "backslash": "\\", "bracketright": "]", "asciicircum": "^",
    "underscore": "_", "grave": "`", "braceleft": "{", "bar": "|",
    "braceright": "}", "asciitilde": "~", "quoteleft": "‘",
    "quoteright": "’", "quotedblleft": "“",
    "quotedblright": "”", "endash": "–", "emdash": "—",
    "bullet": "•", "ellipsis": "…", "fi": "ﬁ",
    "fl": "ﬂ", "degree": "°", "copyright": "©",
    "registered": "®", "trademark": "™", "nbspace": " ",
    "minus": "−", "fraction": "⁄", "dagger": "†",
    "daggerdbl": "‡", "periodcentered": "·",
    "quotesinglbase": "‚", "quotedblbase": "„",
    "guillemotleft": "«", "guillemotright": "»",
    "germandbls": "ß", "ae": "æ", "AE": "Æ",
    "oslash": "ø", "Oslash": "Ø", "oe": "œ", "OE": "Œ",
    "cent": "¢", "sterling": "£", "yen": "¥",
    "Euro": "€", "section": "§", "paragraph": "¶",
}
for _ch in "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ":
    _AGL[_ch] = _ch
_ACCENT = {"grave": "̀", "acute": "́", "circumflex": "̂",
           "tilde": "̃", "dieresis": "̈", "ring": "̊",
           "cedilla": "̧", "macron": "̄", "breve": "̆",
           "caron": "̌", "hungarumlaut": "̋", "ogonek": "̨",
           "dotaccent": "̇"}


def _glyph_to_text(name: str) -> str:
    if name in _AGL:
        return _AGL[name]
    m = re.fullmatch(r"uni([0-9A-Fa-f]{4,6})", name)
    if m:
        return chr(int(m.group(1)[:6], 16))
    m = re.fullmatch(r"u([0-9A-Fa-f]{4,6})", name)
    if m:
        return chr(int(m.group(1), 16))
    # composed accents: Aacute, edieresis, ...
    for acc, comb in _ACCENT.items():
        if name.endswith(acc) and name[:-len(acc)] in _AGL:
            import unicodedata
            return unicodedata.normalize(
                "NFC", _AGL[name[:-len(acc)]] + comb)
    return ""  # unknown glyph → drop rather than emit noise


def _base_decode(enc: str | None):
    if enc == "MacRomanEncoding":
        return lambda b: bytes([b]).decode("mac_roman", "replace")
    if enc == "WinAnsiEncoding":
        return lambda b: bytes([b]).decode("cp1252", "replace")
    return lambda b: bytes([b]).decode("latin-1", "replace")


class FontDecoder:
    """One per /Font resource: code bytes → text + glyph advance widths."""

    def __init__(self, doc: PdfDocument, font: dict):
        self.two_byte = False
        self.cmap: dict[int, str] = {}
        self.code_to_text = None
        self.widths: dict[int, float] = {}
        self.default_width = 500.0

        subtype = str(font.get("Subtype", ""))
        tu = doc.resolve(font.get("ToUnicode"))
        if isinstance(tu, Stream):
            self.cmap, lengths = parse_tounicode(doc.stream_data(tu))
            self.two_byte = 2 in lengths and 1 not in lengths

        if subtype == "Type0":
            self.two_byte = True  # Identity-H et al: 2-byte codes
            desc = doc.resolve(font.get("DescendantFonts"))
            d0 = doc.resolve(desc[0]) if desc else {}
            self.default_width = float(doc.resolve(d0.get("DW", 1000)) or 1000)
            w = doc.resolve(d0.get("W")) or []
            i = 0
            while i < len(w):
                first = int(doc.resolve(w[i]))
                nxt = doc.resolve(w[i + 1]) if i + 1 < len(w) else None
                if isinstance(nxt, list):
                    for off, wid in enumerate(nxt):
                        self.widths[first + off] = float(doc.resolve(wid))
                    i += 2
                else:
                    last, wid = int(nxt), float(doc.resolve(w[i + 2]))
                    for c in range(first, last + 1):
                        self.widths[c] = wid
                    i += 3
        else:
            fc = doc.resolve(font.get("FirstChar"))
            ws = doc.resolve(font.get("Widths"))
            if isinstance(fc, int) and isinstance(ws, list):
                for off, wid in enumerate(ws):
                    wid = doc.resolve(wid)
                    if isinstance(wid, (int, float)):
                        self.widths[fc + off] = float(wid)
            fd = doc.resolve(font.get("FontDescriptor"))
            if isinstance(fd, dict) and "MissingWidth" in fd:
                self.default_width = float(doc.resolve(fd["MissingWidth"]))

            enc = doc.resolve(font.get("Encoding"))
            base, diffs = None, {}
            if isinstance(enc, dict):
                base = str(enc.get("BaseEncoding")) \
                    if "BaseEncoding" in enc else None
                cur = 0
                for item in doc.resolve(enc.get("Differences")) or []:
                    item = doc.resolve(item)
                    if isinstance(item, (int, float)):
                        cur = int(item)
                    else:
                        diffs[cur] = _glyph_to_text(str(item))
                        cur += 1
            elif enc is not None:
                base = str(enc)
            dec = _base_decode(base)
            self.encoding_map = {**{c: dec(c) for c in range(256)}, **diffs}

    def decode(self, raw: bytes) -> list[tuple[int, str]]:
        """bytes → [(code, text)] honoring 1- vs 2-byte codespace."""
        out = []
        if self.two_byte:
            for i in range(0, len(raw) - len(raw) % 2, 2):
                code = int.from_bytes(raw[i:i + 2], "big")
                out.append((code, self._text_of(code)))
        else:
            for b in raw:
                out.append((b, self._text_of(b)))
        return out

    def _text_of(self, code: int) -> str:
        if code in self.cmap:
            return self.cmap[code]
        if not self.two_byte and hasattr(self, "encoding_map"):
            return self.encoding_map.get(code, "")
        return ""

    def width(self, code: int) -> float:
        return self.widths.get(code, self.default_width)


# ---------------------------------------------------------------------------
# Content-stream interpreter (PDF 1.7 §9 text objects)
# ---------------------------------------------------------------------------

def _mat_mul(a, b):
    return (a[0] * b[0] + a[1] * b[2],
            a[0] * b[1] + a[1] * b[3],
            a[2] * b[0] + a[3] * b[2],
            a[2] * b[1] + a[3] * b[3],
            a[4] * b[0] + a[5] * b[2] + b[4],
            a[4] * b[1] + a[5] * b[3] + b[5])


_IDENT = (1.0, 0.0, 0.0, 1.0, 0.0, 0.0)

_OP_RE = re.compile(rb"[^\x00\t\n\x0c\r ()<>\[\]{}/%]+")


class _PageText:
    """Accumulates show-text fragments with device-space positions, then
    renders lines by y (descending) and x order."""

    def __init__(self):
        self.frags: list[tuple[float, float, float, str]] = []  # y, x, xe, t

    def add(self, x: float, y: float, x_end: float, text: str):
        if text:
            self.frags.append((round(y, 2), x, x_end, text))

    def render(self) -> str:
        if not self.frags:
            return ""
        # group into lines: sort by y desc, then x asc; new line when y
        # drops by > half the typical gap (fixed 2pt tolerance — device
        # space is 1/72 inch so 2pt is sub-line-height for any real text)
        frags = sorted(self.frags, key=lambda f: (-f[0], f[1]))
        lines: list[list[tuple[float, float, str]]] = []
        cur_y = None
        for y, x, xe, t in frags:
            if cur_y is None or cur_y - y > 2.0:
                lines.append([])
                cur_y = y
            lines[-1].append((x, xe, t))
        out_lines = []
        for line in lines:
            line.sort(key=lambda f: f[0])
            buf = ""
            prev_end = None
            for x, xe, t in line:
                if prev_end is not None and x - prev_end > 1.0 \
                        and buf and not buf.endswith(" ") \
                        and not t.startswith(" "):
                    buf += " "
                buf += t
                prev_end = xe
            out_lines.append(buf)
        return "\n".join(out_lines)


class _TextState:
    __slots__ = ("tm", "tlm", "ctm", "stack", "font", "size", "tc", "tw",
                 "tl", "th")

    def __init__(self):
        self.ctm = _IDENT
        self.stack: list[tuple] = []
        self.tm = _IDENT
        self.tlm = _IDENT
        self.font: FontDecoder | None = None
        self.size = 0.0
        self.tc = 0.0   # char spacing
        self.tw = 0.0   # word spacing
        self.tl = 0.0   # leading
        self.th = 1.0   # horizontal scale


def _render_page(doc: PdfDocument, content: bytes, fonts: dict[str, FontDecoder],
                 xobjects: dict, depth: int = 0) -> _PageText:
    page = _PageText()
    _exec_content(doc, content, fonts, xobjects, page, _TextState(), depth)
    return page


def _exec_content(doc, content, fonts, xobjects, page, st, depth) -> None:
    if depth > 8:
        return
    stack: list = []  # operand stack
    i, n = 0, len(content)
    while i < n:
        i = _skip_ws(content, i)
        if i >= n:
            break
        c = content[i]
        if c == 0x5B:  # array operand (TJ) — parse inline
            arr = []
            i += 1
            while True:
                i = _skip_ws(content, i)
                if i >= n or content[i] == 0x5D:
                    i += 1
                    break
                if content[i] == 0x28:
                    s, i = _parse_litstring(content, i)
                    arr.append(s)
                elif content[i] == 0x3C:
                    j = content.index(b">", i + 1)
                    arr.append(_hex_bytes(content[i + 1:j]))
                    i = j + 1
                else:
                    m = _NUM_RE.match(content, i)
                    if not m:
                        i += 1
                        continue
                    arr.append(float(m.group(0)))
                    i = m.end()
            stack.append(arr)
            continue
        if c == 0x28:
            s, i = _parse_litstring(content, i)
            stack.append(s)
            continue
        if content.startswith(b"<<", i):
            d, i = _parse_dict(content, i)
            stack.append(d)
            continue
        if c == 0x3C:
            j = content.index(b">", i + 1)
            stack.append(_hex_bytes(content[i + 1:j]))
            i = j + 1
            continue
        if c == 0x2F:
            j = i + 1
            while j < n and content[j] not in _WS and content[j] not in _DELIM:
                j += 1
            stack.append(Name(_decode_name(content[i + 1:j])))
            i = j
            continue
        m = _NUM_RE.match(content, i)
        if m:
            stack.append(float(m.group(0)))
            i = m.end()
            continue
        m = _OP_RE.match(content, i)
        if not m:
            i += 1
            continue
        op = m.group(0)
        i = m.end()
        if op == b"BI":
            j = content.find(b"EI", i)
            i = n if j < 0 else j + 2
            stack.clear()
            continue
        _apply_op(doc, op, stack, fonts, xobjects, page, st, depth)
        stack.clear()


def _num(v, d=0.0):
    return float(v) if isinstance(v, (int, float)) else d


def _apply_op(doc, op, stack, fonts, xobjects, page, st, depth) -> None:
    if op == b"q":
        st.stack.append((st.ctm, st.tm, st.tlm, st.font, st.size,
                         st.tc, st.tw, st.tl, st.th))
    elif op == b"Q":
        if st.stack:
            (st.ctm, st.tm, st.tlm, st.font, st.size,
             st.tc, st.tw, st.tl, st.th) = st.stack.pop()
    elif op == b"cm" and len(stack) >= 6:
        st.ctm = _mat_mul(tuple(_num(v) for v in stack[-6:]), st.ctm)
    elif op == b"BT":
        st.tm = st.tlm = _IDENT
    elif op == b"Tm" and len(stack) >= 6:
        st.tm = st.tlm = tuple(_num(v) for v in stack[-6:])
    elif op in (b"Td", b"TD") and len(stack) >= 2:
        tx, ty = _num(stack[-2]), _num(stack[-1])
        if op == b"TD":
            st.tl = -ty
        st.tm = st.tlm = _mat_mul((1, 0, 0, 1, tx, ty), st.tlm)
    elif op == b"T*":
        st.tm = st.tlm = _mat_mul((1, 0, 0, 1, 0, -st.tl), st.tlm)
    elif op == b"TL" and stack:
        st.tl = _num(stack[-1])
    elif op == b"Tc" and stack:
        st.tc = _num(stack[-1])
    elif op == b"Tw" and stack:
        st.tw = _num(stack[-1])
    elif op == b"Tz" and stack:
        st.th = _num(stack[-1], 100.0) / 100.0
    elif op == b"Tf" and len(stack) >= 2:
        st.font = fonts.get(str(stack[-2]))
        st.size = _num(stack[-1])
    elif op == b"Tj" and stack:
        _show(page, st, stack[-1])
    elif op == b"'" and stack:
        st.tm = st.tlm = _mat_mul((1, 0, 0, 1, 0, -st.tl), st.tlm)
        _show(page, st, stack[-1])
    elif op == b'"' and len(stack) >= 3:
        st.tw, st.tc = _num(stack[-3]), _num(stack[-2])
        st.tm = st.tlm = _mat_mul((1, 0, 0, 1, 0, -st.tl), st.tlm)
        _show(page, st, stack[-1])
    elif op == b"TJ" and stack and isinstance(stack[-1], list):
        for item in stack[-1]:
            if isinstance(item, bytes):
                _show(page, st, item)
            elif isinstance(item, (int, float)):
                # kern: negative moves pen right-to-left gap; a large gap
                # (> 0.18 em) is an encoded inter-word space
                shift = -float(item) / 1000.0 * st.size * st.th
                if shift > 0.18 * st.size:
                    _show_text(page, st, " ", shift)
                else:
                    _advance(st, shift)
    elif op == b"Do" and stack:
        xo = doc.resolve(xobjects.get(str(stack[-1])))
        if isinstance(xo, Stream) and xo.dict.get("Subtype") == "Form":
            res = doc.resolve(xo.dict.get("Resources")) or {}
            f2, x2 = _load_resources(doc, res)
            saved = (st.ctm, st.tm, st.tlm, st.font, st.size,
                     st.tc, st.tw, st.tl, st.th)
            mtx = doc.resolve(xo.dict.get("Matrix"))
            if isinstance(mtx, list) and len(mtx) == 6:
                st.ctm = _mat_mul(tuple(_num(doc.resolve(v)) for v in mtx),
                                  st.ctm)
            try:
                _exec_content(doc, doc.stream_data(xo),
                              {**fonts, **f2}, {**xobjects, **x2},
                              page, st, depth + 1)
            except (PdfError, ValueError, IndexError):
                pass
            (st.ctm, st.tm, st.tlm, st.font, st.size,
             st.tc, st.tw, st.tl, st.th) = saved


def _advance(st: _TextState, tx: float) -> None:
    st.tm = _mat_mul((1, 0, 0, 1, tx, 0), st.tm)


def _show(page: _PageText, st: _TextState, raw: bytes) -> None:
    if st.font is None:
        # no font set: decode latin-1 so text is not silently lost
        _show_text(page, st, raw.decode("latin-1", "replace"),
                   0.5 * st.size * len(raw))
        return
    for code, text in st.font.decode(raw):
        w = st.font.width(code) / 1000.0 * st.size
        adv = (w + st.tc + (st.tw if code == 0x20 else 0.0)) * st.th
        _show_text(page, st, text, adv)


def _show_text(page: _PageText, st: _TextState, text: str, adv: float) -> None:
    trm = _mat_mul(st.tm, st.ctm)
    x0, y0 = trm[4], trm[5]
    # advance is in text space; device advance scales by the full text
    # rendering matrix (Tm × CTM) x-column — CTM alone misses Tm's scale
    x_end = x0 + adv * ((trm[0] ** 2 + trm[1] ** 2) ** 0.5)
    page.add(x0, y0, x_end, text)
    _advance(st, adv)


def _load_resources(doc: PdfDocument, res: dict):
    fonts: dict[str, FontDecoder] = {}
    for name, ref in (doc.resolve(res.get("Font")) or {}).items():
        f = doc.resolve(ref)
        if isinstance(f, dict):
            try:
                fonts[name] = FontDecoder(doc, f)
            except (PdfError, ValueError, KeyError, IndexError):
                continue
    xobjects = doc.resolve(res.get("XObject")) or {}
    return fonts, xobjects


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------

def extract_pdf_pages(data: bytes) -> list[str]:
    """One text string per physical page, page-tree order — the observable
    contract of the reference's readPDF (modules/utilities.py:31-45)."""
    if not data.lstrip()[:5].startswith(b"%PDF-"):
        raise PdfError("not a PDF (missing %PDF- header)")
    doc = PdfDocument(data)
    out = []
    for page_dict, inherited in doc.pages():
        res = doc.resolve(page_dict.get("Resources")
                          or inherited.get("Resources")) or {}
        fonts, xobjects = _load_resources(doc, res)
        try:
            content = doc.page_content(page_dict)
            page = _render_page(doc, content, fonts, xobjects)
            out.append(page.render())
        except (PdfError, ValueError, IndexError):
            out.append("")  # unparsable page → empty text, like pypdf
    return out
