"""Pure-stdlib AES (FIPS-197) with CBC mode — the block cipher needed by
PDF encryption V4 (/AESV2, AES-128) and V5 (/AESV3, AES-256).

Written from the public FIPS-197 specification; validated against the
standard's own known-answer vectors (Appendix C) in ``tests/test_pdf_text.py``.
This exists only because the Python stdlib ships hashlib but no block
cipher; it is NOT a performance path — PDF encrypt dictionaries are tiny
and content streams are decrypted once per document at ingest.

Scale note: runs inside the per-file crack task (``sources/doc_crack.py``),
so throughput is bounded by per-document work exactly like the rest of the
parser — no shuffle, no driver involvement.
"""
from __future__ import annotations

__all__ = ["aes_encrypt_block", "aes_decrypt_block",
           "cbc_encrypt", "cbc_decrypt", "key_expansion"]

_SBOX = [
    0x63, 0x7c, 0x77, 0x7b, 0xf2, 0x6b, 0x6f, 0xc5, 0x30, 0x01, 0x67, 0x2b,
    0xfe, 0xd7, 0xab, 0x76, 0xca, 0x82, 0xc9, 0x7d, 0xfa, 0x59, 0x47, 0xf0,
    0xad, 0xd4, 0xa2, 0xaf, 0x9c, 0xa4, 0x72, 0xc0, 0xb7, 0xfd, 0x93, 0x26,
    0x36, 0x3f, 0xf7, 0xcc, 0x34, 0xa5, 0xe5, 0xf1, 0x71, 0xd8, 0x31, 0x15,
    0x04, 0xc7, 0x23, 0xc3, 0x18, 0x96, 0x05, 0x9a, 0x07, 0x12, 0x80, 0xe2,
    0xeb, 0x27, 0xb2, 0x75, 0x09, 0x83, 0x2c, 0x1a, 0x1b, 0x6e, 0x5a, 0xa0,
    0x52, 0x3b, 0xd6, 0xb3, 0x29, 0xe3, 0x2f, 0x84, 0x53, 0xd1, 0x00, 0xed,
    0x20, 0xfc, 0xb1, 0x5b, 0x6a, 0xcb, 0xbe, 0x39, 0x4a, 0x4c, 0x58, 0xcf,
    0xd0, 0xef, 0xaa, 0xfb, 0x43, 0x4d, 0x33, 0x85, 0x45, 0xf9, 0x02, 0x7f,
    0x50, 0x3c, 0x9f, 0xa8, 0x51, 0xa3, 0x40, 0x8f, 0x92, 0x9d, 0x38, 0xf5,
    0xbc, 0xb6, 0xda, 0x21, 0x10, 0xff, 0xf3, 0xd2, 0xcd, 0x0c, 0x13, 0xec,
    0x5f, 0x97, 0x44, 0x17, 0xc4, 0xa7, 0x7e, 0x3d, 0x64, 0x5d, 0x19, 0x73,
    0x60, 0x81, 0x4f, 0xdc, 0x22, 0x2a, 0x90, 0x88, 0x46, 0xee, 0xb8, 0x14,
    0xde, 0x5e, 0x0b, 0xdb, 0xe0, 0x32, 0x3a, 0x0a, 0x49, 0x06, 0x24, 0x5c,
    0xc2, 0xd3, 0xac, 0x62, 0x91, 0x95, 0xe4, 0x79, 0xe7, 0xc8, 0x37, 0x6d,
    0x8d, 0xd5, 0x4e, 0xa9, 0x6c, 0x56, 0xf4, 0xea, 0x65, 0x7a, 0xae, 0x08,
    0xba, 0x78, 0x25, 0x2e, 0x1c, 0xa6, 0xb4, 0xc6, 0xe8, 0xdd, 0x74, 0x1f,
    0x4b, 0xbd, 0x8b, 0x8a, 0x70, 0x3e, 0xb5, 0x66, 0x48, 0x03, 0xf6, 0x0e,
    0x61, 0x35, 0x57, 0xb9, 0x86, 0xc1, 0x1d, 0x9e, 0xe1, 0xf8, 0x98, 0x11,
    0x69, 0xd9, 0x8e, 0x94, 0x9b, 0x1e, 0x87, 0xe9, 0xce, 0x55, 0x28, 0xdf,
    0x8c, 0xa1, 0x89, 0x0d, 0xbf, 0xe6, 0x42, 0x68, 0x41, 0x99, 0x2d, 0x0f,
    0xb0, 0x54, 0xbb, 0x16,
]
_INV_SBOX = [0] * 256
for _i, _v in enumerate(_SBOX):
    _INV_SBOX[_v] = _i

_RCON = [0x01, 0x02, 0x04, 0x08, 0x10, 0x20, 0x40, 0x80, 0x1b, 0x36,
         0x6c, 0xd8, 0xab, 0x4d]


def _xtime(a: int) -> int:
    a <<= 1
    return (a ^ 0x11B) & 0xFF if a & 0x100 else a


# GF(2^8) multiplication tables for the fixed MixColumns coefficients
def _mul_table(c: int) -> list[int]:
    t = []
    for a in range(256):
        r, b, x = 0, c, a
        while b:
            if b & 1:
                r ^= x
            x = _xtime(x)
            b >>= 1
        t.append(r)
    return t


_M2, _M3 = _mul_table(2), _mul_table(3)
_M9, _M11, _M13, _M14 = (_mul_table(c) for c in (9, 11, 13, 14))


def key_expansion(key: bytes) -> list[list[int]]:
    """FIPS-197 §5.2: expand a 16/24/32-byte key into Nr+1 round keys
    (each a 16-int list)."""
    nk = len(key) // 4
    if nk not in (4, 6, 8):
        raise ValueError(f"AES key must be 128/192/256 bits, got {len(key)*8}")
    nr = nk + 6
    w = [list(key[4 * i:4 * i + 4]) for i in range(nk)]
    for i in range(nk, 4 * (nr + 1)):
        t = list(w[i - 1])
        if i % nk == 0:
            t = t[1:] + t[:1]
            t = [_SBOX[b] for b in t]
            t[0] ^= _RCON[i // nk - 1]
        elif nk > 6 and i % nk == 4:
            t = [_SBOX[b] for b in t]
        w.append([a ^ b for a, b in zip(w[i - nk], t)])
    return [[b for word in w[4 * r:4 * r + 4] for b in word]
            for r in range(nr + 1)]


# Column-major state order per FIPS-197 §3.4: state[r + 4c] = input[4c + r],
# i.e. the input bytes ARE the state read column by column — lists below
# index the flat 16-byte block directly with that layout in mind.

_SHIFT = [0, 5, 10, 15, 4, 9, 14, 3, 8, 13, 2, 7, 12, 1, 6, 11]
_INV_SHIFT = [0, 13, 10, 7, 4, 1, 14, 11, 8, 5, 2, 15, 12, 9, 6, 3]


def aes_encrypt_block(round_keys: list[list[int]], block: bytes) -> bytes:
    s = [b ^ k for b, k in zip(block, round_keys[0])]
    nr = len(round_keys) - 1
    for rnd in range(1, nr):
        # SubBytes + ShiftRows fused
        s = [_SBOX[s[_SHIFT[i]]] for i in range(16)]
        # MixColumns
        t = [0] * 16
        for c in range(0, 16, 4):
            a0, a1, a2, a3 = s[c], s[c + 1], s[c + 2], s[c + 3]
            t[c] = _M2[a0] ^ _M3[a1] ^ a2 ^ a3
            t[c + 1] = a0 ^ _M2[a1] ^ _M3[a2] ^ a3
            t[c + 2] = a0 ^ a1 ^ _M2[a2] ^ _M3[a3]
            t[c + 3] = _M3[a0] ^ a1 ^ a2 ^ _M2[a3]
        k = round_keys[rnd]
        s = [t[i] ^ k[i] for i in range(16)]
    s = [_SBOX[s[_SHIFT[i]]] ^ round_keys[nr][i] for i in range(16)]
    return bytes(s)


def aes_decrypt_block(round_keys: list[list[int]], block: bytes) -> bytes:
    nr = len(round_keys) - 1
    s = [b ^ k for b, k in zip(block, round_keys[nr])]
    for rnd in range(nr - 1, 0, -1):
        # InvShiftRows + InvSubBytes fused
        s = [_INV_SBOX[s[_INV_SHIFT[i]]] for i in range(16)]
        k = round_keys[rnd]
        s = [s[i] ^ k[i] for i in range(16)]
        # InvMixColumns
        t = [0] * 16
        for c in range(0, 16, 4):
            a0, a1, a2, a3 = s[c], s[c + 1], s[c + 2], s[c + 3]
            t[c] = _M14[a0] ^ _M11[a1] ^ _M13[a2] ^ _M9[a3]
            t[c + 1] = _M9[a0] ^ _M14[a1] ^ _M11[a2] ^ _M13[a3]
            t[c + 2] = _M13[a0] ^ _M9[a1] ^ _M14[a2] ^ _M11[a3]
            t[c + 3] = _M11[a0] ^ _M13[a1] ^ _M9[a2] ^ _M14[a3]
        s = t
    s = [_INV_SBOX[s[_INV_SHIFT[i]]] ^ round_keys[0][i] for i in range(16)]
    return bytes(s)


def cbc_encrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    """AES-CBC encrypt; ``data`` must already be a multiple of 16 bytes
    (PDF uses PKCS#7-style padding — the caller appends it)."""
    if len(data) % 16:
        raise ValueError("CBC input not block-aligned")
    rk = key_expansion(key)
    out, prev = bytearray(), iv
    for i in range(0, len(data), 16):
        blk = bytes(a ^ b for a, b in zip(data[i:i + 16], prev))
        prev = aes_encrypt_block(rk, blk)
        out += prev
    return bytes(out)


def cbc_decrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    """AES-CBC decrypt of block-aligned ``data``; padding is NOT removed
    (PDF V5 file-key unwrap is unpadded, content streams strip PKCS#7
    themselves)."""
    if len(data) % 16:
        raise ValueError("CBC input not block-aligned")
    rk = key_expansion(key)
    out, prev = bytearray(), iv
    for i in range(0, len(data), 16):
        c = data[i:i + 16]
        out += bytes(a ^ b for a, b in zip(aes_decrypt_block(rk, c), prev))
        prev = c
    return bytes(out)
