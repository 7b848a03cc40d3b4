"""Standard security handler for minipdf (RC4, ISO 32000-1 §7.6.3).

Pure-stdlib implementation of the PDF "Standard" encryption filter,
revisions R2 (40-bit RC4, /V 1) and R3 (40–128-bit RC4, /V 2) — the
handler that owner-locked-but-readable PDFs in the wild use. Covers:

- Algorithm 2 (file encryption key from a padded password),
- Algorithms 4/5 + 6 (compute and verify the /U user-password value),
- Algorithm 3 (compute the /O owner-password value — used by the
  ``build_pdf(encrypt=...)`` writer so round-trip tests exercise the
  exact byte-level handler),
- per-object keys (key + 3 LSBs of objnum + 2 LSBs of gen → MD5).

AES-based handlers (/V 4 with /AESV2, /V 5 with /AESV3) are out of
scope and raise a typed ``ValueError`` upstream in minipdf — an
``error``-column row, never a crash (upstream pdf2dataset delegates
these to poppler's handler).

RC4 itself is the public KSA/PRGA stream cipher; MD5 comes from
hashlib. RC4/MD5 are cryptographically broken — implemented here for
*compatibility* with the PDF spec's legacy handler, never for
protecting new data.
"""

from __future__ import annotations

import hashlib
import struct

#: ISO 32000-1 Table 22 padding string (Algorithm 2 step a).
PAD = bytes(
    [
        0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
        0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
        0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
        0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A,
    ]
)


def rc4(key: bytes, data: bytes) -> bytes:
    """RC4 stream cipher (encrypt == decrypt)."""
    s = list(range(256))
    j = 0
    klen = len(key)
    for i in range(256):
        j = (j + s[i] + key[i % klen]) & 0xFF
        s[i], s[j] = s[j], s[i]
    out = bytearray(len(data))
    i = j = 0
    for n, c in enumerate(data):
        i = (i + 1) & 0xFF
        j = (j + s[i]) & 0xFF
        s[i], s[j] = s[j], s[i]
        out[n] = c ^ s[(s[i] + s[j]) & 0xFF]
    return bytes(out)


def _padded(password: bytes) -> bytes:
    return (password + PAD)[:32]


def file_key(
    password: bytes,
    o_value: bytes,
    p_value: int,
    id0: bytes,
    r: int,
    key_bytes: int,
) -> bytes:
    """Algorithm 2: file encryption key from a (user) password."""
    h = hashlib.md5()
    h.update(_padded(password))
    h.update(o_value[:32])
    h.update(struct.pack("<i", p_value))  # signed 32-bit little-endian
    h.update(id0)
    digest = h.digest()
    if r >= 3:
        for _ in range(50):
            digest = hashlib.md5(digest[:key_bytes]).digest()
    return digest[:key_bytes]


def compute_o(owner_pwd: bytes, user_pwd: bytes, r: int, key_bytes: int) -> bytes:
    """Algorithm 3: the /O dictionary value."""
    digest = hashlib.md5(_padded(owner_pwd)).digest()
    if r >= 3:
        for _ in range(50):
            digest = hashlib.md5(digest).digest()
    key = digest[:key_bytes]
    out = rc4(key, _padded(user_pwd))
    if r >= 3:
        for i in range(1, 20):
            out = rc4(bytes(b ^ i for b in key), out)
    return out


def compute_u(key: bytes, id0: bytes, r: int) -> bytes:
    """Algorithms 4 (R2) / 5 (R3): the /U dictionary value."""
    if r == 2:
        return rc4(key, PAD)
    digest = hashlib.md5(PAD + id0).digest()
    out = rc4(key, digest)
    for i in range(1, 20):
        out = rc4(bytes(b ^ i for b in key), out)
    return out + b"\x00" * 16  # 16 bytes of arbitrary padding


def check_user_password(key: bytes, u_value: bytes, id0: bytes, r: int) -> bool:
    """Algorithm 6: does `key` (derived from a candidate user
    password) reproduce the stored /U value?"""
    expect = compute_u(key, id0, r)
    if r == 2:
        return expect == u_value[:32]
    return expect[:16] == u_value[:16]  # R3 compares first 16 bytes only

def object_key(key: bytes, num: int, gen: int) -> bytes:
    """Per-object RC4 key: MD5(key + objnum[0:3] + gen[0:2]) truncated
    to min(len(key) + 5, 16) bytes."""
    h = hashlib.md5()
    h.update(key)
    h.update(struct.pack("<I", num)[:3])
    h.update(struct.pack("<I", gen)[:2])
    return h.digest()[: min(len(key) + 5, 16)]
