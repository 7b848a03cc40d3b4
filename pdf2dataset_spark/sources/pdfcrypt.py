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
    encrypt_metadata: bool = True,
) -> bytes:
    """Algorithm 2: file encryption key from a (user) password."""
    h = hashlib.md5()
    h.update(_padded(password))
    h.update(o_value[:32])
    h.update(struct.pack("<i", p_value))  # signed 32-bit little-endian
    h.update(id0)
    if r >= 4 and not encrypt_metadata:
        h.update(b"\xff\xff\xff\xff")
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


def owner_to_user_padded(
    owner_pwd: bytes, o_value: bytes, r: int, key_bytes: int
) -> bytes:
    """Algorithm 7 (owner-password authentication): decrypting /O
    with the owner key yields the PADDED user password, which then
    feeds Algorithm 2 unchanged (padding a 32-byte padded password is
    the identity)."""
    digest = hashlib.md5(_padded(owner_pwd)).digest()
    if r >= 3:
        for _ in range(50):
            digest = hashlib.md5(digest).digest()
    key = digest[:key_bytes]
    data = o_value[:32]
    if r == 2:
        return rc4(key, data)
    for i in range(19, 0, -1):
        data = rc4(bytes(b ^ i for b in key), data)
    return rc4(key, data)


def check_user_password(key: bytes, u_value: bytes, id0: bytes, r: int) -> bool:
    """Algorithm 6: does `key` (derived from a candidate user
    password) reproduce the stored /U value?"""
    expect = compute_u(key, id0, r)
    if r == 2:
        return expect == u_value[:32]
    return expect[:16] == u_value[:16]  # R3 compares first 16 bytes only

def object_key(key: bytes, num: int, gen: int, aes: bool = False) -> bytes:
    """Per-object key: MD5(key + objnum[0:3] + gen[0:2] [+ 'sAlT' for
    AESV2]) truncated to min(len(key) + 5, 16) bytes. /V 5 handlers
    don't use this — the file key encrypts every object directly."""
    h = hashlib.md5()
    h.update(key)
    h.update(struct.pack("<I", num)[:3])
    h.update(struct.pack("<I", gen)[:2])
    if aes:
        h.update(b"sAlT")  # ISO 32000-1 §7.6.2 step b
    return h.digest()[: min(len(key) + 5, 16)]


# -- /V 5 handler (AES-256, ISO 32000-2 §7.6.4) ------------------------


def hash_2b(password: bytes, salt: bytes, udata: bytes) -> bytes:
    """ISO 32000-2 Algorithm 2.B (R6 password hash): SHA-256 seeded,
    then ≥64 rounds of AES-128-CBC over the repeated password‖K‖udata
    with a mod-3 pick of SHA-256/384/512, until the stop condition."""
    from pdf2dataset_spark.sources import _aes

    k = hashlib.sha256(password + salt + udata).digest()
    i = 0
    while True:
        k1 = (password + k + udata) * 64
        e = _aes.cbc_encrypt_nopad(k[:16], k[16:32], k1)
        mod = int.from_bytes(e[:16], "big") % 3
        k = (hashlib.sha256, hashlib.sha384, hashlib.sha512)[mod](e).digest()
        i += 1
        if i >= 64 and e[-1] <= i - 32:
            return k[:32]


def _v5_hash(password: bytes, salt: bytes, udata: bytes, r: int) -> bytes:
    if r == 6:
        return hash_2b(password, salt, udata)
    return hashlib.sha256(password + salt + udata).digest()  # R5 (legacy)


def v5_auth_user(password: bytes, u_value: bytes, r: int) -> bool:
    """Algorithm 11: candidate user password vs /U (48 bytes:
    hash‖validation-salt‖key-salt)."""
    return _v5_hash(password, u_value[32:40], b"", r) == u_value[:32]


def v5_auth_owner(
    password: bytes, o_value: bytes, u_value: bytes, r: int
) -> bool:
    """Algorithm 12: candidate owner password vs /O (udata = U[:48])."""
    return _v5_hash(password, o_value[32:40], u_value[:48], r) == o_value[:32]


def v5_file_key_user(
    password: bytes, u_value: bytes, ue_value: bytes, r: int
) -> bytes:
    """Unwrap the 32-byte file key from /UE with the user password."""
    from pdf2dataset_spark.sources import _aes

    ik = _v5_hash(password, u_value[40:48], b"", r)
    return _aes.cbc_decrypt_nopad(ik, b"\x00" * 16, ue_value[:32])


def v5_file_key_owner(
    password: bytes, o_value: bytes, u_value: bytes, oe_value: bytes, r: int
) -> bytes:
    """Unwrap the 32-byte file key from /OE with the owner password."""
    from pdf2dataset_spark.sources import _aes

    ik = _v5_hash(password, o_value[40:48], u_value[:48], r)
    return _aes.cbc_decrypt_nopad(ik, b"\x00" * 16, oe_value[:32])


def v5_make_user_entries(
    password: bytes, file_key: bytes, r: int = 6
) -> tuple[bytes, bytes]:
    """Writer side: deterministic /U and /UE for a file key."""
    from pdf2dataset_spark.sources import _aes

    vs = hashlib.sha256(b"vs" + password + file_key).digest()[:8]
    ks = hashlib.sha256(b"ks" + password + file_key).digest()[:8]
    u_value = _v5_hash(password, vs, b"", r) + vs + ks
    ik = _v5_hash(password, ks, b"", r)
    ue_value = _aes.cbc_encrypt_nopad(ik, b"\x00" * 16, file_key)
    return u_value, ue_value


def v5_make_owner_entries(
    password: bytes, file_key: bytes, u_value: bytes, r: int = 6
) -> tuple[bytes, bytes]:
    """Writer side: deterministic /O and /OE for a file key."""
    from pdf2dataset_spark.sources import _aes

    vs = hashlib.sha256(b"ovs" + password + file_key).digest()[:8]
    ks = hashlib.sha256(b"oks" + password + file_key).digest()[:8]
    o_value = _v5_hash(password, vs, u_value[:48], r) + vs + ks
    ik = _v5_hash(password, ks, u_value[:48], r)
    oe_value = _aes.cbc_encrypt_nopad(ik, b"\x00" * 16, file_key)
    return o_value, oe_value
