"""Pure-Python AES (FIPS-197) + CBC mode for minipdf's PDF security
handlers (AESV2 = AES-128-CBC, AESV3 = AES-256-CBC).

Stdlib-only table-driven implementation of the public Rijndael
cipher: forward S-box built from GF(2^8) inverses, key expansion for
128/192/256-bit keys, encrypt and decrypt block functions, CBC with
the PDF spec's prepended-IV + PKCS#7 padding layout (ISO 32000-1
§7.6.2). Speed is irrelevant here — PDFs encrypt kilobytes — but the
arithmetic is the real algorithm, verified against FIPS-197 appendix
vectors in tests.

Like pdfcrypt, this exists for *compatibility* with existing files;
never use home-grown crypto to protect new data.
"""

from __future__ import annotations

# -- GF(2^8) tables ----------------------------------------------------


def _xtime(a: int) -> int:
    a <<= 1
    return (a ^ 0x1B) & 0xFF if a & 0x100 else a


def _gmul(a: int, b: int) -> int:
    out = 0
    while b:
        if b & 1:
            out ^= a
        a = _xtime(a)
        b >>= 1
    return out


def _build_sbox() -> tuple[bytes, bytes]:
    # multiplicative inverse via exp/log tables over generator 3
    exp = [0] * 510
    log = [0] * 256
    x = 1
    for i in range(255):
        exp[i] = x
        log[x] = i
        x = _gmul(x, 3)
    for i in range(255, 510):
        exp[i] = exp[i - 255]
    sbox = [0] * 256
    for i in range(256):
        inv = 0 if i == 0 else exp[255 - log[i]]
        # affine transform
        s = inv
        for sh in (1, 2, 3, 4):
            s ^= ((inv << sh) | (inv >> (8 - sh))) & 0xFF
        sbox[i] = s ^ 0x63
    inv_sbox = [0] * 256
    for i, s in enumerate(sbox):
        inv_sbox[s] = i
    return bytes(sbox), bytes(inv_sbox)


_SBOX, _INV_SBOX = _build_sbox()
_RCON = [0x01]
while len(_RCON) < 14:
    _RCON.append(_xtime(_RCON[-1]))

# precomputed GF(2^8) multiplication tables for the MixColumns
# constants — turns the hot path's bit-loop multiplies into lookups
_MUL = {c: bytes(_gmul(x, c) for x in range(256)) for c in (2, 3, 9, 11, 13, 14)}

import functools  # noqa: E402


@functools.lru_cache(maxsize=128)
def _expand_key(key: bytes) -> tuple[tuple[int, ...], ...]:
    """Round keys as a flat tuple of 4-byte words. Cached: CBC over an
    n-block payload reuses one schedule instead of re-deriving it per
    block (the R6 Algorithm 2.B hash encrypts hundreds of blocks per
    round)."""
    nk = len(key) // 4
    if nk not in (4, 6, 8):
        raise ValueError("AES key must be 128/192/256 bits")
    nr = nk + 6
    words = [list(key[4 * i : 4 * i + 4]) for i in range(nk)]
    for i in range(nk, 4 * (nr + 1)):
        temp = list(words[i - 1])
        if i % nk == 0:
            temp = temp[1:] + temp[:1]
            temp = [_SBOX[b] for b in temp]
            temp[0] ^= _RCON[i // nk - 1]
        elif nk > 6 and i % nk == 4:
            temp = [_SBOX[b] for b in temp]
        words.append([a ^ b for a, b in zip(words[i - nk], temp)])
    return tuple(tuple(w) for w in words)


def _add_round_key(state: list[int], words: list[list[int]], rnd: int) -> None:
    for c in range(4):
        w = words[4 * rnd + c]
        for r in range(4):
            state[4 * c + r] ^= w[r]


_SHIFT = [0, 5, 10, 15, 4, 9, 14, 3, 8, 13, 2, 7, 12, 1, 6, 11]
_INV_SHIFT = [0, 13, 10, 7, 4, 1, 14, 11, 8, 5, 2, 15, 12, 9, 6, 3]

# T-tables: fused SubBytes+ShiftRows+MixColumns as four 256-entry
# 32-bit lookup tables (column-packed big-endian). T_r[x] is the
# contribution of shifted-row-r byte x to an output column:
# MixColumns matrix columns (2,1,1,3), (3,2,1,1), (1,3,2,1), (1,1,3,2).
_T0, _T1, _T2, _T3 = [0] * 256, [0] * 256, [0] * 256, [0] * 256
for _x in range(256):
    _s = _SBOX[_x]
    _s2, _s3 = _MUL[2][_s], _MUL[3][_s]
    _T0[_x] = (_s2 << 24) | (_s << 16) | (_s << 8) | _s3
    _T1[_x] = (_s3 << 24) | (_s2 << 16) | (_s << 8) | _s
    _T2[_x] = (_s << 24) | (_s3 << 16) | (_s2 << 8) | _s
    _T3[_x] = (_s << 24) | (_s << 16) | (_s3 << 8) | _s2
del _x, _s, _s2, _s3


@functools.lru_cache(maxsize=128)
def _expand_key_packed(key: bytes) -> tuple[tuple[int, int, int, int], ...]:
    """Round keys packed as one big-endian int per column."""
    words = _expand_key(key)
    return tuple(
        tuple(
            (w[0] << 24) | (w[1] << 16) | (w[2] << 8) | w[3]
            for w in words[4 * r : 4 * r + 4]
        )
        for r in range(len(words) // 4)
    )


def encrypt_block(key: bytes, block: bytes) -> bytes:
    rks = _expand_key_packed(key)
    nr = len(rks) - 1
    t0, t1, t2, t3, sb = _T0, _T1, _T2, _T3, _SBOX
    rk = rks[0]
    c0 = int.from_bytes(block[0:4], "big") ^ rk[0]
    c1 = int.from_bytes(block[4:8], "big") ^ rk[1]
    c2 = int.from_bytes(block[8:12], "big") ^ rk[2]
    c3 = int.from_bytes(block[12:16], "big") ^ rk[3]
    for rnd in range(1, nr):
        rk = rks[rnd]
        n0 = (
            t0[c0 >> 24] ^ t1[(c1 >> 16) & 255] ^ t2[(c2 >> 8) & 255]
            ^ t3[c3 & 255] ^ rk[0]
        )
        n1 = (
            t0[c1 >> 24] ^ t1[(c2 >> 16) & 255] ^ t2[(c3 >> 8) & 255]
            ^ t3[c0 & 255] ^ rk[1]
        )
        n2 = (
            t0[c2 >> 24] ^ t1[(c3 >> 16) & 255] ^ t2[(c0 >> 8) & 255]
            ^ t3[c1 & 255] ^ rk[2]
        )
        n3 = (
            t0[c3 >> 24] ^ t1[(c0 >> 16) & 255] ^ t2[(c1 >> 8) & 255]
            ^ t3[c2 & 255] ^ rk[3]
        )
        c0, c1, c2, c3 = n0, n1, n2, n3
    rk = rks[nr]  # final round: no MixColumns
    n0 = (
        (sb[c0 >> 24] << 24) | (sb[(c1 >> 16) & 255] << 16)
        | (sb[(c2 >> 8) & 255] << 8) | sb[c3 & 255]
    ) ^ rk[0]
    n1 = (
        (sb[c1 >> 24] << 24) | (sb[(c2 >> 16) & 255] << 16)
        | (sb[(c3 >> 8) & 255] << 8) | sb[c0 & 255]
    ) ^ rk[1]
    n2 = (
        (sb[c2 >> 24] << 24) | (sb[(c3 >> 16) & 255] << 16)
        | (sb[(c0 >> 8) & 255] << 8) | sb[c1 & 255]
    ) ^ rk[2]
    n3 = (
        (sb[c3 >> 24] << 24) | (sb[(c0 >> 16) & 255] << 16)
        | (sb[(c1 >> 8) & 255] << 8) | sb[c2 & 255]
    ) ^ rk[3]
    return (
        n0.to_bytes(4, "big") + n1.to_bytes(4, "big")
        + n2.to_bytes(4, "big") + n3.to_bytes(4, "big")
    )


def decrypt_block(key: bytes, block: bytes) -> bytes:
    words = _expand_key(key)
    nr = len(words) // 4 - 1
    state = list(block)
    _add_round_key(state, words, nr)
    for rnd in range(nr - 1, -1, -1):
        state = [_INV_SBOX[state[i]] for i in _INV_SHIFT]  # InvShift+InvSub
        _add_round_key(state, words, rnd)
        if rnd != 0:  # InvMixColumns
            m9, m11, m13, m14 = _MUL[9], _MUL[11], _MUL[13], _MUL[14]
            ns = [0] * 16
            for c in range(4):
                a = state[4 * c : 4 * c + 4]
                ns[4 * c + 0] = m14[a[0]] ^ m11[a[1]] ^ m13[a[2]] ^ m9[a[3]]
                ns[4 * c + 1] = m9[a[0]] ^ m14[a[1]] ^ m11[a[2]] ^ m13[a[3]]
                ns[4 * c + 2] = m13[a[0]] ^ m9[a[1]] ^ m14[a[2]] ^ m11[a[3]]
                ns[4 * c + 3] = m11[a[0]] ^ m13[a[1]] ^ m9[a[2]] ^ m14[a[3]]
            state = ns
    return bytes(state)


# -- CBC (PDF layout: IV || ciphertext, PKCS#7) ------------------------


def cbc_encrypt(key: bytes, iv: bytes, plaintext: bytes) -> bytes:
    pad = 16 - len(plaintext) % 16
    data = plaintext + bytes([pad]) * pad
    out = bytearray(iv)
    prev = iv
    for i in range(0, len(data), 16):
        blk = bytes(a ^ b for a, b in zip(data[i : i + 16], prev))
        prev = encrypt_block(key, blk)
        out += prev
    return bytes(out)


def cbc_decrypt(key: bytes, data: bytes, strip_padding: bool = True) -> bytes:
    """PDF AES payload: first 16 bytes are the IV."""
    if len(data) < 32 or len(data) % 16:
        raise ValueError("AES-CBC payload must be IV + whole blocks")
    prev = data[:16]
    out = bytearray()
    for i in range(16, len(data), 16):
        blk = data[i : i + 16]
        out += bytes(a ^ b for a, b in zip(decrypt_block(key, blk), prev))
        prev = blk
    if strip_padding:
        pad = out[-1]
        if not 1 <= pad <= 16:
            raise ValueError("bad AES-CBC padding")
        del out[-pad:]
    return bytes(out)


def cbc_encrypt_nopad(key: bytes, iv: bytes, data: bytes) -> bytes:
    """Raw CBC without IV prefix or padding (ISO 32000-2 Algorithm
    2.B hash construction and the /UE //OE wrapped file key need it)."""
    out = bytearray()
    prev = iv
    for i in range(0, len(data), 16):
        blk = bytes(a ^ b for a, b in zip(data[i : i + 16], prev))
        prev = encrypt_block(key, blk)
        out += prev
    return bytes(out)


def cbc_decrypt_nopad(key: bytes, iv: bytes, data: bytes) -> bytes:
    """Inverse of :func:`cbc_encrypt_nopad` (explicit IV, no padding)."""
    out = bytearray()
    prev = iv
    for i in range(0, len(data), 16):
        blk = data[i : i + 16]
        out += bytes(a ^ b for a, b in zip(decrypt_block(key, blk), prev))
        prev = blk
    return bytes(out)
