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


def _expand_key(key: bytes) -> list[list[int]]:
    """Round keys as a flat list of 4-byte words."""
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
    return words


def _add_round_key(state: list[int], words: list[list[int]], rnd: int) -> None:
    for c in range(4):
        w = words[4 * rnd + c]
        for r in range(4):
            state[4 * c + r] ^= w[r]


_SHIFT = [0, 5, 10, 15, 4, 9, 14, 3, 8, 13, 2, 7, 12, 1, 6, 11]
_INV_SHIFT = [0, 13, 10, 7, 4, 1, 14, 11, 8, 5, 2, 15, 12, 9, 6, 3]


def encrypt_block(key: bytes, block: bytes) -> bytes:
    words = _expand_key(key)
    nr = len(words) // 4 - 1
    state = list(block)
    _add_round_key(state, words, 0)
    for rnd in range(1, nr + 1):
        state = [_SBOX[state[i]] for i in _SHIFT]  # SubBytes + ShiftRows
        if rnd != nr:  # MixColumns
            ns = [0] * 16
            for c in range(4):
                a = state[4 * c : 4 * c + 4]
                ns[4 * c + 0] = _gmul(a[0], 2) ^ _gmul(a[1], 3) ^ a[2] ^ a[3]
                ns[4 * c + 1] = a[0] ^ _gmul(a[1], 2) ^ _gmul(a[2], 3) ^ a[3]
                ns[4 * c + 2] = a[0] ^ a[1] ^ _gmul(a[2], 2) ^ _gmul(a[3], 3)
                ns[4 * c + 3] = _gmul(a[0], 3) ^ a[1] ^ a[2] ^ _gmul(a[3], 2)
            state = ns
        _add_round_key(state, words, rnd)
    return bytes(state)


def decrypt_block(key: bytes, block: bytes) -> bytes:
    words = _expand_key(key)
    nr = len(words) // 4 - 1
    state = list(block)
    _add_round_key(state, words, nr)
    for rnd in range(nr - 1, -1, -1):
        state = [_INV_SBOX[state[i]] for i in _INV_SHIFT]  # InvShift+InvSub
        _add_round_key(state, words, rnd)
        if rnd != 0:  # InvMixColumns
            ns = [0] * 16
            for c in range(4):
                a = state[4 * c : 4 * c + 4]
                ns[4 * c + 0] = (
                    _gmul(a[0], 14) ^ _gmul(a[1], 11) ^ _gmul(a[2], 13) ^ _gmul(a[3], 9)
                )
                ns[4 * c + 1] = (
                    _gmul(a[0], 9) ^ _gmul(a[1], 14) ^ _gmul(a[2], 11) ^ _gmul(a[3], 13)
                )
                ns[4 * c + 2] = (
                    _gmul(a[0], 13) ^ _gmul(a[1], 9) ^ _gmul(a[2], 14) ^ _gmul(a[3], 11)
                )
                ns[4 * c + 3] = (
                    _gmul(a[0], 11) ^ _gmul(a[1], 13) ^ _gmul(a[2], 9) ^ _gmul(a[3], 14)
                )
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
