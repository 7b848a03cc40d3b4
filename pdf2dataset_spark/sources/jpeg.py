"""Baseline JPEG codec (grayscale, no native deps).

Upstream renders page images through pdf2image/poppler, which can emit
JPEG; this container has no native imaging stack, so `image_format=
"jpeg"` previously required an optional import. This module closes the
gap with a self-contained baseline-DCT JFIF encoder (and a matching
decoder used by the round-trip tests): 8x8 FDCT via a numpy matrix
product, Annex-K-style luminance quantization scaled by `quality`,
and canonical Huffman tables written INTO the stream (DQT/DHT), so
any spec-compliant reader decodes the output regardless of the
specific table constants.

Scope: single-component (grayscale) baseline sequential — exactly
what the text raster produces. Color would add chroma subsampling and
two more Huffman tables but no new structure.
"""

from __future__ import annotations

import struct

import numpy as np

# Annex K luminance quantization matrix (quality 50 base).
_QUANT_BASE = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.float64,
)

# Standard luminance Huffman specs: (bits-per-length[1..16], symbols).
_DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_VALS = list(range(12))
_AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]

# zigzag order: _ZIGZAG[i] = flat index (r*8+c) of the i-th coefficient.
def _zigzag_order() -> list[int]:
    order = sorted(
        ((r, c) for r in range(8) for c in range(8)),
        key=lambda rc: (
            rc[0] + rc[1],
            rc[1] if (rc[0] + rc[1]) % 2 else rc[0],
        ),
    )
    return [r * 8 + c for r, c in order]


_ZIGZAG = _zigzag_order()

# Orthonormal 8-point DCT-II matrix: FDCT = M @ block @ M.T.
def _dct_matrix() -> np.ndarray:
    m = np.zeros((8, 8))
    for u in range(8):
        cu = np.sqrt(0.125) if u == 0 else 0.5
        for x in range(8):
            m[u, x] = cu * np.cos((2 * x + 1) * u * np.pi / 16)
    return m


_DCT_M = _dct_matrix()


def _quant_table(quality: int) -> np.ndarray:
    """libjpeg-compatible quality scaling of the Annex K base table."""
    q = min(100, max(1, quality))
    scale = 5000 / q if q < 50 else 200 - 2 * q
    tbl = np.floor((_QUANT_BASE * scale + 50) / 100)
    return np.clip(tbl, 1, 255)


def _build_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical Huffman: symbol -> (code, length)."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


_DC_CODES = _build_codes(_DC_BITS, _DC_VALS)
_AC_CODES = _build_codes(_AC_BITS, _AC_VALS)


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, code: int, length: int) -> None:
        self._acc = (self._acc << length) | (code & ((1 << length) - 1))
        self._n += length
        while self._n >= 8:
            b = (self._acc >> (self._n - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:  # byte stuffing
                self.out.append(0x00)
            self._n -= 8
        self._acc &= (1 << self._n) - 1

    def flush(self) -> None:
        if self._n:
            pad = 8 - self._n
            self.write((1 << pad) - 1, pad)  # 1-pad to byte boundary


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _amplitude_bits(v: int, cat: int) -> int:
    # negative values: one's-complement representation per spec
    return v if v >= 0 else v + (1 << cat) - 1


def _segment(marker: int, payload: bytes) -> bytes:
    return struct.pack(">HH", marker, len(payload) + 2) + payload


def encode_jpeg(w: int, h: int, px: bytes, quality: int = 85) -> bytes:
    """Encode an 8-bit grayscale image (row-major ``px``) as baseline
    JFIF. Deterministic: same pixels + quality -> same bytes."""
    qt = _quant_table(quality)
    img = np.frombuffer(bytes(px), dtype=np.uint8).reshape(h, w)
    # pad to 8x8 multiples by edge replication (spec-standard choice)
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    padded = np.pad(
        img.astype(np.float64) - 128.0,
        ((0, ph - h), (0, pw - w)),
        mode="edge",
    )
    # all blocks at once: (n_blocks, 8, 8) tensor FDCT
    blocks = (
        padded.reshape(ph // 8, 8, pw // 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(-1, 8, 8)
    )
    coeffs = _DCT_M @ blocks @ _DCT_M.T
    quant = np.round(coeffs / qt).astype(np.int32)
    zz = quant.reshape(-1, 64)[:, _ZIGZAG]

    bw = _BitWriter()
    prev_dc = 0
    for blk in zz:
        dc = int(blk[0])
        diff = dc - prev_dc
        prev_dc = dc
        cat = _category(diff)
        code, ln = _DC_CODES[cat]
        bw.write(code, ln)
        if cat:
            bw.write(_amplitude_bits(diff, cat), cat)
        run = 0
        last_nz = int(np.max(np.nonzero(blk)[0])) if np.any(blk[1:]) else 0
        for i in range(1, last_nz + 1):
            v = int(blk[i])
            if v == 0:
                run += 1
                continue
            while run >= 16:
                code, ln = _AC_CODES[0xF0]  # ZRL
                bw.write(code, ln)
                run -= 16
            cat = _category(v)
            code, ln = _AC_CODES[(run << 4) | cat]
            bw.write(code, ln)
            bw.write(_amplitude_bits(v, cat), cat)
            run = 0
        if last_nz < 63:
            code, ln = _AC_CODES[0x00]  # EOB
            bw.write(code, ln)
    bw.flush()

    qt_zz = qt.reshape(-1)[_ZIGZAG].astype(np.uint8)
    dht_dc = bytes([0x00]) + bytes(_DC_BITS) + bytes(_DC_VALS)
    dht_ac = bytes([0x10]) + bytes(_AC_BITS) + bytes(_AC_VALS)
    return b"".join(
        [
            b"\xff\xd8",  # SOI
            _segment(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"),
            _segment(0xFFDB, b"\x00" + qt_zz.tobytes()),
            _segment(
                0xFFC0,
                struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0]),
            ),
            _segment(0xFFC4, dht_dc),
            _segment(0xFFC4, dht_ac),
            _segment(0xFFDA, bytes([1, 1, 0x00, 0, 63, 0])),
            bytes(bw.out),
            b"\xff\xd9",  # EOI
        ]
    )


# ----------------------------------------------------------------- decode
class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self._acc = 0
        self._n = 0

    def read_bit(self) -> int:
        if self._n == 0:
            if self.pos >= len(self.data):
                raise ValueError("JPEG entropy stream truncated")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                if self.pos >= len(self.data) or self.data[self.pos] != 0x00:
                    raise ValueError("unexpected marker in entropy data")
                self.pos += 1  # skip stuffed zero
            self._acc = b
            self._n = 8
        self._n -= 1
        return (self._acc >> self._n) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def _decode_tree(bits: list[int], vals: list[int]):
    """code-space map: (length, code) -> symbol."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _read_symbol(br: _BitReader, table) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code")


def decode_jpeg(data: bytes) -> tuple[int, int, bytes]:
    """Decode a single-component baseline JPEG produced by
    :func:`encode_jpeg` (or any grayscale baseline file using one
    DC and one AC table). Returns (w, h, pixels)."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG: missing SOI")
    pos = 2
    qt = None
    huff: dict[tuple[int, int], dict] = {}
    w = h = 0
    scan_start = None
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at byte {pos}")
        marker = struct.unpack(">H", data[pos : pos + 2])[0]
        if marker == 0xFFD9:
            break
        (seglen,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        payload = data[pos + 4 : pos + 2 + seglen]
        if marker == 0xFFDB:
            if payload[0] & 0x0F == 0:
                zzt = np.array(list(payload[1:65]), dtype=np.float64)
                qt = np.zeros(64)
                qt[_ZIGZAG] = zzt
                qt = qt.reshape(8, 8)
        elif marker == 0xFFC0:
            _, h, w, ncomp = struct.unpack(">BHHB", payload[:6])
            if ncomp != 1:
                raise ValueError("only single-component JPEGs supported")
        elif marker == 0xFFC2:
            raise ValueError("progressive JPEG not supported")
        elif marker == 0xFFC4:
            tc_th = payload[0]
            bits = list(payload[1:17])
            nvals = sum(bits)
            vals = list(payload[17 : 17 + nvals])
            huff[(tc_th >> 4, tc_th & 0x0F)] = _decode_tree(bits, vals)
        elif marker == 0xFFDA:
            scan_start = pos + 2 + seglen
            break
        pos += 2 + seglen
    if qt is None or scan_start is None or not w or not h:
        raise ValueError("missing JPEG segments")
    end = data.rfind(b"\xff\xd9")
    br = _BitReader(data[scan_start:end])
    dc_t, ac_t = huff[(0, 0)], huff[(1, 0)]

    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    nblocks = (ph // 8) * (pw // 8)
    zz = np.zeros((nblocks, 64), dtype=np.float64)
    prev_dc = 0
    for b in range(nblocks):
        cat = _read_symbol(br, dc_t)
        diff = 0
        if cat:
            raw = br.read_bits(cat)
            diff = raw if raw >= (1 << (cat - 1)) else raw - (1 << cat) + 1
        prev_dc += diff
        zz[b, 0] = prev_dc
        i = 1
        while i < 64:
            sym = _read_symbol(br, ac_t)
            if sym == 0x00:  # EOB
                break
            run, cat = sym >> 4, sym & 0x0F
            if sym == 0xF0:  # ZRL
                i += 16
                continue
            i += run
            raw = br.read_bits(cat)
            v = raw if raw >= (1 << (cat - 1)) else raw - (1 << cat) + 1
            if i < 64:
                zz[b, i] = v
            i += 1

    coeffs = np.zeros((nblocks, 64))
    coeffs[:, _ZIGZAG] = zz
    blocks = coeffs.reshape(-1, 8, 8) * qt
    spatial = _DCT_M.T @ blocks @ _DCT_M + 128.0
    img = (
        spatial.reshape(ph // 8, pw // 8, 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(ph, pw)
    )
    out = np.clip(np.round(img[:h, :w]), 0, 255).astype(np.uint8)
    return w, h, out.tobytes()
