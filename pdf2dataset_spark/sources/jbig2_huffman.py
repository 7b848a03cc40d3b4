"""JBIG2 Huffman coding (ITU-T T.88 Annex B + §7.4.3/7.4.4) — the
second of JBIG2's two entropy regimes (hardware scanner / fax-derived
encoders emit it; jbig2enc-style PDF producers use arithmetic).

Provides:

- MSB-first :class:`BitReader` / :class:`BitWriter`;
- :class:`HuffTable` — line-based tables (normal / lower-range /
  upper-range / OOB lines, B.2's structure) with the B.3 canonical
  prefix-code assignment, decode AND encode (fixture twin);
- the STANDARD tables. Every shipped table passes two independent
  self-consistency checks: the Kraft sum of all prefix lengths
  equals its published value and the normal lines tile one
  contiguous value range that meets the lower/upper 32-bit escape
  lines exactly. Fourteen of the fifteen published tables are
  complete prefix codes (Kraft == 1); B.10 is the published
  exception — its Kraft sum is exactly 59/64 (the code space under
  prefixes 11011/111011/1110101111110… is unused), which the B.3
  assignment procedure permits (it only needs Kraft <= 1). B.7
  (round-9) is B.6's positive-shifted sibling for the first-S
  selection (same mid-section, [-1024, 2048) span). B.10 (round-10)
  is TRANSCRIBED from T.88 Table B.10 like every other table —
  span [-21, 4166) with escapes at -22/4166 — replacing round-9's
  incorrect scaling-law derivation from B.9 (the published table
  does not follow the B.8->B.9 doubling pattern; rows like the
  4-value center {2,2,-2} and the 64-value {2,6,6} break it).
  Custom-table segments (§7.4.13) remain the spec-exact escape
  hatch for any stream whose encoder disagrees;
- custom table segment (type 53) parse + build;
- the runcode-based symbol-ID code-length machinery (§7.4.4.5).

Validation evidence for the standard tables lives in
tests/test_jbig2_huffman.py (Kraft + contiguity + exhaustive
encode/decode round trips over every representable value class).
"""

from __future__ import annotations

import struct
from fractions import Fraction

from pdf2dataset_spark.sources.jbig2 import (  # noqa: F401
    JBIG2Error,
    JBIG2Unsupported,
)

#: out-of-band sentinel (shared identity with the arithmetic coder's
#: is-checks is unnecessary — tables return THIS object)
OOB = object()


class BitReader:
    """MSB-first bit reader over a bytes buffer."""

    __slots__ = ("data", "pos", "_nbits")

    def __init__(self, data: bytes, byte_pos: int = 0):
        self.data = data
        self.pos = byte_pos * 8
        self._nbits = len(data) * 8

    def bit(self) -> int:
        i = self.pos
        byte = i >> 3
        if byte >= len(self.data):
            raise JBIG2Error("bit read past end of segment")
        self.pos = i + 1
        return (self.data[byte] >> (7 - (i & 7))) & 1

    def bits(self, n: int) -> int:
        i = self.pos
        if i + n > self._nbits:
            raise JBIG2Error("bit read past end of segment")
        self.pos = i + n
        first = i >> 3
        last = (i + n + 7) >> 3
        window = int.from_bytes(self.data[first:last], "big")
        return (window >> ((last - first) * 8 - (i & 7) - n)) & ((1 << n) - 1)

    def peek_pad(self, n: int) -> int:
        """The next ``n`` bits without consuming, zero-padded past the
        end of the buffer (LUT probes; pad bits are don't-cares for
        any code short enough to be real)."""
        i = self.pos
        first = i >> 3
        last = (i + n + 7) >> 3
        chunk = self.data[first:last]
        window = int.from_bytes(chunk, "big") << ((last - first - len(chunk)) * 8)
        return (window >> ((last - first) * 8 - (i & 7) - n)) & ((1 << n) - 1)

    def align(self) -> int:
        """Skip to the next byte boundary; return the byte offset."""
        self.pos = (self.pos + 7) & ~7
        return self.pos >> 3

    @property
    def byte_pos(self) -> int:
        return (self.pos + 7) >> 3

    def seek_byte(self, byte_pos: int) -> None:
        self.pos = byte_pos * 8


class BitWriter:
    """MSB-first bit writer (fixture-encoder twin)."""

    __slots__ = ("buf", "cur", "nbits")

    def __init__(self):
        self.buf = bytearray()
        self.cur = 0
        self.nbits = 0

    def bit(self, b: int) -> None:
        self.cur = (self.cur << 1) | (b & 1)
        self.nbits += 1
        if self.nbits == 8:
            self.buf.append(self.cur)
            self.cur = 0
            self.nbits = 0

    def bits(self, v: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.bit((v >> i) & 1)

    def align(self) -> None:
        while self.nbits:
            self.bit(0)

    def raw_bytes(self, data: bytes) -> None:
        if self.nbits:
            raise JBIG2Error("raw bytes on unaligned writer")
        self.buf += data

    def getvalue(self) -> bytes:
        out = bytearray(self.buf)
        if self.nbits:
            out.append(self.cur << (8 - self.nbits))
        return bytes(out)


# line kinds
_NORMAL, _LOWER, _UPPER, _OOBK = "n", "l", "u", "o"


class HuffTable:
    """One Annex-B table: lines of (preflen, rangelen, rangelow,
    kind). Prefix codes are assigned by the B.3 procedure (canonical:
    ascending code length, table order within a length)."""

    def __init__(self, lines):
        self.lines = [ln for ln in lines if ln[0] > 0]
        self.oob = any(ln[3] == _OOBK for ln in self.lines)
        # B.3 canonical assignment: ascending length, table order
        # within a length, first-code recurrence
        maxlen = max((ln[0] for ln in self.lines), default=0)
        firstcode = [0] * (maxlen + 2)
        cnt = [0] * (maxlen + 1)
        for ln in self.lines:
            cnt[ln[0]] += 1
        for length in range(1, maxlen + 1):
            firstcode[length] = (firstcode[length - 1]
                                 + cnt[length - 1]) << 1
        assign = list(firstcode)
        self._decode_map = {}
        self._encode_map = {}
        for ln in self.lines:  # table order within equal lengths
            preflen = ln[0]
            codeval = assign[preflen]
            assign[preflen] += 1
            if codeval >= (1 << preflen):
                raise JBIG2Error("Huffman table prefix overflow")
            self._decode_map[(preflen, codeval)] = ln
            self._encode_map[id(ln)] = (codeval, preflen)
        self._lut = None  # dense whole-code LUT, built on first decode
        self._lut_bits = min(maxlen, 13)

    def _build_lut(self):
        """Dense ``2**_lut_bits`` table: index = the next ``_lut_bits``
        stream bits, value = the line whose prefix code starts there
        (codes up to ``_lut_bits`` long; longer codes and unassigned
        prefixes stay ``None`` and take the exact per-bit walk)."""
        width = self._lut_bits
        lut = [None] * (1 << width)
        for (preflen, codeval), ln in self._decode_map.items():
            if preflen <= width:
                base = codeval << (width - preflen)
                span = 1 << (width - preflen)
                lut[base:base + span] = [ln] * span
        self._lut = lut

    # -- validation (used by the standard tables + tests) ------------

    def kraft_sum(self):
        return sum(Fraction(1, 1 << ln[0]) for ln in self.lines)

    def check_complete_and_contiguous(self, expect_kraft=1) -> None:
        """Raise unless the prefix code's Kraft sum equals
        ``expect_kraft`` (1 — a complete code — for every published
        table except B.10, whose published sum is 59/64) and the
        normal lines tile one contiguous range meeting the
        lower/upper escape lines exactly. A sum below 1 is still a
        valid prefix code (unused code space); above 1 is not."""
        if self.kraft_sum() != expect_kraft:
            raise JBIG2Error("Huffman table Kraft sum mismatch")
        normals = sorted(
            (ln for ln in self.lines if ln[3] == _NORMAL),
            key=lambda ln: ln[2],
        )
        for a, b in zip(normals, normals[1:]):
            if a[2] + (1 << a[1]) != b[2]:
                raise JBIG2Error("Huffman table ranges not contiguous")
        lowers = [ln for ln in self.lines if ln[3] == _LOWER]
        uppers = [ln for ln in self.lines if ln[3] == _UPPER]
        if normals:
            if lowers and lowers[0][2] != normals[0][2] - 1:
                raise JBIG2Error("lower-range line does not meet table")
            if uppers and uppers[0][2] != (
                normals[-1][2] + (1 << normals[-1][1])
            ):
                raise JBIG2Error("upper-range line does not meet table")

    # -- decode ------------------------------------------------------

    def decode(self, br: BitReader):
        lut = self._lut
        if lut is None:
            self._build_lut()
            lut = self._lut
        # One peek resolves any code up to _lut_bits long (the prefix
        # property makes pad bits past the buffer end don't-cares);
        # longer codes, unassigned prefixes and truncation fall back
        # to the exact per-bit walk below, which reproduces the old
        # reader's behavior bit for bit.
        ln = lut[br.peek_pad(self._lut_bits)]
        if ln is not None and br.pos + ln[0] <= br._nbits:
            br.pos += ln[0]
        else:
            length = 0
            code = 0
            dm = self._decode_map
            while True:
                code = (code << 1) | br.bit()
                length += 1
                ln = dm.get((length, code))
                if ln is not None:
                    break
                if length > 32:
                    raise JBIG2Error("Huffman prefix longer than any code")
        preflen, rangelen, rangelow, kind = ln
        if kind == _OOBK:
            return OOB
        if kind == _LOWER:
            return rangelow - br.bits(32)
        if kind == _UPPER:
            return rangelow + br.bits(32)
        return rangelow + br.bits(rangelen)

    # -- encode (fixture twin) --------------------------------------

    def _line_for(self, value):
        for ln in self.lines:
            if ln[3] == _NORMAL and ln[2] <= value < ln[2] + (1 << ln[1]):
                return ln
        for ln in self.lines:
            if ln[3] == _LOWER and value <= ln[2]:
                return ln
            if ln[3] == _UPPER and value >= ln[2]:
                return ln
        raise JBIG2Error(f"value {value} not representable in table")

    def encode(self, bw: BitWriter, value) -> None:
        if value is OOB:
            for ln in self.lines:
                if ln[3] == _OOBK:
                    code, preflen = self._encode_map[id(ln)]
                    bw.bits(code, preflen)
                    return
            raise JBIG2Error("table has no OOB line")
        ln = self._line_for(value)
        code, preflen = self._encode_map[id(ln)]
        bw.bits(code, preflen)
        if ln[3] == _LOWER:
            bw.bits(ln[2] - value, 32)
        elif ln[3] == _UPPER:
            bw.bits(value - ln[2], 32)
        elif ln[1]:
            bw.bits(value - ln[2], ln[1])


def _t(preflen, rangelen, rangelow, kind=_NORMAL):
    return (preflen, rangelen, rangelow, kind)


#: Annex B standard tables that survived transcription validation
#: (Kraft completeness + range contiguity, checked at import).
_STD_LINES = {
    1: [_t(1, 4, 0), _t(2, 8, 16), _t(3, 16, 272),
        _t(3, 32, 65808, _UPPER)],
    2: [_t(1, 0, 0), _t(2, 0, 1), _t(3, 0, 2), _t(4, 3, 3),
        _t(5, 6, 11), _t(6, 32, 75, _UPPER), _t(6, 0, 0, _OOBK)],
    3: [_t(8, 8, -256), _t(1, 0, 0), _t(2, 0, 1), _t(3, 0, 2),
        _t(4, 3, 3), _t(5, 6, 11), _t(8, 32, -257, _LOWER),
        _t(7, 32, 75, _UPPER), _t(6, 0, 0, _OOBK)],
    4: [_t(1, 0, 1), _t(2, 0, 2), _t(3, 0, 3), _t(4, 3, 4),
        _t(5, 6, 12), _t(5, 32, 76, _UPPER)],
    5: [_t(7, 8, -255), _t(1, 0, 1), _t(2, 0, 2), _t(3, 0, 3),
        _t(4, 3, 4), _t(5, 6, 12), _t(7, 32, -256, _LOWER),
        _t(6, 32, 76, _UPPER)],
    6: [_t(5, 10, -2048), _t(4, 9, -1024), _t(4, 8, -512),
        _t(4, 7, -256), _t(5, 6, -128), _t(5, 5, -64), _t(4, 5, -32),
        _t(2, 7, 0), _t(3, 7, 128), _t(3, 8, 256), _t(4, 9, 512),
        _t(4, 10, 1024), _t(6, 32, -2049, _LOWER),
        _t(6, 32, 2048, _UPPER)],
    7: [_t(4, 9, -1024), _t(3, 8, -512), _t(4, 7, -256),
        _t(5, 6, -128), _t(5, 5, -64), _t(4, 5, -32), _t(2, 7, 0),
        _t(3, 7, 128), _t(3, 8, 256), _t(4, 9, 512),
        _t(5, 10, 1024), _t(6, 32, -1025, _LOWER),
        _t(6, 32, 2048, _UPPER)],
    8: [_t(8, 3, -15), _t(9, 1, -7), _t(8, 1, -5), _t(9, 0, -3),
        _t(7, 0, -2), _t(4, 0, -1), _t(2, 1, 0), _t(5, 0, 2),
        _t(6, 0, 3), _t(3, 4, 4), _t(6, 1, 20), _t(4, 4, 22),
        _t(4, 5, 38), _t(5, 6, 70), _t(5, 7, 134), _t(6, 7, 262),
        _t(7, 8, 390), _t(6, 10, 646), _t(9, 32, -16, _LOWER),
        _t(9, 32, 1670, _UPPER), _t(2, 0, 0, _OOBK)],
    9: [_t(8, 4, -31), _t(9, 2, -15), _t(8, 2, -11), _t(9, 1, -7),
        _t(7, 1, -5), _t(4, 1, -3), _t(3, 1, -1), _t(3, 1, 1),
        _t(5, 1, 3), _t(6, 1, 5), _t(3, 5, 7), _t(6, 2, 39),
        _t(4, 5, 43), _t(4, 6, 75), _t(5, 7, 139), _t(5, 8, 267),
        _t(6, 8, 523), _t(7, 9, 779), _t(6, 11, 1291),
        _t(9, 32, -32, _LOWER), _t(9, 32, 3339, _UPPER),
        _t(2, 0, 0, _OOBK)],
    # B.10 (round-10): transcribed from T.88 Table B.10. NOT a
    # doubled B.9 — the published table keeps a 4-value preflen-2
    # center row at -2, seven single-value rows around it, and a
    # 64-value preflen-2 row at 6; its Kraft sum is 59/64
    # (incomplete by publication, see module doc).
    10: [_t(7, 4, -21), _t(8, 0, -5), _t(7, 0, -4), _t(5, 0, -3),
         _t(2, 2, -2), _t(5, 0, 2), _t(6, 0, 3), _t(7, 0, 4),
         _t(8, 0, 5), _t(2, 6, 6), _t(5, 5, 70), _t(6, 5, 102),
         _t(7, 6, 134), _t(8, 7, 198), _t(9, 8, 326),
         _t(10, 9, 582), _t(11, 10, 1094), _t(12, 11, 2118),
         _t(13, 32, -22, _LOWER), _t(13, 32, 4166, _UPPER),
         _t(2, 0, 0, _OOBK)],
    11: [_t(1, 0, 1), _t(2, 1, 2), _t(4, 0, 4), _t(4, 1, 5),
         _t(5, 1, 7), _t(5, 2, 9), _t(6, 2, 13), _t(7, 2, 17),
         _t(7, 3, 21), _t(7, 4, 29), _t(7, 5, 45), _t(7, 6, 77),
         _t(7, 32, 141, _UPPER)],
    12: [_t(1, 0, 1), _t(2, 0, 2), _t(3, 1, 3), _t(5, 0, 5),
         _t(5, 1, 6), _t(6, 1, 8), _t(7, 0, 10), _t(7, 1, 11),
         _t(7, 2, 13), _t(7, 3, 17), _t(7, 4, 25), _t(8, 5, 41),
         _t(8, 32, 73, _UPPER)],
    13: [_t(1, 0, 1), _t(3, 0, 2), _t(4, 0, 3), _t(5, 0, 4),
         _t(4, 1, 5), _t(3, 3, 7), _t(6, 1, 15), _t(6, 2, 17),
         _t(6, 3, 21), _t(6, 4, 29), _t(6, 5, 45), _t(7, 6, 77),
         _t(7, 32, 141, _UPPER)],
    14: [_t(3, 0, -2), _t(3, 0, -1), _t(1, 0, 0), _t(3, 0, 1),
         _t(3, 0, 2)],
    15: [_t(7, 4, -24), _t(6, 2, -8), _t(5, 1, -4), _t(4, 0, -2),
         _t(3, 0, -1), _t(1, 0, 0), _t(3, 0, 1), _t(4, 0, 2),
         _t(5, 1, 3), _t(6, 2, 5), _t(7, 4, 9),
         _t(7, 32, -25, _LOWER), _t(7, 32, 25, _UPPER)],
}

_STD_CACHE: dict = {}

#: Published Kraft sums — 1 (complete) everywhere except B.10,
#: whose published code leaves 5/64 of the code space unused.
_STD_KRAFT = {10: Fraction(59, 64)}


def standard_table(index: int) -> HuffTable:
    """Standard table B.<index> (all fifteen transcribed; B.10's
    published-incomplete Kraft sum is pinned — see the module
    doc)."""
    if index not in _STD_LINES:
        raise JBIG2Error(f"no standard Huffman table B.{index}")
    tb = _STD_CACHE.get(index)
    if tb is None:
        tb = HuffTable(_STD_LINES[index])
        tb.check_complete_and_contiguous(_STD_KRAFT.get(index, 1))
        _STD_CACHE[index] = tb
    return tb


# ---------------------------------------------------------------
# Custom table segments (§7.4.13, segment type 53)
# ---------------------------------------------------------------


def parse_table_segment(data: bytes) -> HuffTable:
    """Custom table segment data → :class:`HuffTable`."""
    if len(data) < 9:
        raise JBIG2Error("truncated table segment")
    flags = data[0]
    htoob = flags & 1
    htps = ((flags >> 1) & 7) + 1  # prefix-length field size in bits
    htrs = ((flags >> 4) & 7) + 1  # range-length field size in bits
    low, high = struct.unpack_from(">ii", data, 1)
    if low > high:
        raise JBIG2Error("table segment HTLOW > HTHIGH")
    br = BitReader(data, 9)
    lines = []
    cur = low
    while cur < high:
        preflen = br.bits(htps)
        rangelen = br.bits(htrs)
        if rangelen > 32:
            raise JBIG2Error("table range length > 32")
        lines.append(_t(preflen, rangelen, cur))
        cur += 1 << rangelen
    lines.append(_t(br.bits(htps), 32, low - 1, _LOWER))
    lines.append(_t(br.bits(htps), 32, high, _UPPER))
    if htoob:
        lines.append(_t(br.bits(htps), 0, 0, _OOBK))
    return HuffTable(lines)


def build_table_segment(ranges, low: int, high: int,
                        lower_len: int, upper_len: int,
                        oob_len: int = 0) -> bytes:
    """Author a custom table segment (fixture twin): ``ranges`` is a
    list of (preflen, rangelen) tiling [low, high)."""
    htps = max(
        (pl.bit_length() for pl, _ in ranges),
        default=1,
    )
    htps = max(htps, lower_len.bit_length(), upper_len.bit_length(),
               oob_len.bit_length(), 1)
    htrs = max((rl.bit_length() for _, rl in ranges), default=1) or 1
    out = bytearray()
    out.append((1 if oob_len else 0) | ((htps - 1) << 1)
               | ((htrs - 1) << 4))
    out += struct.pack(">ii", low, high)
    bw = BitWriter()
    cur = low
    for preflen, rangelen in ranges:
        bw.bits(preflen, htps)
        bw.bits(rangelen, htrs)
        cur += 1 << rangelen
    if cur < high:
        raise JBIG2Error("ranges do not reach HTHIGH")
    bw.bits(lower_len, htps)
    bw.bits(upper_len, htps)
    if oob_len:
        bw.bits(oob_len, htps)
    return bytes(out) + bw.getvalue()


# ---------------------------------------------------------------
# Symbol-ID code table via runcodes (§7.4.4.5)
# ---------------------------------------------------------------


def read_symbol_id_codes(br: BitReader, nsyms: int) -> HuffTable:
    """Decode the symbol-ID Huffman code lengths (35 runcodes, each
    length a 4-bit field; runcode 32 repeats the previous length
    3+bits(2) times, 33 emits 3+bits(3) zeros, 34 emits 11+bits(7)
    zeros), build the canonical code, and byte-align (the section's
    final step)."""
    runlens = [(br.bits(4), 0, i, _NORMAL) for i in range(35)]
    runtab = HuffTable(runlens)
    lengths = []
    prev = 0
    while len(lengths) < nsyms:
        rc = runtab.decode(br)
        if rc is OOB:
            raise JBIG2Error("OOB runcode")
        if rc < 32:
            lengths.append(rc)
            prev = rc
        elif rc == 32:
            lengths.extend([prev] * (3 + br.bits(2)))
        elif rc == 33:
            lengths.extend([0] * (3 + br.bits(3)))
        else:
            lengths.extend([0] * (11 + br.bits(7)))
    if len(lengths) > nsyms:
        raise JBIG2Error("runcodes overrun the symbol count")
    br.align()
    lines = [(ln, 0, i, _NORMAL) for i, ln in enumerate(lengths) if ln]
    if not lines:
        raise JBIG2Error("no symbol has a code length")
    return HuffTable(lines)


def write_symbol_id_codes(bw: BitWriter, nsyms: int) -> HuffTable:
    """Fixture twin of :func:`read_symbol_id_codes`: emit the
    simplest legal encoding — one runcode (= the uniform code length
    L) gets runcode-length 1, every symbol's length is that single
    1-bit code."""
    L = max(1, (nsyms - 1).bit_length())
    for i in range(35):
        bw.bits(1 if i == L else 0, 4)
    for _ in range(nsyms):
        bw.bit(0)  # the single runcode's canonical code is '0'
    bw.align()
    return HuffTable([(L, 0, i, _NORMAL) for i in range(nsyms)])
