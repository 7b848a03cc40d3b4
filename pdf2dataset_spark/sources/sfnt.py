"""Minimal TrueType (sfnt) ``cmap`` access — CID text without /ToUnicode.

A Type0/CIDFontType2 font SHOULD carry a /ToUnicode CMap, but real
PDF generators frequently omit it; the text is then only recoverable
from the embedded font program itself: the TrueType ``cmap`` table
maps unicode → glyph id, and with the usual ``/Encoding /Identity-H``
+ ``/CIDToGIDMap /Identity`` combination the content stream's 2-byte
CIDs ARE glyph ids — so inverting the cmap recovers the text.

Scope: cmap subtable formats 4 (segmented BMP — what practically
every TrueType font carries), 12 (segmented coverage, full Unicode),
6 (trimmed) and 0 (byte). CFF-based CID fonts (/FontFile3) are out of
scope — their glyph→string mapping needs a CFF charset parser — and
stay on the documented Latin-1-ish fallback.

``build_sfnt_cmap`` writes a minimal font whose cmap encodes a given
mapping — the fixture inverse of :func:`gid_to_unicode`, same pattern
as ``minipdf.build_pdf`` / ``ccitt.encode_g4``.
"""

from __future__ import annotations

import struct

#: (platformID, encodingID) preference for unicode-carrying subtables.
_ENCODING_SCORE = {
    (3, 10): 5,  # Windows, UCS-4
    (0, 4): 5,   # Unicode, 2.0+ full
    (0, 6): 5,
    (3, 1): 4,   # Windows, BMP — the ubiquitous one
    (0, 3): 4,   # Unicode 2.0 BMP
    (0, 2): 3,
    (0, 1): 3,
    (0, 0): 2,
}


def _u16(b: bytes, off: int) -> int:
    return struct.unpack(">H", b[off : off + 2])[0]


def _u32(b: bytes, off: int) -> int:
    return struct.unpack(">I", b[off : off + 4])[0]


def unicode_to_gid(font: bytes) -> dict[int, int]:
    """Parse the best unicode cmap subtable: codepoint → glyph id."""
    if len(font) < 12:
        raise ValueError("not an sfnt font: too short")
    tag = font[:4]
    if tag not in (b"\x00\x01\x00\x00", b"true", b"OTTO", b"ttcf"):
        raise ValueError("not an sfnt font: bad version tag")
    if tag == b"ttcf":  # font collection: use the first face
        if len(font) < 16:
            raise ValueError("truncated ttc header")
        return unicode_to_gid_at(font, _u32(font, 12))
    return unicode_to_gid_at(font, 0)


def unicode_to_gid_at(font: bytes, face_off: int) -> dict[int, int]:
    num_tables = _u16(font, face_off + 4)
    cmap_off = None
    for i in range(num_tables):
        rec = face_off + 12 + 16 * i
        if font[rec : rec + 4] == b"cmap":
            cmap_off = _u32(font, rec + 8)
            break
    if cmap_off is None:
        raise ValueError("sfnt has no cmap table")
    n = _u16(font, cmap_off + 2)
    best: tuple[int, int] | None = None
    for i in range(n):
        rec = cmap_off + 4 + 8 * i
        pe = (_u16(font, rec), _u16(font, rec + 2))
        sub = cmap_off + _u32(font, rec + 4)
        score = _ENCODING_SCORE.get(pe, 0)
        if score and (best is None or score > best[0]):
            best = (score, sub)
    if best is None:
        raise ValueError("cmap has no unicode subtable")
    return _parse_subtable(font, best[1])


def _parse_subtable(font: bytes, off: int) -> dict[int, int]:
    fmt = _u16(font, off)
    out: dict[int, int] = {}
    if fmt == 0:  # byte encoding
        for c in range(256):
            g = font[off + 6 + c]
            if g:
                out[c] = g
    elif fmt == 4:  # segmented BMP
        seg2 = _u16(font, off + 6)
        nseg = seg2 // 2
        ends = off + 14
        starts = ends + seg2 + 2  # +2: reservedPad
        deltas = starts + seg2
        ranges = deltas + seg2
        for i in range(nseg):
            end = _u16(font, ends + 2 * i)
            start = _u16(font, starts + 2 * i)
            (delta,) = struct.unpack(">h", font[deltas + 2 * i : deltas + 2 * i + 2])
            ro = _u16(font, ranges + 2 * i)
            if start == 0xFFFF:
                continue  # the mandatory terminator segment
            for c in range(start, min(end, 0xFFFE) + 1):
                if ro == 0:
                    g = (c + delta) & 0xFFFF
                else:
                    # spec pointer arithmetic: glyph id lives at
                    # idRangeOffset[i] + (c-start)*2 bytes past the
                    # idRangeOffset entry itself
                    gi = ranges + 2 * i + ro + 2 * (c - start)
                    if gi + 2 > len(font):
                        continue
                    g = _u16(font, gi)
                    if g:
                        g = (g + delta) & 0xFFFF
                if g:
                    out[c] = g
    elif fmt == 6:  # trimmed table
        first = _u16(font, off + 6)
        count = _u16(font, off + 8)
        for i in range(count):
            g = _u16(font, off + 10 + 2 * i)
            if g:
                out[first + i] = g
    elif fmt == 12:  # segmented coverage (32-bit)
        # Bound total mapped codepoints: a single valid-looking group
        # with end=0xFFFFFFFF would otherwise expand to ~4G dict
        # entries from a 12-byte record (untrusted embedded fonts
        # reach here via page_fonts). Unicode itself tops out at
        # 0x10FFFF, so 2^20+ mappings means a hostile/corrupt table.
        _MAX_MAPPED = 1 << 20
        ngroups = _u32(font, off + 12)
        for i in range(ngroups):
            rec = off + 16 + 12 * i
            start, end, sgid = struct.unpack(">III", font[rec : rec + 12])
            if end < start or end > 0x10FFFF:
                continue  # span outside Unicode: corrupt group
            span = min(end - start + 1, _MAX_MAPPED - len(out))
            if span <= 0:
                break  # budget exhausted: keep what's mapped so far
            for j in range(span):
                out[start + j] = sgid + j
    else:
        raise ValueError(f"cmap subtable format {fmt} not supported")
    return out


def table(font: bytes, tag: bytes) -> bytes | None:
    """Raw bytes of the first face's ``tag`` table, or None — used to
    pull the ``CFF `` table out of an OpenType-wrapped (OTTO) CID
    font so sources/cff can parse its charset."""
    if len(font) < 12:
        raise ValueError("not an sfnt font: too short")
    face_off = 0
    if font[:4] == b"ttcf":
        if len(font) < 16:
            raise ValueError("truncated ttc header")
        face_off = _u32(font, 12)
    num_tables = _u16(font, face_off + 4)
    for i in range(num_tables):
        rec = face_off + 12 + 16 * i
        if font[rec : rec + 4] == tag:
            off, length = _u32(font, rec + 8), _u32(font, rec + 12)
            if off + length > len(font):
                raise ValueError(f"sfnt table {tag!r} out of bounds")
            return font[off : off + length]
    return None


def gid_to_unicode(font: bytes) -> dict[int, str]:
    """Inverted cmap: glyph id → unicode char. When several
    codepoints share a glyph (common for space/nbsp), the LOWEST
    codepoint wins — deterministic and almost always the plain form."""
    u2g = unicode_to_gid(font)
    out: dict[int, str] = {}
    for c in sorted(u2g):
        g = u2g[c]
        if g not in out:
            out[g] = chr(c)
    return out


def build_sfnt_cmap(
    mapping: dict[int, int],
    extra_tables: dict[bytes, bytes] | None = None,
    version_tag: int = 0x00010000,
) -> bytes:
    """Minimal sfnt carrying a format-4 cmap that encodes ``mapping``
    (codepoint → glyph id) — one segment per codepoint plus the
    mandatory 0xFFFF terminator — plus any ``extra_tables``
    ({4-byte tag → raw bytes}, e.g. a ``CFF `` table with
    ``version_tag=0x4F54544F`` 'OTTO' for an OpenType CID fixture).
    Fixture-writer inverse of :func:`unicode_to_gid` /
    :func:`table`; not a renderable font (no glyf/head), but a
    spec-valid table layout for cmap consumers."""
    segs = sorted(mapping)
    nseg = len(segs) + 1  # + terminator
    seg2 = 2 * nseg
    # binary-search header fields per spec
    import math

    search_range = 2 * (2 ** int(math.floor(math.log2(nseg))))
    entry_sel = int(math.floor(math.log2(nseg)))
    sub = struct.pack(
        ">HHHHHHH",
        4,  # format
        16 + 8 * nseg,  # length: header(14) + 4 arrays + pad(2)
        0,  # language
        seg2,
        search_range,
        entry_sel,
        seg2 - search_range,
    )
    ends = b"".join(struct.pack(">H", c) for c in segs) + b"\xff\xff"
    starts = b"".join(struct.pack(">H", c) for c in segs) + b"\xff\xff"
    def signed_delta(c: int) -> int:
        d = (mapping[c] - c) % 0x10000  # (c + delta) & 0xFFFF == gid
        return d - 0x10000 if d >= 0x8000 else d

    deltas = b"".join(
        struct.pack(">h", signed_delta(c)) for c in segs
    ) + struct.pack(">h", 1)
    ranges = b"\x00\x00" * nseg
    subtable = sub + ends + b"\x00\x00" + starts + deltas + ranges
    cmap = struct.pack(">HH", 0, 1) + struct.pack(">HHI", 3, 1, 12) + subtable
    tables = {b"cmap": cmap, **(extra_tables or {})}
    tags = sorted(tables)  # table records must be tag-sorted per spec
    header = struct.pack(">IHHHH", version_tag, len(tables), 16, 0, 0)
    data_off = 12 + 16 * len(tables)
    recs, body = b"", b""
    for tag in tags:
        tbl = tables[tag]
        recs += tag + struct.pack(">III", 0, data_off + len(body), len(tbl))
        body += tbl + b"\x00" * (-len(tbl) % 4)  # 4-byte table alignment
    return header + recs + body
