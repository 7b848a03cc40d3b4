"""Minimal CFF (Compact Font Format / Type1C) parsing — built-in
encoding recovery for simple fonts.

A subset Type1/Type1C font embedded as ``/FontFile3`` often carries a
CUSTOM built-in encoding (code → glyph) with no PDF-side /Encoding
dict and no /ToUnicode CMap; decoding its show-ops as Latin-1 then
yields garbage. The font itself knows better: its Encoding table maps
byte codes to glyphs, its charset maps glyphs to SIDs, and SIDs name
glyphs (standard strings + String INDEX) — names that the AGL maps to
unicode. This module extracts that ``code → glyph-name`` table;
``minipdf.page_fonts`` turns names into text via its AGL subset.

Scope (per the CFF spec, Adobe TN #5176):
- INDEX structures, DICT operand encodings (ints, 16/32-bit, reals).
- Charset formats 0/1/2; predefined charset 0 (ISOAdobe, SID == GID).
- Encoding formats 0/1 plus supplements (high bit). PREDEFINED
  encodings (Standard/Expert) return {} — the PDF-side base-encoding
  default already covers those fonts, and the interesting failure is
  exactly the custom-encoding subset.
- CID-keyed fonts (ROS in the Top DICT) return {} from
  :func:`code_to_glyph_names`: their charset maps GID→CID, not to
  named glyphs. :func:`cid_font_info` parses that charset (GID→CID,
  inverted to CID→GID), the FDArray and the FDSelect (formats 0/3)
  instead, so a Type0/CIDFontType0 consumer can compose the mapping
  with an sfnt ``cmap`` (OpenType-wrapped CFF) to recover unicode;
  :func:`gid_to_name` serves the name-keyed-CFF-in-a-CIDFont-slot
  case (ISO 32000-1 §9.7.4.2: the CID is then used as the GID).
  A bare CID-keyed CFF with no cmap stays a documented fallback —
  its CIDs are registry-ordering values with no in-font unicode.
- Standard strings 0-228 (the text-bearing set) are transcribed; the
  Expert-set tail (229-390: small-caps/oldstyle variants) resolves to
  opaque ``sidNNN`` names the AGL lookup rejects — honest unknowns.

``build_cff`` writes a minimal valid CFF with a given custom encoding
— the fixture twin used by the round-trip tests and PDF goldens.
"""

from __future__ import annotations

import struct

# CFF standard strings 0-228 (Appendix A): the Latin text set.
_STD_STRINGS = (
    ".notdef space exclam quotedbl numbersign dollar percent ampersand "
    "quoteright parenleft parenright asterisk plus comma hyphen period "
    "slash zero one two three four five six seven eight nine colon "
    "semicolon less equal greater question at A B C D E F G H I J K L M "
    "N O P Q R S T U V W X Y Z bracketleft backslash bracketright "
    "asciicircum underscore quoteleft a b c d e f g h i j k l m n o p q "
    "r s t u v w x y z braceleft bar braceright asciitilde exclamdown "
    "cent sterling fraction yen florin section currency quotesingle "
    "quotedblleft guillemotleft guilsinglleft guilsinglright fi fl "
    "endash dagger daggerdbl periodcentered paragraph bullet "
    "quotesinglbase quotedblbase quotedblright guillemotright ellipsis "
    "perthousand questiondown grave acute circumflex tilde macron breve "
    "dotaccent dieresis ring cedilla hungarumlaut ogonek caron emdash "
    "AE ordfeminine Lslash Oslash OE ordmasculine ae dotlessi lslash "
    "oslash oe germandbls onesuperior logicalnot mu trademark Eth "
    "onehalf plusminus Thorn onequarter divide brokenbar degree thorn "
    "threequarters twosuperior registered minus eth multiply "
    "threesuperior copyright Aacute Acircumflex Adieresis Agrave Aring "
    "Atilde Ccedilla Eacute Ecircumflex Edieresis Egrave Iacute "
    "Icircumflex Idieresis Igrave Ntilde Oacute Ocircumflex Odieresis "
    "Ograve Otilde Scaron Uacute Ucircumflex Udieresis Ugrave Yacute "
    "Ydieresis Zcaron aacute acircumflex adieresis agrave aring atilde "
    "ccedilla eacute ecircumflex edieresis egrave iacute icircumflex "
    "idieresis igrave ntilde oacute ocircumflex odieresis ograve otilde "
    "scaron uacute ucircumflex udieresis ugrave yacute ydieresis zcaron"
).split()
N_STD_SIDS = 391  # SIDs below this index the standard set


def _read_index(data: bytes, off: int) -> tuple[list[bytes], int]:
    """One CFF INDEX at ``off`` → (entries, offset past the INDEX)."""
    if off + 2 > len(data):
        raise ValueError("CFF INDEX truncated")
    count = struct.unpack_from(">H", data, off)[0]
    if count == 0:
        return [], off + 2
    off_size = data[off + 2]
    if not 1 <= off_size <= 4:
        raise ValueError("CFF INDEX offSize out of range")
    pos = off + 3
    offs = []
    for i in range(count + 1):
        chunk = data[pos : pos + off_size]
        if len(chunk) < off_size:
            raise ValueError("CFF INDEX offsets truncated")
        offs.append(int.from_bytes(chunk, "big"))
        pos += off_size
    base = pos - 1  # offsets are 1-based from the byte before data
    entries = []
    for i in range(count):
        a, b = base + offs[i], base + offs[i + 1]
        if not (0 <= a <= b <= len(data)):
            raise ValueError("CFF INDEX entry out of bounds")
        entries.append(data[a:b])
    return entries, base + offs[count]


def _parse_dict(data: bytes) -> dict[int, list]:
    """CFF DICT → {op (two-byte ops as 1200+b1): operands}."""
    out: dict[int, list] = {}
    operands: list = []
    i = 0
    while i < len(data):
        b0 = data[i]
        if b0 <= 21:  # operator
            if b0 == 12:
                if i + 1 >= len(data):
                    raise ValueError("CFF DICT truncated escape op")
                out[1200 + data[i + 1]] = operands
                i += 2
            else:
                out[b0] = operands
                i += 1
            operands = []
        elif 32 <= b0 <= 246:
            operands.append(b0 - 139)
            i += 1
        elif 247 <= b0 <= 250:
            operands.append((b0 - 247) * 256 + data[i + 1] + 108)
            i += 2
        elif 251 <= b0 <= 254:
            operands.append(-(b0 - 251) * 256 - data[i + 1] - 108)
            i += 2
        elif b0 == 28:
            operands.append(struct.unpack_from(">h", data, i + 1)[0])
            i += 3
        elif b0 == 29:
            operands.append(struct.unpack_from(">i", data, i + 1)[0])
            i += 5
        elif b0 == 30:  # real: nibble-coded, ends at 0xf nibble
            i += 1
            txt = ""
            done = False
            while i < len(data) and not done:
                for nib in (data[i] >> 4, data[i] & 0xF):
                    if nib <= 9:
                        txt += str(nib)
                    elif nib == 0xA:
                        txt += "."
                    elif nib == 0xB:
                        txt += "E"
                    elif nib == 0xC:
                        txt += "E-"
                    elif nib == 0xE:
                        txt += "-"
                    elif nib == 0xF:
                        done = True
                        break
                i += 1
            operands.append(float(txt or "0"))
        else:
            raise ValueError(f"invalid CFF DICT byte {b0}")
    return out


def _sid_name(sid: int, strings: list[bytes]) -> str:
    if sid < len(_STD_STRINGS):
        return _STD_STRINGS[sid]
    if sid < N_STD_SIDS:
        return f"sid{sid}"  # Expert-set tail: honest unknown
    i = sid - N_STD_SIDS
    if i < len(strings):
        return strings[i].decode("latin-1")
    return f"sid{sid}"


def _parse_charset(
    data: bytes, off: int, n_glyphs: int
) -> list[int] | None:
    """gid → SID. Predefined id 0 (ISOAdobe) is SID == GID; other
    predefined ids (Expert sets) return None."""
    if off == 0:
        return list(range(n_glyphs))
    if off in (1, 2):
        return None
    sids = [0]  # gid 0 = .notdef
    fmt = data[off]
    pos = off + 1
    if fmt == 0:
        for _ in range(n_glyphs - 1):
            sids.append(struct.unpack_from(">H", data, pos)[0])
            pos += 2
    elif fmt in (1, 2):
        width = 1 if fmt == 1 else 2
        while len(sids) < n_glyphs:
            first = struct.unpack_from(">H", data, pos)[0]
            n_left = (
                data[pos + 2]
                if width == 1
                else struct.unpack_from(">H", data, pos + 2)[0]
            )
            pos += 2 + width
            for j in range(n_left + 1):
                if len(sids) >= n_glyphs:
                    break
                sids.append(first + j)
    else:
        raise ValueError(f"unsupported CFF charset format {fmt}")
    return sids


def _parse_encoding(data: bytes, off: int) -> dict[int, int] | None:
    """code → gid for CUSTOM encodings (formats 0/1 + supplements).
    Predefined encodings (off 0/1) return None — the caller's
    base-encoding default covers those. Supplement entries map code →
    SID and are returned with gid = -(SID) - 1 (resolved by name)."""
    if off in (0, 1):
        return None
    fmt = data[off]
    supplemented = bool(fmt & 0x80)
    fmt &= 0x7F
    out: dict[int, int] = {}
    pos = off + 1
    if fmt == 0:
        n_codes = data[pos]
        pos += 1
        for gid in range(1, n_codes + 1):
            out[data[pos]] = gid
            pos += 1
    elif fmt == 1:
        n_ranges = data[pos]
        pos += 1
        gid = 1
        for _ in range(n_ranges):
            first, n_left = data[pos], data[pos + 1]
            pos += 2
            for j in range(n_left + 1):
                out[first + j] = gid
                gid += 1
    else:
        raise ValueError(f"unsupported CFF encoding format {fmt}")
    if supplemented:
        n_sups = data[pos]
        pos += 1
        for _ in range(n_sups):
            code = data[pos]
            sid = struct.unpack_from(">H", data, pos + 1)[0]
            out[code] = -sid - 1
            pos += 3
    return out


def _parse_fdselect(data: bytes, off: int, n_glyphs: int) -> list[int]:
    """FDSelect (CFF spec §19) → FD index per glyph. Formats 0
    (byte-per-glyph) and 3 (ranges) — the only two the spec defines."""
    fmt = data[off]
    if fmt == 0:
        chunk = data[off + 1 : off + 1 + n_glyphs]
        if len(chunk) < n_glyphs:
            raise ValueError("FDSelect format 0 truncated")
        return list(chunk)
    if fmt == 3:
        n_ranges = struct.unpack_from(">H", data, off + 1)[0]
        out = [0] * n_glyphs
        pos = off + 3
        for _ in range(n_ranges):
            first = struct.unpack_from(">H", data, pos)[0]
            fd = data[pos + 2]
            nxt = struct.unpack_from(">H", data, pos + 3)[0]
            if nxt < first:
                raise ValueError("FDSelect range out of order")
            for g in range(first, min(nxt, n_glyphs)):
                out[g] = fd
            pos += 3
        return out
    raise ValueError(f"unsupported FDSelect format {fmt}")


def _top_and_strings(font: bytes) -> tuple[dict[int, list], list[bytes]]:
    if len(font) < 4 or font[0] != 1:
        raise ValueError("not a CFF version-1 font")
    hdr_size = font[2]
    _, pos = _read_index(font, hdr_size)  # Name INDEX
    top_dicts, pos = _read_index(font, pos)
    if not top_dicts:
        raise ValueError("CFF has no Top DICT")
    strings, _ = _read_index(font, pos)
    return _parse_dict(top_dicts[0]), strings


def cid_font_info(font: bytes) -> dict | None:
    """Parse a CID-keyed CFF (ROS in the Top DICT, CFF spec §16-19):
    the charset as GID→CID (plus its CID→GID inverse — lowest GID
    wins on duplicate CIDs), the FDSelect (FD index per glyph) and
    the FDArray font DICTs. Returns None for a name-keyed font — the
    :func:`code_to_glyph_names` path owns those. Raises ValueError on
    malformed structures (the caller treats that as undecodable)."""
    top, strings = _top_and_strings(font)
    ros = top.get(1230)
    if ros is None:
        return None
    cs_off = top.get(17)
    if not cs_off:
        raise ValueError("CID-keyed CFF lacks CharStrings")
    charstrings, _ = _read_index(font, int(cs_off[0]))
    n_glyphs = len(charstrings)
    gid_to_cid = _parse_charset(font, int(top.get(15, [0])[0]), n_glyphs)
    if gid_to_cid is None:
        # predefined Expert charsets are name-keyed-only constructs;
        # a CID font pointing at them is malformed
        raise ValueError("CID-keyed CFF uses a predefined name charset")
    fds_off = top.get(1237)
    fd_of_gid = (
        _parse_fdselect(font, int(fds_off[0]), n_glyphs) if fds_off else
        [0] * n_glyphs
    )
    fd_dicts: list[dict[int, list]] = []
    fda_off = top.get(1236)
    if fda_off:
        fd_entries, _ = _read_index(font, int(fda_off[0]))
        fd_dicts = [_parse_dict(e) for e in fd_entries]
    if fd_dicts and any(fd >= len(fd_dicts) for fd in fd_of_gid):
        raise ValueError("FDSelect points past the FDArray")
    cid_to_gid: dict[int, int] = {}
    for gid, cid in enumerate(gid_to_cid):
        cid_to_gid.setdefault(cid, gid)
    return {
        "registry": _sid_name(int(ros[0]), strings),
        "ordering": _sid_name(int(ros[1]), strings),
        "supplement": int(ros[2]) if len(ros) > 2 else 0,
        "n_glyphs": n_glyphs,
        "gid_to_cid": gid_to_cid,
        "cid_to_gid": cid_to_gid,
        "fd_of_gid": fd_of_gid,
        "fd_dicts": fd_dicts,
    }


def gid_to_name(font: bytes) -> dict[int, str] | None:
    """Charset of a NAME-KEYED CFF as ``{gid → glyph name}`` (for the
    name-keyed-CFF-used-as-CIDFont case, where CID == GID per ISO
    32000-1 §9.7.4.2). Returns None when the font is CID-keyed or
    uses a predefined Expert charset."""
    top, strings = _top_and_strings(font)
    if 1230 in top:
        return None
    cs_off = top.get(17)
    if not cs_off:
        raise ValueError("CFF Top DICT lacks CharStrings")
    charstrings, _ = _read_index(font, int(cs_off[0]))
    sids = _parse_charset(font, int(top.get(15, [0])[0]), len(charstrings))
    if sids is None:
        return None
    return {gid: _sid_name(sid, strings) for gid, sid in enumerate(sids)}


def code_to_glyph_names(font: bytes) -> dict[int, str]:
    """Parse a (non-CID) CFF font's built-in encoding into
    ``{byte code → glyph name}``. Returns {} when the font is
    CID-keyed, uses a predefined encoding, or carries no custom
    mapping — the caller then keeps its existing fallback."""
    if len(font) < 4 or font[0] != 1:
        raise ValueError("not a CFF version-1 font")
    hdr_size = font[2]
    _, pos = _read_index(font, hdr_size)  # Name INDEX
    top_dicts, pos = _read_index(font, pos)
    if not top_dicts:
        raise ValueError("CFF has no Top DICT")
    strings, pos = _read_index(font, pos)
    top = _parse_dict(top_dicts[0])
    if 1230 in top:  # ROS → CID-keyed: charset is GID→CID, no names
        return {}
    cs_off = top.get(17)
    if not cs_off:
        raise ValueError("CFF Top DICT lacks CharStrings")
    charstrings, _ = _read_index(font, int(cs_off[0]))
    n_glyphs = len(charstrings)
    charset_off = int(top.get(15, [0])[0])
    enc_off = int(top.get(16, [0])[0])
    encoding = _parse_encoding(font, enc_off)
    if not encoding:
        return {}
    sids = _parse_charset(font, charset_off, n_glyphs)
    if sids is None:
        return {}
    out: dict[int, str] = {}
    for code, gid in encoding.items():
        if gid < 0:  # supplement: direct SID
            out[code] = _sid_name(-gid - 1, strings)
        elif 0 <= gid < n_glyphs:
            out[code] = _sid_name(sids[gid], strings)
    return out


# ------------------------------------------------------------------ fixture
def _write_index(entries: list[bytes]) -> bytes:
    if not entries:
        return struct.pack(">H", 0)
    body = b"".join(entries)
    off_size = 1 if len(body) + 1 < 256 else (2 if len(body) + 1 < 65536 else 4)
    out = struct.pack(">HB", len(entries), off_size)
    pos = 1
    offs = [pos]
    for e in entries:
        pos += len(e)
        offs.append(pos)
    for o in offs:
        out += o.to_bytes(off_size, "big")
    return out + body


def build_cff(code_to_name: dict[int, str], font_name: str = "TestFont") -> bytes:
    """Write a minimal valid CFF whose built-in encoding (format 0) and
    charset (format 0) realize ``code_to_name`` — the parsing inverse
    of :func:`code_to_glyph_names` for fixtures and PDF goldens.
    Glyph names already in the standard strings use their standard
    SID; others go to the String INDEX."""
    codes = sorted(code_to_name)
    std = {n: i for i, n in enumerate(_STD_STRINGS)}
    custom: list[bytes] = []
    sids = [0]  # .notdef
    for c in codes:
        name = code_to_name[c]
        if name in std:
            sids.append(std[name])
        else:
            custom.append(name.encode("latin-1"))
            sids.append(N_STD_SIDS + len(custom) - 1)
    n_glyphs = len(codes) + 1

    header = bytes([1, 0, 4, 1])
    name_index = _write_index([font_name.encode("latin-1")])
    string_index = _write_index(custom)
    gsubr_index = _write_index([])
    charstrings = _write_index([b"\x0e"] * n_glyphs)  # endchar each
    charset = b"\x00" + b"".join(
        struct.pack(">H", s) for s in sids[1:]
    )  # format 0
    encoding = bytes([0, len(codes)]) + bytes(codes)  # format 0

    def top_dict(cs_off: int, en_off: int, chs_off: int) -> bytes:
        def op29(v: int) -> bytes:
            return b"\x1d" + struct.pack(">i", v)

        return (
            op29(cs_off) + b"\x0f"   # charset
            + op29(en_off) + b"\x10"  # Encoding
            + op29(chs_off) + b"\x11"  # CharStrings
        )

    td_len = len(top_dict(0, 0, 0))
    # Top DICT INDEX size is stable because op29 is fixed-width
    tdi_len = len(_write_index([bytes(td_len)]))
    base = len(header) + len(name_index) + tdi_len + len(string_index) + len(
        gsubr_index
    )
    charset_off = base
    enc_off = charset_off + len(charset)
    chs_off = enc_off + len(encoding)
    top_index = _write_index([top_dict(charset_off, enc_off, chs_off)])
    assert len(top_index) == tdi_len
    return (
        header + name_index + top_index + string_index + gsubr_index
        + charset + encoding + charstrings
    )


def _encode_charset(cids: list[int], fmt: int) -> bytes:
    """Charset table (gid 0 = .notdef implied; ``cids`` covers gids
    1..n-1) in the requested format 0/1/2."""
    if fmt == 0:
        return b"\x00" + b"".join(struct.pack(">H", c) for c in cids)
    width, cap = (1, 0xFF) if fmt == 1 else (2, 0xFFFF)
    out = bytearray([fmt])
    i = 0
    while i < len(cids):
        first = cids[i]
        n_left = 0
        while (
            i + n_left + 1 < len(cids)
            and cids[i + n_left + 1] == first + n_left + 1
            and n_left < cap
        ):
            n_left += 1
        out += struct.pack(">H", first)
        out += bytes([n_left]) if width == 1 else struct.pack(">H", n_left)
        i += n_left + 1
    return bytes(out)


def _encode_fdselect(fd_of_gid: list[int], fmt: int) -> bytes:
    if fmt == 0:
        return b"\x00" + bytes(fd_of_gid)
    if fmt != 3:
        raise ValueError("FDSelect fixture format must be 0 or 3")
    ranges: list[tuple[int, int]] = []  # (first gid, fd)
    for gid, fd in enumerate(fd_of_gid):
        if not ranges or ranges[-1][1] != fd:
            ranges.append((gid, fd))
    out = b"\x03" + struct.pack(">H", len(ranges))
    for first, fd in ranges:
        out += struct.pack(">HB", first, fd)
    return out + struct.pack(">H", len(fd_of_gid))  # sentinel


def build_cff_cid(
    cid_of_gid: list[int],
    font_name: str = "TestCID",
    charset_fmt: int = 2,
    fdselect_fmt: int = 3,
    fd_of_gid: list[int] | None = None,
    registry: str = "Adobe",
    ordering: str = "Identity",
    supplement: int = 0,
) -> bytes:
    """Write a minimal valid CID-keyED CFF (ROS + charset + FDArray +
    FDSelect, CFF spec §16-19) whose charset realizes ``cid_of_gid``
    (the CID for each gid ≥ 1; gid 0 is .notdef) — the parsing
    inverse of :func:`cid_font_info` for fixtures and PDF goldens."""
    n_glyphs = len(cid_of_gid) + 1
    if fd_of_gid is None:
        fd_of_gid = [0] * n_glyphs
    if len(fd_of_gid) != n_glyphs:
        raise ValueError("fd_of_gid must cover every glyph incl. .notdef")
    n_fds = max(fd_of_gid) + 1

    header = bytes([1, 0, 4, 1])
    name_index = _write_index([font_name.encode("latin-1")])
    string_index = _write_index(
        [registry.encode("latin-1"), ordering.encode("latin-1")]
    )
    gsubr_index = _write_index([])
    charset = _encode_charset(cid_of_gid, charset_fmt)
    fdselect = _encode_fdselect(fd_of_gid, fdselect_fmt)
    charstrings = _write_index([b"\x0e"] * n_glyphs)

    def op29(v: int) -> bytes:
        return b"\x1d" + struct.pack(">i", v)

    def fd_dict(priv_off: int) -> bytes:
        # Private DICT op 18: [size, offset]; size 0 = empty private
        return op29(0) + op29(priv_off) + b"\x12"

    fd_len = len(fd_dict(0))

    def fd_array(priv_off: int) -> bytes:
        return _write_index([fd_dict(priv_off)] * n_fds)

    def top_dict(chs: int, cstr: int, fda: int, fds: int) -> bytes:
        return (
            op29(N_STD_SIDS) + op29(N_STD_SIDS + 1) + op29(supplement)
            + b"\x0c\x1e"  # ROS
            + op29(chs) + b"\x0f"     # charset
            + op29(cstr) + b"\x11"    # CharStrings
            + op29(fda) + b"\x0c\x24"  # FDArray
            + op29(fds) + b"\x0c\x25"  # FDSelect
        )

    tdi_len = len(_write_index([bytes(len(top_dict(0, 0, 0, 0)))]))
    base = (
        len(header) + len(name_index) + tdi_len + len(string_index)
        + len(gsubr_index)
    )
    charset_off = base
    fdselect_off = charset_off + len(charset)
    chs_off = fdselect_off + len(fdselect)
    fda_off = chs_off + len(charstrings)
    assert len(fd_array(0)) == len(fd_array(charset_off))
    top_index = _write_index(
        [top_dict(charset_off, chs_off, fda_off, fdselect_off)]
    )
    assert len(top_index) == tdi_len
    return (
        header + name_index + top_index + string_index + gsubr_index
        + charset + fdselect + charstrings + fd_array(charset_off)
    )
