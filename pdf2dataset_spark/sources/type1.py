"""Minimal Type1 (PostScript) font parsing — built-in encoding
recovery for ``/FontFile`` embedded fonts.

The third member of the embedded-font trio (TrueType ``/FontFile2``
via :mod:`sources.sfnt`, CFF ``/FontFile3`` via :mod:`sources.cff`):
an old-school Type1 program defines its encoding in PostScript as
either ``/Encoding StandardEncoding def`` or a custom array built
with ``dup <code> /<glyphname> put`` entries. Subset fonts emitted by
TeX/old distillers routinely use the custom form with no PDF-side
/Encoding dict and no /ToUnicode — Latin-1 fallback then garbles the
text, while the font itself spells out the mapping in cleartext.

Scope:
- PFB segmented files (0x80-marker blocks) and raw PFA/PT1 bytes.
- The cleartext portion is searched for the Encoding definition;
  when it only appears inside the eexec-encrypted portion (rare),
  that portion is decrypted with the fixed-key eexec cipher
  (r=55665, c1=52845, c2=22719 — public Adobe Type 1 spec §7.2) and
  searched the same way. Hex-form eexec data is de-hexed first.
- ``StandardEncoding``/``ISOLatin1Encoding`` definitions return {}
  (the caller's base-encoding default already covers them; only
  custom arrays carry new information).

``build_type1`` writes a minimal cleartext font realizing a custom
encoding — the fixture twin for round-trip tests.
"""

from __future__ import annotations

import re

_DUP_RE = re.compile(rb"dup\s+(\d+)\s*/([^\s/\(\)\[\]{}<>]+)\s+put")
_ENC_DEF_RE = re.compile(rb"/Encoding\s+(StandardEncoding|ISOLatin1Encoding)\s+def")


def _pfb_segments(data: bytes) -> bytes:
    """Join a PFB file's ASCII+binary segments in order; raw PFA/PT1
    input returns unchanged."""
    if not data.startswith(b"\x80"):
        return data
    out = bytearray()
    pos = 0
    while pos + 6 <= len(data) and data[pos] == 0x80:
        kind = data[pos + 1]
        if kind == 3:  # EOF marker
            break
        ln = int.from_bytes(data[pos + 2 : pos + 6], "little")
        out += data[pos + 6 : pos + 6 + ln]
        pos += 6 + ln
    return bytes(out)


def _eexec_decrypt(data: bytes) -> bytes:
    """Fixed-key eexec decryption (Type 1 spec §7.2); first 4 output
    bytes are random lead-in and dropped."""
    r = 55665
    c1, c2 = 52845, 22719
    out = bytearray()
    for b in data:
        out.append(b ^ (r >> 8))
        r = ((b + r) * c1 + c2) & 0xFFFF
    return bytes(out[4:])


def code_to_glyph_names(data: bytes) -> dict[int, str]:
    """Parse a Type1 program's built-in encoding into
    ``{byte code → glyph name}``. Returns {} for standard-encoding
    fonts or when no custom array is found — callers keep their
    existing fallback rather than guessing."""
    text = _pfb_segments(data)
    ee = text.find(b"eexec")
    clear = text if ee < 0 else text[:ee]
    enc_at = clear.find(b"/Encoding")
    if enc_at >= 0:
        if _ENC_DEF_RE.search(clear, enc_at):
            return {}
        # custom array: dup/put entries up to 'readonly def' or eexec
        end = clear.find(b" def", enc_at)
        region = clear[enc_at : end if end > 0 else len(clear)]
        out = {
            int(m.group(1)): m.group(2).decode("latin-1")
            for m in _DUP_RE.finditer(region)
            if int(m.group(1)) < 256
        }
        if out:
            return out
    if ee < 0:
        return {}
    # Encoding hidden in the encrypted portion (rare): decrypt and retry
    enc_data = text[ee + 5 :].lstrip(b"\r\n\t ")
    # hex-form eexec data: all hex digits/whitespace in the first 4 bytes
    head = bytes(enc_data[:4])
    if all(c in b"0123456789abcdefABCDEF \r\n\t" for c in head):
        hex_str = re.sub(rb"[^0-9A-Fa-f]", b"", enc_data)
        try:
            enc_data = bytes.fromhex(hex_str.decode("ascii"))
        except ValueError:
            return {}
    plain = _eexec_decrypt(enc_data)
    enc_at = plain.find(b"/Encoding")
    if enc_at < 0 or _ENC_DEF_RE.search(plain, enc_at):
        return {}
    end = plain.find(b" def", enc_at)
    region = plain[enc_at : end if end > 0 else len(plain)]
    return {
        int(m.group(1)): m.group(2).decode("latin-1")
        for m in _DUP_RE.finditer(region)
        if int(m.group(1)) < 256
    }


def build_type1(code_to_name: dict[int, str], font_name: str = "TestT1") -> bytes:
    """Write a minimal cleartext Type1 program realizing a custom
    encoding — the parsing inverse of :func:`code_to_glyph_names` for
    fixtures (structurally a PFA: header, custom Encoding array,
    eexec marker with dummy encrypted payload, 512 zeros trailer)."""
    lines = [
        b"%!PS-AdobeFont-1.0: " + font_name.encode("latin-1") + b" 001.001",
        b"/FontName /" + font_name.encode("latin-1") + b" def",
        b"/FontType 1 def",
        b"/Encoding 256 array",
        b"0 1 255 {1 index exch /.notdef put} for",
    ]
    for code in sorted(code_to_name):
        lines.append(
            b"dup %d /%s put" % (code, code_to_name[code].encode("latin-1"))
        )
    lines += [
        b"readonly def",
        b"currentdict end",
        b"currentfile eexec",
        b"0" * 64,
        b"0" * 512,
        b"cleartomark",
    ]
    return b"\n".join(lines) + b"\n"
