"""Pure-stdlib page rasterization + pixel OCR (tiers A6/A7).

Upstream renders PDF pages with pdf2image/poppler and OCRs them with
pytesseract — native stacks absent here. This module makes the A6/A7
surface REAL without them:

- :func:`render_text_png` draws page text into a monochrome raster
  using a built-in deterministic 5×7 bitmap glyph table and encodes a
  spec-valid PNG (IHDR/IDAT/IEND, zlib scanlines, CRC32 — all
  stdlib). Glyphs are procedurally generated (multiplicative bit
  mixing of the codepoint), verified pairwise-distinct over printable
  ASCII — machine-legible rather than typographically pretty, which
  is exactly what the pipeline tests need: real bytes in a real
  format with recoverable content.
- :func:`decode_png` parses the PNG back to pixels (filter-0
  scanlines, i.e. what we emit).
- :func:`ocr_png` is an actual pixel-level OCR for that font: walks
  the character grid, matches each cell against the glyph table, and
  reconstructs the text — so render → bytes → OCR round-trips
  exactly at native resolution, and the image/ocr feature columns
  carry real image payloads through Arrow batches.

Resize (`image_size="WxH"`) is nearest-neighbor on the decoded
pixels; OCR of a resized image is out of scope (raises ValueError,
mirroring real OCR quality degradation).
"""

from __future__ import annotations

import struct
import zlib

GLYPH_W, GLYPH_H = 5, 7
CELL_W, CELL_H = GLYPH_W + 1, GLYPH_H + 3  # 1px kerning, 3px leading


def glyph_rows(ch: str) -> list[int]:
    """7 rows of 5-bit patterns for one character — deterministic
    multiplicative mixing, pairwise-distinct over printable ASCII
    (asserted in tests)."""
    c = ord(ch)
    rows = []
    for r in range(GLYPH_H):
        mixed = (c * 0x9E3779B1 + (r + 1) * 0x85EBCA77) & 0xFFFFFFFF
        mixed ^= mixed >> 13
        rows.append((mixed * 0xC2B2AE35 >> 16) & 0x1F)
    return rows


def _rasterize(text: str) -> tuple[int, int, bytearray]:
    lines = text.split("\n") or [""]
    n_cols = max((len(ln) for ln in lines), default=0) or 1
    w, h = n_cols * CELL_W, len(lines) * CELL_H
    px = bytearray(b"\xff" * (w * h))
    for li, line in enumerate(lines):
        for ci, ch in enumerate(line):
            rows = glyph_rows(ch)
            x0, y0 = ci * CELL_W, li * CELL_H
            for r, bits in enumerate(rows):
                for col in range(GLYPH_W):
                    if bits >> (GLYPH_W - 1 - col) & 1:
                        px[(y0 + r) * w + x0 + col] = 0
    return w, h, px


def _png_chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(w: int, h: int, px: bytes) -> bytes:
    """8-bit grayscale PNG, filter 0 scanlines."""
    raw = b"".join(
        b"\x00" + bytes(px[y * w : (y + 1) * w]) for y in range(h)
    )
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw, 6))
        + _png_chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> tuple[int, int, bytearray]:
    if data[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG")
    pos, w = 8, 0
    h = 0
    idat = b""
    while pos < len(data):
        if pos + 8 > len(data):
            raise ValueError("PNG chunk header truncated")
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        if tag == b"IHDR":
            if len(payload) < 10:
                raise ValueError("PNG IHDR truncated")
            w, h, depth, ctype = struct.unpack(">IIBB", payload[:10])
            if depth != 8 or ctype != 0:
                raise ValueError("only 8-bit grayscale supported")
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
        pos += 12 + length
    if w <= 0 or h <= 0 or w * h > _MAX_CANVAS_PIXELS:
        # untrusted IHDR dims (u32 each): bound before allocating —
        # the same crafted-header posture as the codec pixel budgets
        raise ValueError(
            f"PNG {w}x{h} outside the {_MAX_CANVAS_PIXELS}-pixel bound"
        )
    stride = w + 1
    # cap inflation at exactly the scanline bytes needed: a 60-byte
    # zlib bomb cannot expand past the (already-bounded) w*h budget
    raw = zlib.decompressobj().decompress(idat, h * stride)
    if len(raw) < h * stride:
        raise ValueError("PNG pixel data truncated")
    px = bytearray(w * h)
    prev = bytearray(w)
    for y in range(h):
        line = raw[y * stride : (y + 1) * stride]
        filt, body = line[0], bytearray(line[1:])
        if filt == 0:
            pass
        elif filt == 2:  # Up (defensive; we emit 0)
            for x in range(w):
                body[x] = (body[x] + prev[x]) & 0xFF
        else:
            raise ValueError(f"unsupported PNG filter {filt}")
        px[y * w : (y + 1) * w] = body
        prev = body
    return w, h, px


def resize_nearest(
    w: int, h: int, px: bytes, new_w: int, new_h: int
) -> tuple[int, int, bytearray]:
    out = bytearray(new_w * new_h)
    for y in range(new_h):
        sy = min(h - 1, y * h // new_h)
        row = sy * w
        orow = y * new_w
        for x in range(new_w):
            out[orow + x] = px[row + min(w - 1, x * w // new_w)]
    return new_w, new_h, out


def render_text_png(
    text: str, size: tuple[int, int] | None = None
) -> bytes:
    w, h, px = _rasterize(text)
    if size is not None:
        w, h, px = resize_nearest(w, h, px, size[0], size[1])
    return encode_png(w, h, px)


def render_text_jpeg(
    text: str, size: tuple[int, int] | None = None, quality: int = 90
) -> bytes:
    """Same raster as :func:`render_text_png`, encoded as baseline
    JPEG by the built-in stdlib+numpy codec (sources/jpeg.py) — lossy,
    so OCR keeps using the PNG path; this is the payload format
    upstream's ``image_format="jpeg"`` produces via pdf2image."""
    from pdf2dataset_spark.sources.jpeg import encode_jpeg

    w, h, px = _rasterize(text)
    if size is not None:
        w, h, px = resize_nearest(w, h, px, size[0], size[1])
    return encode_jpeg(w, h, bytes(px), quality=quality)


_GLYPH_CACHE: dict[tuple[int, ...], str] = {}


def _glyph_table() -> dict[tuple[int, ...], str]:
    if not _GLYPH_CACHE:
        for c in range(32, 127):
            _GLYPH_CACHE[tuple(glyph_rows(chr(c)))] = chr(c)
    return _GLYPH_CACHE


def ocr_png(data: bytes) -> str:
    """Pixel-level OCR of a native-resolution render: re-reads the
    character grid and matches cells against the glyph table.
    Unmatched cells (unknown codepoints) become ``\\uFFFD``."""
    w, h, px = decode_png(data)
    return ocr_gray(w, h, px)


def ocr_gray(w: int, h: int, px, threshold: int = 128) -> str:
    """Grid OCR over raw 8-bit grayscale pixels: binarize at
    ``threshold`` (ink = dark; exact renders use 0, so lossy re-
    encodes like a JPEG scan of the engine's own raster still
    binarize back to the original bitmap) and match cells against
    the glyph table. Raises ``ValueError`` when dimensions are not
    cell-aligned — which is how foreign (non-engine-rendered) scans
    are detected and reported honestly by the codec's scanned-page
    route."""
    if w % CELL_W or h % CELL_H or not w or not h:
        raise ValueError(
            "OCR requires a native-resolution render "
            f"(got {w}x{h}, cell {CELL_W}x{CELL_H})"
        )
    table = _glyph_table()
    lines = []
    for li in range(h // CELL_H):
        chars = []
        for ci in range(w // CELL_W):
            x0, y0 = ci * CELL_W, li * CELL_H
            rows = []
            for r in range(GLYPH_H):
                bits = 0
                for col in range(GLYPH_W):
                    bits = (bits << 1) | (
                        1 if px[(y0 + r) * w + x0 + col] < threshold else 0
                    )
                rows.append(bits)
            if all(b == 0 for b in rows):
                chars.append(" ")
            else:
                chars.append(table.get(tuple(rows), "�"))
        lines.append("".join(chars).rstrip())
    return "\n".join(lines)


def _ncc_binary(a: list[int], b: list[int]) -> float:
    """Normalized cross-correlation of two equal-length 0/1 vectors
    (1.0 = identical up to global intensity; 0 variance -> 0)."""
    n = len(a)
    sa, sb = sum(a), sum(b)
    sab = sum(x & y for x, y in zip(a, b))
    va = sa * n - sa * sa
    vb = sb * n - sb * sb
    if va <= 0 or vb <= 0:
        return 0.0
    return (sab * n - sa * sb) / (va * vb) ** 0.5


_NCC_TEMPLATES: list[tuple[str, list[int]]] = []


def _ncc_templates() -> list[tuple[str, list[int]]]:
    if not _NCC_TEMPLATES:
        for c in range(33, 127):  # space is the all-blank cell
            ch = chr(c)
            vec = []
            for bits in glyph_rows(ch):
                for col in range(GLYPH_W):
                    vec.append((bits >> (GLYPH_W - 1 - col)) & 1)
            _NCC_TEMPLATES.append((ch, vec))
    return _NCC_TEMPLATES


#: candidate re-rasterization scales tried when a scan is not
#: cell-aligned: integer zooms plus the common fractional resizes.
_OCR_SCALES = (2.0, 3.0, 4.0, 1.5, 0.5, 2.5, 1.25)

#: per-cell NCC acceptance and page-level honesty thresholds
_NCC_CELL_MIN = 0.82
_NCC_PAGE_MIN = 0.75

#: NCC work cap per candidate scale (cells x 94 templates x 35 px
#: stays a sub-second pure-Python pass); engine renders are far
#: smaller, foreign mega-scans skip to '' without grinding
_MAX_OCR_CELLS = 20_000


def ocr_gray_flex(w: int, h: int, px, threshold: int = 128) -> str:
    """OCR that degrades gracefully on RE-RASTERIZED engine output:
    the exact grid walk first; when the scan is not cell-aligned, try
    the candidate zoom factors (a scan of the engine's raster resized
    by another tool), block-resample back to native cell resolution,
    and match every cell against the glyph table by NORMALIZED
    CROSS-CORRELATION. A page is accepted only when >= 75% of its
    non-blank cells score >= 0.82 — foreign-font scans fail that
    honesty gate and return ``""`` instead of confabulated text."""
    best: tuple[float, str] | None = None
    if w and h and w % CELL_W == 0 and h % CELL_H == 0:
        # cell-aligned at native scale: the exact dict-lookup walk is
        # cheap at ANY size — trust it only when every inked cell
        # matched (an UPSCALED engine raster can be accidentally
        # aligned too: 2x of 90x20 is 180x40, and its exact walk
        # yields replacement chars, not silent garbage)
        exact_text = ocr_gray(w, h, px, threshold)
        if "�" not in exact_text:
            return exact_text
        if (w // CELL_W) * (h // CELL_H) <= _MAX_OCR_CELLS:
            text, score = _ocr_ncc(w, h, px, threshold)
            if score >= 0.999:
                return text
            if score >= _NCC_PAGE_MIN:
                best = (score, text)
    for s in _OCR_SCALES:
        n_cols = w / (CELL_W * s)
        n_rows = h / (CELL_H * s)
        rc, rr = round(n_cols), round(n_rows)
        if rc < 1 or rr < 1:
            continue
        # ABSOLUTE tolerance (<= ~2 px of the input), not relative to
        # the column count: a 2550x3300 real-world 300-dpi scan must
        # be rejected in O(1), not grind the pure-Python NCC pass at
        # all seven scales only to return '' (a 2% relative slack
        # admitted every scale on any large image)
        if (
            abs(w - rc * CELL_W * s) > max(2.0, s)
            or abs(h - rr * CELL_H * s) > max(2.0, s)
        ):
            continue
        if rc * rr > _MAX_OCR_CELLS:
            continue  # work cap: foreign gigapixel scans stay O(1)
        nw, nh = rc * CELL_W, rr * CELL_H
        _, _, native = resize_nearest(w, h, px, nw, nh)
        text, score = _ocr_ncc(nw, nh, native, threshold)
        if score >= _NCC_PAGE_MIN and (best is None or score > best[0]):
            best = (score, text)
        if best and best[0] >= 0.999:
            break
    return best[1] if best else ""


def _ocr_ncc(
    w: int, h: int, px, threshold: int
) -> tuple[str, float]:
    """Tolerant grid walk: per-cell best-NCC glyph; returns the text
    and the fraction of non-blank cells whose best match clears the
    cell threshold (the page honesty score; 1.0 when no ink at all)."""
    templates = _ncc_templates()
    exact = _glyph_table()
    lines = []
    inked = accepted = 0
    for li in range(h // CELL_H):
        chars = []
        for ci in range(w // CELL_W):
            x0, y0 = ci * CELL_W, li * CELL_H
            vec = []
            rows = []
            for r in range(GLYPH_H):
                bits = 0
                for col in range(GLYPH_W):
                    v = 1 if px[(y0 + r) * w + x0 + col] < threshold else 0
                    vec.append(v)
                    bits = (bits << 1) | v
                rows.append(bits)
            if not any(vec):
                chars.append(" ")
                continue
            inked += 1
            ch = exact.get(tuple(rows))
            if ch is not None:
                accepted += 1
                chars.append(ch)
                continue
            bs, bc = 0.0, "�"
            for cand, tvec in templates:
                sc = _ncc_binary(vec, tvec)
                if sc > bs:
                    bs, bc = sc, cand
            if bs >= _NCC_CELL_MIN:
                accepted += 1
                chars.append(bc)
            else:
                chars.append("�")
        lines.append("".join(chars).rstrip())
    score = accepted / inked if inked else 1.0
    return "\n".join(lines), score


# ---------------------------------------------------------------------
# composite page render (A6 fidelity): fills + lines + embedded
# images + positioned text on one canvas
# ---------------------------------------------------------------------

#: Canvas budget (2^26 px = 64 MB gray): covers A0 at 200 dpi with
#: headroom; a crafted /MediaBox clamps the render scale down rather
#: than allocating unbounded memory.
_MAX_CANVAS_PIXELS = 1 << 26


def _blend_gray(mode: str, b: int, s: int) -> int:
    """Separable blend B(backdrop, source) on one 8-bit gray channel
    (ISO 32000-1 §11.3.5 Table 136). ``b``/``s`` and the result are
    0-255; unknown modes pass the source through (Normal)."""
    bf, sf = b / 255.0, s / 255.0
    if mode == "Multiply":
        r = bf * sf
    elif mode == "Screen":
        r = bf + sf - bf * sf
    elif mode == "Overlay":
        r = 2 * bf * sf if bf <= 0.5 else 1 - 2 * (1 - bf) * (1 - sf)
    elif mode == "Darken":
        r = min(bf, sf)
    elif mode == "Lighten":
        r = max(bf, sf)
    elif mode == "ColorDodge":
        r = 0.0 if bf <= 0 else \
            (1.0 if sf >= 1 else min(1.0, bf / (1 - sf)))
    elif mode == "ColorBurn":
        r = 1.0 if bf >= 1 else \
            (0.0 if sf <= 0 else 1 - min(1.0, (1 - bf) / sf))
    elif mode == "HardLight":
        r = 2 * sf * bf if sf <= 0.5 else 1 - 2 * (1 - sf) * (1 - bf)
    elif mode == "SoftLight":
        if sf <= 0.5:
            r = bf - (1 - 2 * sf) * bf * (1 - bf)
        else:
            d = ((16 * bf - 12) * bf + 4) * bf if bf <= 0.25 \
                else bf ** 0.5
            r = bf + (2 * sf - 1) * (d - bf)
    elif mode == "Difference":
        r = abs(bf - sf)
    elif mode == "Exclusion":
        r = bf + sf - 2 * bf * sf
    else:
        r = sf
    return int(r * 255 + 0.5)


def _ceil(v: float) -> int:
    i = int(v)
    return i if i >= v else i + 1


def compose_page(
    page_w: float,
    page_h: float,
    fills: list | None = None,
    lines: list | None = None,
    images: list | None = None,
    glyph_runs: list | None = None,
    scale: float = 1.0,
    polys: list | None = None,
    base_images: list | None = None,
    order: list | None = None,
    alphas: dict | None = None,
    stencils: dict | None = None,
    blends: dict | None = None,
    pixel_masks: dict | None = None,
) -> tuple[int, int, bytearray]:
    """Deterministic page compositor (pure stdlib): white canvas at
    ``scale`` px per PDF unit. With ``order`` — a list of
    ``(category, index)`` pairs referencing the category lists —
    geometry paints in exact CONTENT-STREAM order (true PDF z-order;
    glyphs still on top). Without it, layer order:
    fills, then stroked lines, then embedded images, then the text
    layer's glyphs on top.

    - ``fills``: ``(x0, y0, x1, y1, gray)`` device-space rects.
    - ``polys``: ``([(x, y), ...], gray)`` device-space polygons
      (implicitly closed), filled with the EVEN-ODD scanline rule at
      pixel centers — the flattened-curve/polyline fill surface.
    - ``lines``: ``(x0, y0, x1, y1, gray)`` segments (Bresenham).
    - ``images``: ``(w, h, pixels_gray, ctm)`` — the decoded image
      stamped nearest-neighbor into the CTM image space (unit square
      -> ctm), the PDF convention where row 0 is the TOP of the
      placed rect.
    - ``base_images``: same shape as ``images`` but painted FIRST
      (below fills) — the shading-patch layer.
    - ``glyph_runs``: ``(x, y, text)`` baselines; glyphs render with
      the built-in 5x7 table at native size.
    - ``stencils``: ``{(category, index): groups}`` per-item CLIP
      stencils (round-8: non-rect/multi-rect clip paths) — ``groups``
      is a tuple of polygon groups; a pixel passes when it is inside
      EVERY group, a group's interior being the EVEN-ODD union of its
      polygons (page coords, same space as the item geometry). Masks
      rasterize once per distinct ``groups`` object and gate every
      painter per pixel.
    - ``blends``: ``{(category, index): mode}`` separable blend modes
      (round-9, ISO 32000-1 §11.3.5): the painted value becomes
      ``B(backdrop, source)`` before alpha compositing. ``images``/
      ``base_images`` entries may carry a 6th element — a per-pixel
      8-bit ALPHA plane (image /SMask) multiplied into the item's
      constant alpha.
    - ``pixel_masks``: ``{(category, index): bytes}`` full-canvas
      W*H per-pixel alpha (0-255) — the rasterized ExtGState
      /SMask LUMINOSITY GROUP gating the item (round-9); multiplies
      into the item's constant alpha at every painted pixel. A mask
      whose length does not match the canvas is ignored (scale-
      clamped canvases decline rather than misalign).

    PDF y grows UP; the canvas row 0 is the page TOP.

    The canvas is budgeted (``_MAX_CANVAS_PIXELS``): a hostile
    /MediaBox cannot force an unbounded allocation — the scale clamps
    down proportionally instead (deterministic degraded resolution),
    the same crafted-header posture as the codec pixel bounds.
    """
    if page_w <= 0 or page_h <= 0:
        raise ValueError(f"invalid page geometry {page_w}x{page_h}")
    area = page_w * page_h * scale * scale
    if area > _MAX_CANVAS_PIXELS:
        scale = scale * (_MAX_CANVAS_PIXELS / area) ** 0.5
    W = max(1, int(round(page_w * scale)))
    H = max(1, int(round(page_h * scale)))
    px = bytearray(b"\xff" * (W * H))

    def put(cx: int, cy: int, g: int, a: float | None = None,
            m: bytearray | None = None,
            bm: str | None = None,
            pm: bytes | None = None) -> None:
        if 0 <= cx < W and 0 <= cy < H \
                and (m is None or m[cy * W + cx]):
            if pm is not None:
                a = (1.0 if a is None else a) * pm[cy * W + cx] / 255.0
                if a <= 0.0:
                    return
                if a >= 1.0:
                    a = None
            if a is None and bm is None:
                px[cy * W + cx] = g
            else:
                old = px[cy * W + cx]
                s_ = _blend_gray(bm, old, g) if bm else g
                px[cy * W + cx] = s_ if a is None else int(
                    a * s_ + (1 - a) * old + 0.5)

    def dev(x: float, y: float) -> tuple[int, int]:
        return int(round(x * scale)), int(round((page_h - y) * scale))

    _mask_cache: dict = {}

    def _group_spans(group, cy: int) -> list:
        """Even-odd scanline spans of one polygon GROUP at canvas
        row ``cy`` (crossings pooled over every polygon — the
        multi-subpath even-odd interior)."""
        yc = cy + 0.5
        xs: list = []
        for pts in group:
            cpts = [(x * scale, (page_h - y) * scale) for x, y in pts]
            for (xa, ya), (xb, yb) in zip(cpts, cpts[1:] + cpts[:1]):
                if (ya <= yc < yb) or (yb <= yc < ya):
                    xs.append(xa + (yc - ya) * (xb - xa) / (yb - ya))
        xs.sort()
        return xs

    def stencil_mask(groups) -> bytearray:
        """1-byte-per-pixel mask for a stencil chain: pixel passes
        iff inside every group's even-odd interior."""
        m = _mask_cache.get(id(groups))
        if m is not None:
            return m
        m = bytearray(W * H)
        first = True
        for group in groups:
            for cy in range(H):
                xs = _group_spans(group, cy)
                row = cy * W
                if first:
                    for lo_f, hi_f in zip(xs[::2], xs[1::2]):
                        lo = max(0, _ceil(lo_f - 0.5))
                        hi = min(W, _ceil(hi_f - 0.5))
                        if hi > lo:
                            m[row + lo:row + hi] = b"\x01" * (hi - lo)
                else:
                    # AND with this group: keep only pixels inside
                    keep = bytearray(W)
                    for lo_f, hi_f in zip(xs[::2], xs[1::2]):
                        lo = max(0, _ceil(lo_f - 0.5))
                        hi = min(W, _ceil(hi_f - 0.5))
                        if hi > lo:
                            keep[lo:hi] = b"\x01" * (hi - lo)
                    for i in range(W):
                        if not keep[i]:
                            m[row + i] = 0
            first = False
        _mask_cache[id(groups)] = m
        return m

    def stamp(entries, a: float | None = None,
              m: bytearray | None = None,
              bm: str | None = None,
              pm: bytes | None = None) -> None:
        for entry in entries or ():
            ialpha = None
            if len(entry) == 6:
                # 6-tuple (round-9): per-pixel /SMask alpha plane,
                # 0-255 per SOURCE pixel, multiplied into ``a``
                iw, ih, ipx, ictm, imask, ialpha = entry
            elif len(entry) == 5:
                # optional paint mask: 0 = transparent (skip-stamp) —
                # unpainted shading pixels must not erase layers below
                iw, ih, ipx, ictm, imask = entry
            else:
                iw, ih, ipx, ictm = entry
                imask = None
            if not iw or not ih or len(ipx) < iw * ih \
                    or (imask is not None and len(imask) < iw * ih) \
                    or (ialpha is not None and len(ialpha) < iw * ih):
                continue  # malformed entry: skip, never IndexError
            ia, ib, ic, id_, ie, if_ = ictm
            ixs = (ie, ia + ie, ic + ie, ia + ic + ie)
            iys = (if_, ib + if_, id_ + if_, ib + id_ + if_)
            tx0, ty1 = dev(min(ixs), min(iys))
            tx1, ty0 = dev(max(ixs), max(iys))
            tw, th = tx1 - tx0, ty1 - ty0
            # a placement with REAL extent must not vanish to
            # banker's rounding (round-9: half-unit-aligned thin
            # pattern strokes) — degenerate target spans widen to
            # the one pixel whose CENTER falls inside the span (the
            # stencil machinery's pixel-center rule, so the two
            # agree); zero-extent placements still skip
            if tw <= 0:
                if max(ixs) - min(ixs) <= 0:
                    continue
                tx0 = _ceil(min(ixs) * scale - 0.5)
                tw = 1
            if th <= 0:
                if max(iys) - min(iys) <= 0:
                    continue
                ty0 = _ceil((page_h - max(iys)) * scale - 0.5)
                th = 1
            for ty in range(max(0, ty0), min(H, ty0 + th)):
                sy = min(ih - 1, (ty - ty0) * ih // th)
                srow = sy * iw
                row = ty * W
                for tx in range(max(0, tx0), min(W, tx0 + tw)):
                    sxp = min(iw - 1, (tx - tx0) * iw // tw)
                    if (imask is None or imask[srow + sxp]) \
                            and (m is None or m[row + tx]):
                        ae = a
                        if ialpha is not None:
                            ae = (1.0 if ae is None else ae) \
                                * ialpha[srow + sxp] / 255.0
                        if pm is not None:
                            ae = (1.0 if ae is None else ae) \
                                * pm[row + tx] / 255.0
                        if ae is not None:
                            if ae <= 0.0:
                                continue
                            if ae >= 1.0:
                                ae = None
                        src = ipx[srow + sxp]
                        if ae is None and bm is None:
                            px[row + tx] = src
                        else:
                            old = px[row + tx]
                            s_ = _blend_gray(bm, old, src) if bm \
                                else src
                            px[row + tx] = s_ if ae is None else int(
                                ae * s_ + (1 - ae) * old + 0.5)

    def _span(row: int, lo: int, hi: int, g: int,
              a: float | None, m: bytearray | None,
              fill_b: bytes | None, bm: str | None = None,
              pm: bytes | None = None) -> None:
        """Paint one horizontal span honoring alpha + stencil +
        blend mode + per-pixel soft mask."""
        if pm is not None:
            base_a = 1.0 if a is None else a
            for i in range(lo, hi):
                if m is None or m[row + i]:
                    ae = base_a * pm[row + i] / 255.0
                    if ae <= 0.0:
                        continue
                    old = px[row + i]
                    s_ = _blend_gray(bm, old, g) if bm else g
                    px[row + i] = s_ if ae >= 1.0 else int(
                        ae * s_ + (1 - ae) * old + 0.5)
            return
        if m is None and bm is None:
            if a is None:
                px[row + lo:row + hi] = (fill_b or bytes([g])) \
                    * (hi - lo)
            else:
                ag = a * g
                px[row + lo:row + hi] = bytes(
                    int(ag + (1 - a) * px[row + i] + 0.5)
                    for i in range(lo, hi))
            return
        for i in range(lo, hi):
            if m is None or m[row + i]:
                old = px[row + i]
                s_ = _blend_gray(bm, old, g) if bm else g
                px[row + i] = s_ if a is None else int(
                    a * s_ + (1 - a) * old + 0.5)

    def paint_fill(item, a: float | None = None,
                   m: bytearray | None = None,
                   bm: str | None = None,
                   pm: bytes | None = None) -> None:
        x0, y0, x1, y1, g = item
        cx0, cy1 = dev(x0, y0)
        cx1, cy0 = dev(x1, y1)
        fill_b = bytes([g])
        for cy in range(max(0, cy0), min(H, cy1)):
            lo, hi = max(0, cx0), min(W, cx1)
            if hi > lo:
                _span(cy * W, lo, hi, g, a, m, fill_b, bm, pm)

    def paint_poly(item, a: float | None = None,
                   m: bytearray | None = None,
                   bm: str | None = None,
                   pm: bytes | None = None) -> None:
        pts, g = item
        if len(pts) < 3:
            return
        # canvas space: y flips, rows sampled at pixel centers
        cpts = [(x * scale, (page_h - y) * scale) for x, y in pts]
        ys = [p[1] for p in cpts]
        y_lo = max(0, int(min(ys)))
        y_hi = min(H, int(max(ys)) + 1)
        fill_b = bytes([g])
        for cy in range(y_lo, y_hi):
            yc = cy + 0.5
            xs = []
            for (xa, ya), (xb, yb) in zip(cpts, cpts[1:] + cpts[:1]):
                if (ya <= yc < yb) or (yb <= yc < ya):
                    xs.append(xa + (yc - ya) * (xb - xa) / (yb - ya))
            xs.sort()
            row = cy * W
            for lo_f, hi_f in zip(xs[::2], xs[1::2]):
                # pixel-center rule: paint x iff x+0.5 in [lo_f, hi_f)
                lo = max(0, _ceil(lo_f - 0.5))
                hi = min(W, _ceil(hi_f - 0.5))
                if hi > lo:
                    _span(row, lo, hi, g, a, m, fill_b, bm, pm)

    def paint_line(item, a: float | None = None,
                   m: bytearray | None = None,
                   bm: str | None = None,
                   pm: bytes | None = None) -> None:
        x0, y0, x1, y1, g = item
        cx0, cy0 = dev(x0, y0)
        cx1, cy1 = dev(x1, y1)
        dx, dy = abs(cx1 - cx0), -abs(cy1 - cy0)
        sx = 1 if cx0 < cx1 else -1
        sy = 1 if cy0 < cy1 else -1
        err = dx + dy
        while True:
            put(cx0, cy0, g, a, m, bm, pm)
            if cx0 == cx1 and cy0 == cy1:
                break
            e2 = 2 * err
            if e2 >= dy:
                err += dy
                cx0 += sx
            if e2 <= dx:
                err += dx
                cy0 += sy

    if order is not None:
        # CONTENT-STREAM paint order (geometry only; glyphs stay on
        # top): each entry references a category list by index
        painters = {
            "fills": (fills or (), paint_fill),
            "polys": (polys or (), paint_poly),
            "lines": (lines or (), paint_line),
            "images": (images or (),
                       lambda e, a=None, m=None, bm=None, pm=None:
                       stamp([e], a, m, bm, pm)),
            "base_images": (base_images or (),
                            lambda e, a=None, m=None, bm=None,
                            pm=None: stamp([e], a, m, bm, pm)),
        }
        for kind, idx in order:
            lst, fn = painters.get(kind, ((), None))
            if fn is not None and 0 <= idx < len(lst):
                groups = (stencils or {}).get((kind, idx))
                pmask = (pixel_masks or {}).get((kind, idx))
                if pmask is not None and len(pmask) != W * H:
                    pmask = None  # scale-clamped canvas: ignore
                fn(lst[idx],
                   (alphas or {}).get((kind, idx)),
                   stencil_mask(groups) if groups else None,
                   (blends or {}).get((kind, idx)),
                   pmask)
    else:
        stamp(base_images)
        for item in fills or ():
            paint_fill(item)
        for item in polys or ():
            paint_poly(item)
        for item in lines or ():
            paint_line(item)
        # embedded-image placements (unit square through the CTM,
        # axis-aligned stamp — rotated placements draw their bbox)
        stamp(images)
    for run in glyph_runs or ():
        if len(run) == 5:
            # (x, y, text, dx, dy): displayed text DIRECTION
            # (round-9) — axis-aligned vertical/reverse directions
            # rasterize the 5x7 cells exactly rotated; OBLIQUE
            # directions (round-9 follow-up) paint each glyph pixel
            # at its nearest device pixel along the rotated frame —
            # a faithful orientation with the 1-px nearest-sample
            # approximation an un-hinted bitmap font implies.
            # Degenerate directions fall back to horizontal.
            gx, gy, text, dx, dy = run
            n = (dx * dx + dy * dy) ** 0.5
            if n < 1e-6:
                dxu, dyu = 1.0, 0.0
            else:
                dxu, dyu = dx / n, dy / n
        else:
            gx, gy, text = run
            dxu, dyu = 1.0, 0.0
        cx0, cby = dev(gx, gy)
        if (dxu, dyu) == (1.0, 0.0):
            top = cby - GLYPH_H
            for ci, ch in enumerate(text):
                rows = glyph_rows(ch)
                ox = cx0 + ci * CELL_W
                for r, bits in enumerate(rows):
                    for col in range(GLYPH_W):
                        if bits & (1 << (GLYPH_W - 1 - col)):
                            put(ox + col, top + r, 0)
            continue
        for ci, ch in enumerate(text):
            rows = glyph_rows(ch)
            for r, bits in enumerate(rows):
                b_up = GLYPH_H - r  # height above baseline, y-up
                for col in range(GLYPH_W):
                    if bits & (1 << (GLYPH_W - 1 - col)):
                        a = ci * CELL_W + col  # along-baseline
                        # device pos = anchor + (dx,dy)*a +
                        # (-dy,dx)*b_up; canvas y grows DOWN
                        put(int(round(cx0 + dxu * a - dyu * b_up)),
                            int(round(cby - dyu * a - dxu * b_up)),
                            0)
    return W, H, px
