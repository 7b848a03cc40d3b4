"""JPEG 2000 (/JPXDecode) codec — ITU-T T.800 lossless subset.

The last of the PDF image-compression filters this engine decodes
(after /DCTDecode → :mod:`sources.jpeg`, /CCITTFaxDecode →
:mod:`sources.ccitt`, /JBIG2Decode → :mod:`sources.jbig2`). PDF
embeds either a raw JPEG 2000 codestream or a JP2 container in a
/JPXDecode stream (ISO 32000-1 §7.4.9); this module implements the
reversible (lossless) path with zero native deps:

- **JP2 container + codestream parsing**: signature/ftyp/jp2h boxes,
  SOC/SIZ/COD/QCD/COC/QCC/SOT/SOD/EOC markers.
- **Tier-2**: packet headers with inclusion + zero-bitplane tag
  trees (B.10), coding-pass counts, Lblock length signaling;
  packet iteration in all five progression orders over default OR
  non-default precincts (B.6/B.12 — per-precinct tag trees,
  position-correct RPCL/PCRL/CPRL anchor stepping; precinct sizes
  down to the 64x64 code block).
- **Tier-1 (EBCOT, Annex D)**: MQ bit-plane coding — significance
  propagation, magnitude refinement and cleanup passes with the
  standard context tables (the MQ coder itself is
  :mod:`sources.jbig2`'s, validated against the shared T.88/T.800
  test sequence).
- **5/3 reversible DWT** (Annex F lifting, arbitrary odd/even
  extents, multi-level) and the **RCT** reversible color transform +
  DC level shift.
- The **irreversible 9/7 path** real scanner/camera payloads use:
  float64 lifting validated against the normative Table F.4
  convolution taps, scalar dequantization (QCD styles 1 derived and
  2 expounded, midpoint reconstruction per E.1.1) and the ICT color
  transform (Annex G).
- An **encoder twin** (`encode_jpx`, lossless and lossy) producing
  spec-shaped codestreams for fixtures and round-trip property
  tests — the :mod:`sources.ccitt`/:mod:`sources.jbig2` fixture
  strategy.

Also in scope: multiple TILES (independently transformed, raster
Isot order), multiple TILE-PARTS per tile (bodies concatenated in
TPsot order), the SOP/EPH resync markers (A.8), COMPONENT
SUBSAMPLING (SIZ XRsiz/YRsiz in {1, 2, 4} — the real-world 4:2:0 /
4:2:2 chroma shapes; subsampled components decode at their own
dimensions and map onto the reference grid by replication per B.2,
with the external sYCC transform inverted when the JP2 colr box
signals EnumCS 18), and multiple QUALITY LAYERS in all five
progression orders (per-precinct inclusion state persists across
layers, chunks concatenating into each block's single MQ stream).
The FULL CODE-BLOCK STYLE byte (D.7) decodes: selective arithmetic
bypass (raw bit-stuffed sig/mag segments alternating with
terminated MQ cleanups, each separately length-signaled per
B.10.7.4), per-pass context RESET, TERMALL per-pass termination,
vertically CAUSAL context formation, predictable termination
(decode no-op), and SEGMENTATION SYMBOLS (validated — corrupt
block data surfaces as a named error). ROI decodes via the MAXSHIFT
method (RGN marker, Annex H: magnitude-thresholded downshift) AND
the scaling-based rectangle style (T.801 Srgn=1, round-11: the RGN
segment signals the region; decode downshifts the dependency-
closure band rectangles — see :func:`_roi_band_rects`).

Round 8 closed the last two declared declines: CANVAS OFFSETS (SIZ
XOsiz/YOsiz/XTOsiz/YTOsiz per B.3, with precinct AND code-block
grids anchored at the canvas origin per B.6/B.7 — offset tiles get
partial first windows and edge blocks) and genuinely DIFFERING
per-component COC coding styles (A.6.2: levels / transform /
code-block style / precincts per component), including per-TILE
COD/COC/QCD/QCC overrides parsed from the first tile-part's header
with the A.6 precedence (tile-COC > tile-COD > main-COC > main-COD).
Round 10 closed the canvas-offset phase decline AND the tile-local
convention behind it: EVERY tile-component now transforms and
anchors at its ABSOLUTE canvas origin — origins that are not
multiples of 2^levels, including fully odd XOsiz/YOsiz and
unaligned multi-tile grids, decode bit-exact. The 5/3 and 9/7
lifting are phase-aware (F.3/F.4 on the absolute interval, PSE
folds computed on the extended signal), band dims/origins follow
B-15 (ceil/floor halving per gain, pinned in tests against the
closed form), and precinct/code-block grids anchor at each band's
own absolute origin (B.6/B.7) — the former
"canvas-anchored precinct grid offset against tile origin" decline
is gone with the convention that caused it.

Late round 10 also closed the code-block-size tail: any T.800
A.6.1-legal SIGNALED size decodes (xcb/ycb 2..10, sum <= 12 — the
64x64-only decline is gone), and precincts smaller than the block
SHRINK the effective block grid per B-17 (xcb' = min(xcb, PPx) at
r = 0, min(xcb, PPx - 1) above) instead of declining.

Round 11 closed two more: the scaling-based rectangle ROI above,
and CANVAS OFFSETS COMBINED WITH COMPONENT SUBSAMPLING — every
component anchors at its own ceil-division origin (B.3), the
lifting phase follows it, decimation and the replication upsample
map the offset phase (pinned against an independent numpy replica
of the B.2/B.3 mapping).

Both ROI styles compose with canvas offsets, tiling and component
subsampling (late round-11: the dependency closure works in
ABSOLUTE coordinates — low coefficients sit at absolute even
positions whatever the phase — and the region divides to component
coordinates the way maxshift's always did).

Out of scope, surfaced as named :class:`JPXUnsupported` errors (the
compressed payload is preserved by the caller either way):
elliptic/reserved ROI styles (T.801 Srgn >= 2) and the 9/7
single-sample odd-phase window (F.3.4 publishes the one-sample rule
for the reversible path only; guessing the irreversible
normalization is the round-9 B.10 mistake).

Output convention matches the other codecs: 8-bit samples, gray or
interleaved RGB.
"""

from __future__ import annotations

import struct

from pdf2dataset_spark.sources.jbig2 import (
    _QE_NLPS,
    _QE_NMPS,
    _QE_Q,
    _QE_Q16,
    _QE_SW,
    MQDecoder,
    MQEncoder,
)


#: decode-size sanity bound (samples = w*h*ncomp): large enough for
#: any real scanned page (e.g. A4 @ 600 dpi RGB ≈ 100M), small enough
#: that a crafted SIZ can't OOM an executor
_MAX_PIXELS = 1 << 27


class JPXError(ValueError):
    """Malformed JPEG 2000 stream."""


class JPXUnsupported(JPXError):
    """Valid JPEG 2000 feature outside this decoder's scope."""


# =====================================================================
# 5/3 reversible DWT (T.800 Annex F)
# =====================================================================


def _dwt53_forward_1d(x: list, i0: int = 0) -> tuple[list, list]:
    """One 5/3 lifting level on a signal occupying the absolute
    interval [i0, i0+n) (T.800 F.4, the 1D_SD procedure): returns
    (low, high) where low holds the samples at EVEN absolute
    positions (count ceil(i1/2) - ceil(i0/2)) and high the odd ones.
    Only i0's parity matters (extension is translation-invariant
    under even shifts), so callers may pass tcx0 or tcx0 & 1 alike.
    Round-10: the odd phase (i0 & 1 == 1 — canvas-offset streams)
    is supported; with i0 even this is bit-identical to the round-8
    zero-phase transform. Out-of-range lifting taps are computed
    directly on the PSE-extended signal (F.3.7), which is the
    normative formulation and subsumes every band-mirror identity.
    A single sample at an odd position becomes 2x the sample in the
    high band (F.3.4's one-sample rule — without the doubling the
    high-pass of a constant extension would be 0 and the sample
    would vanish)."""
    n = len(x)
    i0 &= 1
    i1 = i0 + n
    if n == 1:
        return ([x[0]], []) if i0 == 0 else ([], [2 * x[0]])

    def xa(i: int) -> int:  # PSE in the absolute index domain
        j = i - i0
        if j < 0:
            j = -j
        if j >= n:
            j = 2 * (n - 1) - j
        return x[j]

    kh0, kh1 = i0 // 2, i1 // 2
    kl0, kl1 = (i0 + 1) // 2, (i1 + 1) // 2
    hmap: dict[int, int] = {}

    def ha(k: int) -> int:
        v = hmap.get(k)
        if v is None:
            v = xa(2 * k + 1) - ((xa(2 * k) + xa(2 * k + 2)) >> 1)
            hmap[k] = v
        return v

    high = [ha(k) for k in range(kh0, kh1)]
    low = [
        xa(2 * k) + ((ha(k - 1) + ha(k) + 2) >> 2)
        for k in range(kl0, kl1)
    ]
    return low, high


def _dwt53_inverse_1d(low: list, high: list, i0: int = 0) -> list:
    """Inverse of :func:`_dwt53_forward_1d` (same phase contract)."""
    n = len(low) + len(high)
    i0 &= 1
    i1 = i0 + n
    if n == 1:
        return [low[0]] if i0 == 0 else [high[0] // 2]
    kh0, kh1 = i0 // 2, i1 // 2
    kl0, kl1 = (i0 + 1) // 2, (i1 + 1) // 2

    def ha(k: int) -> int:
        # band extension = the X-domain PSE reflections (about i0
        # and i1-1) folded onto the high indices
        while not (kh0 <= k < kh1):
            k = i0 - k - 1 if k < kh0 else i1 - k - 2
        return high[k - kh0]

    even = {
        k: low[k - kl0] - ((ha(k - 1) + ha(k) + 2) >> 2)
        for k in range(kl0, kl1)
    }

    def ea(k: int) -> int:
        while not (kl0 <= k < kl1):
            k = i0 - k if k < kl0 else i1 - 1 - k
        return even[k]

    out = []
    for i in range(i0, i1):
        if i % 2 == 0:
            out.append(even[i // 2])
        else:
            k = i // 2
            out.append(high[k - kh0] + ((ea(k) + ea(k + 1)) >> 1))
    return out


def _dwt_level_geom(width: int, height: int, levels: int,
                    origin: tuple = (0, 0)) -> list:
    """Per-split geometry of the multi-level DWT on the ABSOLUTE
    window [(x0, y0), (x0+w, y0+h)) (T.800 B-14: level d's window is
    the ceil-halving of level d-1's): one entry per performed split,
    ``(ch, cw, phy, phx, nlo_h, nlo_w)`` — the window dims, the axis
    parities (the lifting phase) and the low-band split points. With
    origin (0, 0) this is the round-8 zero-phase geometry (parities
    0, nlo = ceil(n/2))."""
    x0, y0 = origin
    w, h = width, height
    out = []
    for _ in range(levels):
        lx0, lx1 = (x0 + 1) // 2, (x0 + w + 1) // 2
        ly0, ly1 = (y0 + 1) // 2, (y0 + h + 1) // 2
        out.append((h, w, y0 & 1, x0 & 1, ly1 - ly0, lx1 - lx0))
        x0, y0, w, h = lx0, ly0, lx1 - lx0, ly1 - ly0
    return out


def dwt53_forward_2d(rows: list, levels: int,
                     origin: tuple = (0, 0)) -> list:
    """Multi-level 2D 5/3 forward DWT. Input: list of lists of ints.
    Returns the coefficient plane in the standard layout (LL at the
    top-left, per-level subbands around it) as a mutable list of
    lists — the layout carries the structure. ``origin`` is the
    tile-component's absolute canvas origin; an odd coordinate
    shifts the lifting phase and the low/high split point at every
    level it propagates to (round-10 — zero-origin output is
    bit-identical to round-8)."""
    h = len(rows)
    w = len(rows[0]) if h else 0
    plane = [list(r) for r in rows]
    for ch, cw, phy, phx, _nlh, _nlw in _dwt_level_geom(
            w, h, levels, origin):
        # a 1x1 window at an EVEN position is a fixed point; at an
        # odd one the single-sample rule still applies per level
        if ch <= 1 and cw <= 1 and not (phx or phy):
            continue
        # Integer lifting is NOT pass-order commutative: T.800's
        # normative inverse (F.3.4/F.3.5) is HOR_SR (rows) then
        # VER_SR (columns), so the forward must be columns then rows.
        for x in range(cw):
            col = [plane[y][x] for y in range(ch)]
            lo, hi = _dwt53_forward_1d(col, phy)
            merged = lo + hi
            for y in range(ch):
                plane[y][x] = merged[y]
        for y in range(ch):
            lo, hi = _dwt53_forward_1d(plane[y][:cw], phx)
            plane[y][:cw] = lo + hi
    return plane


def dwt53_inverse_2d(plane: list, width: int, height: int,
                     levels: int, origin: tuple = (0, 0)) -> list:
    """Inverse of :func:`dwt53_forward_2d` (same origin contract)."""
    plane = [list(r) for r in plane]
    for ch, cw, phy, phx, nlo_h, nlo_w in reversed(
            _dwt_level_geom(width, height, levels, origin)):
        if ch <= 1 and cw <= 1 and not (phx or phy):
            continue
        # normative order (F.3.4/F.3.5): rows (HOR_SR) then columns
        # (VER_SR) — the forward ran columns first to mirror this
        for y in range(ch):
            row = plane[y][:cw]
            rec = _dwt53_inverse_1d(row[:nlo_w], row[nlo_w:], phx)
            plane[y][:cw] = rec
        for x in range(cw):
            col = [plane[y][x] for y in range(ch)]
            rec = _dwt53_inverse_1d(col[:nlo_h], col[nlo_h:], phy)
            for y in range(ch):
                plane[y][x] = rec[y]
    return plane


# =====================================================================
# Tag trees (T.800 B.10.2)
# =====================================================================


class TagTree:
    """2D tag tree: each leaf holds a value; internal nodes hold the
    min of their children. Decoding reads 0-bits ("not yet") and a
    1-bit ("reached") per level threshold."""

    def __init__(self, w: int, h: int):
        self.levels = []  # finest first: list of (w, h)
        while True:
            self.levels.append((w, h))
            if w == 1 and h == 1:
                break
            w = (w + 1) // 2
            h = (h + 1) // 2

    def nodes(self):
        return self.levels


class TagTreeDecoder:
    def __init__(self, w: int, h: int):
        self.tree = TagTree(w, h)
        # per level: dict (x, y) -> [current_low, resolved?]
        self.state = [dict() for _ in self.tree.levels]

    def decode(self, reader, x: int, y: int, threshold: int) -> bool:
        """Is leaf (x, y)'s value < threshold? Consumes bits from
        `reader` (callable -> 0/1) per B.10.2; call with increasing
        thresholds."""
        # path from root to leaf
        path = []
        lx, ly = x, y
        for li, (w, h) in enumerate(self.tree.levels):
            path.append((li, lx, ly))
            lx //= 2
            ly //= 2
        low = 0
        for li, lx, ly in reversed(path):  # root first
            st = self.state[li].setdefault((lx, ly), [0, False])
            if st[0] < low:
                st[0] = low
            while not st[1] and st[0] < threshold:
                if reader():
                    st[1] = True
                else:
                    st[0] += 1
            low = st[0]
            if not st[1] and st[0] >= threshold:
                return False  # value >= threshold (so far)
        return True

    def value(self, li0_state, x, y):  # pragma: no cover - debug aid
        return self.state[0].get((x, y))


class TagTreeEncoder:
    def __init__(self, w: int, h: int, values: dict):
        """`values`: dict (x, y) -> leaf value; internal nodes become
        the min over children."""
        self.tree = TagTree(w, h)
        self.vals = []  # per level: dict (x,y) -> value
        cur = dict(values)
        for li, (lw, lh) in enumerate(self.tree.levels):
            self.vals.append(cur)
            nxt: dict = {}
            for (x, y), v in cur.items():
                k = (x // 2, y // 2)
                nxt[k] = v if k not in nxt else min(nxt[k], v)
            cur = nxt
        self.state = [dict() for _ in self.tree.levels]

    def encode(self, writer, x: int, y: int, threshold: int) -> None:
        """Emit the bits a :class:`TagTreeDecoder` consumes for the
        query `value(x, y) < threshold`."""
        path = []
        lx, ly = x, y
        for li, (w, h) in enumerate(self.tree.levels):
            path.append((li, lx, ly))
            lx //= 2
            ly //= 2
        low = 0
        for li, lx, ly in reversed(path):
            v = self.vals[li][(lx, ly)]
            st = self.state[li].setdefault((lx, ly), [0, False])
            if st[0] < low:
                st[0] = low
            while not st[1] and st[0] < threshold:
                if st[0] >= v:
                    writer(1)
                    st[1] = True
                else:
                    writer(0)
                    st[0] += 1
            low = st[0]
            if not st[1]:
                return  # decoder learned value >= threshold


# =====================================================================
# EBCOT tier-1 (T.800 Annex D): code-block bit-plane MQ coding
# =====================================================================

# significance-coding context tables: (H, V, D) -> context 0..8
#: strip-scan-order flat-index arrays per code-block shape: iterating
#: the array visits pixels in the EBCOT order (4-row strips, columns
#: within a strip, rows within a column)
_STRIP_ORDER_CACHE: dict = {}


def _strip_order(w: int, h: int):
    key = (w, h)
    o = _STRIP_ORDER_CACHE.get(key)
    if o is None:
        import numpy as np

        idx = np.arange(w * h, dtype=np.intp).reshape(h, w)
        o = np.concatenate(
            [idx[ys:ys + 4].T.ravel() for ys in range(0, h, 4)]
        )
        if len(_STRIP_ORDER_CACHE) > 64:
            _STRIP_ORDER_CACHE.clear()
        _STRIP_ORDER_CACHE[key] = o
    return o


def _sig_ctx(h: int, v: int, d: int, band: str) -> int:
    if band == "HL":  # transpose
        h, v = v, h
    if band != "HH":
        if h == 2:
            return 8
        if h == 1:
            return 7 if v >= 1 else (6 if d >= 1 else 5)
        if v == 2:
            return 4
        if v == 1:
            return 3
        return 2 if d >= 2 else (1 if d == 1 else 0)
    hv = h + v
    if d >= 3:
        return 8
    if d == 2:
        return 7 if hv >= 1 else 6
    if d == 1:
        return 5 if hv >= 2 else (4 if hv == 1 else 3)
    return 2 if hv >= 2 else (1 if hv == 1 else 0)


#: flat per-band views of :func:`_sig_ctx` for the decode hot path —
#: indexed ``h * 15 + v * 5 + d`` (h, v in 0..2; d in 0..4). The
#: decoder tracks the three neighbor counts incrementally (bumped on
#: the rare became-significant events), so each significance decision
#: is one LUT load instead of a function call that rescans 8
#: neighbors.
_SIG_LUT = {
    band: tuple(
        _sig_ctx(h, v, d, band)
        for h in range(3)
        for v in range(3)
        for d in range(5)
    )
    for band in ("LL", "LH", "HL", "HH")
}

# sign-coding: (hsum, vsum) clamped to [-1,1] -> (context, xor-bit)
_SIGN_CTX = {
    (1, 1): (13, 0), (1, 0): (12, 0), (1, -1): (11, 0),
    (0, 1): (10, 0), (0, 0): (9, 0), (0, -1): (10, 1),
    (-1, 1): (11, 1), (-1, 0): (12, 1), (-1, -1): (13, 1),
}
_CTX_MR_FIRST = 14
_CTX_MR_FIRST_NBR = 15
_CTX_MR_LATER = 16
_CTX_RUNLENGTH = 17
_CTX_UNIFORM = 18
_N_CTX = 19


def _fresh_contexts() -> list:
    cx = [[0, 0] for _ in range(_N_CTX)]
    cx[0] = [4, 0]
    cx[_CTX_RUNLENGTH] = [3, 0]
    cx[_CTX_UNIFORM] = [46, 0]
    return cx


class _BlockState:
    """Shared encode/decode state for one code block. With
    ``causal`` (cbstyle vertically-stripe-causal, D.7), context
    formation treats every sample in the stripe BELOW (x, y)'s
    4-row stripe as insignificant — significance/sign lookups are
    masked here so the shared walkers need no changes."""

    __slots__ = ("w", "h", "sig", "visited", "refined", "sign",
                 "mag", "causal")

    def __init__(self, w: int, h: int, causal: bool = False):
        self.w = w
        self.h = h
        self.sig = bytearray(w * h)
        self.visited = bytearray(w * h)
        self.refined = bytearray(w * h)
        self.sign = bytearray(w * h)  # 1 = negative
        self.mag = [0] * (w * h)
        self.causal = causal

    def _masked(self, yy: int, y: int) -> bool:
        return self.causal and yy >= (y // 4) * 4 + 4

    def neighborhood(self, x: int, y: int):
        w, h, sig = self.w, self.h, self.sig
        hcnt = vcnt = dcnt = 0
        if x > 0 and sig[y * w + x - 1]:
            hcnt += 1
        if x < w - 1 and sig[y * w + x + 1]:
            hcnt += 1
        if y > 0 and sig[(y - 1) * w + x]:
            vcnt += 1
        if y < h - 1 and sig[(y + 1) * w + x] and not self._masked(
            y + 1, y
        ):
            vcnt += 1
        for dy in (-1, 1):
            for dx in (-1, 1):
                xx, yy = x + dx, y + dy
                if (0 <= xx < w and 0 <= yy < h and sig[yy * w + xx]
                        and not self._masked(yy, y)):
                    dcnt += 1
        return hcnt, vcnt, dcnt

    def sign_ctx(self, x: int, y: int):
        w, h, sig, sign = self.w, self.h, self.sig, self.sign

        def contrib(xx: int, yy: int) -> int:
            if not (0 <= xx < w and 0 <= yy < h) or not sig[yy * w + xx]:
                return 0
            if self._masked(yy, y):
                return 0
            return -1 if sign[yy * w + xx] else 1

        hs = max(-1, min(1, contrib(x - 1, y) + contrib(x + 1, y)))
        vs = max(-1, min(1, contrib(x, y - 1) + contrib(x, y + 1)))
        return _SIGN_CTX[(hs, vs)]

    def any_sig_neighbor(self, x: int, y: int) -> bool:
        w, h, sig = self.w, self.h, self.sig
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dx == 0 and dy == 0:
                    continue
                xx, yy = x + dx, y + dy
                if (0 <= xx < w and 0 <= yy < h and sig[yy * w + xx]
                        and not self._masked(yy, y)):
                    return True
        return False


def _strip_iter(w: int, h: int):
    """EBCOT scan order: strips of 4 rows, column-major inside."""
    for y0 in range(0, h, 4):
        for x in range(w):
            for y in range(y0, min(y0 + 4, h)):
                yield x, y


def _pass_sig(bit_of, put, st: _BlockState, band: str, plane: int):
    """Significance-propagation pass (D.3.1): visit coefficients not
    yet significant that have a significant neighbor."""
    for x, y in _strip_iter(st.w, st.h):
        i = y * st.w + x
        if st.sig[i] or not st.any_sig_neighbor(x, y):
            continue
        st.visited[i] = 1
        ctx = _sig_ctx(*st.neighborhood(x, y), band)
        if bit_of is not None:
            b = bit_of("sig", x, y, ctx)
        else:
            b = (st.mag[i] >> plane) & 1
            put("sig", x, y, ctx, b)
        if b:
            if bit_of is not None:
                sctx, xor = st.sign_ctx(x, y)
                sbit = bit_of("sign", x, y, sctx)
                st.sign[i] = sbit ^ xor
                st.mag[i] |= 1 << plane
            else:
                sctx, xor = st.sign_ctx(x, y)
                put("sign", x, y, sctx, st.sign[i] ^ xor)
            st.sig[i] = 1


def _pass_mag(bit_of, put, st: _BlockState, plane: int):
    """Magnitude-refinement pass (D.3.3)."""
    for x, y in _strip_iter(st.w, st.h):
        i = y * st.w + x
        if not st.sig[i] or st.visited[i]:
            continue
        # significant before this plane (not newly set this plane)
        if st.refined[i]:
            ctx = _CTX_MR_LATER
        else:
            ctx = (_CTX_MR_FIRST_NBR if st.any_sig_neighbor(x, y)
                   else _CTX_MR_FIRST)
        if bit_of is not None:
            b = bit_of("mag", x, y, ctx)
            if b:
                st.mag[i] |= 1 << plane
        else:
            put("mag", x, y, ctx, (st.mag[i] >> plane) & 1)
        st.refined[i] = 1
        st.visited[i] = 1


def _pass_cleanup(bit_of, put, st: _BlockState, band: str, plane: int):
    """Cleanup pass (D.3.4) with column run-length coding."""
    w, h = st.w, st.h
    for y0 in range(0, h, 4):
        for x in range(w):
            y = y0
            while y < min(y0 + 4, h):
                i = y * w + x
                run_mode = False
                if (
                    y == y0
                    and y0 + 4 <= h
                    and all(
                        not st.visited[(y0 + k) * w + x]
                        and not st.sig[(y0 + k) * w + x]
                        and not st.any_sig_neighbor(x, y0 + k)
                        for k in range(4)
                    )
                ):
                    run_mode = True
                if run_mode:
                    if bit_of is not None:
                        any_sig = bit_of("run", x, y0, _CTX_RUNLENGTH)
                        if not any_sig:
                            y = y0 + 4
                            continue
                        r = (bit_of("uni", x, y0, _CTX_UNIFORM) << 1) | (
                            bit_of("uni", x, y0, _CTX_UNIFORM)
                        )
                    else:
                        first = next(
                            (
                                k
                                for k in range(4)
                                if (st.mag[(y0 + k) * w + x] >> plane) & 1
                            ),
                            None,
                        )
                        if first is None:
                            put("run", x, y0, _CTX_RUNLENGTH, 0)
                            y = y0 + 4
                            continue
                        put("run", x, y0, _CTX_RUNLENGTH, 1)
                        put("uni", x, y0, _CTX_UNIFORM, (first >> 1) & 1)
                        put("uni", x, y0, _CTX_UNIFORM, first & 1)
                        r = first
                    # coefficient at y0 + r becomes significant with
                    # an implied 1-bit; its sign follows
                    y = y0 + r
                    i = y * w + x
                    if bit_of is not None:
                        sctx, xor = st.sign_ctx(x, y)
                        sbit = bit_of("sign", x, y, sctx)
                        st.sign[i] = sbit ^ xor
                        st.mag[i] |= 1 << plane
                    else:
                        sctx, xor = st.sign_ctx(x, y)
                        put("sign", x, y, sctx, st.sign[i] ^ xor)
                    st.sig[i] = 1
                    y += 1
                    continue
                if st.visited[i] or st.sig[i]:
                    y += 1
                    continue
                ctx = _sig_ctx(*st.neighborhood(x, y), band)
                if bit_of is not None:
                    b = bit_of("sig", x, y, ctx)
                else:
                    b = (st.mag[i] >> plane) & 1
                    put("sig", x, y, ctx, b)
                if b:
                    if bit_of is not None:
                        sctx, xor = st.sign_ctx(x, y)
                        sbit = bit_of("sign", x, y, sctx)
                        st.sign[i] = sbit ^ xor
                        st.mag[i] |= 1 << plane
                    else:
                        sctx, xor = st.sign_ctx(x, y)
                        put("sign", x, y, sctx, st.sign[i] ^ xor)
                    st.sig[i] = 1
                y += 1
    # reset per-plane visited flags
    for i in range(w * h):
        st.visited[i] = 0


class _RawWriter:
    """Raw (bypass) bit output, D.4.2 shape: MSB-first, and after an
    0xFF byte the next byte carries only 7 bits (its MSB is a
    stuffed 0) so no 0xFF>0x8F marker pattern can appear."""

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def _limit(self) -> int:
        return 7 if self.out and self.out[-1] == 0xFF else 8

    def bit(self, b: int) -> None:
        self.acc = (self.acc << 1) | (b & 1)
        self.nbits += 1
        if self.nbits == self._limit():
            self.out.append(self.acc)
            self.acc = 0
            self.nbits = 0

    def flush(self) -> bytes:
        if self.nbits:
            self.out.append(self.acc << (self._limit() - self.nbits))
            self.acc = 0
            self.nbits = 0
        if self.out and self.out[-1] == 0xFF:
            self.out.append(0)
        return bytes(self.out)


class _RawReader:
    """Inverse of :class:`_RawWriter`; reads 0 past end of data."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0
        self.prev = 0

    def bit(self) -> int:
        if self.nbits == 0:
            if self.pos < len(self.data):
                self.acc = self.data[self.pos]
                self.pos += 1
            else:
                self.acc = 0
            self.nbits = 7 if self.prev == 0xFF else 8
            self.prev = self.acc
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1


def _bypass_boundary_after(p: int) -> bool:
    """Selective-bypass codeword-segment termination rule (D.4/D.7):
    the first 10 coding passes form one arithmetic segment; from
    then on raw (sig+mag) pairs alternate with one-pass arithmetic
    cleanups, each segment terminated. Pass p (0-based; 0 = first
    cleanup, then sig/mag/cleanup triplets) ends a segment iff
    p == 9 or (p > 9 and p is not a significance pass)."""
    return p == 9 or (p > 9 and (p - 1) % 3 != 0)


def _bypass_is_raw(p: int) -> bool:
    """Pass p is raw-coded under selective bypass (significance and
    magnitude passes from the 11th pass on; cleanups stay MQ)."""
    return p >= 10 and (p - 1) % 3 != 2


def _style_boundary_after(p: int, cbstyle: int) -> bool:
    """Codeword-segment termination rule for a cbstyle combination:
    TERMALL (0x04) terminates every pass; else selective bypass
    (0x01) terminates per :func:`_bypass_boundary_after`; else the
    block is one segment."""
    if cbstyle & 0x04:
        return True
    if cbstyle & 0x01:
        return _bypass_boundary_after(p)
    return False


def _style_parts(p0: int, p1: int, cbstyle: int):
    """Split pass range [p0, p1) at the style's segment boundaries →
    [(start, end, is_raw, seg_index), ...]. seg_index counts
    segments from pass 0 so packet parts map onto the block's
    accumulated segment list across quality layers."""
    parts = []
    seg_index = sum(
        1 for p in range(p0) if _style_boundary_after(p, cbstyle)
    )
    bypass = bool(cbstyle & 0x01)
    start = p0
    for p in range(p0, p1):
        if _style_boundary_after(p, cbstyle) or p == p1 - 1:
            parts.append((
                start, p + 1, bypass and _bypass_is_raw(start),
                seg_index,
            ))
            if _style_boundary_after(p, cbstyle):
                seg_index += 1
            start = p + 1
    return parts


def _bypass_parts(p0: int, p1: int):
    """:func:`_style_parts` for plain selective bypass."""
    return _style_parts(p0, p1, 0x01)


def encode_codeblock_styled(coeffs, w: int, h: int, band: str,
                            cbstyle: int):
    """EBCOT-encode under a CODE-BLOCK STYLE combination (COD byte,
    D.7): → (segments, n_passes, n_bitplanes) with segments
    [(is_raw, bytes), ...] in pass order.

    - 0x01 selective bypass: the first 10 passes are one MQ segment;
      later sig/mag passes ride RAW bit-stuffed segments (sign bits
      unpredicted) alternating with terminated MQ cleanups.
    - 0x02 reset: contexts reinitialize at every pass boundary.
    - 0x04 termall: EVERY pass is its own terminated segment.
    - 0x08 vertically causal: context formation ignores the stripe
      below (masked in :class:`_BlockState`).
    - 0x10 predictable termination: an encoder-side promise about
      spare bits — no stream-shape change here, accepted on decode.
    - 0x20 segmentation symbols: a UNIFORM-context 1010 is coded at
      the end of every cleanup pass (decoder validates it).

    MQ contexts persist across terminated MQ segments unless reset.
    With cbstyle 0 the single segment is byte-identical to
    :func:`encode_codeblock`."""
    causal = bool(cbstyle & 0x08)
    reset = bool(cbstyle & 0x02)
    segmark = bool(cbstyle & 0x20)
    st2 = _BlockState(w, h, causal)
    maxmag = 0
    for i, c in enumerate(coeffs):
        st2.mag[i] = abs(c)
        st2.sign[i] = 1 if c < 0 else 0
        maxmag = max(maxmag, abs(c))
    nplanes = max(1, maxmag.bit_length())
    cx = _fresh_contexts()
    segments: list = []
    enc: MQEncoder | None = None
    raw: _RawWriter | None = None

    def put_mq(kind, x, y, ctx, bit):
        enc.encode(bit, cx[ctx])

    def put_raw(kind, x, y, ctx, bit):
        if kind == "sign":
            # raw sign bits are UNPREDICTED (D.7): undo the walker's
            # context xor (sign_ctx is unchanged at this point)
            _, xor = st2.sign_ctx(x, y)
            raw.bit(bit ^ xor)
        else:
            raw.bit(bit)

    npasses = 0
    total = 1 + 3 * (nplanes - 1)
    bypass = bool(cbstyle & 0x01)
    p = 0
    plane = nplanes - 1
    while p < total:
        is_raw = bypass and _bypass_is_raw(p)
        if is_raw and raw is None:
            raw = _RawWriter()
        if not is_raw and enc is None:
            enc = MQEncoder()
        if reset:
            cx[:] = _fresh_contexts()
        put = put_raw if is_raw else put_mq
        ptype = 2 if p == 0 else (p - 1) % 3
        if ptype == 0:
            _pass_sig(None, put, st2, band, plane)
        elif ptype == 1:
            _pass_mag(None, put, st2, plane)
        else:
            _pass_cleanup(None, put, st2, band, plane)
            if segmark:
                for b in (1, 0, 1, 0):
                    enc.encode(b, cx[_CTX_UNIFORM])
            plane -= 1
        npasses += 1
        if _style_boundary_after(p, cbstyle) or p == total - 1:
            if is_raw:
                segments.append((True, raw.flush()))
                raw = None
            else:
                segments.append((False, enc.flush()))
                enc = None
        p += 1
    return segments, npasses, nplanes


def encode_codeblock_bypass(coeffs, w: int, h: int, band: str):
    """:func:`encode_codeblock_styled` with plain selective bypass."""
    return encode_codeblock_styled(coeffs, w, h, band, 0x01)


def decode_codeblock_styled(
    segments, w: int, h: int, band: str, nplanes: int, npasses: int,
    cbstyle: int,
):
    """Inverse of :func:`encode_codeblock_styled`: decode a block
    from its codeword segments under the given style. MQ contexts
    persist across independently terminated MQ segments (unless
    RESET); raw segments use the D.4.2 bit-unstuffing reader;
    segmentation symbols are validated (1010 after each cleanup).
    Built on the shared reference pass walkers (styled blocks trade
    the inlined fast decoder for restartability)."""
    causal = bool(cbstyle & 0x08)
    reset = bool(cbstyle & 0x02)
    segmark = bool(cbstyle & 0x20)
    st = _BlockState(w, h, causal)
    cx = _fresh_contexts()
    seg_iter = iter(segments)
    reader = None
    reader_raw = False

    def next_reader():
        nonlocal reader, reader_raw
        is_raw, data = next(seg_iter)
        reader_raw = is_raw
        reader = _RawReader(data) if is_raw else MQDecoder(data)

    def bit_of(kind, x, y, ctx):
        if reader_raw:
            b = reader.bit()
            if kind == "sign":
                _, xor = st.sign_ctx(x, y)
                return b ^ xor
            return b
        return reader.decode(cx[ctx])

    p = 0
    plane = nplanes - 1
    need_reader = True
    while p < npasses and plane >= 0:
        if need_reader:
            try:
                next_reader()
            except StopIteration:
                break
            need_reader = False
        if reset:
            cx[:] = _fresh_contexts()
        ptype = 2 if p == 0 else (p - 1) % 3
        if ptype == 0:
            _pass_sig(bit_of, None, st, band, plane)
        elif ptype == 1:
            _pass_mag(bit_of, None, st, plane)
        else:
            _pass_cleanup(bit_of, None, st, band, plane)
            if segmark:
                got = 0
                for _ in range(4):
                    got = (got << 1) | reader.decode(cx[_CTX_UNIFORM])
                if got != 0b1010:
                    raise JPXError(
                        "segmentation symbol mismatch (corrupt "
                        "code-block data)"
                    )
            plane -= 1
        if _style_boundary_after(p, cbstyle):
            need_reader = True
        p += 1
    return [
        -m if s else m for m, s in zip(st.mag, st.sign)
    ]


def decode_codeblock_bypass(
    segments, w: int, h: int, band: str, nplanes: int, npasses: int
):
    """:func:`decode_codeblock_styled` with plain selective bypass."""
    return decode_codeblock_styled(
        segments, w, h, band, nplanes, npasses, 0x01
    )


def encode_codeblock(coeffs, w: int, h: int, band: str):
    """EBCOT-encode signed coefficients (row-major list) → (data,
    n_passes, n_bitplanes). All three passes per plane, single MQ
    codeword segment (default code-block style)."""
    st = _BlockState(w, h)
    maxmag = 0
    for i, c in enumerate(coeffs):
        st.mag[i] = abs(c)
        st.sign[i] = 1 if c < 0 else 0
        maxmag = max(maxmag, abs(c))
    nplanes = max(1, maxmag.bit_length())
    enc = MQEncoder()
    cx = _fresh_contexts()

    def put(kind, x, y, ctx, bit):
        enc.encode(bit, cx[ctx])

    # drop the magnitudes into a fresh state for pass simulation: the
    # shared pass walkers mutate sig/refined exactly like decode
    st2 = _BlockState(w, h)
    st2.mag = st.mag
    st2.sign = st.sign
    npasses = 0
    for plane in range(nplanes - 1, -1, -1):
        if npasses == 0:
            _pass_cleanup(None, put, st2, band, plane)
            npasses += 1
        else:
            _pass_sig(None, put, st2, band, plane)
            _pass_mag(None, put, st2, plane)
            _pass_cleanup(None, put, st2, band, plane)
            npasses += 3
    return enc.flush(), npasses, nplanes


def decode_codeblock(
    data: bytes, w: int, h: int, band: str, nplanes: int, npasses: int
):
    """Inverse of :func:`encode_codeblock` → signed coefficient list.

    This is the production (per-corpus-page) path, so it is written
    for speed: the MQ decoder is inlined, neighbor significance is
    tracked incrementally (updated on the rare became-significant
    events instead of re-scanned per decision), and the pass walkers
    are flat loops. The encoder keeps the readable shared walkers —
    the round-trip property tests pin the two implementations to the
    same coding decisions."""
    size = w * h
    sig = bytearray(size)
    visited = bytearray(size)
    refined = bytearray(size)
    sign = bytearray(size)
    mag = [0] * size
    # ONE precombined significance-context index per pixel:
    # horizontal neighbors weigh 15, vertical 5, diagonal 1 — exactly
    # the old hcn*15 + vcn*5 + dcn LUT index (max 2*15+2*5+4 = 44),
    # and nonzero iff the old nbr count was nonzero
    cidx = bytearray(size)
    # mirror the old per-band branch exactly: anything that is not
    # HL/HH classifies as the no-swap (LL/LH) table
    sig_lut = (
        _SIG_LUT["HL"]
        if band == "HL"
        else (_SIG_LUT["HH"] if band == "HH" else _SIG_LUT["LL"])
    )
    cx = _fresh_contexts()
    qe_q, qe_q16 = _QE_Q, _QE_Q16
    qe_nmps, qe_nlps, qe_sw = _QE_NMPS, _QE_NLPS, _QE_SW
    # local MQ registers (same INITDEC as MQDecoder)
    bp = 0
    b0 = data[0] if data else 0xFF
    c_reg = b0 << 16
    ndata = len(data)
    b = data[0] if 0 < ndata else 0xFF
    b1 = data[1] if 1 < ndata else 0xFF
    if b == 0xFF:
        if b1 > 0x8F:
            c_reg += 0xFF00
            ct = 8
        else:
            bp = 1
            c_reg += b1 << 9
            ct = 7
    else:
        bp = 1
        c_reg += b1 << 8
        ct = 8
    c_reg = (c_reg << 7) & 0xFFFFFFFF
    ct -= 7
    a_reg = 0x8000

    def mq(state):
        nonlocal bp, c_reg, ct, a_reg
        i_st = state[0]
        qe = qe_q[i_st]
        qe16 = qe_q16[i_st]
        a_reg -= qe
        if c_reg < qe16:  # == Chigh < Qe (C < 2**32 invariant)
            if a_reg < qe:
                bit = state[1]
                state[0] = qe_nmps[i_st]
            else:
                bit = 1 - state[1]
                if qe_sw[i_st]:
                    state[1] = bit
                state[0] = qe_nlps[i_st]
            a_reg = qe
        else:
            c_reg -= qe16  # stays >= 0: c >= qe16 here
            if a_reg & 0x8000:
                return state[1]
            if a_reg < qe:
                bit = 1 - state[1]
                if qe_sw[i_st]:
                    state[1] = bit
                state[0] = qe_nlps[i_st]
            else:
                bit = state[1]
                state[0] = qe_nmps[i_st]
        while True:
            if ct == 0:
                bb = data[bp] if bp < ndata else 0xFF
                bb1 = data[bp + 1] if bp + 1 < ndata else 0xFF
                if bb == 0xFF:
                    if bb1 > 0x8F:
                        c_reg += 0xFF00
                        ct = 8
                    else:
                        bp += 1
                        c_reg += bb1 << 9
                        ct = 7
                else:
                    bp += 1
                    c_reg += bb1 << 8
                    ct = 8
            a_reg = (a_reg << 1) & 0xFFFF
            c_reg = (c_reg << 1) & 0xFFFFFFFF
            ct -= 1
            if a_reg & 0x8000:
                break
        return bit

    def decode_sign_and_set(i, x, y, plane_bit):
        # sign context from h/v neighbor contributions
        hs = vs = 0
        if x > 0 and sig[i - 1]:
            hs += -1 if sign[i - 1] else 1
        if x < w - 1 and sig[i + 1]:
            hs += -1 if sign[i + 1] else 1
        if y > 0 and sig[i - w]:
            vs += -1 if sign[i - w] else 1
        if y < h - 1 and sig[i + w]:
            vs += -1 if sign[i + w] else 1
        hs = -1 if hs < 0 else (1 if hs > 0 else 0)
        vs = -1 if vs < 0 else (1 if vs > 0 else 0)
        sctx, xor = _SIGN_CTX[(hs, vs)]
        sign[i] = mq(cx[sctx]) ^ xor
        mag[i] |= plane_bit
        sig[i] = 1
        # bump neighbor significance-context indexes (the rare
        # event): h neighbors +15, v +5, d +1 — one array carries
        # both the scan-skip predicate (nonzero) and the LUT index
        y0 = y > 0
        y1 = y < h - 1
        x0 = x > 0
        x1 = x < w - 1
        if x0:
            cidx[i - 1] += 15
        if x1:
            cidx[i + 1] += 15
        if y0:
            cidx[i - w] += 5
            if x0:
                cidx[i - w - 1] += 1
            if x1:
                cidx[i - w + 1] += 1
        if y1:
            cidx[i + w] += 5
            if x0:
                cidx[i + w - 1] += 1
            if x1:
                cidx[i + w + 1] += 1

    zeros = bytes(size)
    # numpy snapshot walkers (exact; see each pass) only pay off when
    # the per-pixel Python scan they replace is long enough
    if size >= 1024:
        import numpy as np

        sig_np = np.frombuffer(sig, dtype=np.uint8)
        vis_np = np.frombuffer(visited, dtype=np.uint8)
        ref_np = np.frombuffer(refined, dtype=np.uint8)
        cidx_np = np.frombuffer(cidx, dtype=np.uint8)
        order = _strip_order(w, h)
    else:
        np = None
    plane = nplanes - 1
    p = 0
    while p < npasses and plane >= 0:
        plane_bit = 1 << plane
        if p > 0:
            # ---- significance propagation pass ----
            if np is not None:
                # per-strip snapshot: eligibility (not sig, has sig
                # neighbors) can only be GAINED during the pass, and
                # only by neighbors of a became-significant event —
                # so the snapshot is exact up to the first event that
                # decodes 1, after which the remainder of the strip
                # runs the per-pixel live loop. Strips snapshot
                # lazily (after all earlier strips), so cross-strip
                # effects are always visible. The MQ decode is
                # inlined on pass-local registers; the closure cells
                # sync around each decode_sign_and_set (whose sign
                # decision still goes through mq()).
                l_a, l_c, l_ct, l_bp = a_reg, c_reg, ct, bp
                l_data, l_nd = data, ndata
                l_qq, l_q16 = qe_q, qe_q16
                l_nm, l_nl, l_sw = qe_nmps, qe_nlps, qe_sw
                for ys in range(0, h, 4):
                    ye = ys + 4 if ys + 4 <= h else h
                    seg_el = (
                        (sig_np[ys * w:ye * w] == 0)
                        & (cidx_np[ys * w:ye * w] != 0)
                    )
                    if not seg_el.any():
                        continue
                    xs_i, rys_i = np.nonzero(
                        seg_el.reshape(ye - ys, w).T
                    )
                    ev_x = ev_y = -1
                    for x, ry in zip(xs_i.tolist(), rys_i.tolist()):
                        y = ys + ry
                        i = y * w + x
                        visited[i] = 1
                        # -- inlined MQ DECODE --
                        state = cx[sig_lut[cidx[i]]]
                        i_st = state[0]
                        qe = l_qq[i_st]
                        qe16 = l_q16[i_st]
                        l_a -= qe
                        if l_c < qe16:
                            if l_a < qe:
                                bit = state[1]
                                state[0] = l_nm[i_st]
                            else:
                                bit = 1 - state[1]
                                if l_sw[i_st]:
                                    state[1] = bit
                                state[0] = l_nl[i_st]
                            l_a = qe
                            renorm = True
                        else:
                            l_c -= qe16
                            if l_a & 0x8000:
                                bit = state[1]
                                renorm = False
                            else:
                                if l_a < qe:
                                    bit = 1 - state[1]
                                    if l_sw[i_st]:
                                        state[1] = bit
                                    state[0] = l_nl[i_st]
                                else:
                                    bit = state[1]
                                    state[0] = l_nm[i_st]
                                renorm = True
                        if renorm:
                            while True:
                                if l_ct == 0:
                                    bb = l_data[l_bp] if l_bp < l_nd else 0xFF
                                    bb1 = (l_data[l_bp + 1]
                                           if l_bp + 1 < l_nd else 0xFF)
                                    if bb == 0xFF:
                                        if bb1 > 0x8F:
                                            l_c += 0xFF00
                                            l_ct = 8
                                        else:
                                            l_bp += 1
                                            l_c += bb1 << 9
                                            l_ct = 7
                                    else:
                                        l_bp += 1
                                        l_c += bb1 << 8
                                        l_ct = 8
                                l_a = (l_a << 1) & 0xFFFF
                                l_c = (l_c << 1) & 0xFFFFFFFF
                                l_ct -= 1
                                if l_a & 0x8000:
                                    break
                        if bit:
                            a_reg, c_reg, ct, bp = l_a, l_c, l_ct, l_bp
                            decode_sign_and_set(i, x, y, plane_bit)
                            l_a, l_c, l_ct, l_bp = a_reg, c_reg, ct, bp
                            ev_x, ev_y = x, y
                            break
                    if ev_x < 0:
                        continue
                    # exact live remainder: rest of the event column,
                    # then the remaining columns of the strip
                    x = ev_x
                    y = ev_y + 1
                    i = y * w + x
                    while True:
                        while y < ye:
                            if not sig[i] and cidx[i]:
                                visited[i] = 1
                                # -- inlined MQ DECODE --
                                state = cx[sig_lut[cidx[i]]]
                                i_st = state[0]
                                qe = l_qq[i_st]
                                qe16 = l_q16[i_st]
                                l_a -= qe
                                if l_c < qe16:
                                    if l_a < qe:
                                        bit = state[1]
                                        state[0] = l_nm[i_st]
                                    else:
                                        bit = 1 - state[1]
                                        if l_sw[i_st]:
                                            state[1] = bit
                                        state[0] = l_nl[i_st]
                                    l_a = qe
                                    renorm = True
                                else:
                                    l_c -= qe16
                                    if l_a & 0x8000:
                                        bit = state[1]
                                        renorm = False
                                    else:
                                        if l_a < qe:
                                            bit = 1 - state[1]
                                            if l_sw[i_st]:
                                                state[1] = bit
                                            state[0] = l_nl[i_st]
                                        else:
                                            bit = state[1]
                                            state[0] = l_nm[i_st]
                                        renorm = True
                                if renorm:
                                    while True:
                                        if l_ct == 0:
                                            bb = l_data[l_bp] if l_bp < l_nd else 0xFF
                                            bb1 = (l_data[l_bp + 1]
                                                   if l_bp + 1 < l_nd else 0xFF)
                                            if bb == 0xFF:
                                                if bb1 > 0x8F:
                                                    l_c += 0xFF00
                                                    l_ct = 8
                                                else:
                                                    l_bp += 1
                                                    l_c += bb1 << 9
                                                    l_ct = 7
                                            else:
                                                l_bp += 1
                                                l_c += bb1 << 8
                                                l_ct = 8
                                        l_a = (l_a << 1) & 0xFFFF
                                        l_c = (l_c << 1) & 0xFFFFFFFF
                                        l_ct -= 1
                                        if l_a & 0x8000:
                                            break
                                if bit:
                                    a_reg, c_reg, ct, bp = \
                                        l_a, l_c, l_ct, l_bp
                                    decode_sign_and_set(
                                        i, x, y, plane_bit)
                                    l_a, l_c, l_ct, l_bp = \
                                        a_reg, c_reg, ct, bp
                            y += 1
                            i += w
                        x += 1
                        if x >= w:
                            break
                        y = ys
                        i = ys * w + x
                a_reg, c_reg, ct, bp = l_a, l_c, l_ct, l_bp
            else:
                for ys in range(0, h, 4):
                    ye = ys + 4 if ys + 4 <= h else h
                    base = ys * w
                    for x in range(w):
                        i = base + x
                        for y in range(ys, ye):
                            if sig[i] or not cidx[i]:
                                i += w
                                continue
                            visited[i] = 1
                            if mq(cx[sig_lut[cidx[i]]]):
                                decode_sign_and_set(i, x, y, plane_bit)
                            i += w
            p += 1
            if p >= npasses:
                break
            # ---- magnitude refinement pass (hottest: one decision
            # per already-significant coefficient per plane — MQ
            # decode inlined to drop the call overhead) ----
            ctx14 = cx[_CTX_MR_FIRST]
            ctx15 = cx[_CTX_MR_FIRST_NBR]
            ctx16 = cx[_CTX_MR_LATER]
            if np is not None:
                # the refinement pass decodes exactly the significant,
                # not-yet-visited coefficients and NOTHING becomes
                # significant during it — candidate set and context
                # classes are frozen for the whole pass, so one numpy
                # snapshot in strip order replaces the per-pixel scan
                mr_mask = (sig_np != 0) & (vis_np == 0)
                if mr_mask.any():
                    cand = order[mr_mask[order]]
                    cls = np.where(
                        ref_np[cand] != 0, 2,
                        (cidx_np[cand] != 0).astype(np.int8),
                    )
                    ctx_by = (ctx14, ctx15, ctx16)
                    # every name this loop touches is hoisted out of
                    # its closure cell into a plain local (mq() and
                    # decode_sign_and_set are never called here, so
                    # the registers are exclusively ours), written
                    # back once at the end of the pass
                    l_a, l_c, l_ct, l_bp = a_reg, c_reg, ct, bp
                    l_data, l_nd, l_mag = data, ndata, mag
                    l_qq, l_q16 = qe_q, qe_q16
                    l_nm, l_nl, l_sw = qe_nmps, qe_nlps, qe_sw
                    for i, k in zip(cand.tolist(), cls.tolist()):
                        state = ctx_by[k]
                        # -- inlined MQ DECODE (same as below) --
                        i_st = state[0]
                        qe = l_qq[i_st]
                        qe16 = l_q16[i_st]
                        l_a -= qe
                        if l_c < qe16:  # == Chigh < Qe
                            if l_a < qe:
                                bit = state[1]
                                state[0] = l_nm[i_st]
                            else:
                                bit = 1 - state[1]
                                if l_sw[i_st]:
                                    state[1] = bit
                                state[0] = l_nl[i_st]
                            l_a = qe
                        else:
                            l_c -= qe16  # c >= qe16 here
                            if l_a & 0x8000:
                                if bit := state[1]:
                                    l_mag[i] |= plane_bit
                                continue
                            if l_a < qe:
                                bit = 1 - state[1]
                                if l_sw[i_st]:
                                    state[1] = bit
                                state[0] = l_nl[i_st]
                            else:
                                bit = state[1]
                                state[0] = l_nm[i_st]
                        while True:
                            if l_ct == 0:
                                bb = (l_data[l_bp]
                                      if l_bp < l_nd else 0xFF)
                                bb1 = (l_data[l_bp + 1]
                                       if l_bp + 1 < l_nd else 0xFF)
                                if bb == 0xFF:
                                    if bb1 > 0x8F:
                                        l_c += 0xFF00
                                        l_ct = 8
                                    else:
                                        l_bp += 1
                                        l_c += bb1 << 9
                                        l_ct = 7
                                else:
                                    l_bp += 1
                                    l_c += bb1 << 8
                                    l_ct = 8
                            l_a = (l_a << 1) & 0xFFFF
                            l_c = (l_c << 1) & 0xFFFFFFFF
                            l_ct -= 1
                            if l_a & 0x8000:
                                break
                        # -----------------------
                        if bit:
                            l_mag[i] |= plane_bit
                    a_reg, c_reg, ct, bp = l_a, l_c, l_ct, l_bp
                    ref_np[cand] = 1
                    vis_np[cand] = 1
            else:
                for ys in range(0, h, 4):
                    ye = ys + 4 if ys + 4 <= h else h
                    base = ys * w
                    for x in range(w):
                        i = base + x
                        for y in range(ys, ye):
                            if not sig[i] or visited[i]:
                                i += w
                                continue
                            if refined[i]:
                                state = ctx16
                            else:
                                state = ctx15 if cidx[i] else ctx14
                            # -- inlined MQ DECODE --
                            i_st = state[0]
                            qe = qe_q[i_st]
                            qe16 = qe_q16[i_st]
                            a_reg -= qe
                            if c_reg < qe16:  # == Chigh < Qe
                                if a_reg < qe:
                                    bit = state[1]
                                    state[0] = qe_nmps[i_st]
                                else:
                                    bit = 1 - state[1]
                                    if qe_sw[i_st]:
                                        state[1] = bit
                                    state[0] = qe_nlps[i_st]
                                a_reg = qe
                                renorm = True
                            else:
                                c_reg -= qe16  # c >= qe16 here
                                if a_reg & 0x8000:
                                    bit = state[1]
                                    renorm = False
                                else:
                                    if a_reg < qe:
                                        bit = 1 - state[1]
                                        if qe_sw[i_st]:
                                            state[1] = bit
                                        state[0] = qe_nlps[i_st]
                                    else:
                                        bit = state[1]
                                        state[0] = qe_nmps[i_st]
                                    renorm = True
                            if renorm:
                                while True:
                                    if ct == 0:
                                        bb = data[bp] if bp < ndata else 0xFF
                                        bb1 = (data[bp + 1]
                                               if bp + 1 < ndata else 0xFF)
                                        if bb == 0xFF:
                                            if bb1 > 0x8F:
                                                c_reg += 0xFF00
                                                ct = 8
                                            else:
                                                bp += 1
                                                c_reg += bb1 << 9
                                                ct = 7
                                        else:
                                            bp += 1
                                            c_reg += bb1 << 8
                                            ct = 8
                                    a_reg = (a_reg << 1) & 0xFFFF
                                    c_reg = (c_reg << 1) & 0xFFFFFFFF
                                    ct -= 1
                                    if a_reg & 0x8000:
                                        break
                            # -----------------------
                            if bit:
                                mag[i] |= plane_bit
                            refined[i] = 1
                            visited[i] = 1
                            i += w
            p += 1
            if p >= npasses:
                break
        # ---- cleanup pass ----
        run_state = cx[_CTX_RUNLENGTH]
        uni_state = cx[_CTX_UNIFORM]
        # MQ inlined on pass-local registers (cells sync around each
        # decode_sign_and_set / run-length uniform decode)
        l_a, l_c, l_ct, l_bp = a_reg, c_reg, ct, bp
        l_data, l_nd = data, ndata
        l_qq, l_q16 = qe_q, qe_q16
        l_nm, l_nl, l_sw = qe_nmps, qe_nlps, qe_sw
        for ys in range(0, h, 4):
            full = ys + 4 <= h
            ye = ys + 4 if full else h
            event = False
            skip_l = quiet_l = None
            if np is not None and full:
                # strip snapshot: a column whose four pixels are all
                # visited|significant consumes NO decisions — that
                # only grows during the pass, so skip flags stay
                # exact across events. Run-mode (quiet) flags are
                # exact only until the first became-significant
                # event; after one, quietness re-checks live.
                s0 = ys * w
                occ = vis_np[s0:s0 + 4 * w] | sig_np[s0:s0 + 4 * w]
                occ4 = occ.reshape(4, w)
                col_skip = occ4.min(axis=0) != 0
                if col_skip.all():
                    continue
                skip_l = col_skip.tolist()
                quiet_l = (
                    ((occ | cidx_np[s0:s0 + 4 * w]).reshape(4, w)
                     .max(axis=0) == 0).tolist()
                )
            for x in range(w):
                y = ys
                if full:
                    i0 = ys * w + x
                    if skip_l is not None:
                        if skip_l[x]:
                            continue
                        if event:
                            qcol = not (
                                visited[i0] or sig[i0] or cidx[i0]
                                or visited[i0 + w] or sig[i0 + w]
                                or cidx[i0 + w]
                                or visited[i0 + 2 * w]
                                or sig[i0 + 2 * w] or cidx[i0 + 2 * w]
                                or visited[i0 + 3 * w]
                                or sig[i0 + 3 * w] or cidx[i0 + 3 * w]
                            )
                        else:
                            qcol = quiet_l[x]
                    else:
                        qcol = not (
                            visited[i0] or sig[i0] or cidx[i0]
                            or visited[i0 + w] or sig[i0 + w]
                            or cidx[i0 + w]
                            or visited[i0 + 2 * w] or sig[i0 + 2 * w]
                            or cidx[i0 + 2 * w]
                            or visited[i0 + 3 * w] or sig[i0 + 3 * w]
                            or cidx[i0 + 3 * w]
                        )
                    if qcol:
                        # -- inlined MQ DECODE (run-length ctx) --
                        state = run_state
                        i_st = state[0]
                        qe = l_qq[i_st]
                        qe16 = l_q16[i_st]
                        l_a -= qe
                        if l_c < qe16:
                            if l_a < qe:
                                bit = state[1]
                                state[0] = l_nm[i_st]
                            else:
                                bit = 1 - state[1]
                                if l_sw[i_st]:
                                    state[1] = bit
                                state[0] = l_nl[i_st]
                            l_a = qe
                            renorm = True
                        else:
                            l_c -= qe16
                            if l_a & 0x8000:
                                bit = state[1]
                                renorm = False
                            else:
                                if l_a < qe:
                                    bit = 1 - state[1]
                                    if l_sw[i_st]:
                                        state[1] = bit
                                    state[0] = l_nl[i_st]
                                else:
                                    bit = state[1]
                                    state[0] = l_nm[i_st]
                                renorm = True
                        if renorm:
                            while True:
                                if l_ct == 0:
                                    bb = l_data[l_bp] if l_bp < l_nd else 0xFF
                                    bb1 = (l_data[l_bp + 1]
                                           if l_bp + 1 < l_nd else 0xFF)
                                    if bb == 0xFF:
                                        if bb1 > 0x8F:
                                            l_c += 0xFF00
                                            l_ct = 8
                                        else:
                                            l_bp += 1
                                            l_c += bb1 << 9
                                            l_ct = 7
                                    else:
                                        l_bp += 1
                                        l_c += bb1 << 8
                                        l_ct = 8
                                l_a = (l_a << 1) & 0xFFFF
                                l_c = (l_c << 1) & 0xFFFFFFFF
                                l_ct -= 1
                                if l_a & 0x8000:
                                    break
                        if not bit:
                            continue  # whole column stays insignificant
                        a_reg, c_reg, ct, bp = l_a, l_c, l_ct, l_bp
                        r = (mq(uni_state) << 1) | mq(uni_state)
                        y = ys + r
                        i = y * w + x
                        decode_sign_and_set(i, x, y, plane_bit)
                        l_a, l_c, l_ct, l_bp = a_reg, c_reg, ct, bp
                        event = True
                        y += 1
                i = y * w + x
                while y < ye:
                    if not (visited[i] or sig[i]):
                        # -- inlined MQ DECODE --
                        state = cx[sig_lut[cidx[i]]]
                        i_st = state[0]
                        qe = l_qq[i_st]
                        qe16 = l_q16[i_st]
                        l_a -= qe
                        if l_c < qe16:
                            if l_a < qe:
                                bit = state[1]
                                state[0] = l_nm[i_st]
                            else:
                                bit = 1 - state[1]
                                if l_sw[i_st]:
                                    state[1] = bit
                                state[0] = l_nl[i_st]
                            l_a = qe
                            renorm = True
                        else:
                            l_c -= qe16
                            if l_a & 0x8000:
                                bit = state[1]
                                renorm = False
                            else:
                                if l_a < qe:
                                    bit = 1 - state[1]
                                    if l_sw[i_st]:
                                        state[1] = bit
                                    state[0] = l_nl[i_st]
                                else:
                                    bit = state[1]
                                    state[0] = l_nm[i_st]
                                renorm = True
                        if renorm:
                            while True:
                                if l_ct == 0:
                                    bb = l_data[l_bp] if l_bp < l_nd else 0xFF
                                    bb1 = (l_data[l_bp + 1]
                                           if l_bp + 1 < l_nd else 0xFF)
                                    if bb == 0xFF:
                                        if bb1 > 0x8F:
                                            l_c += 0xFF00
                                            l_ct = 8
                                        else:
                                            l_bp += 1
                                            l_c += bb1 << 9
                                            l_ct = 7
                                    else:
                                        l_bp += 1
                                        l_c += bb1 << 8
                                        l_ct = 8
                                l_a = (l_a << 1) & 0xFFFF
                                l_c = (l_c << 1) & 0xFFFFFFFF
                                l_ct -= 1
                                if l_a & 0x8000:
                                    break
                        if bit:
                            a_reg, c_reg, ct, bp = l_a, l_c, l_ct, l_bp
                            decode_sign_and_set(i, x, y, plane_bit)
                            l_a, l_c, l_ct, l_bp = a_reg, c_reg, ct, bp
                            event = True
                    y += 1
                    i += w
        a_reg, c_reg, ct, bp = l_a, l_c, l_ct, l_bp
        visited[:] = zeros  # C-level clear (was a size-long loop)
        p += 1
        plane -= 1
    return [-m if s else m for m, s in zip(mag, sign)]


# =====================================================================
# Tier-2: packet-header bit IO (B.10.1 — 0xFF bit-stuffing)
# =====================================================================


class _HeaderWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def bit(self, b: int) -> None:
        # after a full 0xFF byte only 7 bits fit in the next byte
        limit = 7 if self.out and self.out[-1] == 0xFF else 8
        self.acc = (self.acc << 1) | (b & 1)
        self.nbits += 1
        if self.nbits == limit:
            self.out.append(self.acc)
            self.acc = 0
            self.nbits = 0

    def bits(self, value: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.bit((value >> i) & 1)

    def flush(self) -> bytes:
        if self.nbits:
            limit = 7 if self.out and self.out[-1] == 0xFF else 8
            self.out.append(self.acc << (limit - self.nbits))
            self.acc = 0
            self.nbits = 0
        if self.out and self.out[-1] == 0xFF:  # header may not end 0xFF
            self.out.append(0)
        return bytes(self.out)


class _HeaderReader:
    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.prev_ff = False

    def bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                raise JPXError("packet header overruns stream")
            b = self.data[self.pos]
            self.pos += 1
            if self.prev_ff:
                if b & 0x80:
                    raise JPXError("invalid bit-stuffing in packet header")
                self.nbits = 7
            else:
                self.nbits = 8
            self.prev_ff = b == 0xFF
            self.acc = b
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def align(self) -> int:
        """Finish the header: byte-align and skip a trailing stuffing
        byte if the last consumed byte was 0xFF. Returns the body
        offset."""
        self.nbits = 0
        if self.prev_ff:
            if self.pos >= len(self.data):
                raise JPXError("missing stuffing byte after 0xFF")
            self.pos += 1
        return self.pos


def _passes_codeword_write(w: _HeaderWriter, n: int) -> None:
    """Number-of-coding-passes codeword (Table B.4)."""
    if n == 1:
        w.bit(0)
    elif n == 2:
        w.bit(1), w.bit(0)
    elif 3 <= n <= 5:
        w.bits(0b11, 2)
        w.bits(n - 3, 2)
    elif 6 <= n <= 36:
        w.bits(0b1111, 4)
        w.bits(n - 6, 5)
    elif 37 <= n <= 164:
        w.bits(0b111111111, 9)
        w.bits(n - 37, 7)
    else:
        raise JPXError(f"cannot signal {n} coding passes")


def _passes_codeword_read(r: _HeaderReader) -> int:
    if not r.bit():
        return 1
    if not r.bit():
        return 2
    v = r.bits(2)
    if v != 3:
        return 3 + v
    v = r.bits(5)
    if v != 31:
        return 6 + v
    return 37 + r.bits(7)


# =====================================================================
# Subband / code-block geometry (single tile at the origin)
# =====================================================================

_CB_EXP = 6  # 64x64 code blocks (the common default)


def _level_dims(w: int, h: int, levels: int) -> list:
    """Window dims [ (w, h) pre-split at each level 1..NL ]."""
    dims = []
    cw, ch = w, h
    for _ in range(levels):
        dims.append((cw, ch))
        cw = (cw + 1) // 2
        ch = (ch + 1) // 2
    return dims


def _level_windows(x0: int, y0: int, w: int, h: int,
                   levels: int) -> list:
    """ABSOLUTE tile-component windows [(x0, y0, x1, y1)] for
    d = 0..levels (B-14: each level ceil-halves both edges). Entry 0
    is the full window; entry `levels` the final LL window."""
    out = [(x0, y0, x0 + w, y0 + h)]
    for _ in range(levels):
        px0, py0, px1, py1 = out[-1]
        out.append((
            (px0 + 1) // 2, (py0 + 1) // 2,
            (px1 + 1) // 2, (py1 + 1) // 2,
        ))
    return out


def _bands_for_resolution(w: int, h: int, levels: int, r: int,
                          origin: tuple = (0, 0)) -> list:
    """Subbands of resolution r as (name, x0, y0, bw, bh) in the
    :func:`dwt53_forward_2d` plane layout. ``origin`` is the
    tile-component's absolute canvas origin (round-10): odd
    coordinates shift the low/high split at the levels they reach
    (B-15 — low size = #even absolute positions in the window), so
    the band DIMENSIONS are phase-dependent; with origin (0, 0)
    this is the round-8 zero-phase layout."""
    wins = _level_windows(origin[0], origin[1], w, h, levels)
    if r == 0:
        x0, y0, x1, y1 = wins[levels]
        return [("LL", 0, 0, x1 - x0, y1 - y0)]
    d = levels - r + 1  # decomposition level of these bands
    x0, y0, x1, y1 = wins[d - 1]
    cw, ch = x1 - x0, y1 - y0
    lw = (x1 + 1) // 2 - (x0 + 1) // 2
    lh = (y1 + 1) // 2 - (y0 + 1) // 2
    hw, hh = cw - lw, ch - lh
    return [
        ("HL", lw, 0, hw, lh),
        ("LH", 0, lh, lw, hh),
        ("HH", lw, lh, hw, hh),
    ]


def _band_abs_origins(w: int, h: int, levels: int, r: int,
                      origin: tuple = (0, 0)) -> list:
    """ABSOLUTE origin of each band of resolution r on its own band
    grid (B-15: tbx0 = ceil((tcx0 - 2^(lev-1)·xob) / 2^lev), i.e.
    the ceil-halved window edge for a low axis and the floor-halved
    one for a high axis), ordered like
    :func:`_bands_for_resolution`. Anchors the canvas code-block
    64-grid and the precinct windows; all zeros at origin (0, 0)."""
    x0, y0 = origin
    wins = _level_windows(x0, y0, w, h, levels)
    if r == 0:
        return [(wins[levels][0], wins[levels][1])]
    d = levels - r + 1
    px0, py0, _, _ = wins[d - 1]
    lx, ly = (px0 + 1) // 2, (py0 + 1) // 2
    hx, hy = px0 // 2, py0 // 2
    return [(hx, ly), (lx, hy), (hx, hy)]


def _eff_cb_exp(r: int, ppx: int, ppy: int,
                cb_exp: tuple = (6, 6)) -> tuple:
    """EFFECTIVE code-block exponents inside resolution r's
    precincts (T.800 B.7 / Eq. B-17: xcb' = min(xcb, PPx) at r = 0
    and min(xcb, PPx - 1) for r > 0 — a precinct smaller than the
    signaled code block SHRINKS the blocks instead of splitting
    them). With the default 2^15 precincts this is the signaled
    size (round-10: both small signaled sizes and precinct-clamped
    sizes decode; the former 64x64-only decline is gone)."""
    s = 0 if r == 0 else 1
    return min(cb_exp[0], ppx - s), min(cb_exp[1], ppy - s)


def _cb_edges(origin: int, extent: int, exp: int = _CB_EXP) -> list:
    """Split [0, extent) at the canvas-anchored 2^exp-grid
    boundaries ((origin + x) % 2^exp == 0) → [(grid index, x, w)].
    With origin 0 this is the plain 0-anchored grid."""
    cb = 1 << exp
    out = []
    x = 0
    while x < extent:
        nxt = min(extent, ((origin + x) // cb + 1) * cb - origin)
        out.append(((origin + x) >> exp, x, nxt - x))
        x = nxt
    return out


def _codeblocks(bw: int, bh: int, obx: int = 0, oby: int = 0,
                xcb: int = _CB_EXP, ycb: int = _CB_EXP) -> list:
    """Code-block grid over a band: (gx, gy, x, y, w, h) with
    band-LOCAL x/y and CANVAS-anchored grid indices (T.800 B.7: the
    partition is anchored at the canvas origin; ``obx``/``oby`` are
    the band's absolute origin — 0 for untiled zero-offset streams,
    where this reduces to the plain local grid). ``xcb``/``ycb``
    are the EFFECTIVE exponents (see :func:`_eff_cb_exp`)."""
    out = []
    for gy, y, ch in _cb_edges(oby, bh, ycb):
        for gx, x, cw in _cb_edges(obx, bw, xcb):
            out.append((gx, gy, x, y, cw, ch))
    return out



# =====================================================================
# Codestream (Annex A markers) — encoder
# =====================================================================

_GUARD_BITS = 1


def _encode_tile_component(plane, w: int, h: int, levels: int,
                           cbstyle: int = 0, origin: tuple = (0, 0),
                           precincts: list | None = None,
                           cb_exp: tuple = (_CB_EXP, _CB_EXP)):
    """EBCOT-encode one component's coefficient plane → (per-resolution
    band/block structures, per-subband max plane counts in QCD order).
    When ``cbstyle`` carries terminations (bypass/termall) each
    block's data is its codeword-SEGMENT list instead of one byte
    string; other style bits keep a single (styled) segment.
    ``origin`` is the tile-component origin (tcx0, tcy0) for
    canvas-offset streams — round-10: it no longer needs to be
    phase-safe; it shifts the band dims/split points (B-15) and
    anchors each band's code-block grid at that band's own absolute
    origin (T.800 B.7). ``precincts``/``cb_exp`` (round-10) size
    the EFFECTIVE per-resolution block grid (B-17)."""
    terminated = bool(cbstyle & 0x05)
    styled = bool(cbstyle & 0x2F)  # any bit that changes the coding
    resolutions = []
    exps = []
    for r in range(levels + 1):
        ppx, ppy = (15, 15) if precincts is None else precincts[r]
        xcb, ycb = _eff_cb_exp(r, ppx, ppy, cb_exp)
        bands = _bands_for_resolution(w, h, levels, r, origin)
        borigins = _band_abs_origins(w, h, levels, r, origin)
        per_band = []
        for (name, bx, by, bw, bh), (obx, oby) in zip(bands, borigins):
            blocks = []
            for gx, gy, x, y, cw, ch in _codeblocks(bw, bh, obx, oby,
                                                    xcb, ycb):
                coeffs = [
                    plane[by + y + yy][bx + x + xx]
                    for yy in range(ch)
                    for xx in range(cw)
                ]
                if any(coeffs):
                    if styled:
                        data, npasses, nplanes = encode_codeblock_styled(
                            coeffs, cw, ch, name, cbstyle
                        )
                        if not terminated:
                            data = data[0][1]  # single MQ segment
                    else:
                        data, npasses, nplanes = encode_codeblock(
                            coeffs, cw, ch, name
                        )
                else:
                    data, npasses, nplanes = ([] if terminated
                                              else b"", 0, 0)
                blocks.append((gx, gy, data, npasses, nplanes))
            per_band.append((name, bw, bh, blocks))
            exps.append(max((b[4] for b in blocks), default=0))
        resolutions.append(per_band)
    return resolutions, exps


def _precinct_info(comp_tile_dims: list, levels: int,
                   precincts: list | None, subs: list,
                   origins: list | None = None,
                   comp_levels: list | None = None,
                   comp_precincts: list | None = None) -> dict:
    """Per-(resolution, component) precinct layout for one tile:
    ``pinfo[(r, c)] = (npx, npy, step_x, step_y, ppx, ppy, base_x,
    base_y, borigins)`` where npx x npy is the precinct grid over
    the resolution-r grid (B.6 — 2^PPx x 2^PPy cells anchored at the
    CANVAS origin; ``precincts`` None means the default 2^15; an
    EMPTY resolution grid — trx1 == trx0 or try1 == try0 — has NO
    precincts and therefore no packets, npx = npy = 0 per B-16),
    step_x/step_y are the precinct anchor strides on the REFERENCE
    grid (component separation x 2^(PPx + levels - r)) that the
    position-dependent progression orders iterate (B.12), base_x/
    base_y are the first precinct's canvas grid indices
    (floor(trx0 / 2^PPx)), and slot 8 is the per-band absolute
    origins list from :func:`_band_abs_origins` (the three bands of
    a resolution differ at odd phases).

    ``origins`` (per-component (tcx0, tcy0)) anchors the geometry at
    the ABSOLUTE canvas position. Round-10: every codestream path
    passes them (canvas-offset or not — T.800 anchors everything at
    the canvas origin; the engine's former tile-local convention
    for zero-offset multi-tile streams is gone) and origins need
    not be phase-safe: the resolution-grid origin is the normative
    ceil (B-14: trx0 = ceil(tcx0 / 2^(NL-r))), extents are edge
    differences, and slot 8 carries each band's own absolute origin
    from :func:`_band_abs_origins` (the three bands of a resolution
    differ at odd phases). Single-tile zero-offset streams — the
    PDF-embedded norm — have all-zero origins, bit-identically to
    the old layout."""
    pinfo = {}
    for c, (tcw, tch) in enumerate(comp_tile_dims):
        xr, yr = subs[c]
        tcx0, tcy0 = origins[c] if origins else (0, 0)
        lv = comp_levels[c] if comp_levels is not None else levels
        prec = comp_precincts[c] if comp_precincts is not None \
            else precincts
        for r in range(lv + 1):
            ppx, ppy = (15, 15) if prec is None else prec[r]
            s = lv - r
            trx0 = -(-tcx0 // (1 << s))
            try0 = -(-tcy0 // (1 << s))
            rw = -(-(tcx0 + tcw) // (1 << s)) - trx0 if tcw > 0 else 0
            rh = -(-(tcy0 + tch) // (1 << s)) - try0 if tch > 0 else 0
            base_x, base_y = trx0 >> ppx, try0 >> ppy
            if rw > 0 and rh > 0:
                npx = -(-(trx0 + rw) // (1 << ppx)) - base_x
                npy = -(-(try0 + rh) // (1 << ppy)) - base_y
            else:
                # B-16: numprecincts = 0 when the resolution grid is
                # empty (trx1 == trx0 or try1 == try0) — a tiny
                # odd-origin tile-component can collapse at coarse
                # resolutions (tcx0=1, tcx1=2 at s=1 gives
                # trx0=trx1=1); such resolutions carry NO packets
                npx = npy = 0
            pinfo[(r, c)] = (npx, npy, xr << (ppx + s),
                             yr << (ppy + s), ppx, ppy,
                             base_x, base_y,
                             _band_abs_origins(
                                 tcw, tch, lv, r, (tcx0, tcy0)))
    return pinfo


def _precinct_band_windows(band_dims: list, r: int, ppx: int,
                           ppy: int, pxi: int, pyi: int,
                           base_x: int = 0, base_y: int = 0,
                           borigins: list | None = None) -> list:
    """Precinct (pxi, pyi)'s window in each band's LOCAL coordinates:
    per (bw, bh) in ``band_dims``, an (x0, y0, x1, y1) clamped to the
    band. Resolution-grid precinct cells map to band cells at half
    scale for r > 0 (the bands sit one decomposition below the
    resolution grid). The grid is CANVAS-anchored: cell pxi covers
    band-absolute [(base_x + pxi)·pw, +pw) against EACH band's own
    absolute origin in ``borigins`` (round-10: per band — the three
    bands of a resolution differ at odd phases; all 0 for
    zero-offset single-tile streams). Window edges land on the
    canvas code-block grid because the EFFECTIVE code-block
    exponents are clamped to the band-domain precinct size (B-17,
    :func:`_eff_cb_exp`) — a block can never straddle a precinct
    edge, so the local tag-tree grid is a contiguous sub-rectangle
    of the global one."""
    scale = 0 if r == 0 else 1
    pw = 1 << (ppx - scale)
    ph = 1 << (ppy - scale)
    out = []
    for bi, (bw, bh) in enumerate(band_dims):
        obx, oby = borigins[bi] if borigins else (0, 0)
        ax0 = (base_x + pxi) * pw - obx
        ay0 = (base_y + pyi) * ph - oby
        x0 = min(max(ax0, 0), bw)
        y0 = min(max(ay0, 0), bh)
        out.append((x0, y0, min(max(ax0 + pw, 0), bw),
                    min(max(ay0 + ph, 0), bh)))
    return out


def _precinct_codeblocks(bw: int, bh: int, win: tuple,
                         obx: int = 0, oby: int = 0,
                         xcb: int = _CB_EXP,
                         ycb: int = _CB_EXP) -> list:
    """Code blocks of one band inside a precinct window: global grid
    indices plus LOCAL tag-tree indices —
    (gx, gy, lx, ly, x, y, cw, ch). The global 2^xcb/2^ycb grid and
    the precinct windows are both CANVAS-anchored (band origin
    ``obx``/``oby``); window edges land on the canvas block grid
    (the effective exponents never exceed the band-domain precinct
    size, B-17), so the local grid is a contiguous sub-rectangle of
    it. The band's own start/end may cut the first/last blocks
    short."""
    x0, y0, x1, y1 = win
    if x1 <= x0 or y1 <= y0:
        return []
    gx0, gy0 = (obx + x0) >> xcb, (oby + y0) >> ycb
    out = []
    for gy, y, ch in _cb_edges(oby + y0, y1 - y0, ycb):
        for gx, x, cw in _cb_edges(obx + x0, x1 - x0, xcb):
            out.append((gx, gy, gx - gx0, gy - gy0,
                        x0 + x, y0 + y, cw, ch))
    return out


def _packet_order(prog: int, layers: int, levels: int, ncomp: int,
                  pinfo: dict, comp_levels: list | None = None) -> list:
    """Packet (layer, resolution, component, precinct) sequence for
    the five progression orders (B.12) with zero tile/image offsets:
    precinct anchors sit at multiples of their reference-grid stride,
    so the position-dependent orders (RPCL/PCRL/CPRL) reduce to
    sorting anchor events by the B.12 loop nesting. With one precinct
    everywhere this reproduces the classic (l, r, c) nestings
    bit-for-bit."""
    events = []  # (r, c, p, x, y)
    for c in range(ncomp):
        lv = comp_levels[c] if comp_levels is not None else levels
        for r in range(lv + 1):
            npx, npy, sx, sy = pinfo[(r, c)][:4]
            base_x, base_y = pinfo[(r, c)][6:8] or (0, 0)
            for pyi in range(npy):
                for pxi in range(npx):
                    events.append(
                        (r, c, pyi * npx + pxi,
                         (base_x + pxi) * sx, (base_y + pyi) * sy)
                    )
    rng_l = range(layers)
    if prog == 0:    # LRCP
        ev = sorted(events, key=lambda e: (e[0], e[1], e[2]))
        return [(l, r, c, p) for l in rng_l for (r, c, p, _, _) in ev]
    if prog == 1:    # RLCP
        ev = sorted(events, key=lambda e: (e[0], e[1], e[2]))
        out = []
        for rr in range(levels + 1):
            evr = [e for e in ev if e[0] == rr]
            for l in rng_l:
                out.extend((l, rr, c, p) for (_, c, p, _, _) in evr)
        return out
    if prog == 2:    # RPCL: resolution, position (y, x), component
        ev = sorted(events, key=lambda e: (e[0], e[4], e[3], e[1]))
    elif prog == 3:  # PCRL: position, component, resolution
        ev = sorted(events, key=lambda e: (e[4], e[3], e[1], e[0]))
    else:            # CPRL: component, position, resolution
        ev = sorted(events, key=lambda e: (e[1], e[4], e[3], e[0]))
    return [(l, r, c, p) for (r, c, p, _, _) in ev for l in rng_l]


def _tile_packets(all_res, mbs_by_cr: list, levels: int, layers: int,
                  sop: bool, eph: bool, prog: int = 0,
                  pinfo: dict | None = None,
                  cbstyle: int = 0,
                  comp_levels: list | None = None,
                  cb_exp: tuple = (_CB_EXP, _CB_EXP)) -> list:
    """Build one tile's packets (list of byte strings, SOP markers
    attached): code blocks are assigned round-robin to quality layers
    (first-inclusion layer), packets iterate in ``prog`` order over
    the precinct grid in ``pinfo`` (default: one precinct per
    (r, c)). At ``layers=1`` LRCP with default precincts the
    concatenation is bit-identical to the original single-layer
    builder (tag-tree coordinates are precinct-local, which for one
    precinct IS the band grid)."""
    ncomp = len(all_res)
    if comp_levels is None:
        comp_levels = [levels] * ncomp
    if pinfo is None:
        pinfo = {
            (r, c): (1, 1, 1 << 30, 1 << 30, 15, 15)
            for c in range(ncomp)
            for r in range(comp_levels[c] + 1)
        }
    counter = 0
    states: dict = {}
    # r-major like the original single-levels builder: the counter's
    # round-robin layer assignment is part of the byte format
    for r in range(max(comp_levels) + 1):
        for c in range(ncomp):
            if r > comp_levels[c]:
                continue
            info = pinfo[(r, c)]
            npx, npy, _, _, ppx, ppy = info[:6]
            base_x, base_y = (info[6:8] or (0, 0))
            borigins = info[8] if len(info) > 8 else None
            xcb, ycb = _eff_cb_exp(r, ppx, ppy, cb_exp)
            band_dims = [(bw, bh) for _, bw, bh, _ in all_res[c][r]]
            plist = []
            for pyi in range(npy):
                for pxi in range(npx):
                    wins = _precinct_band_windows(
                        band_dims, r, ppx, ppy, pxi, pyi,
                        base_x, base_y, borigins,
                    )
                    per = []
                    for bi, (name, bw, bh, blocks) in enumerate(
                        all_res[c][r]
                    ):
                        obx, oby = borigins[bi] if borigins \
                            else (0, 0)
                        x0, y0, x1, y1 = wins[bi]
                        if x1 <= x0 or y1 <= y0 or not blocks:
                            per.append(None)
                            continue
                        gx0, gy0 = ((obx + x0) >> xcb,
                                    (oby + y0) >> ycb)
                        gx1 = (obx + x1 + (1 << xcb) - 1) >> xcb
                        gy1 = (oby + y1 + (1 << ycb) - 1) >> ycb
                        # precinct-local block list, local tag coords
                        sel = [
                            (gx - gx0, gy - gy0, data, np_, nb)
                            for gx, gy, data, np_, nb in blocks
                            if gx0 <= gx < gx1 and gy0 <= gy < gy1
                        ]
                        if not sel:
                            per.append(None)
                            continue
                        mb = mbs_by_cr[c][r][bi]
                        fl = {}
                        incl_vals = {}
                        zbp_vals = {}
                        for lx, ly, data, npasses, nplanes in sel:
                            if npasses:
                                fl[(lx, ly)] = counter % layers
                                counter += 1
                            else:  # all-zero block: never included
                                fl[(lx, ly)] = layers
                            incl_vals[(lx, ly)] = fl[(lx, ly)]
                            zbp_vals[(lx, ly)] = (
                                (mb - nplanes) if npasses else 0
                            )
                        per.append({
                            "blocks": sel,
                            "incl": TagTreeEncoder(
                                gx1 - gx0, gy1 - gy0, incl_vals
                            ),
                            "zbp": TagTreeEncoder(
                                gx1 - gx0, gy1 - gy0, zbp_vals
                            ),
                            "lblock": {},
                            "mb": mb,
                            "fl": fl,
                        })
                    plist.append(per)
            states[(r, c)] = plist
    packets = []
    nsop = 0
    for l, r, c, p in _packet_order(prog, layers, levels, ncomp,
                                    pinfo, comp_levels=comp_levels):
        pkt = b""
        if sop:
            pkt += b"\xff\x91" + struct.pack(">HH", 4, nsop & 0xFFFF)
        nsop += 1
        packets.append(
            pkt + _build_packet_layer(states[(r, c)][p], l, eph,
                                      cbstyle)
        )
    return packets


def _emit_tile(out: bytearray, isot: int, packets: list,
               tile_parts: int, header_bytes: bytes = b"") -> None:
    """Emit one tile's packets as ``tile_parts`` tile-part segments
    (TPsot order, packets split at packet boundaries).
    ``header_bytes`` (per-tile COD/COC/QCD/QCC marker segments) go in
    the FIRST tile-part's header, between SOT and SOD (A.4.2)."""
    n = max(1, min(tile_parts, len(packets)))
    for tp in range(n):
        chunk = b"".join(
            packets[tp * len(packets) // n:(tp + 1) * len(packets) // n]
        )
        hdrb = header_bytes if tp == 0 else b""
        sot = struct.pack(
            ">HIBB", isot, 12 + len(hdrb) + 2 + len(chunk), tp, n
        )
        out += b"\xff\x90" + struct.pack(">H", 10) + sot
        out += hdrb + b"\xff\x93" + chunk


def _build_packet_layer(per_band, l: int, eph: bool,
                        cbstyle: int = 0) -> bytes:
    """One packet for quality layer `l` from a resolution's encoder
    states (first-inclusion tag trees persist across layers)."""
    eph_m = b"\xff\x92" if eph else b""
    hw = _HeaderWriter()
    has_new = any(
        st is not None and any(v == l for v in st["fl"].values())
        for st in per_band
    )
    if not has_new:
        hw.bit(0)  # empty packet: decoder reads nothing else
        return hw.flush() + eph_m
    hw.bit(1)
    body = bytearray()
    for st in per_band:
        if st is None:
            continue
        incl = st["incl"]
        zbp = st["zbp"]
        lblock = st["lblock"]
        mb = st["mb"]
        fl_map = st["fl"]
        for gx, gy, data, npasses, nplanes in st["blocks"]:
            key = (gx, gy)
            fl = fl_map[key]
            if fl > l:  # not yet included (or never: all-zero)
                incl.encode(hw.bit, gx, gy, l + 1)
            elif fl == l:  # first inclusion: full signaling
                incl.encode(hw.bit, gx, gy, l + 1)
                t = 1
                while True:  # zero-bitplane tag tree, rising threshold
                    zbp.encode(hw.bit, gx, gy, t)
                    if mb - nplanes < t:
                        break
                    t += 1
                _passes_codeword_write(hw, npasses)
                lb = lblock.setdefault(key, 3)
                if isinstance(data, list):
                    # bypass/termall: one length per codeword
                    # segment, bits = Lblock + floor(log2(segment
                    # passes)); Lblock raised once so EVERY segment
                    # length fits
                    parts = _style_parts(0, npasses, cbstyle)
                    k = 0
                    for (s0, s1, _, si) in parts:
                        nbits = max(1, len(data[si][1]).bit_length())
                        avail = lb + ((s1 - s0).bit_length() - 1)
                        k = max(k, nbits - avail)
                    for _ in range(k):
                        hw.bit(1)
                    hw.bit(0)
                    lblock[key] = lb + k
                    for (s0, s1, _, si) in parts:
                        seg_bytes = data[si][1]
                        hw.bits(
                            len(seg_bytes),
                            lb + k + ((s1 - s0).bit_length() - 1),
                        )
                        body += seg_bytes
                else:
                    nbits = max(1, len(data).bit_length())
                    avail = lb + (npasses.bit_length() - 1)
                    if nbits > avail:
                        k = nbits - avail
                        for _ in range(k):
                            hw.bit(1)
                        hw.bit(0)
                        lblock[key] = lb + k
                        avail = nbits
                    else:
                        hw.bit(0)
                    hw.bits(len(data), avail)
                    body += data
            else:  # previously included: single bit (B.10.4)
                hw.bit(0)
    return hw.flush() + eph_m + bytes(body)


def _check_cb_exp(cb_exp: tuple) -> None:
    """Validate a SIGNALED code-block exponent pair (T.800 A.6.1:
    xcb, ycb in 2..10 and xcb + ycb <= 12 — at most 4096 samples per
    block)."""
    xcb, ycb = cb_exp
    if not (2 <= xcb <= 10 and 2 <= ycb <= 10 and xcb + ycb <= 12):
        raise JPXError(
            f"code-block exponents {xcb}/{ycb} outside T.800 A.6.1 "
            "(2..10 each, sum <= 12)"
        )


def _check_precincts(precincts, levels: int) -> list | None:
    """Normalize an encoder precinct spec: a single (PPx, PPy) pair
    applies to every resolution; a list gives one pair per
    resolution (r = 0 first). Round-10: precincts smaller than the
    signaled code block no longer decline — they SHRINK the
    effective block size per B-17 (:func:`_eff_cb_exp`); only the
    4-bit field range and the r>0 >= 2^1 band-domain minimum are
    enforced."""
    if precincts is None:
        return None
    if (len(precincts) == 2
            and all(isinstance(v, int) for v in precincts)):
        precincts = [tuple(precincts)] * (levels + 1)
    precincts = [tuple(p) for p in precincts]
    if len(precincts) != levels + 1:
        raise JPXError("precincts must list every resolution")
    for r, (ppx, ppy) in enumerate(precincts):
        if not (0 <= ppx <= 15 and 0 <= ppy <= 15):
            raise JPXError(f"precinct exponents {ppx}/{ppy} out of range")
        if r > 0 and (ppx < 1 or ppy < 1):
            raise JPXError(
                "precinct exponent 0 is only legal at resolution 0 "
                "(T.800 Table A.21)"
            )
    return precincts


def _roi_mask_for_plane(tcw: int, tch: int, levels: int, rect):
    """Wavelet-domain ROI membership for a tile-component plane:
    True where a coefficient's (pyramid back-projected) spatial cell
    intersects ``rect`` = (x0, y0, x1, y1) in tile-local component
    coordinates. Filter-overlap spill is ignored — legitimate for
    maxshift, where the DECODE rule is purely magnitude-based and
    any encoder-chosen coefficient set round-trips."""
    mask = [[False] * tcw for _ in range(tch)]
    x0, y0, x1, y1 = rect
    if x1 <= x0 or y1 <= y0:
        return mask
    for r in range(levels + 1):
        step = 1 << (levels - r + (0 if r == 0 else 1))
        for name, bx, by, bw, bh in _bands_for_resolution(
            tcw, tch, levels, r
        ):
            for j in range(bh):
                cy = j * step
                if cy >= y1 or cy + step <= y0:
                    continue
                row = mask[by + j]
                for i in range(bw):
                    cx_ = i * step
                    if cx_ < x1 and cx_ + step > x0:
                        row[bx + i] = True
    return mask


def _roi_interval_back(a: int, b: int) -> tuple:
    """1-D dependency closure of the sample interval [a, b) through
    one reversible 5/3 synthesis level (zero-phase): the low (s) and
    high (d) coefficient index intervals, each [lo, hi), whose
    coefficients influence any sample in [a, b). Derived from the
    engine's OWN lifting (not a transcribed table): s[n] reaches
    x[2n-1..2n+1] (x[2n] = even[n] directly; even[n] feeds the
    predict step of x[2n-1] and x[2n+1]) and d[n] reaches
    x[2n-1..2n+3] (direct at 2n+1; via the update step into even[n]
    and even[n+1], which feed x[2n-1] and x[2n+3])."""
    if b <= a:
        return (0, 0), (0, 0)
    s_lo = max(-(-(a - 1) // 2), 0)   # 2n+1 >= a
    d_lo = max(-(-(a - 3) // 2), 0)   # 2n+3 >= a
    hi = b // 2 + 1                   # 2n-1 <= b-1
    return (s_lo, hi), (d_lo, hi)


def _roi_band_rects(tcw: int, tch: int, levels: int, rect,
                    origin: tuple = (0, 0)) -> list:
    """Scaling-based ROI (T.801 Srgn=1) coefficient rectangles, in
    PLANE coordinates, for a rectangular region ``rect`` = (x0, y0,
    x1, y1) in tile-local component coordinates: per decomposition
    level, the 1-D dependency closures (:func:`_roi_interval_back`)
    compose separably, so each band's mask is a single rectangle —
    bands are disjoint plane regions, so the rects are disjoint and
    cover exactly the coefficients that influence the region. Both
    the encoder (upshift) and the decoder (downshift) derive the
    mask from this one function, so the scaling inverts exactly.

    ``origin`` is the tile-component's ABSOLUTE canvas origin
    (round-11: offsets compose with scaling ROI): the interval
    closure works in absolute sample coordinates — low coefficients
    sit at absolute even positions whatever the phase, so the s/d
    reach formulas are phase-invariant — and band-local indices are
    absolute minus each band's own B-15 origin. origin (0, 0)
    reproduces the zero-phase layout bit-for-bit."""
    ox, oy = origin
    ax, ay = max(rect[0], 0) + ox, max(rect[1], 0) + oy
    bx, by = min(rect[2], tcw) + ox, min(rect[3], tch) + oy
    if bx <= ax or by <= ay:
        return []
    rects = []
    # absolute extents of the current level's window
    wx0, wx1 = ox, ox + tcw
    wy0, wy1 = oy, oy + tch
    for r in range(levels, 0, -1):
        (sx0, sx1), (dx0, dx1) = _roi_interval_back(ax, bx)
        (sy0, sy1), (dy0, dy1) = _roi_interval_back(ay, by)
        bands = _bands_for_resolution(tcw, tch, levels, r, origin)
        origs = _band_abs_origins(tcw, tch, levels, r, origin)
        for (name, bpx, bpy, bw, bh), (abx, aby) in zip(bands, origs):
            if name == "HL":    # x high-pass, y low-pass
                ix0, ix1, iy0, iy1 = dx0, dx1, sy0, sy1
            elif name == "LH":  # x low-pass, y high-pass
                ix0, ix1, iy0, iy1 = sx0, sx1, dy0, dy1
            elif name == "HH":
                ix0, ix1, iy0, iy1 = dx0, dx1, dy0, dy1
            else:
                continue
            # absolute band-grid interval -> band-local, clamped
            lx0 = max(ix0 - abx, 0)
            ly0 = max(iy0 - aby, 0)
            lx1 = min(ix1 - abx, bw)
            ly1 = min(iy1 - aby, bh)
            if lx1 > lx0 and ly1 > ly0:
                rects.append((bpx + lx0, bpy + ly0,
                              bpx + lx1, bpy + ly1))
        # recurse into the low band: its absolute k-extent is the
        # ceil/floor halving of the window (B-14)
        wx0, wx1 = -(-wx0 // 2), -(-wx1 // 2)
        wy0, wy1 = -(-wy0 // 2), -(-wy1 // 2)
        ax, bx = max(sx0, wx0), min(sx1, wx1)
        ay, by = max(sy0, wy0), min(sy1, wy1)
    if bx > ax and by > ay:
        # the r = 0 LL sits at the plane origin; its absolute origin
        # is the fully-halved window edge
        rects.append((ax - wx0, ay - wy0, bx - wx0, by - wy0))
    return rects


def _check_subsampling(subsampling, ncomp: int) -> list:
    """Validate a per-component (XRsiz, YRsiz) list → normalized."""
    if subsampling is None:
        return [(1, 1)] * ncomp
    subs = [tuple(s) for s in subsampling]
    if len(subs) != ncomp:
        raise JPXError("subsampling must list every component")
    for xr, yr in subs:
        if xr not in (1, 2, 4) or yr not in (1, 2, 4):
            raise JPXError(f"subsampling factors {xr}x{yr} (1/2/4 only)")
    return subs


def _decimate_rows(rows: list, xr: int, yr: int,
                   xo: int = 0, yo: int = 0) -> list:
    """Top-left-rule decimation of a list-of-rows plane anchored at
    reference-grid (xo, yo): component samples sit at grid multiples
    of the separation (B.2), so the first kept row/column is the
    first multiple >= the offset — ceil(xo/xr)·xr − xo into the
    plane. Zero offsets reduce to plain ``[::xr]``."""
    if xr == 1 and yr == 1:
        return rows
    x0 = -(-xo // xr) * xr - xo
    y0 = -(-yo // yr) * yr - yo
    return [row[x0::xr] for row in rows[y0::yr]]


def _tile_comp_box(tx, ty, xts, yts, width, height, xr, yr,
                   xo=0, yo=0, xto=0, yto=0):
    """Tile (tx, ty)'s span in component coordinates (B.3):
    (tcx0, tcy0, tcw, tch). ``width``/``height`` are Xsiz/Ysiz;
    canvas offsets XO/YO clamp the first row/column of tiles and
    XTO/YTO anchor the tile grid."""
    tx0 = max(xto + tx * xts, xo)
    ty0 = max(yto + ty * yts, yo)
    tcx0 = -(-tx0 // xr)
    tcy0 = -(-ty0 // yr)
    tcx1 = -(-min(xto + (tx + 1) * xts, width) // xr)
    tcy1 = -(-min(yto + (ty + 1) * yts, height) // yr)
    return tcx0, tcy0, tcx1 - tcx0, tcy1 - tcy0


def encode_jpx(
    width: int,
    height: int,
    samples: bytes,
    ncomp: int = 1,
    levels: int = 3,
    jp2: bool = False,
    mct: bool = True,
    irreversible: bool = False,
    quality_bits: int = 8,
    quant_style: str = "expounded",
    tile_size: tuple | None = None,
    sop: bool = False,
    eph: bool = False,
    layers: int = 1,
    prog: int = 0,
    chroma_quality_bits: int | None = None,
    tile_parts: int = 1,
    subsampling: tuple | None = None,
    precincts: tuple | list | None = None,
    bypass: bool = False,
    cbstyle: int = 0,
    roi: tuple | None = None,
    roi_style: int = 0,
    roi_shift: int = 6,
    image_offset: tuple = (0, 0),
    tile_offset: tuple = (0, 0),
    coc: dict | None = None,
    tile_coc: dict | None = None,
    cb_exp: tuple = (_CB_EXP, _CB_EXP),
) -> bytes:
    """Author a JPEG 2000 codestream (or JP2 file with ``jp2``) from
    8-bit samples (gray, or interleaved RGB with the color transform
    when ``mct``). Fixture twin of :func:`decode_jpx`.

    ``subsampling`` gives per-component (XRsiz, YRsiz) pairs — e.g.
    ``((1, 1), (2, 2), (2, 2))`` for 4:2:0. Components are decimated
    by taking every XRsiz-th/YRsiz-th sample (the top-left rule the
    decoder's replication upsample inverts). Because MCT is
    spec-limited to equal separations, ``mct=True`` with unequal
    subsampling performs the ICT EXTERNALLY (float, rounded) and
    signals sYCC via the JP2 colr box (EnumCS 18) with MCT off —
    the shape real 4:2:0 scanner payloads use; ``mct=False`` stores
    the interleaved channels as independent components.

    ``irreversible=True`` emits the lossy regime real scanner/camera
    payloads use: forward 9/7 wavelet, ICT for RGB, and scalar
    quantization keeping ``quality_bits`` magnitude bits per subband
    (Δ_b = max|coeff| / 2^quality_bits), signaled as QCD style 2
    (``quant_style="expounded"``, per-subband steps) or style 1
    (``"derived"``, one LL step scaled per level).

    ``tile_size=(tw, th)`` splits the image into independently coded
    tiles (one tile-part each, raster Isot order); ``sop``/``eph``
    emit the A.8 resync markers real scanner codestreams carry.

    ``image_offset=(XO, YO)`` / ``tile_offset=(XTO, YTO)`` anchor the
    image area and tile grid on the reference CANVAS (B.3, round-8):
    Xsiz = XO + width, the first tile row/column is clamped to the
    image area, and precinct + code-block grids anchor at the canvas
    origin. Round-10: offsets may be ANY phase (odd origins shift
    the 5/3/9/7 lifting phase and the B-15 band geometry — both
    phase-aware now) and work on the lossy path too; they still
    require 1x1 subsampling and no ROI.

    ``coc={component: levels}`` emits main-header COC + QCC segments
    giving that component its OWN decomposition depth (A.6.2);
    ``tile_coc={tile: {component: levels}}`` puts the COC + QCC in
    that tile's first tile-part HEADER (per-tile coding styles).
    Both are reversible-path only; with ``precincts`` the per-
    resolution sizes must be uniform (each COC re-signals its own
    list for its own depth)."""
    if ncomp not in (1, 2, 3, 4):
        raise JPXError("encode_jpx handles 1-4 components")
    if ncomp in (2, 4) and mct:
        raise JPXError(
            "MCT is a 3-component transform (T.800 G); pass "
            "mct=False for gray+alpha / CMYK"
        )
    if len(samples) != width * height * ncomp:
        raise JPXError("sample buffer does not match dimensions")
    levels = max(0, min(levels, 32))
    subs = _check_subsampling(subsampling, ncomp)
    precincts = _check_precincts(precincts, levels)
    cb_exp = tuple(int(v) for v in cb_exp)
    _check_cb_exp(cb_exp)
    cbstyle = (cbstyle | (0x01 if bypass else 0)) & 0xFF
    if cbstyle & ~0x3F:
        raise JPXError(f"undefined code-block style bits 0x{cbstyle:02x}")
    if roi is not None and irreversible:
        raise JPXError(
            "the fixture encoder codes ROI in the reversible path "
            "(the decoder handles both)"
        )
    if roi_style not in (0, 1):
        raise JPXError("roi_style must be 0 (maxshift) or 1 (scaling)")
    if roi_style == 1 and roi is not None \
            and not 1 <= int(roi_shift) <= 37:
        raise JPXError("scaling ROI shift must be in 1..37")
    xo, yo = (int(v) for v in image_offset)
    xto, yto = (int(v) for v in tile_offset)
    canvas = bool(xo or yo or xto or yto)
    # round-10: the LOSSY path supports canvas offsets (phase-aware
    # 9/7); round-11: subsampling composes with offsets, and BOTH
    # ROI styles compose with offsets and subsampling — the
    # dependency-closure mask works in absolute coordinates and the
    # maxshift decode rule is magnitude-based (mask-free) anyway
    coc = {int(k): int(v) for k, v in (coc or {}).items()}
    tile_coc = {
        int(t): {int(k): int(v) for k, v in d.items()}
        for t, d in (tile_coc or {}).items()
    }
    if coc or tile_coc:
        if irreversible or roi is not None:
            raise JPXError(
                "per-component/per-tile COC is reversible-path only"
            )
        for d in [coc, *tile_coc.values()]:
            for c, lv in d.items():
                if not 0 <= c < ncomp or not 0 <= lv <= 32:
                    raise JPXError(f"bad COC override {c}: {lv}")
        if precincts is not None and len(set(precincts)) != 1:
            raise JPXError(
                "COC overrides need uniform precinct sizes"
            )
    if irreversible:
        if ncomp not in (1, 3):
            raise JPXError("the lossy fixture path is 1/3-component")
        return _encode_jpx_lossy(
            width, height, samples, ncomp, levels, jp2, mct,
            quality_bits, quant_style, tile_size, sop, eph, layers,
            prog, chroma_quality_bits, tile_parts, subs, precincts,
            cbstyle, image_offset=(xo, yo), tile_offset=(xto, yto),
            cb_exp=cb_exp,
        )
    external_ycc = False
    comps = []
    if ncomp == 1:
        comps.append(
            [[samples[y * width + x] - 128 for x in range(width)]
             for y in range(height)]
        )
        use_mct = False
    elif ncomp in (2, 4):
        # gray+opacity / CMYK: components code independently (no
        # inter-component transform); the JP2 colr box carries the
        # colorspace (EnumCS 12 for 4 components)
        comps = [
            [[samples[(y * width + x) * ncomp + c] - 128
              for x in range(width)]
             for y in range(height)]
            for c in range(ncomp)
        ]
        use_mct = False
    else:
        rs, gs, bs = [], [], []
        for y in range(height):
            rr, gg, bb = [], [], []
            for x in range(width):
                i = (y * width + x) * 3
                rr.append(samples[i] - 128)
                gg.append(samples[i + 1] - 128)
                bb.append(samples[i + 2] - 128)
            rs.append(rr), gs.append(gg), bs.append(bb)
        use_mct = mct
        if use_mct and len(set(subs)) != 1:
            # unequal separations: ICT outside the codestream (the
            # 4:2:0 shape), MCT off in COD, sYCC in the JP2 colr box
            use_mct, external_ycc = False, True
            ys, us, vs = [], [], []
            for rr, gg, bb in zip(rs, gs, bs):
                yy, uu, vv = [], [], []
                for r, g, b in zip(rr, gg, bb):
                    yy.append(round(0.299 * r + 0.587 * g + 0.114 * b))
                    uu.append(round(-0.16875 * r - 0.33126 * g
                                    + 0.5 * b))
                    vv.append(round(0.5 * r - 0.41869 * g
                                    - 0.08131 * b))
                ys.append(yy), us.append(uu), vs.append(vv)
            comps = [ys, us, vs]
        elif use_mct:
            ys, us, vs = [], [], []
            for rr, gg, bb in zip(rs, gs, bs):
                yy = [(r + 2 * g + b) >> 2 for r, g, b in zip(rr, gg, bb)]
                uu = [b - g for g, b in zip(gg, bb)]
                vv = [r - g for r, g in zip(rr, gg)]
                ys.append(yy), us.append(uu), vs.append(vv)
            comps = [ys, us, vs]
        else:
            comps = [rs, gs, bs]
    comps = [
        _decimate_rows(p, xr, yr, xo, yo)
        for p, (xr, yr) in zip(comps, subs)
    ]
    xts, yts = tile_size or (width, height)
    if xts <= 0 or yts <= 0:
        raise JPXError("non-positive tile size")
    xsiz, ysiz = xo + width, yo + height
    if not (0 <= xto <= xo < xto + xts and 0 <= yto <= yo < yto + yts):
        raise JPXError("inconsistent canvas offsets")
    out = bytearray()
    out += b"\xff\x4f"  # SOC
    # SIZ
    siz = struct.pack(
        ">HIIIIIIIIH", 0, xsiz, ysiz, xo, yo, xts, yts, xto, yto,
        ncomp
    )
    for xr, yr in subs:
        siz += bytes([7, xr, yr])  # 8-bit unsigned
    out += b"\xff\x51" + struct.pack(">H", len(siz) + 2) + siz
    # COD: LRCP, 1 layer, MCT flag, NL levels, 64x64 blocks, 5/3
    if layers < 1:
        raise JPXError("layers must be >= 1")
    if not 0 <= prog <= 4:
        raise JPXError("bad progression order")
    scod = (0x02 if sop else 0) | (0x04 if eph else 0)
    if precincts is not None:
        scod |= 0x01
    cod = bytes([scod, prog]) + struct.pack(">H", layers) + bytes(
        [1 if use_mct else 0, levels, cb_exp[0] - 2, cb_exp[1] - 2,
         cbstyle, 1]
    )
    if precincts is not None:
        cod += bytes(ppx | (ppy << 4) for ppx, ppy in precincts)
    out += b"\xff\x52" + struct.pack(">H", len(cod) + 2) + cod
    # encode every tile first (QCD + zero-bitplane signaling need the
    # per-band exponents max-merged across components AND tiles)
    ntx = (xsiz - xto + xts - 1) // xts
    nty = (ysiz - yto + yts - 1) // yts
    # forward transforms first — ROI needs the cross-tile background
    # maximum BEFORE any block is entropy-coded
    def eff_levels(isot: int, c: int) -> int:
        tl = tile_coc.get(isot, {})
        return tl[c] if c in tl else coc.get(c, levels)

    tile_planes: dict = {}
    for isot in range(ntx * nty):
        tx, ty = isot % ntx, isot // ntx
        planes = []
        for c, ((xr, yr), plane_rows) in enumerate(zip(subs, comps)):
            lv = eff_levels(isot, c)
            tcx0, tcy0, tcw, tch = _tile_comp_box(
                tx, ty, xts, yts, xsiz, ysiz, xr, yr, xo, yo, xto, yto
            )
            # component planes cover the IMAGE AREA: index from the
            # component origin ceil(offset / separation) (B.3;
            # round-11 — with 1x1 subsampling this is the offset
            # itself, the round-10 convention, bytes unchanged).
            # round-10: EVERY tile-component transforms at its
            # ABSOLUTE canvas origin (B-14/F.3 — the lifting phase
            # and split points are position-dependent). Zero-offset
            # single-tile streams — the PDF-embedded norm — have
            # origin (0, 0), so their bytes are unchanged; unaligned
            # multi-tile streams now match the spec instead of the
            # engine's former tile-local convention.
            cox, coy = -(-xo // xr), -(-yo // yr)
            sub = [row[tcx0 - cox:tcx0 - cox + tcw]
                   for row in plane_rows[tcy0 - coy:tcy0 - coy + tch]]
            planes.append(
                (dwt53_forward_2d(sub, lv, (tcx0, tcy0)), tcw, tch,
                 tcx0, tcy0)
            )
        tile_planes[isot] = planes
    sprgn = 0
    if roi is not None and roi_style == 1:
        # scaling-based ROI (T.801 Srgn=1): the region is SIGNALED in
        # the RGN segment, so the shift is encoder-chosen (no
        # background-magnitude floor) and the decoder identifies ROI
        # coefficients geometrically — encoder and decoder share
        # _roi_band_rects, so the upshift inverts exactly
        sprgn = int(roi_shift)
        rx0, ry0, rx1, ry1 = (int(v) for v in roi)
        for isot, planes in tile_planes.items():
            for cc, (plane, tcw, tch, tcx0, tcy0) in enumerate(planes):
                xr, yr = subs[cc]
                rect = (rx0 // xr - tcx0, ry0 // yr - tcy0,
                        -(-rx1 // xr) - tcx0, -(-ry1 // yr) - tcy0)
                for (wx0, wy0, wx1, wy1) in _roi_band_rects(
                        tcw, tch, levels, rect, (tcx0, tcy0)):
                    for row in plane[wy0:wy1]:
                        for i in range(wx0, wx1):
                            row[i] <<= sprgn
    elif roi is not None:
        # maxshift (H.1): s must exceed every BACKGROUND magnitude's
        # bit length so the decoder's 2^s threshold is unambiguous
        rx0, ry0, rx1, ry1 = (int(v) for v in roi)
        masks: dict = {}
        bg = 1
        for isot, planes in tile_planes.items():
            for cc, (plane, tcw, tch, tcx0, tcy0) in enumerate(planes):
                xr, yr = subs[cc]
                rect = (rx0 // xr - tcx0, ry0 // yr - tcy0,
                        -(-rx1 // xr) - tcx0, -(-ry1 // yr) - tcy0)
                m = _roi_mask_for_plane(tcw, tch, levels, rect)
                masks[(isot, cc)] = m
                for row, mrow in zip(plane, m):
                    for v, in_roi in zip(row, mrow):
                        if not in_roi:
                            bg = max(bg, abs(v))
        sprgn = bg.bit_length()
        for (isot, cc), m in masks.items():
            plane = tile_planes[isot][cc][0]
            for row, mrow in zip(plane, m):
                for i, in_roi in enumerate(mrow):
                    if in_roi:
                        row[i] <<= sprgn
    tile_res: dict = {}
    exps_tc: dict = {}  # (isot, c) -> per-subband max plane counts
    for isot in range(ntx * nty):
        all_res = []
        for c, (plane, tcw, tch, tcx0, tcy0) in enumerate(
            tile_planes[isot]
        ):
            lv_c = eff_levels(isot, c)
            prec_c = None if precincts is None else (
                precincts if lv_c == levels
                else [precincts[0]] * (lv_c + 1)
            )
            res, comp_exps = _encode_tile_component(
                plane, tcw, tch, lv_c, cbstyle,
                origin=(tcx0, tcy0), precincts=prec_c,
                cb_exp=cb_exp,
            )
            all_res.append(res)
            exps_tc[(isot, c)] = comp_exps
        tile_res[isot] = all_res
    # quantization governors (A.6.4/5): tile QCC > main QCC (emitted
    # for main-COC comps) > QCD; exponents max-merge within each
    # governor so the signaled Mb is valid for every tile it covers
    def governor(isot: int, c: int):
        if c in tile_coc.get(isot, {}):
            return ("tqcc", isot, c)
        if c in coc:
            return ("qcc", c)
        return ("qcd",)

    gov_exps: dict = {}
    for (isot, c), e in exps_tc.items():
        g = governor(isot, c)
        cur = gov_exps.get(g)
        gov_exps[g] = (list(e) if cur is None
                       else [max(a, b) for a, b in zip(cur, e)])
    if any(e + 1 - _GUARD_BITS > 31
           for es in gov_exps.values() for e in es):
        raise JPXError("coefficient magnitudes exceed the 5-bit exponent")

    def mbs_for(isot: int, c: int) -> list:
        """Per-resolution Mb slices for one tile-component from its
        governing quantization segment."""
        es = gov_exps[governor(isot, c)]
        out_r = []
        k = 0
        for r in range(eff_levels(isot, c) + 1):
            n = 1 if r == 0 else 3
            out_r.append(es[k:k + n])
            k += n
        return out_r

    def _exp_bytes(es: list) -> bytes:
        return bytes(max(0, e + 1 - _GUARD_BITS) << 3 for e in es)

    def _coc_seg(c: int, lv: int) -> bytes:
        scoc = 1 if precincts is not None else 0
        body = bytes([c, scoc, lv, cb_exp[0] - 2, cb_exp[1] - 2,
                      cbstyle, 1])
        if precincts is not None:
            ppx, ppy = precincts[0]
            body += bytes([ppx | (ppy << 4)]) * (lv + 1)
        return b"\xff\x53" + struct.pack(">H", len(body) + 2) + body

    def _qcc_seg(c: int, es: list) -> bytes:
        body = bytes([c, _GUARD_BITS << 5]) + _exp_bytes(es)
        return b"\xff\x5d" + struct.pack(">H", len(body) + 2) + body

    # main-header COC + QCC for per-component overrides
    for c in sorted(coc):
        out += _coc_seg(c, coc[c])
    # QCD: reversible (style 0), guard bits, one exponent per subband
    # (Mb = eps + guard - 1 must reproduce the per-band plane count).
    # When EVERY (tile, comp) is governed by a QCC, a placeholder QCD
    # for the COD depth is still required (A.6.4).
    qcd_exps = gov_exps.get(
        ("qcd",), [_GUARD_BITS] * (1 + 3 * levels)
    )
    qcd = bytes([_GUARD_BITS << 5]) + _exp_bytes(qcd_exps)
    out += b"\xff\x5c" + struct.pack(">H", len(qcd) + 2) + qcd
    for c in sorted(coc):
        out += _qcc_seg(c, gov_exps[("qcc", c)])
    if roi is not None and roi_style == 1:
        # scaling-based rectangle ROI (T.801 Srgn=1): the segment
        # carries the shift AND the region — XArgn/YArgn/WArgn/HArgn
        # as 32-bit reference-grid values after SPrgn
        rx0, ry0, rx1, ry1 = (int(v) for v in roi)
        body = struct.pack(">IIII", rx0, ry0, rx1 - rx0, ry1 - ry0)
        for cc in range(ncomp):
            out += b"\xff\x5e" + struct.pack(
                ">H", 5 + len(body)
            ) + bytes([cc, 1, sprgn]) + body
    elif roi is not None:
        for cc in range(ncomp):  # RGN maxshift per component (A.6.3)
            out += b"\xff\x5e" + struct.pack(">H", 5) + bytes(
                [cc, 0, sprgn]
            )
    # tiles: LRCP over 1 layer → resolution-major, component-minor
    for isot in range(ntx * nty):
        tx, ty = isot % ntx, isot // ntx
        tboxes = [_tile_comp_box(tx, ty, xts, yts, xsiz, ysiz,
                                 xr, yr, xo, yo, xto, yto)
                  for xr, yr in subs]
        comp_levels = [eff_levels(isot, c) for c in range(ncomp)]
        comp_precincts = [
            None if precincts is None
            else (precincts if lv == levels
                  else [precincts[0]] * (lv + 1))
            for lv in comp_levels
        ]
        pinfo = _precinct_info(
            [b[2:] for b in tboxes], max(comp_levels), None, subs,
            origins=[b[:2] for b in tboxes],
            comp_levels=comp_levels, comp_precincts=comp_precincts,
        )
        hdrb = b""
        for c in sorted(tile_coc.get(isot, {})):
            hdrb += _coc_seg(c, tile_coc[isot][c])
            hdrb += _qcc_seg(c, gov_exps[("tqcc", isot, c)])
        _emit_tile(
            out, isot,
            _tile_packets(tile_res[isot],
                          [mbs_for(isot, c) for c in range(ncomp)],
                          max(comp_levels), layers,
                          sop, eph, prog, pinfo, cbstyle,
                          comp_levels=comp_levels, cb_exp=cb_exp),
            tile_parts,
            header_bytes=hdrb,
        )
    out += b"\xff\xd9"  # EOC
    if not jp2:
        return bytes(out)
    return _jp2_container(bytes(out), width, height, ncomp,
                          18 if external_ycc else None)


def _jp2_container(codestream: bytes, width: int, height: int,
                   ncomp: int, enumcs: int | None = None) -> bytes:
    """Wrap a codestream in a minimal JP2 container. ``enumcs``
    overrides the colr box's enumerated colorspace (default: 17
    greyscale / 16 sRGB by component count; 18 = sYCC)."""
    def box(btype: bytes, payload: bytes) -> bytes:
        return struct.pack(">I", len(payload) + 8) + btype + payload

    if enumcs is None:
        enumcs = 17 if ncomp <= 2 else (12 if ncomp == 4 else 16)
    sig = box(b"jP\x20\x20", b"\x0d\x0a\x87\x0a")
    ftyp = box(b"ftyp", b"jp2 " + struct.pack(">I", 0) + b"jp2 ")
    ihdr = box(
        b"ihdr",
        struct.pack(">IIHBBBB", height, width, ncomp, 7, 7, 0, 0),
    )
    colr = box(
        b"colr",
        bytes([1, 0, 0]) + struct.pack(">I", enumcs),
    )
    jp2h = box(b"jp2h", ihdr + colr)
    return sig + ftyp + jp2h + box(b"jp2c", codestream)


def _encode_jpx_lossy(
    width: int,
    height: int,
    samples: bytes,
    ncomp: int,
    levels: int,
    jp2: bool,
    mct: bool,
    quality_bits: int,
    quant_style: str,
    tile_size: tuple | None = None,
    sop: bool = False,
    eph: bool = False,
    layers: int = 1,
    prog: int = 0,
    chroma_quality_bits: int | None = None,
    tile_parts: int = 1,
    subs: list | None = None,
    precincts: list | None = None,
    cbstyle: int = 0,
    image_offset: tuple = (0, 0),
    tile_offset: tuple = (0, 0),
    cb_exp: tuple = (_CB_EXP, _CB_EXP),
) -> bytes:
    """Lossy (9/7 + scalar quantization) body of :func:`encode_jpx`.

    ``chroma_quality_bits`` quantizes components 1-2 (Cb/Cr after the
    ICT) with their own coarser steps, signaled via per-component QCC
    segments (A.6.5) — the real-world chroma-subquality shape.
    ``image_offset``/``tile_offset`` (round-10) anchor the canvas
    like the reversible path — any phase, including odd origins,
    through the phase-aware 9/7; round-11: subsampling composes with
    offsets (per-component ceil-division origins, B.3)."""
    import numpy as np

    if quant_style not in ("expounded", "derived"):
        raise JPXError(f"unknown quant_style {quant_style!r}")
    subs = subs or [(1, 1)] * ncomp
    xo, yo = (int(v) for v in image_offset)
    xto, yto = (int(v) for v in tile_offset)
    xsiz, ysiz = xo + width, yo + height
    external_ycc = False
    if ncomp == 1:
        arr = np.frombuffer(samples, np.uint8).astype(np.float64)
        fcomps = [arr.reshape(height, width) - 128.0]
        use_mct = False
    else:
        rgb = (np.frombuffer(samples, np.uint8).astype(np.float64)
               .reshape(height, width, 3) - 128.0)
        use_mct = mct
        if use_mct and len(set(subs)) != 1:
            # unequal separations (4:2:0 etc.): ICT outside the
            # codestream, MCT off, sYCC signaled in the JP2 colr box
            use_mct, external_ycc = False, True
        if use_mct or external_ycc:  # ICT forward (T.800 G.2)
            r_, g_, b_ = rgb[..., 0], rgb[..., 1], rgb[..., 2]
            fcomps = [
                0.299 * r_ + 0.587 * g_ + 0.114 * b_,
                -0.16875 * r_ - 0.33126 * g_ + 0.5 * b_,
                0.5 * r_ - 0.41869 * g_ - 0.08131 * b_,
            ]
        else:
            fcomps = [rgb[..., c].copy() for c in range(3)]
    fcomps = [
        # top-left-rule decimation anchored at the per-component
        # ceil-division origin (B.3; zero offsets reduce to [::xr])
        c[(-(-yo // yr) * yr - yo)::yr, (-(-xo // xr) * xr - xo)::xr]
        for c, (xr, yr) in zip(fcomps, subs)
    ]
    xts, yts = tile_size or (xsiz - xto, ysiz - yto)
    if xts <= 0 or yts <= 0:
        raise JPXError("non-positive tile size")
    ntx = (xsiz - xto + xts - 1) // xts
    nty = (ysiz - yto + yts - 1) // yts

    def comp_box(isot, cc):
        tx, ty = isot % ntx, isot // ntx
        return _tile_comp_box(tx, ty, xts, yts, xsiz, ysiz,
                              *subs[cc], xo, yo, xto, yto)

    def comp_origin(isot, cc):
        tcx0, tcy0, _, _ = comp_box(isot, cc)
        return (tcx0, tcy0)

    # forward 9/7 per tile (tiles transform independently; canvas
    # streams take the absolute origin — phase-aware, round-10)
    tile_coeff: dict = {}
    for isot in range(ntx * nty):
        planes = []
        for cc, c in enumerate(fcomps):
            tcx0, tcy0, tw, th = comp_box(isot, cc)
            xr, yr = subs[cc]
            cox, coy = -(-xo // xr), -(-yo // yr)
            planes.append(_dwt97_forward_2d_np(
                c[tcy0 - coy:tcy0 - coy + th,
                  tcx0 - cox:tcx0 - cox + tw].copy(),
                tw, th, levels, comp_origin(isot, cc)
            ))
        tile_coeff[isot] = planes
    # per-subband step selection from the cross-tile/component max;
    # band_list geometry varies per tile, so index bands by position
    band_list = []  # (r, name) in QCD order
    for r in range(levels + 1):
        for nm in (["LL"] if r == 0 else ["HL", "LH", "HH"]):
            band_list.append((r, nm))

    def band_max(idx, comps_sel=None):
        r, nm = band_list[idx]
        best = 0.0
        for isot in range(ntx * nty):
            for cc in (range(ncomp) if comps_sel is None
                       else comps_sel):
                _, _, tw, th = comp_box(isot, cc)
                bands = _bands_for_resolution(
                    tw, th, levels, r, comp_origin(isot, cc))
                nm2, bx, by, bw, bh = bands[
                    0 if r == 0 else ["HL", "LH", "HH"].index(nm)
                ]
                if bw <= 0 or bh <= 0:
                    continue
                c = tile_coeff[isot][cc]
                v = float(np.abs(c[by:by + bh, bx:bx + bw]).max())
                best = max(best, v)
        return best

    def select_steps(qbits, comps_sel=None):
        """(pairs, deltas, band_eps) for one quantization signal."""
        pairs, deltas, band_eps = [], [], []
        if quant_style == "derived":
            mx = band_max(0, comps_sel) or 1.0
            e0, mu0, _ = _delta_to_eps_mu(
                mx / (1 << qbits), 8, _band_gain("LL")
            )
            pairs = [(e0, mu0)]
            for r, nm in band_list:
                eps = e0 if r == 0 else e0 + 1 - r
                if not 0 <= eps <= 31:
                    raise JPXError(
                        "derived quantization exponent out of range"
                    )
                deltas.append(_quant_delta(8, _band_gain(nm), eps, mu0))
                band_eps.append(eps)
        else:
            for idx, (r, nm) in enumerate(band_list):
                mx = band_max(idx, comps_sel) or 1.0
                eps, mu, dd = _delta_to_eps_mu(
                    mx / (1 << qbits), 8, _band_gain(nm)
                )
                pairs.append((eps, mu))
                deltas.append(dd)
                band_eps.append(eps)
        return pairs, deltas, band_eps

    if chroma_quality_bits is None:
        # shared signal: steps from the cross-component max, QCD only
        pairs, deltas, band_eps = select_steps(quality_bits)
        comp_pairs = [pairs] * ncomp
        comp_deltas = [deltas] * ncomp
        comp_eps = [band_eps] * ncomp
    else:
        if ncomp != 3:
            raise JPXError("chroma_quality_bits requires 3 components")
        if quant_style != "expounded":
            raise JPXError(
                "chroma_quality_bits requires the expounded style"
            )
        luma = select_steps(quality_bits, [0])
        chroma = select_steps(chroma_quality_bits, [1, 2])
        comp_pairs = [luma[0], chroma[0], chroma[0]]
        comp_deltas = [luma[1], chroma[1], chroma[1]]
        comp_eps = [luma[2], chroma[2], chroma[2]]
    # quantize per tile: q = sign(c) * floor(|c| / Δ_b)
    tile_res: dict = {}
    comp_maxq = [[0] * len(band_list) for _ in range(ncomp)]
    for isot in range(ntx * nty):
        all_res = []
        for cc, c in enumerate(tile_coeff[isot]):
            _, _, tw, th = comp_box(isot, cc)
            ip = np.zeros((th, tw), np.int64)
            k = 0
            for r in range(levels + 1):
                for nm, bx, by, bw, bh in _bands_for_resolution(
                    tw, th, levels, r, comp_origin(isot, cc)
                ):
                    dl = comp_deltas[cc][k]
                    k += 1
                    if bw <= 0 or bh <= 0:
                        continue
                    v = c[by:by + bh, bx:bx + bw]
                    ip[by:by + bh, bx:bx + bw] = (
                        np.sign(v) * np.floor(np.abs(v) / dl)
                    ).astype(np.int64)
            res, comp_exps = _encode_tile_component(
                ip.tolist(), tw, th, levels, cbstyle,
                origin=comp_origin(isot, cc), precincts=precincts,
                cb_exp=cb_exp,
            )
            all_res.append(res)
            comp_maxq[cc] = [max(a, b) for a, b in
                             zip(comp_maxq[cc], comp_exps)]
        tile_res[isot] = all_res
    # guard bits sized so Mb = guard + eps - 1 covers every block;
    # without QCC all components share the QCD guard
    if chroma_quality_bits is None:
        merged = [max(comp_maxq[cc][i] for cc in range(ncomp))
                  for i in range(len(band_list))]
        comp_maxq = [merged] * ncomp
    comp_guard = []
    for cc in range(ncomp):
        g = max(1, max(
            (q + 1 - e for q, e in zip(comp_maxq[cc], comp_eps[cc])),
            default=1,
        ))
        if g > 7:
            raise JPXError("guard bits exceed the 3-bit field")
        comp_guard.append(g)
    mbs_by_cr = []
    for cc in range(ncomp):
        mbs_all = [comp_guard[cc] + e - 1 for e in comp_eps[cc]]
        by_r = []
        k = 0
        for r in range(levels + 1):
            n = 1 if r == 0 else 3
            by_r.append(mbs_all[k:k + n])
            k += n
        mbs_by_cr.append(by_r)
    out = bytearray()
    out += b"\xff\x4f"  # SOC
    siz = struct.pack(
        ">HIIIIIIIIH", 0, xsiz, ysiz, xo, yo, xts, yts, xto, yto,
        ncomp
    )
    for xr, yr in subs:
        siz += bytes([7, xr, yr])
    out += b"\xff\x51" + struct.pack(">H", len(siz) + 2) + siz
    # COD: LRCP, 1 layer, MCT flag, NL levels, 64x64 blocks, 9/7
    if layers < 1:
        raise JPXError("layers must be >= 1")
    if not 0 <= prog <= 4:
        raise JPXError("bad progression order")
    scod = (0x02 if sop else 0) | (0x04 if eph else 0)
    if precincts is not None:
        scod |= 0x01
    cod = bytes([scod, prog]) + struct.pack(">H", layers) + bytes(
        [1 if use_mct else 0, levels, cb_exp[0] - 2, cb_exp[1] - 2,
         cbstyle, 0]
    )
    if precincts is not None:
        cod += bytes(ppx | (ppy << 4) for ppx, ppy in precincts)
    out += b"\xff\x52" + struct.pack(">H", len(cod) + 2) + cod
    style = 1 if quant_style == "derived" else 2
    qcd = bytes([(comp_guard[0] << 5) | style]) + b"".join(
        struct.pack(">H", (e << 11) | mu) for e, mu in comp_pairs[0]
    )
    out += b"\xff\x5c" + struct.pack(">H", len(qcd) + 2) + qcd
    if chroma_quality_bits is not None:
        for cc in (1, 2):  # QCC overrides for the chroma components
            qcc = (bytes([cc, (comp_guard[cc] << 5) | style])
                   + b"".join(struct.pack(">H", (e << 11) | mu)
                              for e, mu in comp_pairs[cc]))
            out += b"\xff\x5d" + struct.pack(">H", len(qcc) + 2) + qcc
    for isot in range(ntx * nty):
        tboxes = [comp_box(isot, cc) for cc in range(ncomp)]
        pinfo = _precinct_info(
            [b[2:] for b in tboxes], levels, precincts, subs,
            origins=[(b[0], b[1]) for b in tboxes],
        )
        _emit_tile(
            out, isot,
            _tile_packets(tile_res[isot], mbs_by_cr, levels, layers,
                          sop, eph, prog, pinfo, cbstyle,
                          cb_exp=cb_exp),
            tile_parts,
        )
    out += b"\xff\xd9"  # EOC
    if not jp2:
        return bytes(out)
    return _jp2_container(bytes(out), width, height, ncomp,
                          18 if external_ycc else None)


# =====================================================================
# Codestream — decoder
# =====================================================================


def _parse_cod(seg: bytes) -> dict:
    """COD segment (A.6.1) → the coding-style dict keys."""
    scod = seg[0]
    prog, layers = seg[1], struct.unpack_from(">H", seg, 2)[0]
    mct = seg[4]
    if layers < 1:
        raise JPXError("zero quality layers")
    if prog > 4:
        raise JPXError(f"bad progression order {prog}")
    levels = seg[5]
    cbw, cbh = seg[6] + 2, seg[7] + 2
    cbstyle = seg[8]
    if cbstyle & ~0x3F:
        raise JPXError(
            f"undefined code-block style bits 0x{cbstyle:02x}"
        )
    transform = seg[9]
    if transform not in (0, 1):
        raise JPXError(f"bad wavelet transform byte {transform}")
    precincts = _parse_precinct_bytes(seg[10:], levels) \
        if scod & 0x01 else None
    return dict(
        prog=prog, levels=levels, cb_exp=(cbw, cbh), mct=mct,
        transform=transform, layers=layers, cbstyle=cbstyle,
        sop=bool(scod & 0x02), eph=bool(scod & 0x04),
        precincts=precincts,
    )


def _parse_precinct_bytes(pp: bytes, levels: int) -> list:
    """Per-resolution precinct-size bytes (B.6) → [(ppx, ppy)],
    enforcing the engine's 64x64 code-block floor."""
    if len(pp) < levels + 1:
        raise JPXError("precinct byte list truncated")
    precincts = [(b & 0x0F, b >> 4) for b in pp[:levels + 1]]
    for r, (ppx, ppy) in enumerate(precincts):
        # round-10: small precincts SHRINK the effective code-block
        # size per B-17 instead of declining; only the Table A.21
        # structural minimum remains
        if r > 0 and (ppx < 1 or ppy < 1):
            raise JPXError(
                "precinct exponent 0 is only legal at resolution 0"
            )
    return precincts


def _parse_coc(seg: bytes, ncomp: int) -> tuple[int, dict]:
    """COC segment (A.6.2) → (component, per-component coding-style
    overrides: levels / cb_exp / cbstyle / transform / precincts)."""
    if ncomp < 257:
        comp, at = seg[0], 1
    else:
        comp, at = struct.unpack_from(">H", seg, 0)[0], 2
    if len(seg) < at + 6:
        raise JPXError("truncated COC segment")
    scoc = seg[at]
    levels = seg[at + 1]
    cb = (seg[at + 2] + 2, seg[at + 3] + 2)
    cbstyle = seg[at + 4]
    if cbstyle & ~0x3F:
        raise JPXError(
            f"undefined COC code-block style bits 0x{cbstyle:02x}"
        )
    transform = seg[at + 5]
    if transform not in (0, 1):
        raise JPXError(f"bad COC wavelet transform byte {transform}")
    precincts = _parse_precinct_bytes(seg[at + 6:], levels) \
        if scoc & 0x01 else None
    return comp, dict(
        levels=levels, cb_exp=cb, cbstyle=cbstyle,
        transform=transform, precincts=precincts,
    )


def _parse_qcd(seg: bytes) -> dict:
    """QCD segment (A.6.4) → quantization entry."""
    style = seg[0] & 0x1F
    entry = {"guard": seg[0] >> 5, "qstyle": style}
    if style == 0:  # no quantization (reversible): 8-bit exps
        entry["exps"] = [b >> 3 for b in seg[1:]]
    elif style in (1, 2):  # scalar derived / expounded: 16-bit
        entry["qvals"] = [
            ((v := struct.unpack_from(">H", seg, i)[0]) >> 11,
             v & 0x7FF)
            for i in range(1, len(seg) - 1, 2)
        ]
    else:
        raise JPXError(f"bad quantization style {style}")
    return entry


def _parse_qcc(seg: bytes, ncomp: int) -> tuple[int, dict]:
    """QCC segment (A.6.5) → (component, quantization entry)."""
    if ncomp < 257:
        comp, at = seg[0], 1
    else:
        comp, at = struct.unpack_from(">H", seg, 0)[0], 2
    sqcc = seg[at]
    style = sqcc & 0x1F
    entry = {"guard": sqcc >> 5, "qstyle": style}
    if style == 0:
        entry["exps"] = [b >> 3 for b in seg[at + 1:]]
    elif style in (1, 2):
        entry["qvals"] = [
            ((v := struct.unpack_from(">H", seg, i)[0]) >> 11,
             v & 0x7FF)
            for i in range(at + 1, len(seg) - 1, 2)
        ]
    else:
        raise JPXError(f"bad QCC quantization style {style}")
    return comp, entry


def _parse_markers(data: bytes):
    """Main-header markers up to SOT → dict + tile-part offset."""
    if data[:2] != b"\xff\x4f":
        raise JPXError("missing SOC marker")
    pos = 2
    hdr: dict = {}
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise JPXError(f"bad marker alignment at {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0x93:  # SOD (shouldn't appear before SOT)
            raise JPXError("SOD before SOT")
        if marker == 0xD9:
            raise JPXError("EOC before any tile")
        length = struct.unpack_from(">H", data, pos)[0]
        seg = data[pos + 2 : pos + length]
        if marker == 0x51:  # SIZ
            (rsiz, xs, ys, xo, yo, xts, yts, xto, yto, ncomp) = (
                struct.unpack_from(">HIIIIIIIIH", seg, 0)
            )
            if xts <= 0 or yts <= 0:
                raise JPXError("non-positive tile size")
            # canvas offsets (B.3, round-8): XTO/YTO must not exceed
            # XO/YO and the first tile must reach the image area
            if not (0 <= xto <= xo < xto + xts
                    and 0 <= yto <= yo < yto + yts):
                raise JPXError(
                    f"inconsistent canvas offsets XO={xo} YO={yo} "
                    f"XTO={xto} YTO={yto}"
                )
            ntiles = (((xs - xto) + xts - 1) // xts) \
                * (((ys - yto) + yts - 1) // yts)
            if ntiles > 1 << 16:  # Isot is 16-bit
                raise JPXError("implausible tile count")
            depths = []
            subs = []
            for c in range(ncomp):
                ssiz, xr, yr = struct.unpack_from(
                    ">BBB", seg, 36 + 3 * c
                )
                if xr not in (1, 2, 4) or yr not in (1, 2, 4):
                    raise JPXUnsupported(
                        f"component subsampling {xr}x{yr} (1/2/4 only)"
                    )
                subs.append((xr, yr))
                if ssiz & 0x80:
                    raise JPXUnsupported("signed components")
                depths.append((ssiz & 0x7F) + 1)
            if any(d != depths[0] for d in depths):
                raise JPXUnsupported("mixed component depths")
            if depths[0] > 16:
                raise JPXUnsupported("components deeper than 16 bits")
            # sanity bound BEFORE allocating per-component sample
            # planes: a crafted 60-byte stream must become an error
            # row, not an executor OOM (the A8 capture can't catch an
            # OOM kill). Subsampled components are smaller, so the
            # full-resolution product stays the conservative bound.
            if not (0 < xs and 0 < ys) or xs * ys * max(1, ncomp) > _MAX_PIXELS:
                raise JPXError(
                    f"image dimensions {xs}x{ys}x{ncomp} exceed the "
                    f"{_MAX_PIXELS}-sample decode bound"
                )
            if xs <= xo or ys <= yo:
                raise JPXError("empty image area (Xsiz <= XOsiz)")
            hdr.update(width=xs, height=ys, ncomp=ncomp,
                       depth=depths[0], tile_w=xts, tile_h=yts,
                       subs=subs, xo=xo, yo=yo, xto=xto, yto=yto)
        elif marker == 0x52:  # COD
            hdr.update(_parse_cod(seg))
        elif marker == 0x5C:  # QCD
            entry = _parse_qcd(seg)
            hdr["guard"] = entry["guard"]
            hdr["qstyle"] = entry["qstyle"]
            if "exps" in entry:
                hdr["exps"] = entry["exps"]
            if "qvals" in entry:
                hdr["qvals"] = entry["qvals"]
        elif marker == 0x5D:  # QCC: per-component quantization
            if "ncomp" not in hdr:
                raise JPXError("QCC before SIZ")
            comp, entry = _parse_qcc(seg, hdr["ncomp"])
            hdr.setdefault("qcc", {})[comp] = entry
        elif marker == 0x5E:  # RGN: region of interest (H.1)
            if "ncomp" not in hdr:
                raise JPXError("RGN before SIZ")
            if hdr["ncomp"] < 257:
                comp, at2 = (seg[0] if seg else 0), 1
            else:
                if len(seg) < 2:
                    raise JPXError("truncated RGN segment")
                comp, at2 = struct.unpack_from(">H", seg, 0)[0], 2
            if len(seg) < at2 + 2:
                raise JPXError("truncated RGN segment")
            srgn, sprgn = seg[at2], seg[at2 + 1]
            if srgn == 0:  # implicit maxshift (T.800 H.1)
                if sprgn > 37:
                    raise JPXError(f"RGN shift {sprgn} out of range")
                hdr.setdefault("rgn", {})[comp] = sprgn
            elif srgn == 1:
                # scaling-based rectangle ROI (T.801, round-11): the
                # region is signaled (XArgn/YArgn/WArgn/HArgn, 32-bit
                # reference-grid values after SPrgn) and the decoder
                # downshifts geometrically (_roi_band_rects)
                if sprgn > 37:
                    raise JPXError(f"RGN shift {sprgn} out of range")
                if len(seg) < at2 + 18:
                    raise JPXError("truncated RGN segment")
                rx0, ry0, rw_, rh_ = struct.unpack_from(
                    ">IIII", seg, at2 + 2
                )
                hdr.setdefault("rgn", {})[comp] = (
                    "rect", sprgn, rx0, ry0, rx0 + rw_, ry0 + rh_
                )
            else:
                # Srgn=2 (elliptic, T.801) and reserved styles stay a
                # NAMED decline
                raise JPXUnsupported(
                    f"ROI style {srgn} (maxshift + scaling rect only)"
                )
        elif marker == 0x53:  # COC: tolerated when it matches COD
            hdr.setdefault("coc_raw", []).append(seg)
        elif marker == 0x90:  # SOT
            hdr["sot"] = pos - 2
            return hdr
        # COM/TLM/PLM/others: skip
        pos += length
    raise JPXError("no tile-part in codestream")


class _ResolutionState:
    """Per-(tile, component, resolution, PRECINCT) decoding state
    persisting across quality layers (B.10): inclusion and
    zero-bitplane tag trees (precinct-local grids), Lblock, and the
    accumulated coding-pass chunks per code block (default
    single-codeword-segment style: per-layer chunks concatenate into
    one MQ stream). ``wins`` gives this precinct's window in each
    band's local coordinates; the default single-precinct layout
    passes the full band."""

    __slots__ = ("bands", "mbs", "per_band", "cbstyle")

    def __init__(self, bands, mbs: list, wins: list | None = None,
                 cbstyle: int = 0, borigins: list | None = None,
                 cb_exp: tuple = (_CB_EXP, _CB_EXP)):
        self.bands = bands
        self.mbs = mbs
        self.cbstyle = cbstyle
        self.per_band = []
        xcb, ycb = cb_exp
        if wins is None:
            wins = [(0, 0, bw, bh) for (_, _, _, bw, bh) in bands]
        if borigins is None:
            borigins = [(0, 0)] * len(bands)
        for (name, bx, by, bw, bh), mb, win, (obx, oby) in zip(
                bands, mbs, wins, borigins):
            cells = _precinct_codeblocks(bw, bh, win, obx, oby,
                                         xcb, ycb)
            if bw <= 0 or bh <= 0 or not cells:
                self.per_band.append(None)
                continue
            x0, y0, x1, y1 = win
            gw = ((obx + x1 + (1 << xcb) - 1) >> xcb) - (
                (obx + x0) >> xcb
            )
            gh = ((oby + y1 + (1 << ycb) - 1) >> ycb) - (
                (oby + y0) >> ycb
            )
            self.per_band.append({
                "incl": TagTreeDecoder(gw, gh),
                "zbp": TagTreeDecoder(gw, gh),
                "lblock": {},
                # (gx, gy) -> [name, px, py, cw, ch, nplanes,
                #              npasses, chunks]
                "blocks": {},
                "cells": cells,
            })

    def finish(self):
        """EBCOT-decode every included block's accumulated chunks."""
        out = []
        for band_state in self.per_band:
            if band_state is None:
                continue
            for blk in band_state["blocks"].values():
                (name, px, py, cw, ch, nplanes, npasses, chunks,
                 segs) = blk
                if segs is not None:
                    coeffs = decode_codeblock_styled(
                        [(r, bytes(d)) for r, d in segs],
                        cw, ch, name, nplanes, npasses, self.cbstyle,
                    )
                elif self.cbstyle & ~0x10:
                    # reset/causal/segmark without terminations:
                    # one segment, styled walkers
                    coeffs = decode_codeblock_styled(
                        [(False, b"".join(chunks))],
                        cw, ch, name, nplanes, npasses, self.cbstyle,
                    )
                else:
                    coeffs = decode_codeblock(
                        b"".join(chunks), cw, ch, name, nplanes,
                        npasses,
                    )
                out.append((name, px, py, cw, ch, coeffs))
        return out


def _decode_packet(data: bytes, pos: int, state: _ResolutionState,
                   layer: int, sop: bool = False, eph: bool = False):
    """Decode one packet (header + body) for `layer` at `pos`,
    accumulating coding passes into `state`; returns the position
    after the body. ``sop`` skips a leading SOP resync marker when
    present (A.8.1 — it may be omitted per packet); ``eph`` requires
    an EPH marker after every packet header (A.8.2)."""
    if sop and data[pos:pos + 2] == b"\xff\x91":
        pos += 6  # marker + Lsop(=4) + Nsop
    reader = _HeaderReader(data, pos)

    def end_of_header():
        body = reader.align()
        if eph:
            if data[body:body + 2] != b"\xff\x92":
                raise JPXError("missing EPH marker after packet header")
            body += 2
        return body

    if not reader.bit():
        return end_of_header()  # empty packet: no reads at all
    work = []
    for band_state, ((name, bx, by, bw, bh), mb) in zip(
        state.per_band, zip(state.bands, state.mbs)
    ):
        if band_state is None:
            continue
        incl_tree = band_state["incl"]
        zbp_tree = band_state["zbp"]
        lblock = band_state["lblock"]
        blocks = band_state["blocks"]
        for gx, gy, lx, ly, x, y, cw, ch in band_state["cells"]:
            key = (gx, gy)
            blk = blocks.get(key)
            if blk is None:
                # not yet included: inclusion tag tree, threshold =
                # layer number + 1 (first-inclusion layer <= layer?)
                if not incl_tree.decode(reader.bit, lx, ly, layer + 1):
                    continue
                t = 1
                while not zbp_tree.decode(reader.bit, lx, ly, t):
                    t += 1
                zbp = t - 1
                blk = blocks[key] = [
                    name, bx + x, by + y, cw, ch, mb - zbp, 0, [],
                    [] if state.cbstyle & 0x05 else None,
                ]
            else:
                # previously included: single bit (B.10.4)
                if not reader.bit():
                    continue
            npasses = _passes_codeword_read(reader)
            lb = lblock.setdefault(key, 3)
            while reader.bit():
                lb += 1
            lblock[key] = lb
            if not state.cbstyle & 0x05:
                nbits = lb + (npasses.bit_length() - 1)
                length = reader.bits(nbits)
                work.append((blk, length, None, False))
            else:
                # B.10.7.4: bypass/termall terminations split the
                # contribution into codeword segments, one signaled
                # length each (bits = Lblock + floor(log2(segment
                # passes))); an unterminated tail continues in the
                # next layer's contribution (same seg_index)
                p0 = blk[6]
                for s0, s1, is_raw, seg_index in _style_parts(
                    p0, p0 + npasses, state.cbstyle
                ):
                    nbits = lb + ((s1 - s0).bit_length() - 1)
                    length = reader.bits(nbits)
                    work.append((blk, length, seg_index, is_raw))
            blk[6] += npasses
    body = end_of_header()
    for blk, length, seg_index, is_raw in work:
        if body + length > len(data):
            raise JPXError("code-block data overruns stream")
        piece = data[body:body + length]
        if seg_index is None:
            blk[7].append(piece)
        else:
            segs = blk[8]
            while len(segs) <= seg_index:
                segs.append([False, bytearray()])
            segs[seg_index][0] = is_raw
            segs[seg_index][1] += piece
        body += length
    return body


def decode_codestream(data: bytes):
    """Decode a raw JPEG 2000 codestream → (width, height, ncomp,
    list of per-component sample planes, depth, mct, irreversible,
    subs). Subsampled components come back at their OWN (smaller)
    dimensions — ceil(w/XRsiz) x ceil(h/YRsiz) — with ``subs`` the
    per-component (XRsiz, YRsiz) list; the caller maps them onto the
    reference grid (T.800 B.2: grid point (x, y) reads component
    sample (floor(x/XRsiz), floor(y/YRsiz)))."""
    hdr = _parse_markers(data)
    if "width" not in hdr or "levels" not in hdr or "qstyle" not in hdr:
        raise JPXError("main header missing SIZ, COD or QCD")
    w, h = hdr["width"], hdr["height"]
    ncomp, levels = hdr["ncomp"], hdr["levels"]
    subs = hdr.get("subs") or [(1, 1)] * ncomp
    xo, yo = hdr.get("xo", 0), hdr.get("yo", 0)
    xto, yto = hdr.get("xto", 0), hdr.get("yto", 0)
    canvas = bool(xo or yo or xto or yto)
    # round-11: canvas offsets compose with component subsampling —
    # every component anchors at its own ceil-division origin
    # (B.3), which the tile boxes, band geometry and lifting phase
    # already consume; the replication upsample maps the offset
    # phase back (see decode_jpx)
    # component planes span [ceil(XO/XR), ceil(Xsiz/XR))
    comp_orig = [(-(-xo // xr), -(-yo // yr)) for xr, yr in subs]
    comp_dims = [
        (-(-w // xr) - cox, -(-h // yr) - coy)
        for (xr, yr), (cox, coy) in zip(subs, comp_orig)
    ]
    # T.800 constrains the component transformation to components
    # 0-2 with identical separations — a stream signaling MCT over
    # mixed-subsampling components is malformed, not a regime
    if hdr["mct"] and ncomp >= 3 and len(set(subs[:3])) != 1:
        raise JPXError(
            "MCT signaled over components with different subsampling"
        )
    depth = hdr["depth"]
    # per-component coding parameters (round-8): COD defaults,
    # main-header COC overrides (A.6.2 — levels/transform/cbstyle/
    # precincts may genuinely DIFFER per component now); tile-part
    # COD/COC/QCD/QCC (parsed from the first tile-part's header
    # below) override further, with the A.6 precedence tile-COC >
    # tile-COD > main-COC > main-COD.
    main_coc: dict = {}
    for seg in hdr.get("coc_raw", ()):
        comp, o = _parse_coc(seg, ncomp)
        if comp >= ncomp:
            raise JPXError(f"COC for component {comp} of {ncomp}")
        main_coc[comp] = o

    def resolve_params(cod: dict, coc_by_c: dict) -> list:
        """Effective per-component coding params from a COD dict +
        COC overrides. A COC without its own precinct list resets to
        the 2^15 default (A.6.2), mirroring COD's Scod bit 0."""
        out = []
        for c in range(ncomp):
            p = dict(levels=cod["levels"], transform=cod["transform"],
                     cbstyle=cod.get("cbstyle", 0),
                     precincts=cod.get("precincts"),
                     cb_exp=cod["cb_exp"])
            o = coc_by_c.get(c)
            if o is not None:
                p.update(levels=o["levels"], transform=o["transform"],
                         cbstyle=o["cbstyle"], cb_exp=o["cb_exp"],
                         precincts=o["precincts"])
            # round-10: any A.6.1-legal signaled code-block size
            # decodes (the former 64x64-only decline is gone);
            # precinct-clamped effective sizes come from
            # _eff_cb_exp at state-build time
            _check_cb_exp(p["cb_exp"])
            if p["levels"] > 32:  # T.800 A.6.1: 0..32 levels
                raise JPXError(
                    f"bad decomposition level count {p['levels']}"
                )
            out.append(p)
        return out

    def quant_pairs(entry: dict, lv: int):
        """(eps, mu) per subband in QCD order from a QCD/QCC entry."""
        st = entry["qstyle"]
        if st == 0:
            return [(e, 0) for e in entry["exps"]]
        if st == 2:  # scalar expounded: one value per subband
            return list(entry["qvals"])
        if not entry["qvals"]:  # scalar derived (E-5)
            raise JPXError("empty quantization segment")
        e0, mu0 = entry["qvals"][0]
        out = [(e0, mu0)]
        for r in range(1, lv + 1):
            out += [(e0 + 1 - r, mu0)] * 3
        return out

    def resolve_quant(params: list, base_qcd: dict, qcc: dict):
        """(qcd_index, deltas) keyed (r, c) for one tile: per-subband
        Mb and (lossy) step sizes under the effective params.
        T.800 Table A.30: "no quantization" pairs with the reversible
        5/3 transform, scalar quantization with the irreversible 9/7
        — a mismatch is a malformed stream, not a regime."""
        qcd_index: dict = {}
        deltas: dict = {}
        for c, p in enumerate(params):
            e = qcc.get(c, base_qcd)
            if e is None or e.get("qstyle") is None:
                raise JPXError("missing quantization segment")
            tr = p["transform"]
            if tr == 1 and e["qstyle"] != 0:
                raise JPXError(
                    "reversible 5/3 transform with scalar quantization"
                )
            if tr == 0 and e["qstyle"] == 0:
                raise JPXError(
                    "irreversible 9/7 transform without quantization"
                )
            pairs = quant_pairs(e, p["levels"])
            mbs = [eps + e["guard"] - 1 for eps, _ in pairs]
            k = 0
            for r in range(p["levels"] + 1):
                names = ["LL"] if r == 0 else ["HL", "LH", "HH"]
                sl = mbs[k:k + len(names)]
                if len(sl) < len(names):
                    raise JPXError(
                        "quantization exponent list shorter than "
                        "subbands"
                    )
                qcd_index[(r, c)] = sl
                if tr == 0:
                    deltas[(r, c)] = [
                        _quant_delta(depth, _band_gain(nm),
                                     *pairs[k + i])
                        for i, nm in enumerate(names)
                    ]
                k += len(names)
        return qcd_index, deltas

    main_params = resolve_params(hdr, main_coc)
    # T.800 G: the component transformation needs one transform on
    # components 0-2 — mixed per-component transforms under MCT are
    # malformed
    if hdr["mct"] and ncomp >= 3 and len(
        {main_params[c]["transform"] for c in range(3)}
    ) != 1:
        raise JPXError("MCT over mixed per-component transforms")
    main_qcd = {"qstyle": hdr.get("qstyle"),
                "guard": hdr.get("guard", _GUARD_BITS),
                "exps": hdr.get("exps"), "qvals": hdr.get("qvals")}
    main_qcc = hdr.get("qcc", {})
    rgn = hdr.get("rgn", {})
    xts, yts = hdr["tile_w"], hdr["tile_h"]
    ntx = (w - xto + xts - 1) // xts
    nty = (h - yto + yts - 1) // yts
    ntiles = ntx * nty
    import numpy as np

    # every packet costs at least one header bit, so the packet count
    # a stream can legitimately carry is bounded by its bit length —
    # reject crafted layer/level counts BEFORE materializing any
    # per-packet state (the no-OOM invariant the SIZ bound promises)
    max_levels = max(p["levels"] for p in main_params)
    if hdr["layers"] * (max_levels + 1) * ncomp > 8 * len(data) + 64:
        raise JPXError(
            f"{hdr['layers']} layers x {max_levels + 1} resolutions "
            f"x {ncomp} components exceeds the stream's packet budget"
        )

    def tile_comp_boxes(tx: int, ty: int):
        """Per-component (tcx0, tcy0, tcw, tch) of tile (tx, ty) in
        component coordinates (B.3 — the shared module helper)."""
        return [
            _tile_comp_box(tx, ty, xts, yts, w, h, xr, yr,
                           xo, yo, xto, yto)
            for xr, yr in subs
        ]

    def decode_tile_planes(buf: bytes, boxes: list, tp: dict):
        params = tp["params"]
        qcd_index = tp["qcd_index"]
        layers, prog = tp["layers"], tp["prog"]
        sop, eph = tp["sop"], tp["eph"]
        comp_levels = [p["levels"] for p in params]
        comp_precincts = [p["precincts"] for p in params]
        pos = 0
        planes = [
            np.zeros((tch, tcw), np.int64)
            for (_, _, tcw, tch) in boxes
        ]
        # round-10: EVERY tile-component decodes at its absolute
        # canvas origin — band geometry, precinct/code-block
        # anchoring and the 5/3+9/7 lifting are all origin-aware
        # (B-14/B-15, F.3-F.4), so both former named declines
        # (phase-shifting offsets, tile-local precinct mis-anchor)
        # are gone
        pinfo = _precinct_info(
            [(tcw, tch) for (_, _, tcw, tch) in boxes],
            max(comp_levels), None, subs,
            origins=[(b[0], b[1]) for b in boxes],
            comp_levels=comp_levels, comp_precincts=comp_precincts,
        )
        # every packet costs >= 1 header bit: reject crafted
        # layer/precinct counts BEFORE materializing the packet
        # order or per-precinct state (the no-OOM invariant — the
        # main-header guard below cannot see precinct multiplicity)
        n_precincts = sum(
            npx * npy for (npx, npy, *_) in pinfo.values()
        )
        if layers * n_precincts > 8 * len(buf) + 64:
            raise JPXError(
                f"{layers} layers x {n_precincts} precincts exceeds "
                "the tile's packet budget"
            )
        order = _packet_order(prog, layers, max(comp_levels), ncomp,
                              pinfo, comp_levels=comp_levels)
        states = {}
        n_blocks = 0
        for c in range(ncomp):
            for r in range(comp_levels[c] + 1):
                bands = _bands_for_resolution(
                    boxes[c][2], boxes[c][3], comp_levels[c], r,
                    (boxes[c][0], boxes[c][1]),
                )
                band_dims = [(bw, bh) for (_, _, _, bw, bh) in bands]
                info = pinfo[(r, c)]
                npx, npy, _, _, ppx, ppy = info[:6]
                base_x, base_y, borigins = info[6], info[7], info[8]
                eff = _eff_cb_exp(r, ppx, ppy, params[c]["cb_exp"])
                # tiny effective blocks (legal since round-10) make
                # per-block state O(area / block_area): bound the
                # CELL COUNT a crafted small-block header can demand
                # before materializing it (the area bound alone
                # admits 2^27 one-sample blocks)
                for bw, bh in band_dims:
                    n_blocks += (
                        ((bw >> eff[0]) + 1) * ((bh >> eff[1]) + 1)
                    )
                if n_blocks > (1 << 21):
                    raise JPXError(
                        "code-block count exceeds the per-tile "
                        "2^21 decode budget"
                    )
                states[(r, c)] = [
                    _ResolutionState(
                        bands, qcd_index[(r, c)],
                        _precinct_band_windows(
                            band_dims, r, ppx, ppy, pxi, pyi,
                            base_x, base_y, borigins,
                        ),
                        params[c]["cbstyle"], borigins, eff,
                    )
                    for pyi in range(npy) for pxi in range(npx)
                ]
        for l, r, c, p in order:
            pos = _decode_packet(
                buf, pos, states[(r, c)][p], l, sop, eph
            )
        for (r, c), plist in states.items():
            for st in plist:
                for name, px, py, cw, ch, coeffs in st.finish():
                    planes[c][py:py + ch, px:px + cw] = np.asarray(
                        coeffs, np.int64
                    ).reshape(ch, cw)
        if pos > len(buf):
            raise JPXError("tile body overran its tile-parts")
        # ROI downscale: maxshift (H.1.2) is MAGNITUDE-based —
        # coefficients at or above 2^SPrgn are ROI; scaling-based
        # rects (T.801 Srgn=1, round-11) are GEOMETRIC — the decoder
        # rebuilds the same disjoint band rectangles the encoder
        # scaled (_roi_band_rects) and downshifts exactly those
        for c, s in rgn.items():
            if c >= len(planes):
                continue
            if isinstance(s, tuple):
                _, sp, rx0, ry0, rx1, ry1 = s
                if not sp:
                    continue
                tcx0, tcy0, tcw, tch = boxes[c]
                xr, yr = subs[c]
                rect = (rx0 // xr - tcx0, ry0 // yr - tcy0,
                        -(-rx1 // xr) - tcx0, -(-ry1 // yr) - tcy0)
                for (wx0, wy0, wx1, wy1) in _roi_band_rects(
                        tcw, tch, params[c]["levels"], rect,
                        (tcx0, tcy0)):
                    sub = planes[c][wy0:wy1, wx0:wx1]
                    sub[:] = np.sign(sub) * (np.abs(sub) >> sp)
            elif s:
                arr = planes[c]
                a = np.abs(arr)
                roi = a >= (1 << s)
                arr[roi] = np.sign(arr[roi]) * (a[roi] >> s)
        return planes

    pos = hdr["sot"]
    # a tile's packet stream may be SPLIT across tile-parts (TPsot
    # order, A.4.2) — collect every part's body, then decode each
    # tile's concatenation as one stream. The FIRST tile-part's
    # header may carry per-tile COD/COC/QCD/QCC overrides (A.6.1-5,
    # round-8: per-tile coding styles decode instead of erroring).
    parts: dict = {}
    tile_cod: dict = {}
    tile_coc: dict = {}
    tile_qcd: dict = {}
    tile_qcc: dict = {}
    while pos < len(data) and data[pos:pos + 2] != b"\xff\xd9":
        if data[pos:pos + 2] != b"\xff\x90":
            raise JPXError("expected SOT between tiles")
        lsot = struct.unpack_from(">H", data, pos + 2)[0]
        isot, psot, tpsot, tnsot = struct.unpack_from(
            ">HIBB", data, pos + 4
        )
        if isot >= ntiles:
            raise JPXError(f"bad tile index {isot}")
        tile_end = pos + psot if psot else len(data)
        body = pos + 2 + lsot
        while data[body:body + 2] != b"\xff\x93":  # SOD
            if body + 4 > len(data) or data[body] != 0xFF:
                raise JPXError("bad tile-part header marker")
            tmark = data[body + 1]
            tlen = struct.unpack_from(">H", data, body + 2)[0]
            if tlen < 2 or body + 2 + tlen > len(data):
                raise JPXError("truncated tile-part header segment")
            seg = data[body + 4:body + 2 + tlen]
            if tmark in (0x52, 0x53, 0x5C, 0x5D) and tpsot != 0:
                raise JPXError(
                    "coding-style marker outside the first tile-part"
                )
            if tmark == 0x52:  # tile COD
                cod = _parse_cod(seg)
                if cod["mct"] != hdr["mct"]:
                    raise JPXUnsupported(
                        "per-tile MCT differs from the main header"
                    )
                tile_cod[isot] = cod
            elif tmark == 0x53:  # tile COC
                comp, o = _parse_coc(seg, ncomp)
                if comp >= ncomp:
                    raise JPXError(
                        f"COC for component {comp} of {ncomp}"
                    )
                tile_coc.setdefault(isot, {})[comp] = o
            elif tmark == 0x5C:  # tile QCD
                tile_qcd[isot] = _parse_qcd(seg)
            elif tmark == 0x5D:  # tile QCC
                comp, entry = _parse_qcc(seg, ncomp)
                tile_qcc.setdefault(isot, {})[comp] = entry
            elif tmark in (0x5E, 0x5F, 0x61, 0x63):
                raise JPXUnsupported(
                    f"tile-part header marker 0x{tmark:02x}"
                )
            # COM/PLT/TLM and others: skip
            body += 2 + tlen
        plist = parts.setdefault(isot, [])
        if any(tp == tpsot for tp, _ in plist):
            raise JPXError(f"duplicate tile-part {tpsot} of tile {isot}")
        plist.append((tpsot, data[body + 2:tile_end]))
        if tnsot and len(plist) > tnsot:
            raise JPXError(f"tile {isot} has more parts than TNsot")
        if not psot:  # unknown length: only legal for the last part
            break
        pos = tile_end

    def tile_context(isot: int) -> dict:
        """Effective decode parameters for one tile (A.6 precedence:
        tile-COC > tile-COD > main-COC > main-COD; quantization
        tile-QCC > tile-QCD > main-QCC > main-QCD)."""
        cod = tile_cod.get(isot)
        base = cod if cod is not None else hdr
        coc: dict = {} if cod is not None else dict(main_coc)
        coc.update(tile_coc.get(isot, {}))
        params = resolve_params(base, coc)
        if hdr["mct"] and ncomp >= 3 and len(
            {params[c]["transform"] for c in range(3)}
        ) != 1:
            raise JPXError("MCT over mixed per-component transforms")
        qcd = tile_qcd.get(isot)
        qcc: dict = {} if qcd is not None else dict(main_qcc)
        qcc.update(tile_qcc.get(isot, {}))
        qcd_index, deltas = resolve_quant(
            params, qcd if qcd is not None else main_qcd, qcc
        )
        return dict(
            params=params, qcd_index=qcd_index, deltas=deltas,
            layers=base.get("layers", hdr["layers"]),
            prog=base.get("prog", hdr["prog"]),
            sop=base.get("sop", hdr.get("sop", False)),
            eph=base.get("eph", hdr.get("eph", False)),
        )

    tiles: dict = {}
    tile_ctx: dict = {}
    for isot, plist in parts.items():
        plist.sort()
        if [tp for tp, _ in plist] != list(range(len(plist))):
            raise JPXError(f"tile {isot} tile-parts not contiguous")
        tx, ty = isot % ntx, isot // ntx
        tile_ctx[isot] = tile_context(isot)
        tiles[isot] = decode_tile_planes(
            b"".join(b for _, b in plist), tile_comp_boxes(tx, ty),
            tile_ctx[isot],
        )
    if len(tiles) != ntiles:
        raise JPXError(
            f"codestream has {len(tiles)} of {ntiles} tiles"
        )
    # per-tile inverse transform (per-tile, per-component levels and
    # transform), assembled into the component image planes
    out_comps = []
    comp_irrev = [
        any(tile_ctx[i]["params"][c]["transform"] == 0 for i in tiles)
        for c in range(ncomp)
    ]
    for c in range(ncomp):
        cw_c, ch_c = comp_dims[c]
        cox, coy = comp_orig[c]
        img = np.zeros(
            (ch_c, cw_c), np.float64 if comp_irrev[c] else np.int64
        )
        for isot, tplanes in tiles.items():
            tx, ty = isot % ntx, isot // ntx
            tcx0, tcy0, tcw, tch = tile_comp_boxes(tx, ty)[c]
            if tcw <= 0 or tch <= 0:
                continue
            pc = tile_ctx[isot]["params"][c]
            lv, tr = pc["levels"], pc["transform"]
            orig = (tcx0, tcy0)
            p = tplanes[c]
            if tr == 1:
                rec = _dwt53_inverse_2d_np(p, tcw, tch, lv, orig)
            else:
                # scalar dequantization (E.1.1, midpoint r = 1/2)
                f = np.zeros((tch, tcw), np.float64)
                for r in range(lv + 1):
                    for (nm, bx, by, bw, bh), dl in zip(
                        _bands_for_resolution(tcw, tch, lv, r, orig),
                        tile_ctx[isot]["deltas"][(r, c)],
                    ):
                        if bw <= 0 or bh <= 0:
                            continue
                        q = p[by:by + bh, bx:bx + bw]
                        f[by:by + bh, bx:bx + bw] = (
                            np.sign(q) * (np.abs(q) + 0.5) * dl
                        )
                rec = _dwt97_inverse_2d_np(f, tcw, tch, lv, orig)
            img[tcy0 - coy:tcy0 - coy + tch,
                tcx0 - cox:tcx0 - cox + tcw] = rec
        out_comps.append(img)
    return (w - xo, h - yo, ncomp, out_comps, depth, bool(hdr["mct"]),
            any(comp_irrev), subs, (xo, yo))

def _unwrap_jp2_info(data: bytes) -> tuple:
    """Extract the contiguous codestream from a JP2 container plus
    the colr box's EnumCS (16 sRGB / 17 grey / 18 sYCC; None when
    absent or when `data` is already a raw codestream)."""
    if data[:2] == b"\xff\x4f":
        return data, None
    if data[:4] != b"\x00\x00\x00\x0c" or data[4:8] != b"jP\x20\x20":
        raise JPXError("neither a JPEG 2000 codestream nor a JP2 file")
    pos = 0
    n = len(data)
    enumcs = None

    def scan_colr(payload: bytes) -> None:
        nonlocal enumcs
        at = 0
        while at + 8 <= len(payload):
            bl = struct.unpack_from(">I", payload, at)[0]
            bt = payload[at + 4 : at + 8]
            body = at + 8
            if bl == 1:
                bl = struct.unpack_from(">Q", payload, at + 8)[0]
                body = at + 16
            if bl == 0:
                bl = len(payload) - at
            if bl < 8:
                return
            # colr enumerated method: METH(1) PREC(1) APPROX(1)
            # EnumCS(4) — ignore truncated boxes rather than crash
            if (bt == b"colr" and enumcs is None
                    and body + 7 <= len(payload)
                    and payload[body] == 1):
                enumcs = struct.unpack_from(">I", payload, body + 3)[0]
            at += bl

    while pos + 8 <= n:
        ln = struct.unpack_from(">I", data, pos)[0]
        btype = data[pos + 4 : pos + 8]
        payload_at = pos + 8
        if ln == 1:  # extended length
            ln = struct.unpack_from(">Q", data, pos + 8)[0]
            payload_at = pos + 16
        if ln == 0:
            ln = n - pos
        if btype == b"jp2h":
            scan_colr(data[payload_at : pos + ln])
        if btype == b"jp2c":
            return data[payload_at : pos + ln], enumcs
        pos += ln
    raise JPXError("JP2 container has no codestream box")


def _unwrap_jp2(data: bytes) -> bytes:
    """Extract the contiguous codestream from a JP2 container (or
    return `data` unchanged if it already starts with SOC)."""
    return _unwrap_jp2_info(data)[0]


def decode_jpx(data: bytes) -> tuple[int, int, bytes]:
    """/JPXDecode entry: decode a JP2 file or raw codestream to
    ``(width, height, samples)`` — 8-bit gray, or interleaved RGB
    when the stream carries 3 components (RCT undone when signaled).
    Matches :func:`sources.jpeg.decode_jpeg`'s output shape.

    Subsampled components (the real-world 4:2:0 / 4:2:2 chroma
    shapes) are mapped onto the reference grid by sample replication
    (T.800 B.2: grid (x, y) reads component (x//XRsiz, y//YRsiz)).
    Such streams carry YCbCr transformed OUTSIDE the codestream (MCT
    is spec-limited to equal separations), signaled by the JP2 colr
    box — EnumCS 18 (sYCC) triggers the inverse ICT here; a raw
    codestream or an sRGB colr leaves samples untouched."""
    import numpy as np

    cs, enumcs = _unwrap_jp2_info(data)
    (w, h, ncomp, comps, depth, mct, irrev, subs,
     (xo, yo)) = decode_codestream(cs)
    shift = 1 << (depth - 1)
    top = (1 << depth) - 1
    if ncomp >= 3 and mct:
        # the MCT covers the FIRST THREE components (T.800 G.1);
        # components past them (e.g. the K plane of a CMYK stream)
        # pass through untouched
        if irrev:  # ICT inverse (T.800 G.3), exact forward inverse
            yy, cb, cr = comps[0], comps[1], comps[2]
            comps = [
                yy + 1.402 * cr,
                yy - (0.114 * 1.772 / 0.587) * cb
                - (0.299 * 1.402 / 0.587) * cr,
                yy + 1.772 * cb,
            ] + comps[3:]
        else:
            yy, uu, vv = comps[0], comps[1], comps[2]
            g = yy - ((uu + vv) >> 2)
            comps = [vv + g, g, uu + g] + comps[3:]  # R, G, B

    def upsample(plane, xr, yr):
        if xr == 1 and yr == 1:
            return plane[:h, :w]
        if xo == 0 and yo == 0:
            if yr != 1:
                plane = np.repeat(plane, yr, axis=0)
            if xr != 1:
                plane = np.repeat(plane, xr, axis=1)
            return plane[:h, :w]
        # canvas-offset phase (B.2 with B.3 origins): image pixel
        # (ix, iy) sits at grid (xo+ix, yo+iy) and reads component
        # sample (grid // separation) − ceil(offset / separation);
        # grid points below the first component sample clamp to it
        cox, coy = -(-xo // xr), -(-yo // yr)
        iy = np.clip((np.arange(h) + yo) // yr - coy,
                     0, plane.shape[0] - 1)
        ix = np.clip((np.arange(w) + xo) // xr - cox,
                     0, plane.shape[1] - 1)
        return plane[iy][:, ix]

    comps = [upsample(p, xr, yr) for p, (xr, yr) in zip(comps, subs)]
    if ncomp >= 3 and not mct and enumcs == 18:
        # external sYCC (components are centered YCbCr): same inverse
        # as the ICT, applied after the reference-grid mapping
        yy = comps[0].astype(np.float64)
        cb = comps[1].astype(np.float64)
        cr = comps[2].astype(np.float64)
        comps = [
            yy + 1.402 * cr,
            yy - (0.114 * 1.772 / 0.587) * cb
            - (0.299 * 1.402 / 0.587) * cr,
            yy + 1.772 * cb,
        ] + comps[3:]

    def to_u8(plane):
        v = plane + shift
        if plane.dtype.kind == "f":
            v = np.rint(v)
        if depth != 8:
            v = np.round(v * (255 / top)).astype(np.int64)
        return np.clip(v, 0, 255).astype(np.uint8)

    if ncomp == 1:
        return w, h, to_u8(comps[0]).tobytes()
    if ncomp == 2:
        # gray + opacity (the JP2 gray/alpha shape): the color
        # channel is the image; opacity has no place in the
        # opaque-sample output convention
        return w, h, to_u8(comps[0]).tobytes()
    if ncomp >= 4 and enumcs == 12:
        # CMYK (JP2 colr EnumCS 12, the PDF/X print shape): direct
        # ink values — same naive un-profiled conversion as the
        # plain-CMYK JPEG path (R = (top-C)(top-K)/top)
        c_, m_, y_, k_ = (
            to_u8(comps[i]).astype(np.float64) for i in range(4)
        )
        kk = 255.0 - k_
        rgb = np.stack(
            [(255.0 - c_) * kk, (255.0 - m_) * kk,
             (255.0 - y_) * kk],
            axis=-1,
        ) / 255.0
        return w, h, np.clip(
            np.round(rgb), 0, 255
        ).astype(np.uint8).tobytes()
    if ncomp >= 3:
        # RGB, or RGBA-style extra channels (alpha dropped — the
        # cdef-less convention); a colr box other than CMYK leaves
        # the first three as the color channels
        rgb = np.stack([to_u8(c) for c in comps[:3]], axis=-1)
        return w, h, rgb.tobytes()
    raise JPXUnsupported(f"{ncomp}-component image")


def decode_jpx_gray(data: bytes) -> tuple[int, int, bytes]:
    """Decode to 8-bit grayscale (BT.601 luma for RGB streams) — the
    scanned-page OCR route's input shape."""
    import numpy as np

    w, h, px = decode_jpx(data)
    if len(px) == w * h:
        return w, h, px
    rgb = np.frombuffer(px, np.uint8).reshape(-1, 3).astype(np.float64)
    y = 0.299 * rgb[:, 0] + 0.587 * rgb[:, 1] + 0.114 * rgb[:, 2]
    return w, h, np.clip(np.round(y), 0, 255).astype(np.uint8).tobytes()


# =====================================================================
# numpy fast paths (exact integer arithmetic — used by the decode
# pipeline; the list-based reference implementations above stay for
# the encoder and the property tests that pin equivalence)
# =====================================================================


def _lift_fold_idx(n: int, ph: int):
    """The four PSE fold index arrays the lifting gathers need at
    phase ``ph`` on a length-n axis (absolute interval [ph, ph+n)):
    ``(hm1, h0)`` — high-band local indices of H(k-1) / H(k) over the
    low positions k in [kl0, kl1) — and ``(e0, e1)`` — low/even
    local indices of E(k) / E(k+1) over the high positions k in
    [kh0, kh1). The folds iterate the two X-domain reflections
    (about i0 and i1-1, F.3.7) until the index lands in band range;
    ph == 0 reproduces the round-8 `_he_index`/`_ee_next` mirrors."""
    import numpy as np

    i0, i1 = ph, ph + n
    kh0, kh1 = i0 // 2, i1 // 2
    kl0, kl1 = (i0 + 1) // 2, (i1 + 1) // 2

    def hfold(k: int) -> int:
        while not (kh0 <= k < kh1):
            k = i0 - k - 1 if k < kh0 else i1 - k - 2
        return k - kh0

    def efold(k: int) -> int:
        while not (kl0 <= k < kl1):
            k = i0 - k if k < kl0 else i1 - 1 - k
        return k - kl0

    hm1 = np.array([hfold(k - 1) for k in range(kl0, kl1)], np.int64)
    h0 = np.array([hfold(k) for k in range(kl0, kl1)], np.int64)
    e0 = np.array([efold(k) for k in range(kh0, kh1)], np.int64)
    e1 = np.array([efold(k + 1) for k in range(kh0, kh1)], np.int64)
    return hm1, h0, e0, e1


def _inv53_axis_np(a, n: int, ph: int = 0):
    """Inverse 5/3 along axis 1 of int64 `a` at lifting phase
    ``ph`` (0 = round-8 zero-phase, bit-identical)."""
    import numpy as np

    if n == 1:
        return a[:, :1] if ph == 0 else a[:, :1] >> 1
    nlo = (n + 1) // 2 if ph == 0 else n // 2
    L = a[:, :nlo]
    H = a[:, nlo:n]
    hm1, h0, e0, e1 = _lift_fold_idx(n, ph)
    even = L - ((H[:, hm1] + H[:, h0] + 2) >> 2)
    out = np.empty((a.shape[0], n), np.int64)
    odd = H + ((even[:, e0] + even[:, e1]) >> 1)
    if ph == 0:
        out[:, 0::2] = even
        out[:, 1::2] = odd
    else:
        out[:, 1::2] = even
        out[:, 0::2] = odd
    return out


def _dwt53_inverse_level_np(p, ch: int, cw: int,
                            phy: int = 0, phx: int = 0,
                            nlo_h: int | None = None,
                            nlo_w: int | None = None):
    """One inverse level on the top-left ch x cw window of int64
    array `p`, in the normative order (rows then columns), at the
    window's lifting phase (round-10: odd canvas origins)."""
    win = p[:ch, :cw]
    win = _inv53_axis_np(win, cw, phx)            # HOR_SR (rows)
    win = _inv53_axis_np(win.T.copy(), ch, phy).T  # VER_SR (columns)
    p[:ch, :cw] = win


def _dwt53_inverse_2d_np(p, width: int, height: int, levels: int,
                         origin: tuple = (0, 0)):
    """numpy twin of :func:`dwt53_inverse_2d` (bitwise-equal output;
    pinned by tests). `p` is an int64 array mutated in place."""
    for ch, cw, phy, phx, _nlh, _nlw in reversed(
            _dwt_level_geom(width, height, levels, origin)):
        if ch <= 1 and cw <= 1 and not (phx or phy):
            continue
        _dwt53_inverse_level_np(p, ch, cw, phy, phx)
    return p


# =====================================================================
# 9/7 irreversible DWT + scalar quantization (T.800 F.4.8, E.1) —
# the lossy path real scanner/camera JPX payloads use
# =====================================================================

#: T.800 F.4.8.1 lifting constants.  The low/high normalization was
#: pinned against the NORMATIVE Table F.4 convolution filter taps (an
#: independent published source): conv_low = (1/K)*lift_low and
#: conv_high = K*lift_high on random signals — see
#: tests/test_jpx_lossy.py::TestDwt97::test_lifting_matches_convolution.
_ALPHA97 = -1.586134342059924
_BETA97 = -0.052980118572961
_GAMMA97 = 0.882911075530934
_DELTA97 = 0.443506852043971
_K97 = 1.230174104914001

#: T.800 Table F.4 — normative 9/7 ANALYSIS filter taps (symmetric;
#: index = |offset| from the output sample).  Kept here so the test
#: suite validates the lifting implementation against a genuinely
#: independent formulation of the same transform.
DWT97_ANALYSIS_LOW = (
    0.6029490182363579, 0.2668641184428723, -0.07822326652898785,
    -0.016864118442874950, 0.026748757410810654,
)
DWT97_ANALYSIS_HIGH = (
    1.115087052456994, -0.5912717631142470,
    -0.05754352622849957, 0.09127176311424948,
)


def _dwt97_inverse_axis(a, n: int, ph: int = 0):
    """Inverse 9/7 along axis 1 of float64 array `a` (n samples) at
    lifting phase ``ph`` (round-10; 0 = round-8 zero phase,
    bit-identical — the generic fold indices reproduce
    `_he_index`/`_ee_next` there)."""
    import numpy as np

    if n == 1:
        if ph:
            # F.3.4's one-sample rule is published for the 5/3;
            # the 9/7 odd single-sample normalization has no
            # independent published pin available here — decline by
            # name rather than guess (the round-9 B.10 lesson)
            raise JPXUnsupported(
                "9/7 single-sample odd-phase window"
            )
        return a[:, :1]
    nlo = (n + 1) // 2 if ph == 0 else n // 2
    even = a[:, :nlo] * _K97          # undo low normalization (1/K)
    d = a[:, nlo:n] * (1.0 / _K97)    # undo high normalization (K)
    hm1, h0, e0, e1 = _lift_fold_idx(n, ph)
    for c_even, c_odd in ((_DELTA97, _GAMMA97), (_BETA97, _ALPHA97)):
        even = even - c_even * (d[:, hm1] + d[:, h0])
        d = d - c_odd * (even[:, e0] + even[:, e1])
    out = np.empty((a.shape[0], n), np.float64)
    if ph == 0:
        out[:, 0::2] = even
        out[:, 1::2] = d
    else:
        out[:, 1::2] = even
        out[:, 0::2] = d
    return out


def _dwt97_forward_axis(a, n: int, ph: int = 0):
    """Forward 9/7 along axis 1 → [low | high] layout (float64) at
    lifting phase ``ph``."""
    import numpy as np

    if n == 1:
        if ph:
            raise JPXUnsupported(
                "9/7 single-sample odd-phase window"
            )
        return a[:, :1]
    nlo = (n + 1) // 2 if ph == 0 else n // 2
    even = a[:, ph::2].astype(np.float64)
    d = a[:, 1 - ph::2].astype(np.float64)
    hm1, h0, e0, e1 = _lift_fold_idx(n, ph)
    for c_odd, c_even in ((_ALPHA97, _BETA97), (_GAMMA97, _DELTA97)):
        d = d + c_odd * (even[:, e0] + even[:, e1])
        even = even + c_even * (d[:, hm1] + d[:, h0])
    out = np.empty((a.shape[0], n), np.float64)
    out[:, :nlo] = even * (1.0 / _K97)   # normative low
    out[:, nlo:n] = d * _K97             # normative high
    return out


def _dwt97_inverse_2d_np(p, width: int, height: int, levels: int,
                         origin: tuple = (0, 0)):
    """Multi-level inverse 9/7 on float64 array `p` (in place),
    normative per-level order: rows (HOR_SR) then columns (VER_SR)."""
    for ch, cw, phy, phx, _nlh, _nlw in reversed(
            _dwt_level_geom(width, height, levels, origin)):
        if ch <= 1 and cw <= 1 and not (phx or phy):
            continue
        win = p[:ch, :cw]
        win = _dwt97_inverse_axis(win, cw, phx)
        win = _dwt97_inverse_axis(win.T.copy(), ch, phy).T
        p[:ch, :cw] = win
    return p


def _dwt97_forward_2d_np(p, width: int, height: int, levels: int,
                         origin: tuple = (0, 0)):
    """Multi-level forward 9/7 (columns then rows per level, the
    mirror of the normative inverse order)."""
    for ch, cw, phy, phx, _nlh, _nlw in _dwt_level_geom(
            width, height, levels, origin):
        if ch <= 1 and cw <= 1 and not (phx or phy):
            continue
        win = p[:ch, :cw]
        win = _dwt97_forward_axis(win.T.copy(), ch, phy).T
        win = _dwt97_forward_axis(win, cw, phx)
        p[:ch, :cw] = win
    return p


def _band_gain(name: str) -> int:
    """log2 subband gain for R_b (T.800 Table E.1)."""
    return {"LL": 0, "HL": 1, "LH": 1, "HH": 2}[name]


def _quant_delta(depth: int, gain: int, eps: int, mu: int) -> float:
    """Scalar quantization step Δ_b = 2^(R_b - ε_b)·(1 + μ_b/2^11)
    (T.800 E-3), R_b = component depth + subband gain."""
    return (2.0 ** (depth + gain - eps)) * (1.0 + mu / 2048.0)


def _delta_to_eps_mu(delta: float, depth: int, gain: int):
    """Represent a step size as the nearest (ε_b, μ_b) pair and
    return (ε, μ, exact Δ re-derived from them)."""
    import math

    e = math.floor(math.log2(delta))
    mu = round((delta / (2.0 ** e) - 1.0) * 2048.0)
    if mu >= 2048:
        e += 1
        mu = 0
    eps = depth + gain - e
    if eps > 31:  # step finer than representable: use the finest
        eps, mu = 31, 0
    elif eps < 0:  # coarser than the dynamic range: use the coarsest
        eps, mu = 0, 2047
    return eps, mu, _quant_delta(depth, gain, eps, mu)
