"""Document codecs — pluggable page access (SURVEY.md §7 step 3).

Upstream binds directly to poppler (pdftotext), pdf2image, and
pytesseract. Those native libraries are NOT available in this
container (no network, SURVEY.md §0), so the codec boundary is
explicit and pluggable:

- :class:`TextBytesCodec` (default): treats document bytes as UTF-8
  text whose pages are separated by form-feed ``\\f`` — exactly the
  page separator pdftotext emits — so the whole pipeline (fan-out,
  feature fusion, error rows, resume, sinks) is real and testable
  end-to-end with deterministic fixtures.
- :class:`PdfCodec`: the production binding; each method imports its
  library lazily and raises ``NotImplementedError`` with a clear
  message when the dependency is absent (clearly-marked stub per the
  build mandate). The Spark-side plumbing (schema, batching, UDF
  signature) is identical for both codecs and is what the tests
  verify.

OCR in the default codec is a deterministic fake (identity over the
page text) so the ``ocr`` feature's plumbing is exercised.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Any


class DocumentCodec:
    """Interface: open bytes → handle; page-indexed feature access."""

    name = "abstract"

    def init_worker(self) -> None:
        """Called once per Python worker before any batch (H3 pattern)."""

    def open(self, content: bytes) -> Any:
        raise NotImplementedError

    def page_count(self, handle: Any) -> int:
        raise NotImplementedError

    def page_text(self, handle: Any, page: int) -> str | None:
        raise NotImplementedError

    def page_image(self, handle: Any, page: int) -> bytes | None:
        raise NotImplementedError

    def page_ocr(self, handle: Any, page: int) -> str | None:
        raise NotImplementedError

    def page_embedded_images(self, handle: Any, page: int) -> list[dict]:
        """Embedded raster assets of a page; [] when the format has
        no such concept (text corpora)."""
        return []

    def doc_info(self, handle: Any) -> dict[str, str]:
        """Document-level metadata (Title/Author/...); {} if none."""
        return {}

    def page_annotations(self, handle: Any, page: int) -> list[str]:
        """Annotation text on a page (comments, highlights, form
        values); [] when the format has no such concept."""
        return []

    def doc_outline(self, handle: Any) -> list[tuple[int, str]]:
        """Flattened (depth, title) bookmark outline; [] if none."""
        return []

    def doc_attachments(self, handle: Any) -> list[dict]:
        """Embedded file attachments ({name, data, size}); [] when
        the format has no such concept."""
        return []


def parse_image_size(image_size: str | None) -> tuple[int, int] | None:
    """Upstream-style 'WxH' image size spec → (w, h)."""
    if image_size is None:
        return None
    w, _, h = image_size.lower().partition("x")
    return (int(w), int(h))


@dataclass
class TextBytesCodec(DocumentCodec):
    """Deterministic test codec: bytes = UTF-8 text, pages = \\f-split."""

    name = "textbytes"
    page_sep: str = "\f"
    image_format: str | None = None
    image_size: str | None = None

    def open(self, content: bytes) -> list[str]:
        text = content.decode("utf-8")  # invalid UTF-8 → error row
        return text.split(self.page_sep)

    def page_count(self, handle: list[str]) -> int:
        return len(handle)

    def page_text(self, handle: list[str], page: int) -> str:
        return handle[page - 1]

    def page_image(self, handle: list[str], page: int) -> bytes:
        # Deterministic fake render: tagged bytes of the page text.
        # format/size requests are recorded in the tag so the
        # parameter plumbing (extract → codec → rendered bytes) is
        # testable without a raster library.
        if self.image_format or self.image_size:
            tag = f"IMG[{self.image_format or 'raw'};{self.image_size or 'native'}]"
            return tag.encode() + b"\x00" + handle[page - 1].encode("utf-8")
        return b"IMG\x00" + handle[page - 1].encode("utf-8")

    def page_ocr(self, handle: list[str], page: int) -> str:
        # Deterministic fake OCR: identity over page text.
        return handle[page - 1]


@dataclass
class _PdfHandle:
    """Open-document handle for :class:`PdfCodec`: raw bytes (for the
    raster paths), eagerly parsed page texts, and the parsed document
    (parse ONCE per doc; metadata reads reuse it). ``scan_cache``
    memoizes the decoded scanned-page pixels per page number so the
    image and ocr features share ONE decode (a multi-megapixel G4/JPEG
    page would otherwise decode 2-4x per row)."""

    content: bytes
    pages: list[str]
    doc: Any = None
    scan_cache: dict = None  # page -> (w, h, gray) | None

    def __post_init__(self):
        if self.scan_cache is None:
            self.scan_cache = {}


class PdfCodec(DocumentCodec):
    """Real PDF binding.

    Text extraction (page_count / page_text) is REAL and
    dependency-free: :mod:`pdf2dataset_spark.sources.minipdf`
    implements the ISO 32000 subset needed for text (object parsing,
    FlateDecode + object streams via stdlib zlib, page-tree walk,
    Tj/TJ/'/" content operators). Malformed/encrypted/unsupported
    PDFs raise ``ValueError`` → per-row error capture (A8).

    Page RENDERING and OCR are real too, via the pure-stdlib raster
    path (:mod:`pdf2dataset_spark.sources.raster`): the page's
    extracted text layer is drawn with a deterministic bitmap font
    into a spec-valid PNG, and OCR re-reads the pixels back to text —
    so the image/ocr feature columns carry genuine image payloads
    whose content round-trips. ``image_format`` other than ``png``
    needs the native stack (pdf2image/poppler) and raises
    ``NotImplementedError`` naming it; a visual (non-text-layer)
    raster of the original PDF likewise.

    SCANNED pages (no text layer, embedded image — upstream's core
    real-world input) route through :meth:`_scan_pixels`: the image
    feature yields the engine-DECODED embedded image (JPEG baseline/
    progressive or raw samples) re-encoded in the requested format,
    and OCR runs over those decoded pixels — pytesseract when
    installed (real scans), else the built-in grid OCR, which reads
    scans of the engine's own raster exactly (threshold binarization
    survives lossy re-encodes) and returns "" honestly for foreign
    scans it cannot read.
    """

    name = "pdf"

    def __init__(
        self,
        ocr_lang: str = "eng",
        image_format: str = "png",
        dpi: int = 200,
        image_size: str | None = None,
        password: str = "",
        layout: bool = True,
    ):
        self.ocr_lang = ocr_lang
        self.image_format = image_format
        self.dpi = dpi
        self.image_size = image_size
        self.password = password
        #: reading-order text (pdftotext parity: XY-cut column/section
        #: ordering, kern-gap word breaks); False = raw stream order.
        self.layout = layout

    def open(self, content: bytes) -> "_PdfHandle":
        from pdf2dataset_spark.sources import minipdf

        doc = minipdf.PdfDocument(
            content, password=self.password.encode("latin-1", errors="replace")
        )
        if self.layout:
            # reading order honors the inheritable /Rotate + /MediaBox
            # and inlines /Form XObject text (letterheads, OCR layers)
            pages = [
                minipdf.content_text_layout(
                    doc.page_content(p),
                    fonts=doc.page_fonts(p),
                    rotate=minipdf.page_rotation(doc, p),
                    media_box=minipdf.page_media_box(doc, p),
                    forms=doc.page_forms(p),
                    ext_gstates=doc.page_ext_gstates(p),
                    props=doc.page_properties(p),
                )
                for p in doc.pages()
            ]
        else:
            pages = [
                minipdf.content_text(
                    doc.page_content(p),
                    fonts=doc.page_fonts(p),
                    forms=doc.page_forms(p),
                    ext_gstates=doc.page_ext_gstates(p),
                    props=doc.page_properties(p),
                )
                for p in doc.pages()
            ]
        return _PdfHandle(content=content, pages=pages, doc=doc)

    def doc_info(self, handle: "_PdfHandle") -> dict[str, str]:
        """/Info dictionary with XMP fallback (ISO 32000-1 §14.3):
        a key absent from /Info fills from the catalog's /Metadata
        XMP packet (Title/Author/CreationDate/ModDate) — real files
        increasingly carry XMP only. /Info wins where both exist."""
        if handle.doc is None:
            return {}
        info = dict(handle.doc.info())
        for k, v in handle.doc.xmp().items():
            info.setdefault(k, v)
        return info

    def doc_profile(self, handle: "_PdfHandle") -> dict:
        """Structural facts — version / linearized / tagged /
        encrypted (+ has_xmp) — the corpus-faceting surface; see
        minipdf.PdfDocument.profile."""
        if handle.doc is None:
            return {}
        out = dict(handle.doc.profile())
        out["has_xmp"] = bool(handle.doc.xmp())
        return out

    def doc_dates(
        self, handle: "_PdfHandle"
    ) -> tuple[str | None, str | None]:
        """(creation, modification) as ISO-8601 strings — /Info
        D:-form dates normalized via minipdf.parse_pdf_date, XMP
        ISO dates passed through; None where absent/garbled. The
        document-age curation surface (dedup tie-breaks, recency
        filters) in one sortable format."""
        from pdf2dataset_spark.sources.minipdf import PdfDocument

        info = self.doc_info(handle)
        p = PdfDocument.parse_pdf_date
        return (
            p(info.get("CreationDate") or ""),
            p(info.get("ModDate") or ""),
        )

    def page_annotations(self, handle: "_PdfHandle", page: int) -> list[str]:
        if handle.doc is None:
            return []
        return handle.doc.page_annotations(handle.doc.pages()[page - 1])

    def doc_outline(self, handle: "_PdfHandle") -> list[tuple[int, str]]:
        return handle.doc.outline() if handle.doc is not None else []

    def doc_attachments(self, handle: "_PdfHandle") -> list[dict]:
        return handle.doc.attachments() if handle.doc is not None else []

    def page_count(self, handle: "_PdfHandle") -> int:
        return len(handle.pages)

    def page_text(self, handle: "_PdfHandle", page: int) -> str:
        return handle.pages[page - 1]

    def _entry_gray(
        self, e: dict, doc=None
    ) -> tuple[int, int, bytes] | None:
        """Decoded page_images entry -> (w, h, 8-bit gray pixels);
        None for undecodable / sub-byte payloads. Round-9 colorspace
        fidelity (ISO 32000-1 §8.6.5-8.6.6): /Separation tint
        samples map through the TINT TRANSFORM into the alternate
        space (then luma) via a 256-entry LUT — tint 0 is NO ink
        (white), so the naive raw-gray reading would render such
        plates inverted; /ICCBased images interpret samples by the
        profile's /N (1=gray, 3=RGB luma, 4=CMYK via the k-operator
        formula — the spec's component-count fallback when no CMM is
        wired); bare 4-component (DeviceCMYK) sample planes convert
        the same way."""
        px = e.get("pixels")
        w, h = e.get("width"), e.get("height")
        if px is None or not w or not h:
            return None
        if e.get("cs_kind") == "indexed":
            # palette indices, NOT gray values — and the only
            # sample shape here that is legitimately sub-byte
            # (1/2/4-bit palettes are the norm for diagrams)
            return self._indexed_gray(e, px, w, h)
        if len(px) == w * h:
            if e.get("cs_kind") == "separation":
                from pdf2dataset_spark.sources.minipdf import _luma

                fn = e.get("cs_sep_fn")
                if doc is None or fn is None:
                    return None  # tint uninterpretable: decline
                try:
                    lut = bytes(
                        _luma(
                            self._eval_pdf_function(doc, fn, t / 255.0)
                        )
                        for t in range(256)
                    )
                except (ValueError, KeyError, TypeError, IndexError):
                    return None  # unsupported tint fn: decline
                return w, h, bytes(px).translate(lut)
            return w, h, bytes(px)
        if len(px) == 3 * w * h:  # RGB -> BT.601 luma
            import numpy as np

            rgb = (
                np.frombuffer(bytes(px), np.uint8)
                .reshape(h, w, 3)
                .astype(np.float64)
            )
            y = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
            return w, h, np.clip(np.round(y), 0, 255).astype(np.uint8).tobytes()
        if len(px) == 4 * w * h:  # CMYK (DeviceCMYK / ICCBased N=4)
            import numpy as np

            cmyk = (
                np.frombuffer(bytes(px), np.uint8)
                .reshape(h, w, 4)
                .astype(np.float64)
            ) / 255.0
            v = (1.0 - np.minimum(1.0, cmyk[..., 3])) * (
                1.0 - np.minimum(
                    1.0,
                    (cmyk[..., 0] + cmyk[..., 1] + cmyk[..., 2]) / 3.0,
                )
            )
            return w, h, np.clip(
                np.round(v * 255.0), 0, 255
            ).astype(np.uint8).tobytes()
        return None

    @staticmethod
    def _indexed_gray(e: dict, px, w: int, h: int):
        """/Indexed image samples -> 8-bit gray (ISO 32000-1
        §8.6.6.3): row-padded 1/2/4/8-bit indices unpack, map
        through the lookup table into the BASE space (gray / RGB
        luma / CMYK k-formula), indices past hival clamp to the
        last entry, a short lookup string zero-fills (black). None
        for base spaces this engine cannot interpret."""
        import numpy as np

        bits = e.get("bits") or 8
        bn = e.get("cs_base_ncomp")
        hival = e.get("cs_hival")
        pal = e.get("cs_palette")
        if not bn or pal is None or hival is None                 or bits not in (1, 2, 4, 8):
            return None
        rowlen = (w * bits + 7) // 8
        if len(px) < rowlen * h:
            return None
        a = np.frombuffer(bytes(px[:rowlen * h]), np.uint8)             .reshape(h, rowlen)
        if bits == 8:
            idx = a[:, :w]
        elif bits == 4:
            u = np.empty((h, rowlen * 2), np.uint8)
            u[:, 0::2] = a >> 4
            u[:, 1::2] = a & 0x0F
            idx = u[:, :w]
        elif bits == 2:
            u = np.empty((h, rowlen * 4), np.uint8)
            for i, sft in enumerate((6, 4, 2, 0)):
                u[:, i::4] = (a >> sft) & 0x03
            idx = u[:, :w]
        else:
            idx = np.unpackbits(a, axis=1)[:, :w]
        n = hival + 1
        need = n * bn
        pal_b = bytes(pal)[:need]
        if len(pal_b) < need:
            pal_b = pal_b + b"\x00" * (need - len(pal_b))
        table = np.frombuffer(pal_b, np.uint8).reshape(n, bn)             .astype(np.float64)
        rows = table[np.minimum(idx, n - 1)]
        if bn == 1:
            g = rows[..., 0]
        elif bn == 3:
            g = (0.299 * rows[..., 0] + 0.587 * rows[..., 1]
                 + 0.114 * rows[..., 2])
        elif bn == 4:
            cmyk = rows / 255.0
            g = 255.0 * (
                (1.0 - np.minimum(1.0, cmyk[..., 3]))
                * (1.0 - np.minimum(
                    1.0,
                    (cmyk[..., 0] + cmyk[..., 1] + cmyk[..., 2])
                    / 3.0,
                ))
            )
        else:
            return None
        return w, h, np.clip(
            np.round(g), 0, 255
        ).astype(np.uint8).tobytes()

    @staticmethod
    def _entry_alpha(e: dict, w: int, h: int) -> bytes | None:
        """Per-pixel /SMask alpha plane of a decoded page_images
        entry, nearest-resampled to the BASE image's ``w`` x ``h``
        grid (round-9: the composite render honors image soft masks,
        ISO 32000-1 §11.6.5.2); None when absent, undecoded, or not
        8-bit (the honest decline the smask entry already records)."""
        sm = e.get("smask") if isinstance(e, dict) else None
        if not isinstance(sm, dict) or not sm.get("decodable"):
            return None
        alpha, sw, sh = sm.get("alpha"), sm.get("width"), sm.get("height")
        if alpha is None or not sw or not sh \
                or sm.get("bits", 8) not in (0, 8) \
                or len(alpha) < sw * sh:
            return None
        if (sw, sh) == (w, h):
            return bytes(alpha[:w * h])
        import numpy as np

        src = np.frombuffer(bytes(alpha[:sw * sh]), np.uint8) \
            .reshape(sh, sw)
        yi = np.minimum((np.arange(h) * sh) // h, sh - 1)
        xi = np.minimum((np.arange(w) * sw) // w, sw - 1)
        return src[yi[:, None], xi[None, :]].tobytes()



    #: execution-step budget for Type 4 calculator functions — a
    #: hostile stream cannot loop the interpreter (no loop operators
    #: exist in the calculator language, but nested ifelse chains and
    #: copy/roll could still amplify work)
    _MAX_CALC_STEPS = 10_000

    @staticmethod
    def _parse_calculator(data: bytes) -> list:
        """Tokenize a Type 4 PostScript-calculator program into a
        nested procedure list (ISO 32000-1 7.10.5)."""
        toks = re.findall(rb"\{|\}|[^\s{}]+", data)
        pos = 0

        def proc() -> list:
            nonlocal pos
            out: list = []
            while pos < len(toks):
                t = toks[pos]
                pos += 1
                if t == b"{":
                    out.append(proc())
                elif t == b"}":
                    return out
                else:
                    try:
                        out.append(float(t) if b"." in t or b"e" in t.lower()
                                   else int(t))
                    except ValueError:
                        out.append(t.decode("latin-1"))
            raise ValueError("calculator function: unterminated procedure")

        if not toks or toks[0] != b"{":
            raise ValueError("calculator function: no outer procedure")
        pos = 1
        return proc()

    @staticmethod
    def _run_calculator(prog: list, stack: list, budget: list) -> None:
        import math

        def pop():
            if not stack:
                raise ValueError("calculator stack underflow")
            return stack.pop()

        def popn():
            v = pop()
            if isinstance(v, bool):
                raise ValueError("calculator: number expected")
            return v

        i = 0
        while i < len(prog):
            budget[0] -= 1
            if budget[0] <= 0:
                raise ValueError("calculator step budget exceeded")
            op = prog[i]
            i += 1
            if isinstance(op, (int, float)):
                stack.append(op)
            elif isinstance(op, list):
                stack.append(op)  # procedure literal (if/ifelse operand)
            elif op == "if":
                p1 = pop()
                c = pop()
                if not isinstance(p1, list):
                    raise ValueError("if: procedure expected")
                if c is True:
                    PdfCodec._run_calculator(p1, stack, budget)
                elif c is not False:
                    raise ValueError("if: boolean expected")
            elif op == "ifelse":
                p2, p1 = pop(), pop()
                c = pop()
                if not (isinstance(p1, list) and isinstance(p2, list)):
                    raise ValueError("ifelse: procedures expected")
                if c is True:
                    PdfCodec._run_calculator(p1, stack, budget)
                elif c is False:
                    PdfCodec._run_calculator(p2, stack, budget)
                else:
                    raise ValueError("ifelse: boolean expected")
            elif op == "add":
                b_, a_ = popn(), popn(); stack.append(a_ + b_)
            elif op == "sub":
                b_, a_ = popn(), popn(); stack.append(a_ - b_)
            elif op == "mul":
                b_, a_ = popn(), popn(); stack.append(a_ * b_)
            elif op == "div":
                b_, a_ = popn(), popn()
                if b_ == 0:
                    raise ValueError("calculator division by zero")
                stack.append(a_ / b_)
            elif op == "idiv":
                b_, a_ = popn(), popn()
                if b_ == 0:
                    raise ValueError("calculator division by zero")
                stack.append(int(a_) // int(b_) if (a_ >= 0) == (b_ >= 0)
                             else -(-int(a_) // int(b_)))
            elif op == "mod":
                b_, a_ = popn(), popn()
                if b_ == 0:
                    raise ValueError("calculator division by zero")
                stack.append(int(math.fmod(int(a_), int(b_))))
            elif op == "neg":
                stack.append(-popn())
            elif op == "abs":
                stack.append(abs(popn()))
            elif op == "sqrt":
                v = popn()
                if v < 0:
                    raise ValueError("sqrt of negative")
                stack.append(math.sqrt(v))
            elif op == "sin":
                stack.append(math.sin(math.radians(popn())))
            elif op == "cos":
                stack.append(math.cos(math.radians(popn())))
            elif op == "atan":
                b_, a_ = popn(), popn()
                stack.append(math.degrees(math.atan2(a_, b_)) % 360.0)
            elif op == "exp":
                b_, a_ = popn(), popn(); stack.append(a_ ** b_)
            elif op == "ln":
                v = popn()
                if v <= 0:
                    raise ValueError("ln of non-positive")
                stack.append(math.log(v))
            elif op == "log":
                v = popn()
                if v <= 0:
                    raise ValueError("log of non-positive")
                stack.append(math.log10(v))
            elif op == "cvi":
                stack.append(int(popn()))
            elif op == "cvr":
                stack.append(float(popn()))
            elif op == "floor":
                stack.append(math.floor(popn()))
            elif op == "ceiling":
                stack.append(math.ceil(popn()))
            elif op == "round":
                v = popn()
                stack.append(math.floor(v + 0.5))  # PS rounds half up
            elif op == "truncate":
                stack.append(math.trunc(popn()))
            elif op == "dup":
                v = pop(); stack.append(v); stack.append(v)
            elif op == "pop":
                pop()
            elif op == "exch":
                b_, a_ = pop(), pop(); stack.append(b_); stack.append(a_)
            elif op == "copy":
                n = int(popn())
                if n < 0 or n > len(stack) or len(stack) + n > 1000:
                    raise ValueError("copy: bad count")
                stack.extend(stack[len(stack) - n:])
            elif op == "index":
                n = int(popn())
                if n < 0 or n >= len(stack):
                    raise ValueError("index: bad depth")
                stack.append(stack[-1 - n])
            elif op == "roll":
                j = int(popn()); n = int(popn())
                if n < 0 or n > len(stack):
                    raise ValueError("roll: bad count")
                if n:
                    j %= n
                    tail = stack[len(stack) - n:]
                    del stack[len(stack) - n:]
                    stack.extend(tail[-j:] + tail[:-j])
            elif op in ("eq", "ne", "gt", "ge", "lt", "le"):
                b_, a_ = pop(), pop()
                stack.append({
                    "eq": a_ == b_, "ne": a_ != b_, "gt": a_ > b_,
                    "ge": a_ >= b_, "lt": a_ < b_, "le": a_ <= b_,
                }[op])
            elif op in ("and", "or", "xor"):
                b_, a_ = pop(), pop()
                if isinstance(a_, bool) and isinstance(b_, bool):
                    stack.append({"and": a_ and b_, "or": a_ or b_,
                                  "xor": a_ != b_}[op])
                else:
                    ai, bi = int(a_), int(b_)
                    stack.append({"and": ai & bi, "or": ai | bi,
                                  "xor": ai ^ bi}[op])
            elif op == "not":
                v = pop()
                stack.append((not v) if isinstance(v, bool) else ~int(v))
            elif op == "bitshift":
                s_, a_ = int(popn()), int(popn())
                if abs(s_) > 64:
                    raise ValueError("bitshift out of range")
                stack.append(a_ << s_ if s_ >= 0 else a_ >> -s_)
            elif op == "true":
                stack.append(True)
            elif op == "false":
                stack.append(False)
            else:
                raise ValueError(f"calculator operator {op!r} unsupported")

    @staticmethod
    def _eval_pdf_function(doc, fn, t: float) -> list[float]:
        """PDF function value(s) at ``t`` — Type 0 sampled (linear
        interpolation, 1/2/4/8/16/32-bit samples), Type 2 exponential
        interpolation, Type 3 stitching, and Type 4 PostScript
        calculator via a step-budgeted mini-interpreter (ISO 32000-1
        7.10.2-5); unsupported sample widths and calculator programs
        past the budget DECLINE BY NAME (ValueError -> the shading is
        skipped, deterministic unpainted region)."""
        from pdf2dataset_spark.sources.minipdf import StreamObj

        fn = doc.resolve(fn)
        data = None
        if isinstance(fn, StreamObj):
            data = doc.stream_bytes(fn)
            fn = fn.sdict
        ftype = int(doc.resolve(fn.get("/FunctionType", -1)))
        dom = [float(doc.resolve(v))
               for v in doc.resolve(fn.get("/Domain", [0.0, 1.0]))]
        d0, d1 = dom[0], dom[1]
        t = min(max(t, d0), d1)
        if ftype == 0:
            if data is None:
                raise ValueError("sampled function without a stream")
            size = int(doc.resolve(doc.resolve(fn.get("/Size", [0]))[0]))
            bps = int(doc.resolve(fn.get("/BitsPerSample", 0)))
            rng = [float(doc.resolve(v))
                   for v in doc.resolve(fn.get("/Range", []))]
            if size < 1 or not rng or bps not in (1, 2, 4, 8, 16, 32):
                raise ValueError(
                    f"sampled function unsupported (size={size}, bps={bps})"
                )
            n_out = len(rng) // 2
            enc = [float(doc.resolve(v)) for v in doc.resolve(
                fn.get("/Encode", [0, size - 1]))]
            dec = [float(doc.resolve(v)) for v in doc.resolve(
                fn.get("/Decode", rng))]
            # map t into the sample index space, clamp, interpolate
            x = enc[0] + (0.0 if d1 <= d0 else (t - d0) / (d1 - d0)) \
                * (enc[1] - enc[0])
            x = min(max(x, 0.0), size - 1.0)
            i0 = int(x)
            i1 = min(i0 + 1, size - 1)
            frac = x - i0
            maxv = (1 << bps) - 1

            def sample(idx: int, out: int) -> int:
                bit = (idx * n_out + out) * bps
                byte, off = bit // 8, bit % 8
                # big-endian bit packing per 7.10.2
                acc = 0
                need = bps
                while need > 0:
                    if byte >= len(data):
                        raise ValueError("sampled function stream short")
                    take = min(8 - off, need)
                    chunk = (data[byte] >> (8 - off - take)) & ((1 << take) - 1)
                    acc = (acc << take) | chunk
                    need -= take
                    byte += 1
                    off = 0
                return acc

            out: list[float] = []
            for k in range(n_out):
                v = sample(i0, k) * (1 - frac) + sample(i1, k) * frac
                lo, hi = dec[2 * k], dec[2 * k + 1]
                out.append(lo + v / maxv * (hi - lo))
            return out
        if ftype == 2:
            c0 = [float(doc.resolve(v))
                  for v in doc.resolve(fn.get("/C0", [0.0]))]
            c1 = [float(doc.resolve(v))
                  for v in doc.resolve(fn.get("/C1", [1.0]))]
            n = float(doc.resolve(fn.get("/N", 1)))
            return [a + (t ** n) * (b - a) for a, b in zip(c0, c1)]
        if ftype == 3:
            fns = doc.resolve(fn.get("/Functions")) or []
            bounds = [float(doc.resolve(v))
                      for v in doc.resolve(fn.get("/Bounds", []))]
            enc = [float(doc.resolve(v))
                   for v in doc.resolve(fn.get("/Encode", []))]
            k = 0
            while k < len(bounds) and t >= bounds[k]:
                k += 1
            lo = d0 if k == 0 else bounds[k - 1]
            hi = d1 if k == len(bounds) else bounds[k]
            e0, e1 = (enc[2 * k], enc[2 * k + 1]) if len(enc) >= 2 * k + 2 \
                else (0.0, 1.0)
            frac = 0.0 if hi <= lo else (t - lo) / (hi - lo)
            return PdfCodec._eval_pdf_function(doc, fns[k], e0 + frac * (e1 - e0))
        if ftype == 4:
            if data is None:
                raise ValueError("calculator function without a stream")
            rng = [float(doc.resolve(v))
                   for v in doc.resolve(fn.get("/Range", []))]
            if not rng:
                raise ValueError("calculator function without /Range")
            prog = PdfCodec._parse_calculator(data)
            stack: list = [t]
            PdfCodec._run_calculator(prog, stack, [PdfCodec._MAX_CALC_STEPS])
            n_out = len(rng) // 2
            if len(stack) < n_out:
                raise ValueError("calculator left too few results")
            vals = stack[-n_out:]
            out = []
            for k, v in enumerate(vals):
                if isinstance(v, bool):
                    raise ValueError("calculator returned a boolean")
                out.append(min(max(float(v), rng[2 * k]), rng[2 * k + 1]))
            return out
        raise ValueError(f"shading function type {ftype} unsupported")

    #: pixel budget for a rasterized shading patch (axial/radial) —
    #: a hostile clip/MediaBox cannot force unbounded rasterization
    _MAX_SHADING_PATCH_PX = 2_000_000

    def _eval_fn2(self, doc, fn, x: float, y: float,
                  _cache: dict) -> list[float]:
        """2-input PDF function value(s) at (x, y) — the
        function-based-shading surface (round-9): /FunctionType 4
        calculator programs (stack seeded [x, y], step-budgeted,
        outputs clamped by /Range) and ARRAYS of such 1-out
        functions (one per color component). ``_cache`` memoizes
        the parsed program per function object across a sampling
        grid. Anything else raises ValueError (decline by name)."""
        fn = doc.resolve(fn)
        if isinstance(fn, list):
            out: list[float] = []
            for el in fn:
                out.extend(self._eval_fn2(doc, el, x, y, _cache))
            return out
        from pdf2dataset_spark.sources.minipdf import StreamObj

        if not isinstance(fn, StreamObj):
            raise ValueError("2-in function: calculator stream expected")
        fd = fn.sdict
        if int(doc.resolve(fd.get("/FunctionType", -1))) != 4:
            raise ValueError("2-in function: only type 4 supported here")
        prog = _cache.get(id(fn))
        if prog is None:
            prog = self._parse_calculator(doc.stream_bytes(fn))
            _cache[id(fn)] = prog
        rng = [float(doc.resolve(v))
               for v in doc.resolve(fd.get("/Range", []))]
        n_out = len(rng) // 2
        if n_out < 1:
            raise ValueError("2-in calculator without /Range")
        stack: list = [x, y]
        self._run_calculator(prog, stack, [self._MAX_CALC_STEPS])
        if len(stack) < n_out:
            raise ValueError("2-in calculator left too few outputs")
        outs = stack[-n_out:]
        return [
            min(max(float(o), rng[2 * i]), rng[2 * i + 1])
            for i, o in enumerate(outs)
        ]

    #: sampling-grid side for non-sampled 2-in shading functions —
    #: bounds per-shading calculator work to GRID^2 budgeted runs
    _FN2_GRID = 65

    def _shading_lut(self, doc, sh):
        """(ext0, ext1, lut256) for a shading dict: /Extend flags and
        a 256-level uint8 luma LUT of /Function over /Domain
        (deterministic quantization). Raises on unsupported or
        malformed functions — callers decline the whole paint."""
        import numpy as np

        from pdf2dataset_spark.sources import minipdf

        dom = [float(doc.resolve(v))
               for v in doc.resolve(sh.get("/Domain", [0.0, 1.0]))]
        ext = doc.resolve(sh.get("/Extend", [False, False]))
        ext0 = bool(doc.resolve(ext[0])) if isinstance(ext, list) else False
        ext1 = bool(doc.resolve(ext[1])) if isinstance(ext, list) \
            and len(ext) > 1 else False
        fn = sh.get("/Function")
        lut = np.empty(256, dtype=np.uint8)
        for i in range(256):
            t = dom[0] + i / 255.0 * (dom[1] - dom[0])
            lut[i] = minipdf._luma(self._eval_pdf_function(doc, fn, t))
        return ext0, ext1, lut

    def _patch_grid(self, clip, box):
        """Budgeted device-space raster grid for a shading patch over
        ``clip ∩ box``: (rx0, ry0, pw, ph, xs, ys) with pixel-center
        coordinate vectors (row 0 = TOP, the image-stamp convention),
        or None when empty / over ``_MAX_SHADING_PATCH_PX``."""
        import numpy as np

        region = clip if clip is not None else box
        rx0 = max(region[0], box[0])
        ry0 = max(region[1], box[1])
        rx1 = min(region[2], box[2])
        ry1 = min(region[3], box[3])
        pw, ph = int(rx1 - rx0), int(ry1 - ry0)
        if pw <= 0 or ph <= 0 or pw * ph > self._MAX_SHADING_PATCH_PX:
            return None
        xs = rx0 + np.arange(pw, dtype=np.float64) + 0.5
        ys = ry1 - (np.arange(ph, dtype=np.float64) + 0.5)
        return rx0, ry0, pw, ph, xs, ys

    def _axial_patch(self, doc, sh, ctm, clip, box):
        """/ShadingType 2 (axial) under ANY invertible affine CTM,
        rasterized at 1 device unit/px into a masked gray patch.
        Device pixel centers map back through the CTM inverse to user
        space, where s = ((P-p0)·(p1-p0)) / |p1-p0|² (ISO 32000-1
        8.7.4.5.3) — level lines stay perpendicular to the axis in
        USER space, so skewed/rotated CTMs paint exactly (the round-7
        axis-aligned-strips path declined rotated axes by name).
        /Extend clamping; unpainted pixels are transparent (mask 0).
        Returns (w, h, gray_bytes, placement_ctm, mask_bytes) or None
        when DECLINED BY NAME (singular CTM, degenerate axis,
        over-budget region, unsupported function)."""
        import numpy as np

        try:
            coords = [float(doc.resolve(v))
                      for v in doc.resolve(sh.get("/Coords"))][:4]
            ux0, uy0, ux1, uy1 = coords
            a, b, c, d, e, f = ctm
            det = a * d - c * b
            if abs(det) < 1e-12:
                return None
            adx, ady = ux1 - ux0, uy1 - uy0
            denom = adx * adx + ady * ady
            if denom < 1e-12:
                return None
            ext0, ext1, lut = self._shading_lut(doc, sh)
        except (TypeError, ValueError, KeyError, IndexError):
            return None
        grid = self._patch_grid(clip, box)
        if grid is None:
            return None
        rx0, ry0, pw, ph, xs, ys = grid
        # device = M·user + t with x' = a·x + c·y + e, y' = b·x + d·y
        # + f; invert: u = (d·(x-e) - c·(y-f))/det, v = (-b·(x-e)
        # + a·(y-f))/det
        X = xs[None, :] - e
        Y = ys[:, None] - f
        u = (d * X - c * Y) / det
        v = (-b * X + a * Y) / det
        s = ((u - ux0) * adx + (v - uy0) * ady) / denom
        ok = np.ones(s.shape, dtype=bool)
        if not ext0:
            ok &= s >= 0
        if not ext1:
            ok &= s <= 1
        s = np.clip(s, 0.0, 1.0)
        idx = np.clip(np.round(s * 255), 0, 255).astype(np.int64)
        patch = np.where(ok, lut[idx], np.uint8(255)).astype(np.uint8)
        placement = (float(pw), 0.0, 0.0, float(ph), float(rx0), float(ry0))
        return pw, ph, patch.tobytes(), placement, \
            ok.astype(np.uint8).tobytes()

    def _radial_patch(self, doc, sh, ctm, clip, box):
        """/ShadingType 3 (radial) under a SIMILARITY CTM (circles
        stay circles), rasterized at 1 device unit/px into a gray
        patch for the image-stamping path. Per-pixel parameter s:
        the larger root of |P-c(s)| = r(s) with r(s) >= 0 (ISO
        32000-1 8.7.4.5.4), /Extend clamping, function values via a
        256-level LUT. Returns (w, h, gray_bytes, placement_ctm,
        mask_bytes) in device space, or None when DECLINED BY NAME
        (non-similarity CTM, degenerate geometry, over-budget region,
        unsupported function). Unpainted pixels are TRANSPARENT
        (mask 0, skip-stamped by the compositor) — overlapping
        shadings compose in stream order instead of erasing each
        other with opaque white; the compositor's stream-order paint
        journal (round 8) places every patch at its exact content-
        stream z-position among fills/polys/lines/images."""
        import numpy as np

        try:
            coords = [float(doc.resolve(v))
                      for v in doc.resolve(sh.get("/Coords"))][:6]
            ux0, uy0, ur0, ux1, uy1, ur1 = coords
            a, b, c, d, e, f = ctm
            # similarity check: orthogonal equal-norm columns
            n1, n2 = a * a + b * b, c * c + d * d
            if abs(a * c + b * d) > 1e-9 * max(1.0, n1) or \
                    abs(n1 - n2) > 1e-9 * max(1.0, n1):
                return None
            scale = n1 ** 0.5
            p0 = (a * ux0 + c * uy0 + e, b * ux0 + d * uy0 + f)
            p1 = (a * ux1 + c * uy1 + e, b * ux1 + d * uy1 + f)
            r0, r1 = ur0 * scale, ur1 * scale
            if r0 < 0 or r1 < 0:
                return None
            ext0, ext1, lut = self._shading_lut(doc, sh)
        except (TypeError, ValueError, KeyError, IndexError):
            return None
        grid = self._patch_grid(clip, box)
        if grid is None:
            return None
        rx0, ry0, pw, ph, xs, ys = grid
        ex = xs[None, :] - p0[0]
        ey = ys[:, None] - p0[1]
        dx, dy, dr = p1[0] - p0[0], p1[1] - p0[1], r1 - r0
        qa = dx * dx + dy * dy - dr * dr
        qb = ex * dx + ey * dy + r0 * dr
        qc = ex * ex + ey * ey - r0 * r0
        with np.errstate(invalid="ignore", divide="ignore"):
            if abs(qa) > 1e-12:
                disc = qb * qb - qa * qc
                ok = disc >= 0
                root = np.sqrt(np.maximum(disc, 0.0))
                s_hi = (qb + root) / qa
                s_lo = (qb - root) / qa
                if qa < 0:
                    s_hi, s_lo = s_lo, s_hi
                # prefer the larger root where its radius is valid
                s = np.where(r0 + s_hi * dr >= 0, s_hi, s_lo)
                ok &= r0 + s * dr >= 0
            else:
                # linear case (|c1-c0| == |dr|): s = qc / (2 qb)
                ok = np.abs(qb) > 1e-12
                s = qc / np.where(ok, 2 * qb, 1.0)
                ok &= r0 + s * dr >= 0
        if not ext0:
            ok &= s >= 0
        if not ext1:
            ok &= s <= 1
        s = np.clip(s, 0.0, 1.0)
        idx = np.clip(np.round(s * 255), 0, 255).astype(np.int64)
        patch = np.where(ok, lut[idx], np.uint8(255)).astype(np.uint8)
        placement = (float(pw), 0.0, 0.0, float(ph), float(rx0), float(ry0))
        return pw, ph, patch.tobytes(), placement, \
            ok.astype(np.uint8).tobytes()

    def _function_patch_generic(self, doc, fn, dom, total, clip, box):
        """Grid-sampled fallback for /ShadingType 1 functions the
        vectorized path can't gather (round-9): /FunctionType 4
        calculators and function ARRAYS. The function evaluates on a
        fixed _FN2_GRID x _FN2_GRID lattice over /Domain (each run
        step-budgeted — total work is bounded by construction, the
        hostile-input posture that justified the old decline), grays
        through the BT.601 luma, and device pixels BILINEARLY
        interpolate the lattice. Smooth shading functions — the only
        kind real files put here — reproduce within a gray level;
        evaluation errors decline the whole paint, never mis-paint."""
        import numpy as np

        from pdf2dataset_spark.sources.minipdf import _luma

        a, b, c, d, e, f = total
        det = a * d - c * b
        N = self._FN2_GRID
        cache: dict = {}
        gvals = np.empty((N, N), dtype=np.uint8)
        try:
            for j in range(N):
                yv = dom[2] + (dom[3] - dom[2]) * j / (N - 1)
                for i in range(N):
                    xv = dom[0] + (dom[1] - dom[0]) * i / (N - 1)
                    gvals[j, i] = _luma(
                        self._eval_fn2(doc, fn, xv, yv, cache))
        except (ValueError, KeyError, TypeError, IndexError):
            return None  # unsupported / over-budget: decline
        grid = self._patch_grid(clip, box)
        if grid is None:
            return None
        rx0, ry0, pw, ph, xs, ys = grid
        X = xs[None, :] - e
        Y = ys[:, None] - f
        u = (d * X - c * Y) / det
        v = (-b * X + a * Y) / det
        ok = ((u >= dom[0]) & (u <= dom[1])
              & (v >= dom[2]) & (v <= dom[3]))
        su = np.clip((u - dom[0]) / (dom[1] - dom[0]) * (N - 1),
                     0.0, N - 1.0)
        sv = np.clip((v - dom[2]) / (dom[3] - dom[2]) * (N - 1),
                     0.0, N - 1.0)
        i0 = np.floor(su).astype(np.int64)
        j0 = np.floor(sv).astype(np.int64)
        i1 = np.minimum(i0 + 1, N - 1)
        j1 = np.minimum(j0 + 1, N - 1)
        fu = su - i0
        fv = sv - j0
        g = gvals.astype(np.float64)
        val = (g[j0, i0] * (1 - fu) * (1 - fv)
               + g[j0, i1] * fu * (1 - fv)
               + g[j1, i0] * (1 - fu) * fv
               + g[j1, i1] * fu * fv)
        patch = np.where(
            ok, np.clip(np.round(val), 0, 255).astype(np.uint8),
            np.uint8(255))
        placement = (float(pw), 0.0, 0.0, float(ph),
                     float(rx0), float(ry0))
        return pw, ph, patch.tobytes(), placement, \
            ok.astype(np.uint8).tobytes()

    def _function_patch(self, doc, sh, ctm, clip, box):
        """/ShadingType 1 (function-based, ISO 32000-1 8.7.4.5.2):
        gray(x, y) = Function(x, y) over /Domain [x0 x1 y0 y1] in
        SHADING space; /Matrix maps shading space to user space, so
        device pixels map back through (Matrix · CTM)⁻¹. Supported
        function: one 2-in /FunctionType 0 sampled stream — the
        sample grid evaluates VECTORIZED (numpy gather + bilinear,
        8/16/32-bit samples, 1/3/4 outputs through the BT.601 luma).
        Pixels outside /Domain are transparent (/Background is not
        painted — same unpainted posture). /FunctionType 4
        calculators and function ARRAYS (round-9) route through
        _function_patch_generic: a budgeted _FN2_GRID-squared
        lattice evaluation + per-pixel bilinear interpolation.
        DECLINED BY NAME: other sample widths, singular matrices,
        over-budget sample grids or calculator programs."""
        import numpy as np

        from pdf2dataset_spark.sources.minipdf import StreamObj

        if not isinstance(sh, dict):
            return None
        try:
            dom = [float(doc.resolve(v)) for v in doc.resolve(
                sh.get("/Domain", [0.0, 1.0, 0.0, 1.0]))][:4]
            if len(dom) < 4 or dom[1] <= dom[0] or dom[3] <= dom[2]:
                return None
            mat = doc.resolve(sh.get("/Matrix"))
            from pdf2dataset_spark.sources import minipdf
            smat = tuple(float(doc.resolve(v)) for v in mat)[:6] \
                if isinstance(mat, list) and len(mat) >= 6 \
                else minipdf._ID6
            total = minipdf._mat_mul(smat, ctm)  # shading -> device
            a, b, c, d, e, f = total
            det = a * d - c * b
            if abs(det) < 1e-12:
                return None
            fn = doc.resolve(sh.get("/Function"))
            if not isinstance(fn, StreamObj) or int(doc.resolve(
                    fn.sdict.get("/FunctionType", -1))) != 0:
                # calculator / array functions (round-9): evaluate
                # on a budgeted grid and interpolate per pixel
                return self._function_patch_generic(
                    doc, sh.get("/Function"), dom, total, clip, box)
            fdata = doc.stream_bytes(fn)
            fd = fn.sdict
            fdom = [float(doc.resolve(v))
                    for v in doc.resolve(fd.get("/Domain", []))][:4]
            sizes = [int(doc.resolve(v))
                     for v in doc.resolve(fd.get("/Size", []))][:2]
            bps = int(doc.resolve(fd.get("/BitsPerSample", 0)))
            rng = [float(doc.resolve(v))
                   for v in doc.resolve(fd.get("/Range", []))]
        except (TypeError, ValueError, KeyError, IndexError):
            return None
        if len(fdom) < 4 or len(sizes) < 2 or bps not in (8, 16, 32) \
                or not rng:
            return None
        s0, s1 = sizes
        n_out = len(rng) // 2
        if s0 < 1 or s1 < 1 or n_out not in (1, 3, 4) \
                or s0 * s1 * n_out > 4_000_000:
            return None
        need = (s0 * s1 * n_out * bps + 7) // 8
        if len(fdata) < need:
            return None
        try:
            enc = [float(doc.resolve(v)) for v in doc.resolve(
                fd.get("/Encode",
                       [0, s0 - 1, 0, s1 - 1]))][:4]
            dec = [float(doc.resolve(v)) for v in doc.resolve(
                fd.get("/Decode", rng))][:2 * n_out]
        except (TypeError, ValueError):
            return None
        if len(enc) < 4 or len(dec) < 2 * n_out:
            return None
        grid = self._patch_grid(clip, box)
        if grid is None:
            return None
        rx0, ry0, pw, ph, xs, ys = grid
        # device -> shading space through total⁻¹
        X = xs[None, :] - e
        Y = ys[:, None] - f
        u = (d * X - c * Y) / det
        v = (-b * X + a * Y) / det
        ok = ((u >= dom[0]) & (u <= dom[1])
              & (v >= dom[2]) & (v <= dom[3]))
        # clamp into the function's own domain, then Encode into the
        # sample index space (7.10.2), clamp to [0, Size_i - 1]
        u = np.clip(u, fdom[0], fdom[1])
        v = np.clip(v, fdom[2], fdom[3])
        su = enc[0] + (u - fdom[0]) / (fdom[1] - fdom[0] or 1.0) \
            * (enc[1] - enc[0])
        sv = enc[2] + (v - fdom[2]) / (fdom[3] - fdom[2] or 1.0) \
            * (enc[3] - enc[2])
        su = np.clip(su, 0.0, s0 - 1.0)
        sv = np.clip(sv, 0.0, s1 - 1.0)
        i0 = np.floor(su).astype(np.int64)
        j0 = np.floor(sv).astype(np.int64)
        i1 = np.minimum(i0 + 1, s0 - 1)
        j1 = np.minimum(j0 + 1, s1 - 1)
        fu = su - i0
        fv = sv - j0
        dt = {8: ">u1", 16: ">u2", 32: ">u4"}[bps]
        samples = np.frombuffer(
            fdata[: s0 * s1 * n_out * (bps // 8)], dtype=dt
        ).astype(np.float64).reshape(s1, s0, n_out)
        maxv = float((1 << bps) - 1)
        comps = []
        for k in range(n_out):
            plane = samples[:, :, k]
            # first input varies fastest (7.10.2): index [j, i]
            val = (plane[j0, i0] * (1 - fu) * (1 - fv)
                   + plane[j0, i1] * fu * (1 - fv)
                   + plane[j1, i0] * (1 - fu) * fv
                   + plane[j1, i1] * fu * fv)
            lo, hi = dec[2 * k], dec[2 * k + 1]
            comps.append(lo + val / maxv * (hi - lo))
        # vectorized _luma twin (same formulas, same rounding)
        if n_out == 1:
            lum = comps[0]
        elif n_out == 3:
            lum = 0.299 * comps[0] + 0.587 * comps[1] + 0.114 * comps[2]
        else:
            cy = np.minimum(
                1.0, (comps[0] + comps[1] + comps[2]) / 3.0)
            lum = (1.0 - np.minimum(1.0, comps[3])) * (1.0 - cy)
        patch = np.where(
            ok,
            np.clip(
                np.round(lum * 255), 0, 255
            ).astype(np.uint8),
            np.uint8(255),
        )
        placement = (float(pw), 0.0, 0.0, float(ph), float(rx0), float(ry0))
        return pw, ph, patch.tobytes(), placement, \
            ok.astype(np.uint8).tobytes()

    #: cell-raster pixel budget for one tiling-pattern cell
    _MAX_TILE_CELL_PX = 1 << 16
    #: max denominator when recognizing a fractional tile step as an
    #: exact rational (round-10); the area budget above is what
    #: actually bounds the supersampled cell's cost
    _MAX_TILE_Q = 256
    #: nested-pattern recursion budget (round-10; was a hardcoded
    #: single level): a cell may fill with a pattern whose cell
    #: fills with a pattern (depth 0 -> 1 -> 2); one level deeper
    #: declines. Also what bounds SELF-referencing pattern cycles.
    _TILE_NEST_BUDGET = 2

    def _tiling_patch(self, doc, pat, prect, box,
                      scn_gray: int = 0, _depth: int = 0):
        """/PatternType 1 (tiling, ISO 32000-1 8.7.3.3): the cell's
        content stream rasterizes ONCE at 1 px per pattern unit
        (fills/polys/lines through the standard draw-ops walker; a
        parallel all-black pass derives the paint MASK, so unpainted
        cell area stays transparent), then the fill region samples
        the cell by pattern-space modulo — gaps (XStep/YStep beyond
        the /BBox) stay transparent, and the phase anchors to the
        page's default user space through /Matrix. PaintType 1
        (colored) keeps the cell's own colors; PaintType 2
        (UNCOLORED, round-8) paints the cell's geometry as a stencil
        in ``scn_gray`` — the color the scn operands selected — with
        the cell's own color operators ignored per §8.7.3.3.
        Returns the standard masked 5-tuple patch.

        OVERLAPPING TILES (round-9; round-10 generalized: XStep/
        YStep smaller than the cell, steps >= 1 that are EXACT
        RATIONALS with denominator <= _MAX_TILE_Q — the cell
        supersamples at q = lcm of the denominators px/unit so the
        period stays integer-sized, raster budget permitting)
        composite into an effective PERIOD cell
        first: tiles paint in increasing-origin order,
        so at each period pixel the nearest covering tile's painted
        pixel wins and earlier tiles show through its gaps. Cells
        that ``Do`` IMAGE XObjects (round-9) resolve them against
        the pattern's own /Resources (the form-XObject pseudo-page
        route) and stamp them at the cell's z-order; cells that
        paint SHADINGS rasterize them against the pattern's own
        /Shading resources in cell space (round-9); an uncolored
        (PaintType 2) cell stamps the image/shading FOOTPRINT in
        scn_gray, per the stencil rule.

        Cells may themselves fill with a SHADING or TILING pattern
        from their own /Resources (round-9: one level; round-10:
        a generic ``_TILE_NEST_BUDGET``-deep recursion, so
        pattern-in-pattern-in-pattern composites and one level
        deeper — or a self-referencing cycle — declines).

        DECLINED BY NAME: singular /Matrix, overlap steps that are
        not exact small rationals or are under one unit, depth-2
        pattern nesting, stenciled (non-rect) nested regions
        (patterns, shadings and images alike — round-10),
        undecodable nested images/shadings/patterns, over-budget
        (incl. supersampled) cells. (Rotated/
        skewed/mirrored /Matrix are HONORED since round-8: the
        device→pattern mapping goes through the full matrix
        inverse.)"""
        import numpy as np

        from pdf2dataset_spark.sources import minipdf, raster

        sd = pat.sdict
        try:
            paint_type = int(doc.resolve(sd.get("/PaintType", 1)))
            if paint_type not in (1, 2):
                return None
            bbox = [float(doc.resolve(v))
                    for v in doc.resolve(sd.get("/BBox"))][:4]
            bx0, by0, bx1, by1 = bbox
            cw, ch = int(bx1 - bx0), int(by1 - by0)
            xstep = float(doc.resolve(sd.get("/XStep", bx1 - bx0)))
            ystep = float(doc.resolve(sd.get("/YStep", by1 - by0)))
            mat = doc.resolve(sd.get("/Matrix"))
            pmat = tuple(float(doc.resolve(v)) for v in mat)[:6] \
                if isinstance(mat, list) and len(mat) >= 6 \
                else minipdf._ID6
            content = doc.stream_bytes(pat)
        except (TypeError, ValueError, KeyError, IndexError):
            return None
        a, b, c, d, e, f = pmat
        det = a * d - b * c
        if abs(det) < 1e-12:
            return None  # singular pattern matrix: nothing to paint
        if cw < 1 or ch < 1 or cw * ch > self._MAX_TILE_CELL_PX:
            return None
        overlap = xstep < cw or ystep < ch
        q = 1  # supersampling factor for fractional-step overlap
        if overlap:
            if xstep < 1 or ystep < 1:
                return None  # hostile sub-unit step: declined
            # round-10 (verdict ask #4): any EXACT rational step
            # composites — q is the lcm of the steps' denominators
            # (round-9 allowed only eighths), so the period cell
            # (xstep*q x ystep*q px) stays integer-sized. The
            # raster-area budget below bounds the cost; a step whose
            # double is not exactly p/q for q <= _MAX_TILE_Q
            # (irrational or deeper fraction) still declines.
            from fractions import Fraction
            from math import lcm

            fx = Fraction(xstep).limit_denominator(self._MAX_TILE_Q)
            fy = Fraction(ystep).limit_denominator(self._MAX_TILE_Q)
            if float(fx) != xstep or float(fy) != ystep:
                return None  # not an exact small rational: declined
            q = lcm(fx.denominator, fy.denominator)
            if cw * ch * q * q > self._MAX_TILE_CELL_PX:
                return None  # supersampled cell over budget
        try:
            draw = minipdf.content_draw_ops(content)
        except (ValueError, KeyError):
            return None
        placed_cell: list[tuple] = []
        cell_patches: list[tuple] = []
        cell_order: list[tuple] = []
        sh_ok: dict[int, int] = {}
        pat_ok: dict[int, int] = {}
        if draw["pattern_fills"]:
            # PATTERN-IN-PATTERN (round-9; round-10: generic depth
            # budget) — nested fills resolve against THIS pattern's
            # /Resources /Pattern and rasterize in cell space;
            # nesting past _TILE_NEST_BUDGET levels, stenciled
            # (non-rect) nested regions and undecodable nested
            # patterns decline the whole paint
            if _depth >= self._TILE_NEST_BUDGET:
                return None
            pres2 = doc.resolve(sd.get("/Resources"))
            pdict2 = doc.resolve(pres2.get("/Pattern")) \
                if isinstance(pres2, dict) else None
            for i, (nm, nrect, nscn) in enumerate(
                    draw["pattern_fills"]):
                if ("pattern_fills", i) in draw.get("stencils", {}):
                    return None  # stenciled nested region: declined
                np_ = doc.resolve(pdict2.get(nm)) \
                    if isinstance(pdict2, dict) else None
                nd = np_.sdict if isinstance(np_, minipdf.StreamObj) \
                    else (np_ if isinstance(np_, dict) else None)
                if not isinstance(nd, dict):
                    return None
                try:
                    nptype = int(doc.resolve(nd.get("/PatternType", 0)))
                except (TypeError, ValueError):
                    return None
                patch = None
                if nptype == 1 and isinstance(np_, minipdf.StreamObj):
                    patch = self._tiling_patch(
                        doc, np_, nrect, (bx0, by0, bx1, by1),
                        scn_gray=nscn, _depth=_depth + 1)
                elif nptype == 2:
                    nmat = doc.resolve(nd.get("/Matrix"))
                    try:
                        npm = tuple(float(doc.resolve(v))
                                    for v in nmat)[:6] \
                            if isinstance(nmat, list) \
                            and len(nmat) >= 6 else minipdf._ID6
                    except (TypeError, ValueError):
                        npm = minipdf._ID6
                    nsh = doc.resolve(nd.get("/Shading"))
                    nsd = nsh.sdict \
                        if isinstance(nsh, minipdf.StreamObj) \
                        else (nsh if isinstance(nsh, dict) else None)
                    nst = 0
                    if isinstance(nsd, dict):
                        try:
                            nst = int(doc.resolve(
                                nsd.get("/ShadingType", 0)))
                        except (TypeError, ValueError):
                            nst = 0
                    _pf2 = {1: self._function_patch,
                            2: self._axial_patch,
                            3: self._radial_patch,
                            4: self._mesh_patch, 5: self._mesh_patch,
                            6: self._mesh_patch, 7: self._mesh_patch}
                    fn3 = _pf2.get(nst)
                    sh_arg3 = nsh if nst in (4, 5, 6, 7) else nsd
                    patch = fn3(doc, sh_arg3, npm, nrect,
                                (bx0, by0, bx1, by1)) \
                        if fn3 is not None else None
                if patch is None:
                    return None
                qw, qh, qpx, qctm, qmask = patch
                qa, qb, qc, qd, qe, qf = qctm
                pat_ok[i] = len(cell_patches)
                cell_patches.append(
                    (qw, qh, qpx,
                     (qa, qb, qc, qd, qe - bx0, qf - by0), qmask))
        if draw["shadings"]:
            # nested SHADING resources (round-9): rasterize each sh
            # paint against the PATTERN's own /Resources /Shading in
            # cell space; an undecodable nested shading declines the
            # whole pattern (never a half-painted cell)
            pres = doc.resolve(sd.get("/Resources"))
            shd = doc.resolve(pres.get("/Shading")) \
                if isinstance(pres, dict) else None
            _pf = {1: self._function_patch,
                   2: self._axial_patch, 3: self._radial_patch,
                   4: self._mesh_patch, 5: self._mesh_patch,
                   6: self._mesh_patch, 7: self._mesh_patch}
            for i, (nm, sctm, sclip) in enumerate(draw["shadings"]):
                if ("shadings", i) in draw.get("stencils", {}):
                    # round-10 (advisor): a nested shading under a
                    # non-rect clip stencil would paint its full
                    # rect-clip bbox — decline, never mis-paint
                    return None
                sh = doc.resolve(shd.get(nm)) \
                    if isinstance(shd, dict) else None
                sdict2 = sh.sdict \
                    if isinstance(sh, minipdf.StreamObj) \
                    else (sh if isinstance(sh, dict) else None)
                stype2 = 0
                if isinstance(sdict2, dict):
                    try:
                        stype2 = int(doc.resolve(
                            sdict2.get("/ShadingType", 0)))
                    except (TypeError, ValueError):
                        stype2 = 0
                fn2 = _pf.get(stype2)
                sh_arg2 = sh if stype2 in (4, 5, 6, 7) else sdict2
                patch = fn2(doc, sh_arg2, sctm, sclip,
                            (bx0, by0, bx1, by1)) \
                    if fn2 is not None else None
                if patch is None:
                    return None
                pw_, ph_, ppx_, pctm_, pmask_ = patch
                pa_, pb_, pc_, pd_, pe_, pf_ = pctm_
                sh_ok[i] = len(cell_patches)
                cell_patches.append(
                    (pw_, ph_, ppx_,
                     (pa_, pb_, pc_, pd_, pe_ - bx0, pf_ - by0),
                     pmask_))
        if draw["images"]:
            # nested IMAGE resources (round-9): Do targets resolve
            # against the PATTERN's own /Resources via the same
            # pseudo-page route form XObjects use
            try:
                entries = {
                    en.get("name"): en
                    for en in doc.page_images(
                        {"/Resources": sd.get("/Resources")},
                        decode_pixels=True)
                }
            except (ValueError, KeyError, IndexError):
                return None
            img_ok: dict[int, int] = {}
            for i, (nm, ictm) in enumerate(draw["images"]):
                if ("images", i) in draw.get("stencils", {}):
                    # round-10 (advisor): same stencil decline as
                    # nested patterns/shadings above
                    return None
                en = entries.get(nm)
                gray = self._entry_gray(en, doc) if en else None
                if gray is None:
                    return None  # undecodable nested image: decline
                ia, ib, ic, id_, ie, if_ = ictm
                img_ok[i] = len(placed_cell)
                placed_cell.append(
                    (gray[0], gray[1], gray[2],
                     (ia, ib, ic, id_, ie - bx0, if_ - by0)))
        if placed_cell or cell_patches:
            img_ok_ = img_ok if draw["images"] else {}
            for kind, idx in draw["order"]:
                if kind == "images":
                    j = img_ok_.get(idx)
                    if j is not None:
                        cell_order.append(("images", j))
                elif kind == "shadings":
                    j = sh_ok.get(idx)
                    if j is not None:
                        cell_order.append(("base_images", j))
                elif kind == "pattern_fills":
                    j = pat_ok.get(idx)
                    if j is not None:
                        cell_order.append(("base_images", j))
                elif kind in ("fills", "polys", "lines"):
                    cell_order.append((kind, idx))
        if not (draw["fills"] or draw["polys"] or draw["lines"]
                or placed_cell or cell_patches):
            return None

        def cell(gray_override: int | None):
            # fractional-step overlap (round-9): the cell rasterizes
            # SUPERSAMPLED at q px per pattern unit so the period
            # cell (xstep*q x ystep*q) stays integer-sized
            g = gray_override
            _, _, px = raster.compose_page(
                cw, ch, scale=q,
                fills=[(x0 - bx0, y0 - by0, x1 - bx0, y1 - by0,
                        gg if g is None else g)
                       for x0, y0, x1, y1, gg in draw["fills"]],
                polys=[([(x - bx0, y - by0) for x, y in pts],
                        gg if g is None else g)
                       for pts, gg in draw["polys"]],
                lines=[(x0 - bx0, y0 - by0, x1 - bx0, y1 - by0,
                        gg if g is None else g)
                       for x0, y0, x1, y1, gg in draw["lines"]],
                images=[
                    (iw_, ih_,
                     ipx_ if g is None else bytes([g]) * (iw_ * ih_),
                     ictm_)
                    for iw_, ih_, ipx_, ictm_ in placed_cell],
                base_images=[
                    (pw_, ph_,
                     ppx_ if g is None
                     else bytes([g]) * (pw_ * ph_),
                     pctm_, pmask_)
                    for pw_, ph_, ppx_, pctm_, pmask_
                    in cell_patches],
                order=cell_order
                if (placed_cell or cell_patches) else None,
            )
            return np.frombuffer(bytes(px), dtype=np.uint8) \
                .reshape(ch * q, cw * q)

        mask_cell = cell(0) != 255  # black pass: painted pixels only
        # uncolored cells are pure stencils: every painted pixel
        # takes the scn color, whatever colors the cell stream set
        color_cell = (cell(None) if paint_type == 1
                      else cell(int(scn_gray)))
        if overlap:
            # composite overlapping tiles into ONE period-sized
            # effective cell: tiles paint in increasing-origin
            # order, so the nearest covering tile (offset 0) is
            # painted LAST — its painted pixels win, and farther
            # tiles (larger offsets) only show through the gaps
            # exact by construction (q is the steps' lcm denominator);
            # round() guards the one-ulp float product error
            exx, eyy = round(xstep * q), round(ystep * q)
            cwq, chq = cw * q, ch * q
            cps = np.flipud(color_cell)   # row index = pattern v
            mps = np.flipud(mask_cell)
            ec = np.full((eyy, exx), 255, dtype=np.uint8)
            em = np.zeros((eyy, exx), dtype=bool)
            for jy in range((chq + eyy - 1) // eyy):
                for jx in range((cwq + exx - 1) // exx):
                    v0, u0 = jy * eyy, jx * exx
                    vh = min(eyy, chq - v0)
                    uw = min(exx, cwq - u0)
                    if vh <= 0 or uw <= 0:
                        continue
                    sub_m = np.zeros((eyy, exx), dtype=bool)
                    sub_c = np.zeros((eyy, exx), dtype=np.uint8)
                    sub_m[:vh, :uw] = mps[v0:v0 + vh, u0:u0 + uw]
                    sub_c[:vh, :uw] = cps[v0:v0 + vh, u0:u0 + uw]
                    take = sub_m & ~em
                    ec[take] = sub_c[take]
                    em |= sub_m
            color_cell = np.flipud(ec).copy()
            mask_cell = np.flipud(em).copy()
        grid = self._patch_grid(prect, box)
        if grid is None:
            return None
        rx0, ry0, pw, ph, xs, ys = grid
        # device -> pattern space through the FULL matrix inverse
        # (round-8: rotated / skewed / mirrored /Matrix sample the
        # same axis-aligned cell raster in pattern space)
        dx = xs[None, :] - e
        dy = ys[:, None] - f
        U = (dx * d - dy * c) / det
        V = (-dx * b + dy * a) / det
        pu = np.mod(U - bx0, xstep)
        pv = np.mod(V - by0, ystep)
        # the sample arrays hold the CELL (cw x ch units) or, under
        # overlap, the composited PERIOD (xstep x ystep units) — at
        # q px per unit either way
        ah, aw = mask_cell.shape
        cw_u = xstep if overlap else cw
        ch_u = ystep if overlap else ch
        inside = (pu < cw_u) & (pv < ch_u)
        j = np.clip((pu * q).astype(np.int64), 0, aw - 1)
        i = np.clip(((ch_u - pv) * q).astype(np.int64), 0, ah - 1)
        i = np.broadcast_to(i, inside.shape)
        j = np.broadcast_to(j, inside.shape)
        ok = inside & mask_cell[i, j]
        if not ok.any():
            return None
        patch = np.where(ok, color_cell[i, j], np.uint8(255))
        placement = (float(pw), 0.0, 0.0, float(ph), float(rx0), float(ry0))
        return pw, ph, patch.tobytes(), placement, \
            ok.astype(np.uint8).tobytes()

    #: vertex budget per mesh-shading paint
    _MAX_MESH_VERTICES = 1 << 16
    #: total rasterized bounding-box pixel budget per mesh paint — a
    #: hostile stream of many patch-covering triangles cannot force
    #: unbounded work (the budget counts what the triangle COUNT
    #: multiplies: per-triangle clipped bbox area)
    _MAX_MESH_RASTER_PX = 50_000_000

    def _mesh_patch(self, doc, sh, ctm, clip, box):
        """/ShadingType 4 (free-form) and 5 (lattice-form) Gouraud
        triangle meshes (ISO 32000-1 8.7.4.5.5-6), rasterized into a
        masked gray patch. Vertex records decode from the shading
        STREAM per /BitsPerFlag, /BitsPerCoordinate,
        /BitsPerComponent with /Decode interpolation; per-vertex gray
        is /Function(t) when a function is present, else the raw
        components, through the BT.601 luma. Triangles
        Gouraud-interpolate barycentrically in DEVICE space (affine
        CTMs preserve barycentric weights, so this equals user-space
        interpolation); unpainted pixels are transparent; a truncated
        stream paints its complete triangles.

        DECLINED BY NAME (None, never mis-painted): non-byte-aligned
        vertex records (the spec's padding rule for fractional-byte
        records is ambiguous across readers — aligned layouts, i.e.
        virtually every real file with 8-bit flags and 16/24-bit
        coordinates, are identical under every reading; for types
        6/7 BOTH the flag-0 and continuation record layouts must
        align), over-budget vertex counts or raster area, malformed
        flag sequences, and unsupported functions.

        Types 6 (Coons) and 7 (tensor) tessellate each patch's Coons
        surface — boundary cubics blended per the classic Coons
        formula, corner colors bilinear in (u, v) — into Gouraud
        triangles on a fixed 12x12 parameter grid. Edge-sharing
        continuation records (flags 1-3, ISO 32000-1 §8.7.4.5.7
        Tables 85-86 — how real mesh shadings mostly encode,
        round-9) reuse the previous patch's edge control points and
        edge colors as the new patch's p1-p4 / c1-c2. Type 7's four
        interior control points are IGNORED (documented
        approximation: the boundary and corner colors are exact; only
        interior geometry of wildly-warped tensor patches deviates
        from the bicubic surface)."""
        import numpy as np

        from pdf2dataset_spark.sources import minipdf
        from pdf2dataset_spark.sources.minipdf import StreamObj

        if not isinstance(sh, StreamObj):
            return None
        sd = sh.sdict
        try:
            stype = int(doc.resolve(sd.get("/ShadingType", 0)))
            bpc = int(doc.resolve(sd.get("/BitsPerCoordinate")))
            bpcomp = int(doc.resolve(sd.get("/BitsPerComponent")))
            decode = [float(doc.resolve(v))
                      for v in doc.resolve(sd.get("/Decode"))]
            fn = sd.get("/Function")
            data = doc.stream_bytes(sh)
        except (TypeError, ValueError, KeyError):
            return None
        if stype not in (4, 5, 6, 7) \
                or bpc not in (1, 2, 4, 8, 12, 16, 24, 32) \
                or bpcomp not in (1, 2, 4, 8, 12, 16):
            return None
        ncomp = 1 if fn is not None else (len(decode) - 4) // 2
        if ncomp < 1 or len(decode) < 4 + 2 * ncomp:
            return None
        if stype in (4, 6, 7):
            try:
                bpf = int(doc.resolve(sd.get("/BitsPerFlag")))
            except (TypeError, ValueError):
                return None
            if bpf not in (2, 4, 8):
                return None
            if stype == 4:
                rec_bits = bpf + 2 * bpc + ncomp * bpcomp
            else:
                npts = 12 if stype == 6 else 16
                rec_bits = bpf + npts * 2 * bpc + 4 * ncomp * bpcomp
                # continuation records (flags 1-3) reuse 4 edge
                # points + 2 colors; both layouts must byte-align
                # for the aligned-records policy to hold
                cont_bits = bpf + (npts - 4) * 2 * bpc \
                    + 2 * ncomp * bpcomp
                if cont_bits % 8:
                    return None
        else:
            try:
                vpr = int(doc.resolve(sd.get("/VerticesPerRow", 0)))
            except (TypeError, ValueError):
                return None
            if vpr < 2:
                return None
            rec_bits = 2 * bpc + ncomp * bpcomp
        if rec_bits % 8:
            return None  # non-byte-aligned records: declined by name
        if len(data) * 8 // rec_bits > self._MAX_MESH_VERTICES:
            return None

        pos = 0
        nbits = len(data) * 8

        def rd(width: int) -> int:
            nonlocal pos
            end = pos + width
            if end > nbits:
                raise EOFError
            chunk = int.from_bytes(data[pos // 8:(end + 7) // 8], "big")
            chunk >>= (-end) % 8
            pos = end
            return chunk & ((1 << width) - 1)

        cmax = (1 << bpc) - 1
        compmax = (1 << bpcomp) - 1

        def read_point() -> tuple:
            x = decode[0] + rd(bpc) * (decode[1] - decode[0]) / cmax
            y = decode[2] + rd(bpc) * (decode[3] - decode[2]) / cmax
            return x, y

        def read_gray() -> int:
            comps = [
                decode[4 + 2 * k]
                + rd(bpcomp) * (decode[5 + 2 * k] - decode[4 + 2 * k])
                / compmax
                for k in range(ncomp)
            ]
            if fn is not None:
                comps = self._eval_pdf_function(doc, fn, comps[0])
            return minipdf._luma(comps)

        def read_vertex() -> tuple:
            x, y = read_point()
            return x, y, read_gray()

        tris: list[tuple] = []
        try:
            if stype == 4:
                va = vb = vc = None
                while True:
                    flag = rd(bpf)
                    if flag == 0:
                        va = read_vertex()
                        if rd(bpf) != 0:
                            return None  # malformed: spec requires 0
                        vb = read_vertex()
                        if rd(bpf) != 0:
                            return None
                        vc = read_vertex()
                    elif flag == 1 and vc is not None:
                        va, vb, vc = vb, vc, read_vertex()
                    elif flag == 2 and vc is not None:
                        va, vb, vc = va, vc, read_vertex()
                    else:
                        return None  # malformed flag sequence
                    tris.append((va, vb, vc))
            elif stype == 5:
                rows: list[list[tuple]] = []
                while True:
                    row = [read_vertex() for _ in range(vpr)]
                    rows.append(row)
                    if len(rows) >= 2:
                        r0, r1 = rows[-2], rows[-1]
                        for i in range(vpr - 1):
                            tris.append((r0[i], r0[i + 1], r1[i]))
                            tris.append((r0[i + 1], r1[i], r1[i + 1]))
            else:  # 6 (Coons) / 7 (tensor): tessellate each patch
                N = 12  # parameter-grid density (fixed, deterministic)
                npts = 12 if stype == 6 else 16

                def bez(p0, p1, p2, p3, t):
                    u = 1.0 - t
                    return (
                        u * u * u * p0[0] + 3 * u * u * t * p1[0]
                        + 3 * u * t * t * p2[0] + t * t * t * p3[0],
                        u * u * u * p0[1] + 3 * u * u * t * p1[1]
                        + 3 * u * t * t * p2[1] + t * t * t * p3[1],
                    )

                # edge-sharing continuation (ISO 32000-1
                # §8.7.4.5.7 Tables 85-86, round-9): flags 1-3 reuse
                # the previous patch's edge D2 points and its two
                # edge colors as the new patch's p1-p4 / c1-c2
                _share = {1: ((3, 4, 5, 6), (1, 2)),
                          2: ((6, 7, 8, 9), (2, 3)),
                          3: ((9, 10, 11, 0), (3, 0))}
                prev_p: list | None = None
                prev_c: list | None = None
                while True:
                    flag = rd(bpf)
                    if flag == 0:
                        p = [read_point() for _ in range(npts)]
                        cols = [read_gray() for _ in range(4)]
                    elif flag in _share and prev_p is not None:
                        pidx, cidx = _share[flag]
                        shared = [prev_p[i] for i in pidx]
                        shared_c = [prev_c[i] for i in cidx]
                        p = shared + [read_point()
                                      for _ in range(npts - 4)]
                        cols = shared_c + [read_gray()
                                           for _ in range(2)]
                    else:
                        # flag 1-3 with no previous patch, or an
                        # out-of-range flag: malformed stream
                        return None
                    prev_p, prev_c = p, cols
                    # corners (u,v): (0,0)=p1 (1,0)=p4 (1,1)=p7
                    # (0,1)=p10; boundary cubics counterclockwise.
                    # Coons surface: edge blend minus corner bilinear;
                    # corner colors bilinear in (u,v).
                    grid_pts: list[list[tuple]] = []
                    for i in range(N + 1):
                        v = i / N
                        lv = bez(p[9], p[10], p[11], p[0], 1.0 - v)
                        rv = bez(p[3], p[4], p[5], p[6], v)
                        row_pts = []
                        for j in range(N + 1):
                            u = j / N
                            bu = bez(p[0], p[1], p[2], p[3], u)
                            tu = bez(p[6], p[7], p[8], p[9], 1.0 - u)
                            sx = ((1 - v) * bu[0] + v * tu[0]
                                  + (1 - u) * lv[0] + u * rv[0]
                                  - ((1 - u) * (1 - v) * p[0][0]
                                     + u * (1 - v) * p[3][0]
                                     + u * v * p[6][0]
                                     + (1 - u) * v * p[9][0]))
                            sy = ((1 - v) * bu[1] + v * tu[1]
                                  + (1 - u) * lv[1] + u * rv[1]
                                  - ((1 - u) * (1 - v) * p[0][1]
                                     + u * (1 - v) * p[3][1]
                                     + u * v * p[6][1]
                                     + (1 - u) * v * p[9][1]))
                            g = ((1 - u) * (1 - v) * cols[0]
                                 + u * (1 - v) * cols[1]
                                 + u * v * cols[2]
                                 + (1 - u) * v * cols[3])
                            row_pts.append((sx, sy, g))
                        grid_pts.append(row_pts)
                    for i in range(N):
                        r0, r1 = grid_pts[i], grid_pts[i + 1]
                        for j in range(N):
                            tris.append((r0[j], r0[j + 1], r1[j]))
                            tris.append((r0[j + 1], r1[j], r1[j + 1]))
                    if len(tris) > 3 * self._MAX_MESH_VERTICES:
                        return None  # hostile patch count
        except EOFError:
            pass  # trailing padding / truncation: keep complete tris
        except (TypeError, ValueError, KeyError, IndexError):
            return None  # unsupported function / malformed values
        if not tris:
            return None

        return self._rasterize_triangles(tris, ctm, clip, box)

    def _rasterize_triangles(self, tris, ctm, clip, box):
        """Gouraud-rasterize ``[(x,y,gray) x3]`` user-space triangles
        into a masked patch (shared back end of the mesh and
        Coons/tensor rasterizers). Barycentric interpolation in
        device space; per-triangle clipped-bbox raster budget
        (``_MAX_MESH_RASTER_PX``) bounds hostile inputs; returns the
        standard 5-tuple patch or None."""
        import numpy as np

        grid = self._patch_grid(clip, box)
        if grid is None:
            return None
        rx0, ry0, pw, ph, xs, ys = grid
        ry1 = ry0 + ph
        patch = np.full((ph, pw), 255, dtype=np.uint8)
        mask = np.zeros((ph, pw), dtype=bool)
        a, b, c, d, e, f = ctm
        raster_budget = self._MAX_MESH_RASTER_PX
        for (u0, v0, g0), (u1, v1, g1), (u2, v2, g2) in tris:
            x0d, y0d = a * u0 + c * v0 + e, b * u0 + d * v0 + f
            x1d, y1d = a * u1 + c * v1 + e, b * u1 + d * v1 + f
            x2d, y2d = a * u2 + c * v2 + e, b * u2 + d * v2 + f
            area2 = (x1d - x0d) * (y2d - y0d) - (x2d - x0d) * (y1d - y0d)
            if abs(area2) < 1e-12:
                continue  # degenerate triangle
            # clipped sub-grid bbox (xs[j] = rx0+j+0.5, ys[i] = ry1-i-0.5)
            jlo = max(0, int(min(x0d, x1d, x2d) - rx0 - 0.5))
            jhi = min(pw, int(max(x0d, x1d, x2d) - rx0 + 1.5))
            ilo = max(0, int(ry1 - max(y0d, y1d, y2d) - 0.5))
            ihi = min(ph, int(ry1 - min(y0d, y1d, y2d) + 1.5))
            if jhi <= jlo or ihi <= ilo:
                continue
            raster_budget -= (jhi - jlo) * (ihi - ilo)
            if raster_budget < 0:
                return None  # hostile raster area: declined by name
            X = xs[jlo:jhi][None, :]
            Y = ys[ilo:ihi][:, None]
            l0 = ((y1d - y2d) * (X - x2d) + (x2d - x1d) * (Y - y2d)) / area2
            l1 = ((y2d - y0d) * (X - x2d) + (x0d - x2d) * (Y - y2d)) / area2
            l2 = 1.0 - l0 - l1
            inside = (l0 >= 0) & (l1 >= 0) & (l2 >= 0)
            if not inside.any():
                continue
            g = np.clip(np.round(l0 * g0 + l1 * g1 + l2 * g2), 0, 255) \
                .astype(np.uint8)
            sub_p = patch[ilo:ihi, jlo:jhi]
            sub_m = mask[ilo:ihi, jlo:jhi]
            sub_p[inside] = g[inside]
            sub_m |= inside
        if not mask.any():
            return None
        placement = (float(pw), 0.0, 0.0, float(ph), float(rx0), float(ry0))
        return pw, ph, patch.tobytes(), placement, \
            mask.astype(np.uint8).tobytes()

    @staticmethod
    def _displayed_patch(patch, x0, y0, rot, rot_d):
        """Map a page-space masked patch into the DISPLAYED frame
        under /Rotate (round-9): raster.stamp() places by
        AXIS-ALIGNED bbox, so handing it a rotated ctm would stamp
        the patch's gradient along the wrong axis. Instead the
        pixel + mask planes rotate with np.rot90 and the placement
        stays axis-aligned in display space. Patch placements out
        of _patch_grid are always axis-aligned scale+translate, so
        the two bbox corners suffice."""
        pw_, ph_, ppx, pctm, pmask = patch
        pa, pb, pc, pd, pe, pf = pctm
        ux0, vy0 = pe - x0, pf - y0
        if not rot:
            return pw_, ph_, ppx, (pa, pb, pc, pd, ux0, vy0), pmask
        import numpy as np

        k = {90: -1, 180: 2, 270: 1}[rot]
        P = np.frombuffer(bytes(ppx), np.uint8).reshape(ph_, pw_)
        M = np.frombuffer(bytes(pmask), np.uint8).reshape(ph_, pw_)
        P2 = np.rot90(P, k)
        M2 = np.rot90(M, k)
        nh, nw = P2.shape
        ra, rb, rc, rd, re, rf = rot_d[rot]
        xs, ys = [], []
        for (uu, vv) in ((ux0, vy0), (ux0 + pa, vy0 + pd)):
            xs.append(ra * uu + rc * vv + re)
            ys.append(rb * uu + rd * vv + rf)
        bx0, by0 = min(xs), min(ys)
        return (nw, nh, P2.tobytes(),
                (float(max(xs) - bx0), 0.0, 0.0,
                 float(max(ys) - by0), bx0, by0),
                M2.tobytes())

    def _composite_pixels(
        self, handle: "_PdfHandle", page: int
    ) -> tuple[int, int, bytes] | None:
        """COMPOSITE page render (A6 fidelity): when a text-bearing
        page also paints geometry — embedded images placed by ``Do``,
        rect fills, stroked lines — draw all of it plus the
        positioned text layer onto one MediaBox-sized canvas (1 px
        per PDF unit), instead of the text-grid raster. Pure-text
        pages keep the grid raster (whose pixel OCR round-trips
        exactly); image-ONLY pages take the scan route before this."""
        if handle.doc is None:
            return None
        from pdf2dataset_spark.sources import minipdf, raster

        doc = handle.doc
        pg = doc.pages()[page - 1]
        try:
            content = doc.page_content(pg)
            draw = minipdf.content_draw_ops(
                content, ext_gstates=doc.page_ext_gstates(pg)
            )
        except (ValueError, KeyError):
            return None
        x0, y0, x1, y1 = minipdf.page_media_box(doc, pg)
        rot = minipdf.page_rotation(doc, pg)
        bw, bh = x1 - x0, y1 - y0
        # /Rotate (inheritable): compose in the DISPLAYED frame. The
        # display transform D maps MediaBox-origin coords clockwise;
        # image CTMs compose as ctm . D (row-vector convention).
        _rot_d = {
            90: (0.0, -1.0, 1.0, 0.0, 0.0, bw),
            180: (-1.0, 0.0, 0.0, -1.0, bw, bh),
            270: (0.0, 1.0, -1.0, 0.0, bh, 0.0),
        }

        def dpt(u: float, v: float) -> tuple[float, float]:
            return minipdf.rotate_point(u, v, rot, bw, bh)

        def _disp_dir(ux: float, uy: float) -> tuple[float, float]:
            # text direction in the DISPLAYED frame (round-9:
            # vertical glyph rasterization) — the run's device
            # direction through /Rotate's linear part
            if not rot:
                return ux, uy
            ra, rb, rc, rd, _, _ = _rot_d[rot]
            return ux * ra + uy * rc, ux * rb + uy * rd

        def drect(u0: float, v0: float, u1: float, v1: float, g):
            (a0, b0), (a1, b1) = dpt(u0, v0), dpt(u1, v1)
            return (min(a0, a1), min(b0, b1), max(a0, a1), max(b0, b1), g)

        def dseg(u0: float, v0: float, u1: float, v1: float, g):
            # endpoints map 1:1 (no min/max: that would re-aim a
            # rotated diagonal segment)
            (a0, b0), (a1, b1) = dpt(u0, v0), dpt(u1, v1)
            return (a0, b0, a1, b1, g)

        placed: list[tuple] = []
        img_map: dict[int, int] = {}  # draw["images"] idx -> placed idx
        if draw["images"]:
            # resolve Do targets against the page's IMAGE XObjects:
            # /Form XObject invocations (logos/letterheads on ordinary
            # text pages) must NOT flip the page off the grid raster
            entries = {
                e.get("name"): e
                for e in doc.page_images(pg, decode_pixels=True)
            }
            for i, (name, ctm) in enumerate(draw["images"]):
                e = entries.get(name)
                gray = self._entry_gray(e, doc) if e else None
                if gray is not None:
                    # translate the placement into MediaBox-origin
                    # space (same shift the glyph runs get), then
                    # into the displayed frame under /Rotate
                    a, b, c, d, te, tf = ctm
                    shifted = (a, b, c, d, te - x0, tf - y0)
                    if rot:
                        shifted = minipdf._mat_mul(shifted, _rot_d[rot])
                    img_map[i] = len(placed)
                    alpha = self._entry_alpha(e, gray[0], gray[1])
                    if alpha is None:
                        placed.append(
                            (gray[0], gray[1], gray[2], shifted))
                    else:
                        # 6-tuple: per-pixel /SMask alpha (round-9),
                        # resampled to the base image's grid
                        placed.append(
                            (gray[0], gray[1], gray[2], shifted,
                             None, alpha))
        # shadings rasterize as masked gray patches (axial under any
        # invertible CTM, radial under similarity CTMs), painted at
        # their exact content-stream z-position via the order journal;
        # unsupported types/geometries decline by name (unpainted)
        shading_patches: list[tuple] = []
        res0 = doc.resolve(pg.get("/Resources"))
        shdict = doc.resolve(res0.get("/Shading")) \
            if isinstance(res0, dict) else None
        _patch_fn = {1: self._function_patch,
                     2: self._axial_patch, 3: self._radial_patch,
                     4: self._mesh_patch, 5: self._mesh_patch,
                     6: self._mesh_patch, 7: self._mesh_patch}

        def add_shading_patch(sh, sctm, sclip) -> None:
            # mesh shadings (4/5) are STREAM objects: params in sdict
            sdict = sh.sdict if isinstance(sh, minipdf.StreamObj) \
                else (sh if isinstance(sh, dict) else None)
            stype = 0
            if isinstance(sdict, dict):
                try:
                    stype = int(doc.resolve(sdict.get("/ShadingType", 0)))
                except (TypeError, ValueError):
                    stype = 0
            fn = _patch_fn.get(stype)
            # dict-shadings (2/3) take the params dict; mesh/patch
            # types (4-7) need the stream object for their vertex data
            sh_arg = sh if stype in (4, 5, 6, 7) else sdict
            patch = fn(doc, sh_arg, sctm, sclip, (x0, y0, x1, y1)) \
                if fn is not None else None
            if patch is not None:
                shading_patches.append(
                    self._displayed_patch(patch, x0, y0, rot, _rot_d))

        shading_map: dict[int, int] = {}  # shading idx -> patch idx
        pattern_map: dict[int, int] = {}  # pattern_fill idx -> patch idx
        for i, (name, sctm, sclip) in enumerate(draw.get("shadings", ())):
            sh = doc.resolve(shdict.get(name)) \
                if isinstance(shdict, dict) else None
            n0 = len(shading_patches)
            add_shading_patch(sh, sctm, sclip)
            if len(shading_patches) > n0:
                shading_map[i] = n0
        # shading-PATTERN fills (/Pattern cs + scn + re f): the fill
        # rect clips the pattern's paint; the pattern /Matrix maps
        # pattern space to the page's DEFAULT user space (ISO 32000-1
        # 8.7.3.1), independent of the CTM at paint time. Shading
        # patterns (type 2) route through the shading rasterizers;
        # colored tiling patterns (type 1) through _tiling_patch.
        # Non-rect pattern REGIONS (round-9) arrive as the region's
        # device bbox + a polygon stencil on the journal entry — the
        # patch rasterizes over the bbox and the stencil gates it
        # per pixel. The order journal places each pattern
        # fill at its exact content-stream z-position.
        patdict = doc.resolve(res0.get("/Pattern")) \
            if isinstance(res0, dict) else None
        for i, (name, prect, scn_g) in enumerate(
            draw.get("pattern_fills", ())
        ):
            _n0 = len(shading_patches)
            pat = doc.resolve(patdict.get(name)) \
                if isinstance(patdict, dict) else None
            pd_ = pat.sdict if isinstance(pat, minipdf.StreamObj) \
                else (pat if isinstance(pat, dict) else None)
            if not isinstance(pd_, dict):
                continue
            try:
                ptype = int(doc.resolve(pd_.get("/PatternType", 0)))
            except (TypeError, ValueError):
                continue
            if ptype == 1:
                # tiling pattern: cell raster sampled by
                # pattern-space modulo over the fill rect (uncolored
                # PaintType 2 cells paint in the scn operands' color)
                if isinstance(pat, minipdf.StreamObj):
                    tp = self._tiling_patch(
                        doc, pat, prect, (x0, y0, x1, y1),
                        scn_gray=scn_g)
                    if tp is not None:
                        shading_patches.append(
                            self._displayed_patch(
                                tp, x0, y0, rot, _rot_d))
                        pattern_map[i] = _n0
                continue
            if ptype != 2:
                continue
            mat = doc.resolve(pd_.get("/Matrix"))
            try:
                pmatrix = tuple(float(doc.resolve(v)) for v in mat)[:6] \
                    if isinstance(mat, list) and len(mat) >= 6 \
                    else minipdf._ID6
            except (TypeError, ValueError):
                pmatrix = minipdf._ID6
            add_shading_patch(
                doc.resolve(pd_.get("/Shading")), pmatrix, prect)
            if len(shading_patches) > _n0:
                pattern_map[i] = _n0
        # Type3 glyph painting (round-8 ask #3): _text_runs emits a
        # (font, code, glyph-matrix) event per shown Type3 glyph; each
        # /CharProc executes through the geometry interpreter with the
        # glyph matrix prepended as a `cm`, and the resulting fills/
        # polys/lines merge into the journal after the page's own
        # geometry (glyphs paint on top, same as the builtin raster).
        t3fonts = doc.page_type3_fonts(pg)
        t3_glyphs: list = []
        runs = minipdf._text_runs(
            content, fonts=doc.page_fonts(pg),
            t3_fonts=t3fonts or None, t3_glyphs=t3_glyphs,
            ext_gstates=doc.page_ext_gstates(pg),
            props=doc.page_properties(pg),
        )
        for fname, code, gm in t3_glyphs:
            proc = t3fonts.get(fname, {}).get("procs", {}).get(code)
            if proc is None:
                continue
            prefix = (
                " ".join(f"{v:.8g}" for v in gm) + " cm\n"
            ).encode("ascii")
            try:
                sub = minipdf.content_draw_ops(prefix + proc)
            except (ValueError, KeyError):
                continue
            for kind, idx in sub["order"]:
                if kind in ("fills", "polys", "lines"):
                    draw[kind].append(sub[kind][idx])
                    nkey = (kind, len(draw[kind]) - 1)
                    draw["order"].append(nkey)
                    st = sub.get("stencils", {}).get((kind, idx))
                    if st:
                        draw["stencils"][nkey] = st
        if not (draw["fills"] or draw["polys"] or draw["lines"]
                or placed or shading_patches):
            return None
        # translate the draw-op journal into compose_page's paint
        # order: geometry paints in exact content-stream order
        # (declined items — undecodable images, declined shadings/
        # patterns — drop out of the sequence)
        compose_order: list[tuple] = []
        compose_alphas: dict = {}
        compose_blends: dict = {}
        compose_stencils: dict = {}
        compose_pixel_masks: dict = {}
        draw_alphas = draw.get("alphas", {})
        draw_blends = draw.get("blends", {})
        draw_softmasks = draw.get("softmasks", {})
        draw_stencils = draw.get("stencils", {})
        _mapped_chains: dict = {}
        # ExtGState /SMask SOFT-MASK GROUPS (round-9): rasterize
        # each referenced mask form ONCE into a full-canvas alpha
        # plane and gate the item's pixels with it. /Luminosity
        # groups: painted pixels -> their gray luminosity,
        # unpainted -> /BC (default black = alpha 0). /Alpha
        # subtype groups map the painted footprint to alpha 255
        # (the opaque-paint model has no fractional group alpha).
        # The mask composes in the DISPLAYED frame via the same
        # drect/dpt/dseg mapping the item geometry gets, so
        # /Rotate pages mask correctly too (the _geo closure
        # below; round-9 follow-up — this replaced the earlier
        # rotated-page decline).
        _mask_cache: dict = {}

        def _luminosity_mask(gs_name):
            if gs_name in _mask_cache:
                return _mask_cache[gs_name]
            mask = None
            g = doc.page_ext_gstates(pg).get(gs_name) or {}
            smv = g.get("SMask")
            if smv is not None:
                grp, bc_g, subtype = smv
                try:
                    gcontent = doc.stream_bytes(grp)
                    mat = doc.resolve(grp.sdict.get("/Matrix"))
                    gm = tuple(float(doc.resolve(v))
                               for v in mat)[:6] \
                        if isinstance(mat, list) and len(mat) >= 6 \
                        else minipdf._ID6
                    prefix = (" ".join(
                        f"{v:.8g}" for v in gm
                    ) + " cm\n").encode("ascii")
                    gdraw = minipdf.content_draw_ops(
                        prefix + gcontent)
                except (ValueError, KeyError, TypeError):
                    gdraw = None
                if gdraw is not None and (
                    gdraw["fills"] or gdraw["polys"]
                    or gdraw["lines"] or gdraw["shadings"]
                ):
                    import numpy as np

                    # shading resources resolve against the mask
                    # FORM's own /Resources
                    gres = doc.resolve(
                        grp.sdict.get("/Resources"))
                    gsh = doc.resolve(gres.get("/Shading")) \
                        if isinstance(gres, dict) else None
                    patches = []
                    for (nm, sctm, sclip) in gdraw["shadings"]:
                        sh = doc.resolve(gsh.get(nm)) \
                            if isinstance(gsh, dict) else None
                        sdict2 = sh.sdict if isinstance(
                            sh, minipdf.StreamObj) else (
                            sh if isinstance(sh, dict) else None)
                        stype2 = 0
                        if isinstance(sdict2, dict):
                            try:
                                stype2 = int(doc.resolve(
                                    sdict2.get("/ShadingType", 0)))
                            except (TypeError, ValueError):
                                stype2 = 0
                        fn2 = _patch_fn.get(stype2)
                        sh_arg2 = sh if stype2 in (4, 5, 6, 7) \
                            else sdict2
                        patch = fn2(
                            doc, sh_arg2, sctm, sclip,
                            (x0, y0, x1, y1)
                        ) if fn2 is not None else None
                        if patch is not None:
                            patches.append(
                                self._displayed_patch(
                                    patch, x0, y0, rot, _rot_d))
                    corder = []
                    for kind, idx in gdraw["order"]:
                        if kind in ("fills", "polys", "lines"):
                            corder.append((kind, idx))
                    corder = corder + [
                        ("base_images", i)
                        for i in range(len(patches))
                    ]

                    patches_black = [
                        (pw2, ph2, b"\x00" * (pw2 * ph2),
                         pctm2, pmask2)
                        for pw2, ph2, _ppx2, pctm2, pmask2
                        in patches
                    ]

                    def _geo(g_override):
                        # the mask composes in the DISPLAYED frame
                        # (same drect/dpt/dseg mapping the item
                        # geometry gets), so /Rotate pages mask
                        # correctly too (round-9 follow-up)
                        _, _, mp = raster.compose_page(
                            bh if rot in (90, 270) else bw,
                            bw if rot in (90, 270) else bh,
                            fills=[drect(fx0 - x0, fy0 - y0,
                                         fx1 - x0, fy1 - y0,
                                         gg if g_override is None
                                         else g_override)
                                   for fx0, fy0, fx1, fy1, gg
                                   in gdraw["fills"]],
                            polys=[([dpt(vx - x0, vy - y0)
                                     for vx, vy in pts],
                                    gg if g_override is None
                                    else g_override)
                                   for pts, gg in gdraw["polys"]],
                            lines=[dseg(lx0 - x0, ly0 - y0,
                                        lx1 - x0, ly1 - y0,
                                        gg if g_override is None
                                        else g_override)
                                   for lx0, ly0, lx1, ly1, gg
                                   in gdraw["lines"]],
                            base_images=patches
                            if g_override is None else patches_black,
                            order=corder,
                        )
                        return np.frombuffer(
                            bytes(mp), dtype=np.uint8)

                    painted = _geo(0) != 255
                    if subtype == "alpha":
                        # group alpha == painted footprint in the
                        # opaque-paint model (round-9)
                        lum = np.full(painted.shape, 255,
                                      dtype=np.uint8)
                    else:
                        lum = _geo(None)
                    out_mask = np.full(
                        painted.shape, bc_g, dtype=np.uint8)
                    out_mask[painted] = lum[painted]
                    mask = out_mask.tobytes()
            _mask_cache[gs_name] = mask
            return mask

        def _map_stencil(chain):
            """Stencil polygons into the DISPLAYED frame (the same
            MediaBox shift + /Rotate transform the item geometry
            gets); mapped once per distinct chain so the
            compositor's per-chain mask cache still hits."""
            m = _mapped_chains.get(id(chain))
            if m is None:
                m = tuple(
                    tuple(
                        tuple(dpt(vx - x0, vy - y0) for vx, vy in poly)
                        for poly in group
                    )
                    for group in chain
                )
                _mapped_chains[id(chain)] = m
            return m

        def _put_order(kind, idx, src_kind, src_idx):
            compose_order.append((kind, idx))
            a = draw_alphas.get((src_kind, src_idx))
            if a is not None:
                compose_alphas[(kind, idx)] = a
            bm = draw_blends.get((src_kind, src_idx))
            if bm is not None:
                compose_blends[(kind, idx)] = bm
            smn = draw_softmasks.get((src_kind, src_idx))
            if smn is not None:
                pmask = _luminosity_mask(smn)
                if pmask is not None:
                    compose_pixel_masks[(kind, idx)] = pmask
            st = draw_stencils.get((src_kind, src_idx))
            if st:
                compose_stencils[(kind, idx)] = _map_stencil(st)

        for kind, idx in draw.get("order", ()):
            if kind == "images":
                j = img_map.get(idx)
                if j is not None:
                    _put_order("images", j, kind, idx)
            elif kind == "shadings":
                j = shading_map.get(idx)
                if j is not None:
                    _put_order("base_images", j, kind, idx)
            elif kind == "pattern_fills":
                j = pattern_map.get(idx)
                if j is not None:
                    _put_order("base_images", j, kind, idx)
            else:
                _put_order(kind, idx, kind, idx)
        # glyph runs carry their DISPLAYED direction (round-9):
        # axis-aligned vertical/reverse runs rasterize rotated 5x7
        # cells, oblique runs paint nearest-pixel along the rotated
        # frame, and scanner-convention text (in-plane rotation
        # cancelling /Rotate) still composes upright.
        # Type3 runs paint via their CharProc geometry above, so they
        # are EXCLUDED from the builtin 5×7 glyph raster (no double
        # paint).
        w, h, px = raster.compose_page(
            bh if rot in (90, 270) else bw,
            bw if rot in (90, 270) else bh,
            fills=[drect(fx0 - x0, fy0 - y0, fx1 - x0, fy1 - y0, g)
                   for fx0, fy0, fx1, fy1, g in draw["fills"]],
            lines=[dseg(lx0 - x0, ly0 - y0, lx1 - x0, ly1 - y0, g)
                   for lx0, ly0, lx1, ly1, g in draw["lines"]],
            polys=[
                ([dpt(vx - x0, vy - y0) for vx, vy in pts], g)
                for pts, g in draw["polys"]
            ],
            images=placed,
            base_images=shading_patches,
            order=compose_order,
            alphas=compose_alphas,
            blends=compose_blends,
            pixel_masks=compose_pixel_masks,
            stencils=compose_stencils,
            glyph_runs=[
                (*dpt(r["x"] - x0, r["y"] - y0), r["text"],
                 *_disp_dir(r.get("ux", 1.0), r.get("uy", 0.0)))
                for r in runs
                # Tr 3 (invisible, the OCR-layer idiom) and Tr 7
                # (clip-only) neither fill nor stroke (ISO 32000-1
                # §9.3.6): extracted, never painted
                if r.get("mode", 0) not in (3, 7)
                and (not t3fonts or r.get("font") not in t3fonts)
            ],
        )
        return w, h, bytes(px)

    def page_image(self, handle: "_PdfHandle", page: int) -> bytes:
        fmt = self.image_format.lower()
        # Scanned page (no text layer, embedded image present): the
        # page's visual content IS the embedded image — render that,
        # decoded by the engine, instead of an empty text raster.
        scan = self._scan_pixels(handle, page)
        if scan is None:
            scan = self._composite_pixels(handle, page)
        if scan is not None:
            from pdf2dataset_spark.sources import raster

            w, h, px = scan
            size = parse_image_size(self.image_size)
            if size is not None:
                w, h, px = raster.resize_nearest(w, h, px, size[0], size[1])
            if fmt in ("jpeg", "jpg"):
                from pdf2dataset_spark.sources.jpeg import encode_jpeg

                return encode_jpeg(w, h, bytes(px), quality=90)
            return raster.encode_png(w, h, bytes(px))
        if fmt != "png":
            try:
                from pdf2image import convert_from_bytes  # type: ignore[import-not-found]
            except ImportError as e:
                if fmt in ("jpeg", "jpg"):
                    # built-in baseline JPEG encoder — no native deps
                    from pdf2dataset_spark.sources import raster

                    return raster.render_text_jpeg(
                        handle.pages[page - 1],
                        size=parse_image_size(self.image_size),
                    )
                raise NotImplementedError(
                    f"image_format={self.image_format!r} rendering requires "
                    "pdf2image/poppler (built-in raster path emits png/jpeg)"
                ) from e
            import io

            imgs = convert_from_bytes(
                handle.content, dpi=self.dpi, first_page=page, last_page=page
            )
            img = imgs[0]
            size = parse_image_size(self.image_size)
            if size is not None:
                img = img.resize(size)
            buf = io.BytesIO()
            img.save(buf, format=self.image_format)
            return buf.getvalue()
        from pdf2dataset_spark.sources import raster

        return raster.render_text_png(
            handle.pages[page - 1], size=parse_image_size(self.image_size)
        )

    def page_word_boxes(self, handle: "_PdfHandle", page: int) -> list[dict]:
        """Word-level boxes in reading order (pdftotext -bbox shape)
        — see minipdf.content_word_boxes."""
        if handle.doc is None:
            return []
        from pdf2dataset_spark.sources import minipdf

        pg = handle.doc.pages()[page - 1]
        return minipdf.content_word_boxes(
            handle.doc.page_content(pg),
            fonts=handle.doc.page_fonts(pg),
            rotate=minipdf.page_rotation(handle.doc, pg),
            media_box=minipdf.page_media_box(handle.doc, pg),
            forms=handle.doc.page_forms(pg),
            ext_gstates=handle.doc.page_ext_gstates(pg),
            props=handle.doc.page_properties(pg),
        )

    def page_artifact_char_fraction(
        self, handle: "_PdfHandle", page: int
    ) -> float:
        """Fraction of the page's extracted (non-whitespace)
        characters living inside /Artifact marked content (ISO
        32000-1 §14.8.2.2) — running headers, footers, page numbers,
        watermarks in tagged PDFs. High values flag pages that are
        mostly pagination furniture; page_paragraphs(drop_artifacts)
        is the surgical cut."""
        if handle.doc is None:
            return 0.0
        from pdf2dataset_spark.sources import minipdf

        doc = handle.doc
        pg = doc.pages()[page - 1]
        runs = minipdf._text_runs(
            doc.page_content(pg),
            fonts=doc.page_fonts(pg),
            forms=doc.page_forms(pg),
            ext_gstates=doc.page_ext_gstates(pg),
            props=doc.page_properties(pg),
        )
        tot = art = 0
        for r in runs:
            n = sum(1 for ch in r["text"] if not ch.isspace())
            tot += n
            if r.get("artifact"):
                art += n
        return art / tot if tot else 0.0

    def page_hidden_char_fraction(
        self, handle: "_PdfHandle", page: int
    ) -> float:
        """Fraction of the page's extracted (non-whitespace)
        characters shown with text rendering mode 3 (invisible) or 7
        (clip-only) — ISO 32000-1 §9.3.6. Mode-3 text under a
        scanned image is the searchable-OCR-layer idiom every
        Acrobat/ABBYY/tesseract-OCRed scan uses, so ~1.0 here is a
        strong curation signal: the page's machine text carries the
        OCR engine's quality, not the author's. 0.0 = all glyphs
        visible, or no text at all."""
        if handle.doc is None:
            return 0.0
        from pdf2dataset_spark.sources import minipdf

        doc = handle.doc
        pg = doc.pages()[page - 1]
        runs = minipdf._text_runs(
            doc.page_content(pg),
            fonts=doc.page_fonts(pg),
            forms=doc.page_forms(pg),
            ext_gstates=doc.page_ext_gstates(pg),
            props=doc.page_properties(pg),
        )
        tot = hid = 0
        for r in runs:
            n = sum(1 for ch in r["text"] if not ch.isspace())
            tot += n
            if r.get("mode", 0) in (3, 7):
                hid += n
        return hid / tot if tot else 0.0

    def page_paragraphs(
        self, handle: "_PdfHandle", page: int,
        drop_artifacts: bool = False,
    ) -> list[str]:
        """Layout-aware paragraph segmentation (reading-order lines
        reflowed with line-break dehyphenation; blank-line gaps and
        column jumps split; ``drop_artifacts=True`` removes
        /Artifact pagination furniture first) — see
        minipdf.content_paragraphs."""
        if handle.doc is None:
            return []
        from pdf2dataset_spark.sources import minipdf

        pg = handle.doc.pages()[page - 1]
        return minipdf.content_paragraphs(
            handle.doc.page_content(pg),
            fonts=handle.doc.page_fonts(pg),
            rotate=minipdf.page_rotation(handle.doc, pg),
            media_box=minipdf.page_media_box(handle.doc, pg),
            forms=handle.doc.page_forms(pg),
            ext_gstates=handle.doc.page_ext_gstates(pg),
            props=handle.doc.page_properties(pg),
            drop_artifacts=drop_artifacts,
        )

    def page_embedded_images(self, handle: "_PdfHandle", page: int) -> list[dict]:
        """Embedded image XObjects of one page (pdfimages-shaped; see
        minipdf.PdfDocument.page_images). /DCTDecode payloads come out
        as complete JFIF files with zero native deps."""
        if handle.doc is None:
            return []
        return handle.doc.page_images(handle.doc.pages()[page - 1])

    def _scan_pixels(
        self, handle: "_PdfHandle", page: int
    ) -> tuple[int, int, bytes] | None:
        """SCANNED-PAGE detection (upstream's core real-world input —
        a page with no text layer whose content is one embedded
        image): when the page's text is empty and it carries a
        decodable embedded image, return the LARGEST one decoded to
        8-bit grayscale ``(w, h, pixels)``; else None. JPEG payloads
        go through the engine decoder (baseline or progressive);
        raw-sample payloads are used directly (RGB reduced to BT.601
        luma)."""
        if handle.doc is None or handle.pages[page - 1].strip():
            return None
        if page in handle.scan_cache:
            return handle.scan_cache[page]
        best: tuple[int, int, bytes] | None = None
        # decode_pixels=True: every decodable entry carries its pixels
        # already (gray, or RGB interleaved) — JBIG2/JPX bit-plane
        # decodes are the dominant per-page cost, so decode ONCE here
        # instead of once for `decodable` and again for the scan route
        entries = handle.doc.page_images(
            handle.doc.pages()[page - 1], decode_pixels=True
        )
        for e in entries:
            gray = self._entry_gray(e, handle.doc)
            if gray is None:
                continue  # undecodable / sub-byte payloads: skip
            w, h, px = gray
            if best is None or w * h > best[0] * best[1]:
                best = (w, h, px)
        handle.scan_cache[page] = best
        return best

    def page_ocr(self, handle: "_PdfHandle", page: int) -> str:
        try:
            import pytesseract  # type: ignore[import-not-found]
            from PIL import Image  # type: ignore[import-not-found]
        except ImportError:
            from pdf2dataset_spark.sources import raster

            scan = self._scan_pixels(handle, page)
            if scan is not None:
                # scanned page: pixel-OCR the DECODED EMBEDDED IMAGE.
                # The flex matcher reads scans of the engine's own
                # raster exactly (even re-encoded lossily or resized
                # by an INTEGER zoom — threshold binarization +
                # normalized cross-correlation at candidate scales
                # recover the bitmap); foreign-font or fractional-
                # rescale scans fail the per-page NCC honesty gate
                # and yield "" — real scans need pytesseract, which
                # takes the branch above over the same decoded image.
                w, h, px = scan
                return raster.ocr_gray_flex(w, h, px)
            # built-in pixel OCR of the built-in render (native-res)
            return raster.ocr_png(
                raster.render_text_png(handle.pages[page - 1])
            )
        import io

        return pytesseract.image_to_string(
            Image.open(io.BytesIO(self.page_image(handle, page))),
            lang=self.ocr_lang,
        )


def default_codec() -> DocumentCodec:
    return TextBytesCodec()
