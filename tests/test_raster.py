"""A6/A7 — pure-stdlib page render (PNG) + pixel OCR round trip."""

from __future__ import annotations

import itertools

import pytest

from pdf2dataset_spark.sources import minipdf, raster
from pdf2dataset_spark.sources.codecs import PdfCodec


def test_glyphs_pairwise_distinct_and_nonblank():
    glyphs = {c: tuple(raster.glyph_rows(chr(c))) for c in range(32, 127)}
    for (a, ga), (b, gb) in itertools.combinations(glyphs.items(), 2):
        assert ga != gb, (chr(a), chr(b))
    # no printable glyph may be blank (blank means padding to OCR)
    for c, g in glyphs.items():
        assert any(g), chr(c)


def test_png_encode_decode_roundtrip():
    w, h, px = 11, 5, bytes(range(55))
    out = raster.decode_png(raster.encode_png(w, h, px))
    assert out == (w, h, bytearray(px))


def test_render_ocr_roundtrip():
    text = "Hello OCR 123\nsecond line!\n\ntabs not here, just text"
    png = raster.render_text_png(text)
    assert png[:8] == b"\x89PNG\r\n\x1a\n"
    assert raster.ocr_png(png) == text


def test_resize_changes_dims_and_breaks_ocr_cleanly():
    png = raster.render_text_png("resize me", size=(64, 32))
    w, h, _ = raster.decode_png(png)
    assert (w, h) == (64, 32)
    with pytest.raises(ValueError, match="native-resolution"):
        raster.ocr_png(png)


def test_render_ocr_roundtrip_property():
    """Property: any printable-ASCII multi-line text round-trips
    render → PNG → OCR exactly (modulo trailing spaces, which are
    indistinguishable from cell padding by design)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    line = st.text(
        alphabet=st.characters(min_codepoint=33, max_codepoint=126),
        max_size=20,
    )
    text = st.lists(line, min_size=1, max_size=4).map("\n".join)

    @settings(max_examples=25, deadline=None)
    @given(t=text)
    def check(t):
        assert raster.ocr_png(raster.render_text_png(t)) == t

    check()


def test_pdf_codec_image_and_ocr_features():
    """A6+A7 through the codec: real PDF bytes → page render (PNG) →
    pixel OCR recovers the extracted text exactly."""
    pages = ["page one body", "and page two"]
    codec = PdfCodec()
    h = codec.open(minipdf.build_pdf(pages))
    for i, want in enumerate(pages, start=1):
        img = codec.page_image(h, i)
        assert img[:8] == b"\x89PNG\r\n\x1a\n"
        assert raster.ocr_png(img) == want
        assert codec.page_ocr(h, i) == want


def test_pdf_codec_image_size_plumbs_through():
    codec = PdfCodec(image_size="48x24")
    h = codec.open(minipdf.build_pdf(["sized page"]))
    w, hh, _ = raster.decode_png(codec.page_image(h, 1))
    assert (w, hh) == (48, 24)


def test_extraction_pipeline_all_features_with_pdf_codec(spark):
    """The upstream flagship call shape — text + image + ocr features
    over real PDFs through the fused Spark pipeline."""
    import pdf2dataset_spark as p

    pages = ["alpha page", "beta page"]
    docs = {"d.pdf": minipdf.build_pdf(pages, compress=True)}
    out = p.extract(
        docs, spark=spark, small=True, use_pdf_codec=True,
        features=["text", "image", "ocr"],
    ).sort_values("page")
    assert list(out.text) == pages
    assert list(out.ocr) == pages
    for img in out.image:
        assert bytes(img[:8]) == b"\x89PNG\r\n\x1a\n"


def test_jpeg_encode_decode_roundtrip():
    """Built-in baseline JPEG: decode(encode(img)) must recover the
    image within quantization error (high quality -> small error),
    and byte output must be deterministic."""
    import numpy as np

    from pdf2dataset_spark.sources.jpeg import decode_jpeg, encode_jpeg

    w, h = 37, 21  # non-multiple-of-8 exercises edge padding
    px = bytes(((x * 7 + y * 11) % 256) for y in range(h) for x in range(w))
    data = encode_jpeg(w, h, px, quality=90)
    assert data[:2] == b"\xff\xd8" and data[-2:] == b"\xff\xd9"
    w2, h2, out = decode_jpeg(data)
    assert (w2, h2) == (w, h)
    a = np.frombuffer(px, dtype=np.uint8).astype(int)
    b = np.frombuffer(out, dtype=np.uint8).astype(int)
    assert np.abs(a - b).mean() < 3.0
    assert np.abs(a - b).max() <= 32
    assert encode_jpeg(w, h, px, quality=90) == data  # deterministic


def test_jpeg_quality_tradeoff():
    """Lower quality -> smaller file, larger error (sanity that the
    quantization scaling actually scales)."""
    import numpy as np

    from pdf2dataset_spark.sources.jpeg import decode_jpeg, encode_jpeg

    w, h = 64, 64
    px = bytes(((x * 5 + y * 3) % 256) for y in range(h) for x in range(w))
    hi = encode_jpeg(w, h, px, quality=95)
    lo = encode_jpeg(w, h, px, quality=25)
    assert len(lo) < len(hi)
    a = np.frombuffer(px, dtype=np.uint8).astype(int)
    err_hi = np.abs(a - np.frombuffer(decode_jpeg(hi)[2], np.uint8).astype(int)).mean()
    err_lo = np.abs(a - np.frombuffer(decode_jpeg(lo)[2], np.uint8).astype(int)).mean()
    assert err_hi <= err_lo


def test_pdf_codec_jpeg_format_without_native_deps():
    """image_format='jpeg' must work with zero native deps: the page
    renders through the built-in raster + baseline JPEG encoder, and
    the payload decodes to the same dimensions as the PNG path."""
    from pdf2dataset_spark.sources.jpeg import decode_jpeg

    codec = PdfCodec(image_format="jpeg")
    handle = codec.open(minipdf.build_pdf(["jpeg page text"]))
    payload = codec.page_image(handle, 1)
    assert payload[:2] == b"\xff\xd8"
    w, h, _ = decode_jpeg(payload)
    pw, ph, _ = raster._rasterize("jpeg page text")
    assert (w, h) == (pw, ph)


def test_pdf_codec_jpeg_resize():
    from pdf2dataset_spark.sources.jpeg import decode_jpeg

    codec = PdfCodec(image_format="jpeg", image_size="32x16")
    handle = codec.open(minipdf.build_pdf(["resized"]))
    w, h, _ = decode_jpeg(codec.page_image(handle, 1))
    assert (w, h) == (32, 16)


def test_jpeg_roundtrip_property():
    """Property: any image, any quality >= 70 — encode/decode stays
    within a bounded error envelope and never crashes (random pixel
    content is the JPEG worst case, so the bound is loose but real)."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from pdf2dataset_spark.sources.jpeg import decode_jpeg, encode_jpeg

    @settings(max_examples=25, deadline=None)
    @given(
        w=st.integers(1, 40),
        h=st.integers(1, 40),
        seed=st.integers(0, 2**31),
        quality=st.integers(70, 100),
    )
    def check(w, h, seed, quality):
        rng = np.random.RandomState(seed)
        px = rng.randint(0, 256, size=w * h, dtype=np.uint8).tobytes()
        w2, h2, out = decode_jpeg(encode_jpeg(w, h, px, quality=quality))
        assert (w2, h2) == (w, h)
        a = np.frombuffer(px, np.uint8).astype(int)
        b = np.frombuffer(out, np.uint8).astype(int)
        # random noise is JPEG-hostile; mean error still must be bounded
        assert np.abs(a - b).mean() < 64

    check()
