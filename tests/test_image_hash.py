"""Perceptual image hashing + Hamming-LSH near-dup
(operators/image_hash.py). Pins the properties the rows-only f40
query relies on: determinism, rescale invariance (the *perceptual*
part), separation for unrelated images, LSH recall, and error
isolation for undecodable payloads."""

from __future__ import annotations

from pyspark.sql import functions as F

from pdf2dataset_spark.operators import image_hash as ih
from pdf2dataset_spark.plans.audit import shuffle_count
from pdf2dataset_spark.sources.raster import (
    decode_png,
    encode_png,
    render_text_png,
    resize_nearest,
)


def _ham(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def test_phash_deterministic_and_separating():
    a = ih.phash64(render_text_png("hello world\nsecond line"))
    b = ih.phash64(render_text_png("hello world\nsecond line"))
    c = ih.phash64(render_text_png("completely different text"))
    assert a == b
    assert _ham(a, c) > 10


def test_phash_rescale_invariant():
    png = render_text_png("the quick brown fox\njumps over")
    base = ih.phash64(png)
    w, h, px = decode_png(png)
    for k in (2, 3):
        w2, h2, px2 = resize_nearest(w, h, px, w * k, h * k)
        assert _ham(base, ih.phash64(encode_png(w2, h2, bytes(px2)))) <= 2, k


def test_phash_small_edit_is_near():
    a = ih.phash64(render_text_png("hello world\nsecond line"))
    b = ih.phash64(render_text_png("hello world\nsecond lime"))
    assert 0 < _ham(a, b) <= 10


def test_dhash_deterministic():
    a = ih.dhash64(render_text_png("abc"))
    assert a == ih.dhash64(render_text_png("abc"))
    assert a != ih.dhash64(render_text_png("xyz"))


def test_spark_hash_and_neardup_recall(spark):
    texts = [
        (0, "alpha beta gamma delta"),
        (1, "alpha beta gamma delta"),      # exact dup of 0
        (2, "alpha beta gamma delth"),      # 1-char edit of 0
        (3, "unrelated content entirely"),
        (4, "another independent doc xyz"),
    ]
    df = spark.createDataFrame(
        [(i, render_text_png(t)) for i, t in texts], "doc_id long, image binary"
    )
    hashed = ih.with_image_hash(df, "image")
    # hashing is a narrow pass
    assert shuffle_count(hashed) == 0
    pairs = {
        (r["id_a"], r["id_b"])
        for r in ih.phash_neardup_pairs(
            hashed, max_hamming=6, bands=8
        ).collect()
    }
    assert (0, 1) in pairs            # exact dup found
    assert (0, 2) in pairs or (1, 2) in pairs  # near dup found
    for p in pairs:                   # no unrelated pair verified
        assert 3 not in p and 4 not in p


def test_undecodable_payload_hashes_null(spark):
    df = spark.createDataFrame(
        [(0, render_text_png("ok")), (1, b"\xff\xfenot a png")],
        "doc_id long, image binary",
    )
    rows = {r["doc_id"]: r["phash"] for r in ih.with_image_hash(df, "image").collect()}
    assert rows[0] is not None and rows[1] is None


def test_bucket_cap_bounds_pairs(spark):
    # 50 identical images; max_bucket=10 caps pair fan-out per bucket
    png = render_text_png("same")
    df = spark.createDataFrame(
        [(i, png) for i in range(50)], "doc_id long, image binary"
    )
    hashed = ih.with_image_hash(df, "image")
    n = ih.phash_neardup_pairs(hashed, max_bucket=10, bands=8).count()
    assert 0 < n <= 10 * 9 // 2 * 8  # per-band capped quadratic, not 50*49/2


def test_phash_upscale_invariance_property():
    """Hypothesis: for arbitrary printable one-line texts, the pHash
    of a nearest-neighbor k-x upscale stays within 2 bits of the
    original (pure Python — no Spark round-trip)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=40, deadline=None)
    @given(
        text=st.text(
            alphabet=st.characters(min_codepoint=33, max_codepoint=126),
            min_size=3,
            max_size=40,
        ),
        k=st.sampled_from([2, 3, 4]),
    )
    def prop(text, k):
        png = render_text_png(text)
        base = ih.phash64(png)
        w, h, px = decode_png(png)
        w2, h2, px2 = resize_nearest(w, h, px, w * k, h * k)
        assert _ham(base, ih.phash64(encode_png(w2, h2, bytes(px2)))) <= 2

    prop()


def test_hashes_accept_jpeg_payloads():
    """phash/dhash must decode baseline JPEG (the embedded_image
    feature's /DCTDecode payloads) as well as engine PNGs; lossy
    re-encoding of the same pixels moves pHash by only a few bits."""
    from pdf2dataset_spark.operators import image_hash as ih
    from pdf2dataset_spark.sources.jpeg import encode_jpeg
    from pdf2dataset_spark.sources.raster import decode_png, render_text_png

    png = render_text_png("the quick brown fox 0123")
    w, h, px = decode_png(png)
    jpg = encode_jpeg(w, h, px, quality=92)
    hp, hj = ih.phash64(png), ih.phash64(jpg)
    dist = bin((hp ^ hj) & ((1 << 64) - 1)).count("1")
    assert dist <= 6, dist  # lossy but perceptually identical
    # dhash path decodes too (no exception), and unknown magic raises
    ih.dhash64(jpg)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="container"):
        ih.decode_image(b"GIF89a not supported")
