"""Perceptual image hashing + near-duplicate detection (tier F, F8
family — multimodal dedup over binary image columns).

Unlike the stubbed pixel codecs in :mod:`multimodal` (PIL/ffmpeg are
absent here), this path is REAL end-to-end with zero native deps:
the engine's own PNG raster (:mod:`pdf2dataset_spark.sources.raster`
— stdlib zlib + numpy) decodes the binary payload, and the hashes
are standard published constructions:

- **pHash** (DCT hash): nearest-resize to 32x32, 2-D DCT-II (two
  numpy matmuls with the orthonormal DCT basis — no scipy), keep the
  8x8 low-frequency block minus DC, threshold at the median → 64
  bits. Robust to rescaling/re-encoding, the classic near-dup hash.
- **dHash** (gradient hash): nearest-resize to 9x8, sign of each
  horizontal adjacent-pixel difference → 64 bits. Cheaper, good for
  exact-ish dup detection.

Scale design
------------
- Hashing is an Arrow-batched ``pandas_udf("long")`` over the binary
  column — one narrow pass, no shuffle; per-image work is bounded by
  the decode (real codecs slot into the same batch shape).
- Candidate pairs use **Hamming-LSH banding**, the same
  single-shuffle plan as MinHash-LSH text dedup (`dedup.py`): the 64
  bits split into ``bands`` chunks, a pair of images sharing any
  chunk value lands in a shared bucket (a pair within Hamming
  distance d collides on >= 1 of b bands whenever d < b, pigeonhole
  — so bands=4 is exhaustive for d <= 3). groupBy(bucket) keeps
  wide rows out of the shuffle; candidates are verified exactly with
  the JVM-side ``bit_count(h1 ^ h2)`` — no Python in the verify.
- A ``max_bucket`` cap bounds degenerate buckets (e.g. blank
  images), the same guard as the text-LSH path.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from pdf2dataset_spark.sources.raster import decode_png

_DCT32 = None


def _dct_basis(n: int = 32) -> np.ndarray:
    """Orthonormal DCT-II basis matrix (type-II, norm='ortho')."""
    global _DCT32
    if _DCT32 is None or _DCT32.shape[0] != n:
        k = np.arange(n)[:, None]
        x = np.arange(n)[None, :]
        m = np.sqrt(2.0 / n) * np.cos(np.pi * (2 * x + 1) * k / (2 * n))
        m[0] /= np.sqrt(2.0)
        _DCT32 = m
    return _DCT32


def _resize_nearest_np(px: np.ndarray, new_h: int, new_w: int) -> np.ndarray:
    h, w = px.shape
    ys = np.minimum(h - 1, np.arange(new_h) * h // new_h)
    xs = np.minimum(w - 1, np.arange(new_w) * w // new_w)
    return px[ys[:, None], xs[None, :]]


def _to_signed64(bits: int) -> int:
    return bits - (1 << 64) if bits >= 1 << 63 else bits


def decode_image(data: bytes) -> tuple[int, int, bytes]:
    """Grayscale-decode a binary image payload by magic bytes: the
    engine PNG raster, or a baseline JPEG via :mod:`sources.jpeg` —
    so hashes work directly on extracted /DCTDecode payloads
    (`minipdf.page_images` / the `embedded_image` feature) as well as
    rendered pages. Unknown containers raise ``ValueError`` (hashed
    to NULL by the UDF — A8 error isolation)."""
    data = bytes(data)
    if data[:4] == b"\x89PNG":
        return decode_png(data)
    if data[:2] == b"\xff\xd8":
        from pdf2dataset_spark.sources.jpeg import decode_jpeg_gray

        return decode_jpeg_gray(data)  # hashes run on luminance
    raise ValueError("unknown image container (PNG/baseline-JPEG supported)")


def phash64(img_bytes: bytes) -> int:
    """64-bit DCT perceptual hash of a PNG/JPEG payload (signed,
    matching Spark LongType)."""
    w, h, px = decode_image(img_bytes)
    img = np.frombuffer(bytes(px), dtype=np.uint8).reshape(h, w).astype(np.float64)
    small = _resize_nearest_np(img, 32, 32)
    d = _dct_basis(32)
    freq = d @ small @ d.T
    block = freq[:8, :8].flatten()[1:]  # drop DC: brightness invariance
    bits = (block > np.median(block)).astype(np.uint64)
    out = 0
    for b in bits:
        out = (out << 1) | int(b)
    return _to_signed64(out << 1)  # 63 bits used; LSB zero


def dhash64(img_bytes: bytes) -> int:
    """64-bit gradient (difference) hash (PNG or baseline JPEG)."""
    w, h, px = decode_image(img_bytes)
    img = np.frombuffer(bytes(px), dtype=np.uint8).reshape(h, w).astype(np.int16)
    small = _resize_nearest_np(img, 8, 9)
    bits = (small[:, 1:] > small[:, :-1]).astype(np.uint64).flatten()
    out = 0
    for b in bits:
        out = (out << 1) | int(b)
    return _to_signed64(out)


def render_text_images(
    df: DataFrame, text_col: str = "page_text", out: str = "image"
) -> DataFrame:
    """Render a text column to PNG page images via the engine raster
    — the test-data stand-in for a real page-render feed (A6 output
    or decoded multimodal payloads plug into the same binary
    column)."""
    from pdf2dataset_spark.sources.raster import render_text_png

    @pandas_udf("binary")
    def render(s: pd.Series) -> pd.Series:
        return pd.Series([render_text_png(v) for v in s])

    return df.withColumn(out, render(F.col(text_col)))


def with_image_hash(
    df: DataFrame, media_col: str = "image", out: str = "phash", kind: str = "phash"
) -> DataFrame:
    """Append a 64-bit perceptual hash column — Arrow-batched, narrow.

    Undecodable payloads hash to NULL (error isolation per value, the
    A8 convention)."""
    fn = phash64 if kind == "phash" else dhash64

    @pandas_udf("long")
    def hash_udf(col: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for s in col:
            vals = []
            for payload in s:
                try:
                    vals.append(fn(payload))
                except Exception:
                    vals.append(None)
            yield pd.Series(vals, dtype="Int64")

    return df.withColumn(out, hash_udf(F.col(media_col)))


def _band_cols(hash_col: Column, bands: int) -> list[Column]:
    width = 64 // bands
    mask = (1 << width) - 1
    return [
        (F.shiftrightunsigned(hash_col, i * width).bitwiseAND(F.lit(mask))).alias(
            f"band_{i}"
        )
        for i in range(bands)
    ]


def phash_candidate_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    hash_col: str = "phash",
    bands: int = 4,
    max_bucket: int = 64,
) -> DataFrame:
    """Within-band bucket pairing: (id_a, id_b) candidates, id_a < id_b.

    One shuffle of (id, hash, band-chunk) rows; collect_list per
    bucket capped at ``max_bucket`` so a degenerate bucket (blank
    pages) cannot go quadratic."""
    h = F.col(hash_col)
    banded = df.select(
        F.col(id_col).alias("id"), h.alias("h"),
        F.posexplode(F.array(*_band_cols(h, bands))).alias("band_idx", "band_val"),
    )
    buckets = banded.groupBy("band_idx", "band_val").agg(
        F.slice(
            F.sort_array(F.collect_list(F.struct("id", "h"))), 1, max_bucket
        ).alias("members")
    )
    pairs = (
        buckets.filter(F.size("members") > 1)
        .select(
            F.explode(
                F.filter(
                    F.flatten(
                        F.transform(
                            "members",
                            lambda a: F.transform(
                                F.col("members"),
                                lambda b: F.struct(
                                    a["id"].alias("id_a"),
                                    b["id"].alias("id_b"),
                                    a["h"].alias("h_a"),
                                    b["h"].alias("h_b"),
                                ),
                            ),
                        )
                    ),
                    lambda p: p["id_a"] < p["id_b"],
                )
            ).alias("p")
        )
        .select("p.id_a", "p.id_b", "p.h_a", "p.h_b")
        .distinct()
    )
    return pairs


def phash_neardup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    hash_col: str = "phash",
    max_hamming: int = 3,
    bands: int = 4,
    max_bucket: int = 64,
) -> DataFrame:
    """Verified near-dup pairs: Hamming(h_a, h_b) <= max_hamming.

    Exhaustive for max_hamming < bands (pigeonhole). Verification is
    pure JVM: bit_count(xor)."""
    cand = phash_candidate_pairs(df, id_col, hash_col, bands, max_bucket)
    dist = F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b")))
    return cand.select(
        "id_a", "id_b", dist.alias("hamming")
    ).filter(F.col("hamming") <= max_hamming)
