"""Multimodal (image/audio/video) column handling (tier F, F8).

Design (SURVEY §1.2, BASELINE mandate): media payloads are opaque
``BinaryType`` columns with a typed metadata struct alongside —
schema-first, so Catalyst can prune/partition them like any column
while the bytes stay out of every plan that doesn't touch them.

The decode/feature steps run as Arrow-batched ``mapInPandas`` passes
(batch size capped via session.py so big payloads don't blow worker
memory). Decoders: ``decoder="engine"`` is REAL for still images
with zero native deps (engine PNG + baseline JPEG, gray or color —
see ``operators.image_hash.decode_image``); ``decoder="fake"`` is a
deterministic stand-in that parses tagged fake payloads (for video/
audio pipeline tests); `decoder="pil"`/`"ffmpeg"` raise
``NotImplementedError`` naming the missing dependency. The
Spark-side plumbing — schemas, UDF signatures, batch iteration,
partitioning — is identical for all of them.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType(
    [
        T.StructField("format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
    ]
)


def attach_fake_media(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic fake media payloads for pipeline tests: the
    payload encodes (format, width, height, frames) derived from the
    row, so decode is verifiable without real codecs."""
    w = (F.crc32(F.col(text_col).cast("binary")) % 1024 + 16).cast("int")
    h = (F.crc32(F.upper(F.col(text_col)).cast("binary")) % 768 + 16).cast("int")
    n = (F.col(id_col) % 30 + 1).cast("int")
    payload = F.concat(
        F.lit("FAKEMEDIA:"),
        F.concat_ws(":", w, h, n),
        F.lit(":"),
        F.col(text_col),
    ).cast("binary")
    meta = F.struct(
        F.lit("fake").alias("format"),
        w.alias("width"),
        h.alias("height"),
        n.alias("n_frames"),
    )
    return df.withColumn("media", payload).withColumn("media_meta", meta)


def _require(decoder: str) -> None:
    if decoder == "pil":
        try:
            import PIL  # noqa: F401
        except ImportError as e:
            raise NotImplementedError(
                "image decode requires PIL/Pillow — not installed here; "
                "use decoder='fake' for the deterministic stub"
            ) from e
    elif decoder == "ffmpeg":
        raise NotImplementedError(
            "audio/video decode requires ffmpeg bindings — not installed here; "
            "use decoder='fake' for the deterministic stub"
        )
    elif decoder not in ("fake", "engine"):
        raise ValueError(f"unknown decoder {decoder!r}")


def decode_media(
    df: DataFrame, media_col: str = "media", decoder: str = "fake"
) -> DataFrame:
    """Decode payload → (width, height, n_frames, ok) via mapInPandas.

    ``decoder="engine"`` is REAL for still images with zero native
    deps: engine PNGs and baseline JPEGs (gray or YCbCr up to 2x2
    sampling — the `embedded_image` feature's /DCTDecode payloads)
    decode through :func:`operators.image_hash.decode_image`;
    undecodable payloads get ok=False, never an exception (A8).
    The fake decoder parses the tagged test payloads; pil/ffmpeg
    raise NotImplementedError naming the missing dependency.
    Schema/batching identical for every decoder.
    """
    _require(decoder)
    if decoder == "engine":
        return _decode_media_engine(df, media_col)
    schema = T.StructType(
        df.schema.fields
        + [
            T.StructField("dec_width", T.IntegerType()),
            T.StructField("dec_height", T.IntegerType()),
            T.StructField("dec_frames", T.IntegerType()),
            T.StructField("dec_ok", T.BooleanType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            widths, heights, frames, oks = [], [], [], []
            for payload in pdf[media_col]:
                try:
                    head = bytes(payload).split(b":", 4)
                    assert head[0] == b"FAKEMEDIA"
                    widths.append(int(head[1]))
                    heights.append(int(head[2]))
                    frames.append(int(head[3]))
                    oks.append(True)
                except Exception:
                    widths.append(None)
                    heights.append(None)
                    frames.append(None)
                    oks.append(False)
            out = pdf.copy()
            out["dec_width"] = pd.array(widths, dtype="Int32")
            out["dec_height"] = pd.array(heights, dtype="Int32")
            out["dec_frames"] = pd.array(frames, dtype="Int32")
            out["dec_ok"] = oks
            yield out

    return df.mapInPandas(run, schema=schema)


def _decode_media_engine(df: DataFrame, media_col: str) -> DataFrame:
    schema = T.StructType(
        df.schema.fields
        + [
            T.StructField("dec_width", T.IntegerType()),
            T.StructField("dec_height", T.IntegerType()),
            T.StructField("dec_frames", T.IntegerType()),
            T.StructField("dec_ok", T.BooleanType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pdf2dataset_spark.operators.image_hash import decode_image

        for pdf in batches:
            widths, heights, frames, oks = [], [], [], []
            for payload in pdf[media_col]:
                try:
                    w, h, _px = decode_image(bytes(payload))
                    widths.append(w)
                    heights.append(h)
                    frames.append(1)
                    oks.append(True)
                except Exception:
                    widths.append(None)
                    heights.append(None)
                    frames.append(None)
                    oks.append(False)
            out = pdf.copy()
            out["dec_width"] = pd.array(widths, dtype="Int32")
            out["dec_height"] = pd.array(heights, dtype="Int32")
            out["dec_frames"] = pd.array(frames, dtype="Int32")
            out["dec_ok"] = oks
            yield out

    return df.mapInPandas(run, schema=schema)


def resize_images(
    df: DataFrame, media_col: str = "media", size: tuple[int, int] = (224, 224),
    decoder: str = "fake",
) -> DataFrame:
    """Resize stub: fake decoder rewrites the tagged dims (proving the
    batch plumbing); real decoders would re-encode pixels."""
    _require(decoder)
    if decoder != "fake":
        # the rewrite below only makes sense for tagged fake payloads —
        # applying it to real PNG/JPEG bytes would silently corrupt them
        raise NotImplementedError(
            f"resize_images supports only decoder='fake'; a real resize "
            f"for decoder={decoder!r} needs a decode+re-encode pass "
            "(use decode_media + your own encoder)"
        )
    w, h = size
    tail = F.substring_index(F.col(media_col).cast("string"), ":", -1)
    payload = F.concat(
        F.lit(f"FAKEMEDIA:{w}:{h}:1:"), tail
    ).cast("binary")
    meta = F.struct(
        F.lit("fake").alias("format"),
        F.lit(w).alias("width"),
        F.lit(h).alias("height"),
        F.lit(1).alias("n_frames"),
    )
    return df.withColumn(media_col, payload).withColumn("media_meta", meta)


def sample_frames(
    df: DataFrame, every_n: int = 10, meta_col: str = "media_meta"
) -> DataFrame:
    """Frame sampling: one row per sampled frame index — pure
    relational fan-out (explode over a sequence), no Python."""
    idx = F.sequence(
        F.lit(1), F.col(f"{meta_col}.n_frames"), F.lit(every_n)
    )
    return df.withColumn("frame_index", F.explode(idx))
