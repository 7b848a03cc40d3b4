"""Multimodal (image/audio/video) column handling (tier F, F8).

Design (SURVEY §1.2, BASELINE mandate): media payloads are opaque
``BinaryType`` columns with a typed metadata struct alongside —
schema-first, so Catalyst can prune/partition them like any column
while the bytes stay out of every plan that doesn't touch them.

The decode/feature steps run as Arrow-batched ``mapInPandas`` passes
(batch size capped via session.py so big payloads don't blow worker
memory). The actual codecs (PIL/ffmpeg/torchvision) are NOT in this
container, so the decode core is STUBBED: `decoder="fake"` is a
deterministic stand-in that parses our tagged fake payloads, and
`decoder="pil"`/`"ffmpeg"` raise ``NotImplementedError`` naming the
missing dependency. The Spark-side plumbing — schemas, UDF
signatures, batch iteration, partitioning — is real and tested.
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
    elif decoder != "fake":
        raise ValueError(f"unknown decoder {decoder!r}")


def decode_media(
    df: DataFrame, media_col: str = "media", decoder: str = "fake"
) -> DataFrame:
    """Decode payload → (width, height, n_frames, ok) via mapInPandas.

    The fake decoder parses the tagged payload; real decoders would
    return pixel buffers. Schema/batching identical either way.
    """
    _require(decoder)
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


def resize_images(
    df: DataFrame, media_col: str = "media", size: tuple[int, int] = (224, 224),
    decoder: str = "fake",
) -> DataFrame:
    """Resize stub: fake decoder rewrites the tagged dims (proving the
    batch plumbing); real decoders would re-encode pixels."""
    _require(decoder)
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
