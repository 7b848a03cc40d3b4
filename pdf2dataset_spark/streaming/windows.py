"""Windowed aggregation helpers shared by batch and streaming.

Each helper takes any DataFrame — `spark.read` or `spark.readStream`
— and returns the same logical plan; Structured Streaming reuses the
batch operators with incremental state. Streaming-only knobs
(watermarks, output modes) are applied by the caller (see
tests/test_streaming.py and queries/tier_g.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_window_agg(
    df: DataFrame,
    ts_col: str,
    width: str,
    keys: list[str] | None = None,
    value_col: str = "value",
) -> DataFrame:
    """Count + decimal-exact value sum per tumbling window (G1)."""
    keys = keys or []
    return (
        df.groupBy(F.window(ts_col, width), *keys)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col(value_col).cast("decimal(12,2)"))
            .cast("double")
            .alias("total_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            *keys,
            "n_events",
            "total_value",
        )
        .orderBy("window_start", *keys)
    )


def sliding_window_counts(
    df: DataFrame, ts_col: str, width: str, slide: str
) -> DataFrame:
    """Event count per sliding window (G2)."""
    return (
        df.groupBy(F.window(ts_col, width, slide))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("window.start").alias("window_start"), "n_events")
        .orderBy("window_start")
    )


def session_window_agg(
    df: DataFrame, ts_col: str, gap: str, keys: list[str]
) -> DataFrame:
    """Per-key session windows with a fixed inactivity gap (G3).
    Session start is the first event's timestamp (matches the ANSI
    gap-detection rewrite used as the oracle)."""
    return (
        df.groupBy(F.session_window(ts_col, gap), *keys)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            *keys,
            F.col("session_window.start").alias("session_start"),
            "n_events",
        )
        .orderBy(*keys, "session_start")
    )


def watermarked_tumbling_counts(
    df: DataFrame, ts_col: str, width: str, watermark: str
) -> DataFrame:
    """Watermarked tumbling counts (G4): in streaming, rows later than
    `watermark` behind the max seen event time are dropped and windows
    finalize; in batch the watermark is a no-op."""
    return (
        df.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, width))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("window.start").alias("window_start"), "n_events")
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts_col: str,
    bound: str,
    watermark: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Time-bounded (interval) join: pair each left row with right
    rows of the same ``key`` whose timestamp falls in
    [left.ts, left.ts + bound). This is Spark's canonical
    stream-stream join shape — the time bound is what lets the
    engine expire join state; pass ``watermark`` when both sides are
    streams (required for state cleanup; a no-op in batch).

    ``how='left_outer'`` keeps unmatched left rows (right columns
    null). In streaming, outer rows are emitted only once the
    watermark passes the join bound — state-safe, but trailing
    unmatched rows stay pending until the watermark advances past
    them (asserted in tests/test_streaming.py).

    Scale posture: the equi key shuffles both sides once; the range
    predicate evaluates inside the joined partitions, and in
    streaming the watermark bounds state to O(bound window) per key.
    """
    l = left.select(
        F.col(key).alias("l_key"),
        F.col(ts_col).alias("l_ts"),
        *[c for c in left.columns if c not in (key, ts_col)],
    )
    r = right.select(
        F.col(key).alias("r_key"),
        F.col(ts_col).alias("r_ts"),
        *[
            F.col(c).alias(f"r_{c}")
            for c in right.columns
            if c not in (key, ts_col)
        ],
    )
    if watermark is not None:
        l = l.withWatermark("l_ts", watermark)
        r = r.withWatermark("r_ts", watermark)
    return l.join(
        r,
        (F.col("l_key") == F.col("r_key"))
        & (F.col("r_ts") >= F.col("l_ts"))
        & (F.col("r_ts") < F.col("l_ts") + F.expr(f"INTERVAL {bound}")),
        how,
    )
