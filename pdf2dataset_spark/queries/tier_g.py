"""Tier G — streaming (SURVEY.md §2 tier G).

The reference is batch-only; streaming is mandated extension surface.
Spark's windowing/dedup/join operators are engine-shared between
batch and Structured Streaming, so each operator is oracle-checked
here in batch mode on `events` and re-exercised as a true readStream
→ memory-sink flow in tests/test_streaming.py (watermarks, state,
foreachBatch — the streaming-only semantics — live there).

The same plans run unchanged under `readStream`; helpers in
pdf2dataset_spark/streaming/windows.py wrap them for both modes.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from pdf2dataset_spark.queries import query
from pdf2dataset_spark.queries._util import maybe_broadcast, t
from pdf2dataset_spark.streaming.windows import (
    session_window_agg,
    sliding_window_counts,
    tumbling_window_agg,
)


# --------------------------------------------------------------- G1
@query(
    "g1_tumbling_window",
    sql="""
    SELECT time_bucket(INTERVAL '10 minutes', ts) AS window_start,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
    tier="G",
)
def g1_tumbling_window(spark, sf_dir):
    """Tumbling 10-minute window aggregation (G1). Spark's window()
    and DuckDB's time_bucket share epoch-aligned bucket origins."""
    e = t(spark, sf_dir, "events")
    return tumbling_window_agg(e, "ts", "10 minutes", keys=["event_type"])


# --------------------------------------------------------------- G2
@query(
    "g2_sliding_window",
    sql="""
    SELECT window_start, COUNT(*) AS n_events
    FROM (
      SELECT unnest([time_bucket(INTERVAL '5 minutes', ts),
                     time_bucket(INTERVAL '5 minutes', ts) - INTERVAL 5 MINUTES])
               AS window_start
      FROM events
    )
    GROUP BY 1
    ORDER BY 1
    """,
    tier="G",
)
def g2_sliding_window(spark, sf_dir):
    """Sliding windows: 10-minute length, 5-minute slide → every
    event lands in exactly two windows (G2)."""
    e = t(spark, sf_dir, "events")
    return sliding_window_counts(e, "ts", "10 minutes", "5 minutes")


# --------------------------------------------------------------- G3
@query(
    "g3_session_window",
    sql="""
    WITH gaps AS (
      SELECT user_id, ts,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL 5 MINUTES
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ),
    sess AS (
      SELECT user_id, ts,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM gaps
    )
    SELECT user_id, MIN(ts) AS session_start, COUNT(*) AS n_events
    FROM sess
    GROUP BY user_id, session_id
    ORDER BY user_id, session_start
    """,
    tier="G",
)
def g3_session_window(spark, sf_dir):
    """Session windows with a 5-minute gap (G3): Spark's native
    session_window vs the ANSI gap-detection rewrite — session start
    equals the first event's timestamp in both."""
    e = t(spark, sf_dir, "events")
    return session_window_agg(e, "ts", "5 minutes", keys=["user_id"])


# --------------------------------------------------------------- G4
@query("g4_watermark_passthrough", sql=None, tier="G")
def g4_watermark_passthrough(spark, sf_dir):
    """Watermark + windowed count (G4). In batch, withWatermark is a
    no-op (documented Spark semantics) so this is rows-only; the
    late-row-dropping behavior is asserted in the real streaming test
    (tests/test_streaming.py::test_watermark_drops_late_rows)."""
    e = t(spark, sf_dir, "events")
    return (
        e.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "10 minutes"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("window.start").alias("window_start"), "n_events")
    )


# --------------------------------------------------------------- G5
@query(
    "g5_streaming_dedup",
    sql="""
    SELECT user_id, event_type, event_id AS first_event
    FROM (
      SELECT user_id, event_type, event_id,
             row_number() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts, event_id) AS rn
      FROM events
    )
    WHERE rn = 1
    """,
    tier="G",
)
def g5_streaming_dedup(spark, sf_dir):
    """Keyed dedup keep-earliest (G5): the batch contract matching
    streaming dropDuplicates/dropDuplicatesWithinWatermark (which are
    arrival-order 'first'; event-time-deterministic here via ranked
    window)."""
    e = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type", F.col("event_id").alias("first_event"))
    )


# --------------------------------------------------------------- G6
@query("g6_stateful_per_key", sql=None, tier="G")
def g6_stateful_per_key(spark, sf_dir):
    """Custom stateful per-key processing (G6): batch analog via
    applyInPandas computing per-user event count, value sum and max
    inter-event gap — the same keyed-state shape
    transformWithStateInPandas maintains incrementally in streaming
    (see tests/test_streaming.py). Rows-only: float gap arithmetic
    via pandas."""
    import pandas as pd

    e = t(spark, sf_dir, "events")

    def per_user(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"])
        gaps = pdf["ts"].diff().dt.total_seconds().dropna()
        return pd.DataFrame(
            {
                "user_id": [pdf["user_id"].iloc[0]],
                "n_events": [len(pdf)],
                "max_gap_s": [float(gaps.max()) if len(gaps) else 0.0],
            }
        )

    return e.groupBy("user_id").applyInPandas(
        per_user, schema="user_id long, n_events long, max_gap_s double"
    )


# --------------------------------------------------------------- G7
@query(
    "g7_stream_static_join",
    sql="""
    SELECT e.event_id, e.user_id, c.c_mktsegment
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    """,
    tier="G",
)
def g7_stream_static_join(spark, sf_dir):
    """Stream–static enrichment join (G7): events against a broadcast
    dimension; identical plan under readStream. The static side is
    corpus-growing customer, so the hint is size-guarded
    (maybe_broadcast on the BATCH side only — the estimate never
    touches the stream)."""
    e = t(spark, sf_dir, "events")
    c = t(spark, sf_dir, "customer")
    return e.join(maybe_broadcast(c), e.user_id == c.c_custkey).select(
        "event_id", "user_id", "c_mktsegment"
    )


# --------------------------------------------------------------- G9
@query(
    "g9_reaggregation_rollup",
    sql="""
    WITH ten_min AS (
      SELECT time_bucket(INTERVAL '10 minutes', ts) AS b10,
             event_type,
             COUNT(*) AS n,
             CAST(SUM(CAST(round(value*100,0) AS BIGINT)) AS DOUBLE)/100 AS v
      FROM events
      GROUP BY 1, 2
    )
    SELECT time_bucket(INTERVAL '1 hour', b10) AS hour_start,
           event_type,
           CAST(SUM(n) AS BIGINT) AS n_events,
           CAST(SUM(CAST(round(v*100,0) AS BIGINT)) AS DOUBLE)/100 AS total_value
    FROM ten_min
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
    tier="G",
)
def g9_reaggregation_rollup(spark, sf_dir):
    """Hypertable-style continuous-aggregate rollup (G extension):
    hourly totals computed FROM the 10-minute aggregate, not the raw
    events — proving count/sum are re-aggregable, the property that
    lets a 100 TB pipeline keep multi-resolution rollups incrementally
    instead of rescanning raw data. Cents-exact so the two-level sum
    equals the one-level sum bitwise."""
    e = t(spark, sf_dir, "events")
    v_cents = F.round(F.col("value") * 100, 0).cast("bigint")
    ten_min = (
        e.groupBy(F.window("ts", "10 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.sum(v_cents).cast("double") / 100).alias("v"),
        )
        .select(F.col("w.start").alias("b10"), "event_type", "n", "v")
    )
    return (
        ten_min.groupBy(
            F.window("b10", "1 hour").alias("w"), "event_type"
        )
        .agg(
            F.sum("n").alias("n_events"),
            (
                F.sum(F.round(F.col("v") * 100, 0).cast("bigint")).cast("double")
                / 100
            ).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("hour_start"),
            "event_type",
            "n_events",
            "total_value",
        )
        .orderBy("hour_start", "event_type")
    )


# -------------------------------------------------------------- G10
@query(
    "g10_interval_join",
    sql="""
    SELECT a.event_id AS click_id, b.event_id AS purchase_id,
           a.user_id AS user_id
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND b.ts >= a.ts AND b.ts < a.ts + INTERVAL 60 MINUTE
    WHERE a.event_type = 'click' AND b.event_type = 'purchase'
    ORDER BY click_id, purchase_id
    """,
    tier="G",
)
def g10_interval_join(spark, sf_dir):
    """Stream-stream interval join analog (G10): clicks paired with
    same-user purchases within the following hour. The time-bound
    predicate is exactly what makes the streaming version's state
    finite; the batch plan is an equi-join on user_id with the range
    condition applied inside the co-partitioned join. Streaming
    parity (two file streams + watermarks) in
    tests/test_streaming.py::test_stream_stream_interval_join."""
    from pdf2dataset_spark.streaming.windows import interval_join

    e = t(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    buys = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    return (
        interval_join(clicks, buys, "user_id", "ts", "60 MINUTE")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("r_event_id").alias("purchase_id"),
            F.col("l_key").alias("user_id"),
        )
        .orderBy("click_id", "purchase_id")
    )


# --------------------------------------------------------------- G12
@query(
    "g12_interval_left_outer_join",
    sql="""
    SELECT a.event_id AS click_id, b.event_id AS purchase_id,
           a.user_id AS user_id
    FROM (SELECT * FROM events WHERE event_type = 'click') a
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') b
      ON a.user_id = b.user_id
     AND b.ts >= a.ts AND b.ts < a.ts + INTERVAL 60 MINUTE
    ORDER BY click_id, purchase_id
    """,
    tier="G",
)
def g12_interval_left_outer_join(spark, sf_dir):
    """Stream-stream LEFT OUTER interval join analog (G12): every
    click, paired with same-user purchases in the following hour or
    null-padded if none — the attribution query where unconverted
    impressions matter as much as conversions. In streaming, the
    outer (null) rows emit only after the watermark passes the join
    bound, which is what keeps state finite; parity + pending-tail
    semantics asserted in
    tests/test_streaming.py::test_stream_stream_left_outer_join."""
    from pdf2dataset_spark.streaming.windows import interval_join

    e = t(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    buys = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    return (
        interval_join(
            clicks, buys, "user_id", "ts", "60 MINUTE", how="left_outer"
        )
        .select(
            F.col("event_id").alias("click_id"),
            F.col("r_event_id").alias("purchase_id"),
            F.col("l_key").alias("user_id"),
        )
        .orderBy("click_id", "purchase_id")
    )


# --------------------------------------------------------------- G13
@query(
    "g13_trending_topk_sliding",
    sql="""
    WITH buckets AS (
      SELECT unnest(generate_series(
               time_bucket(INTERVAL 30 MINUTE, ts) - INTERVAL 30 MINUTE,
               time_bucket(INTERVAL 30 MINUTE, ts),
               INTERVAL 30 MINUTE)) AS window_start,
             event_type
      FROM events
    ), counted AS (
      SELECT window_start, event_type, count(*) AS n_events
      FROM buckets GROUP BY 1, 2
    ), ranked AS (
      SELECT window_start, event_type, n_events,
             row_number() OVER (
               PARTITION BY window_start
               ORDER BY n_events DESC, event_type
             ) AS rnk
      FROM counted
    )
    SELECT window_start, event_type, n_events, rnk
    FROM ranked WHERE rnk <= 3
    ORDER BY window_start, rnk
    """,
    tier="G",
)
def g13_trending_topk_sliding(spark, sf_dir):
    """Trending items (G13): top-3 event types per 60-minute sliding
    window (slide 30 min) — the live-leaderboard workload. The batch
    analog shown here is the oracle; the streaming form is the same
    sliding-window count (G2) with the rank applied per finalized
    window downstream (rank-over-updating-state isn't append-safe, so
    production streams rank in the serving layer or foreachBatch).
    Sliding windows expand each event into exactly
    width/slide = 2 buckets (Spark's window() Expand) — mirrored in
    the oracle via generate_series; ties break on event_type for
    engine-invariant top-k."""
    e = t(spark, sf_dir, "events")
    counted = (
        e.groupBy(
            F.window("ts", "60 minutes", "30 minutes"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n_events",
        )
    )
    w = Window.partitionBy("window_start").orderBy(
        F.desc("n_events"), "event_type"
    )
    return (
        counted.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .orderBy("window_start", "rnk")
    )


# --------------------------------------------------------------- G15
@query(
    "g15_interval_full_outer_join",
    sql="""
    SELECT a.event_id AS click_id, b.event_id AS purchase_id,
           COALESCE(a.user_id, b.user_id) AS user_id
    FROM (SELECT * FROM events WHERE event_type = 'click') a
    FULL JOIN (SELECT * FROM events WHERE event_type = 'purchase') b
      ON a.user_id = b.user_id
     AND b.ts >= a.ts AND b.ts < a.ts + INTERVAL 60 MINUTE
    ORDER BY click_id, purchase_id
    """,
    tier="G",
)
def g15_interval_full_outer_join(spark, sf_dir):
    """Stream-stream FULL OUTER interval join analog (G15): clicks
    and purchases both survive unmatched — the reconciliation query
    (which impressions never converted AND which purchases have no
    attributable impression). Completes the interval-join mode matrix
    (inner g10, left g12, full g15); in streaming both sides need
    watermarks and outer rows emit after the watermark passes the
    bound. True-stream parity asserted in tests/test_streaming.py."""
    from pdf2dataset_spark.streaming.windows import interval_join

    e = t(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    buys = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    return (
        interval_join(
            clicks, buys, "user_id", "ts", "60 MINUTE", how="full_outer"
        )
        .select(
            F.col("event_id").alias("click_id"),
            F.col("r_event_id").alias("purchase_id"),
            F.coalesce(F.col("l_key"), F.col("r_key")).alias("user_id"),
        )
        .orderBy("click_id", "purchase_id")
    )
