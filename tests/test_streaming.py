"""True Structured Streaming tests (SURVEY §2 tier G rows-only
semantics): file-source micro-batches → memory sink, watermark
late-data dropping, streaming dedup, stream-static join, stateful
per-key processing, foreachBatch sink."""

from __future__ import annotations

import time

import pandas as pd
import pytest

import pyspark.sql.functions as F

from pdf2dataset_spark.io import load_table
from pdf2dataset_spark.streaming.windows import (
    tumbling_window_agg,
    watermarked_tumbling_counts,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    """events re-encoded at µs precision (readStream can't take the
    raw NANOS parquet, same as batch — see io._load_events)."""
    path = str(tmp_path_factory.mktemp("events_stream") / "events")
    load_table(spark, SF, "events").write.parquet(path)
    return path


def _stream(spark, events_dir):
    schema = spark.read.parquet(events_dir).schema
    return spark.readStream.schema(schema).parquet(events_dir)


def test_tumbling_window_stream_matches_batch(spark, events_dir):
    batch = tumbling_window_agg(
        spark.read.parquet(events_dir), "ts", "10 minutes", keys=["event_type"]
    )
    stream = tumbling_window_agg(
        _stream(spark, events_dir), "ts", "10 minutes", keys=["event_type"]
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("t_tumbling")
        .outputMode("complete")
        .start()
    )
    try:
        q.processAllAvailable()
        got = spark.sql("select * from t_tumbling").toPandas()
    finally:
        q.stop()
    want = batch.toPandas()
    key = ["window_start", "event_type"]
    got = got.sort_values(key).reset_index(drop=True)
    want = want.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_like=True)


def test_watermark_drops_late_rows(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    on_time = spark.createDataFrame(
        [(1, "2024-01-01 10:00:01"), (2, "2024-01-01 10:31:00")],
        "event_id long, ts_s string",
    ).select("event_id", F.col("ts_s").cast("timestamp").alias("ts"))
    on_time.write.parquet(str(src / "batch1"))

    stream = (
        spark.readStream.schema("event_id long, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/*")
    )
    counts = watermarked_tumbling_counts(stream, "ts", "10 minutes", "10 minutes")
    q = (
        counts.writeStream.format("memory")
        .queryName("t_watermark")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        # Late row: 10:05 is > 10 min behind max event time (10:31) →
        # its window [10:00,10:10) has already been finalized+emitted.
        late = spark.createDataFrame(
            [(3, "2024-01-01 10:05:00")], "event_id long, ts_s string"
        ).select("event_id", F.col("ts_s").cast("timestamp").alias("ts"))
        late.write.mode("append").parquet(str(src / "batch2"))
        q.processAllAvailable()
        # One more empty-ish advance so finalized windows flush.
        time.sleep(0.2)
        q.processAllAvailable()
        got = spark.sql(
            "select window_start, n_events from t_watermark order by window_start"
        ).toPandas()
    finally:
        q.stop()
    w10 = got[got.window_start == pd.Timestamp("2024-01-01 10:00:00")]
    # The on-time event at 10:00:01 is counted once; the late event at
    # 10:05 must NOT bump the finalized window.
    assert (w10.n_events <= 1).all(), f"late row leaked into finalized window:\n{got}"


def test_streaming_dedup(spark, tmp_path):
    src = tmp_path / "dsrc"
    src.mkdir()
    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (1, "a-dup"), (3, "c"), (2, "b-dup")],
        "event_id long, payload string",
    )
    df.write.parquet(str(src / "b1"))
    stream = spark.readStream.schema("event_id long, payload string").parquet(
        str(src) + "/*"
    )
    q = (
        stream.dropDuplicates(["event_id"])
        .writeStream.format("memory")
        .queryName("t_dedup")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        got = spark.sql("select event_id from t_dedup").toPandas()
    finally:
        q.stop()
    assert sorted(got.event_id.tolist()) == [1, 2, 3]


def test_stream_static_join(spark, events_dir):
    customer = load_table(spark, SF, "customer")
    stream = _stream(spark, events_dir)
    joined = stream.join(F.broadcast(customer), stream.user_id == customer.c_custkey)
    q = (
        joined.select("event_id", "c_mktsegment")
        .writeStream.format("memory")
        .queryName("t_ssjoin")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        got = spark.sql("select count(*) n from t_ssjoin").collect()[0].n
    finally:
        q.stop()
    batch_n = (
        spark.read.parquet(events_dir)
        .join(customer, F.col("user_id") == customer.c_custkey)
        .count()
    )
    assert got == batch_n > 0


def test_stateful_per_key_counts(spark, events_dir):
    """applyInPandasWithState: running per-user counts maintained in
    keyed state (G6 true-streaming path)."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def count_fn(key, pdf_iter, state: GroupState):
        total = state.get[0] if state.exists else 0
        for pdf in pdf_iter:
            total += len(pdf)
        state.update((total,))
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [total]})

    stream = _stream(spark, events_dir)
    result = stream.groupBy("user_id").applyInPandasWithState(
        count_fn,
        outputStructType="user_id long, n_events long",
        stateStructType="n long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    q = (
        result.writeStream.format("memory")
        .queryName("t_state")
        .outputMode("update")
        .start()
    )
    try:
        q.processAllAvailable()
        got = spark.sql(
            "select user_id, max(n_events) n from t_state group by user_id"
        ).toPandas()
    finally:
        q.stop()
    want = (
        spark.read.parquet(events_dir)
        .groupBy("user_id")
        .count()
        .toPandas()
        .rename(columns={"count": "n"})
    )
    merged = got.merge(want, on="user_id", suffixes=("_got", "_want"))
    assert len(merged) == len(want)
    assert (merged.n_got == merged.n_want).all()


def test_foreachbatch_idempotent_upsert(spark, tmp_path):
    """foreachBatch sink (G8): upsert-by-key into a target directory,
    idempotent under re-delivery."""
    src = tmp_path / "fsrc"
    src.mkdir()
    spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (1, 11.0)], "k long, v double"
    ).write.parquet(str(src / "b1"))

    target: dict[int, float] = {}

    def upsert(df, epoch_id):
        for row in df.groupBy("k").agg(F.max("v").alias("v")).collect():
            target[row.k] = max(row.v, target.get(row.k, float("-inf")))

    stream = spark.readStream.schema("k long, v double").parquet(str(src) + "/*")
    q = stream.writeStream.foreachBatch(upsert).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert target == {1: 11.0, 2: 20.0}


def test_drop_duplicates_within_watermark(spark, tmp_path):
    """dropDuplicatesWithinWatermark (G5 watermarked variant): state
    for a key is kept only watermark-long — the unbounded-state fix
    for infinite streams."""
    src = tmp_path / "wdsrc"
    src.mkdir()
    df = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00"), (1, "2024-01-01 10:00:30"), (2, "2024-01-01 10:01:00")],
        "event_id long, ts_s string",
    ).select("event_id", F.col("ts_s").cast("timestamp").alias("ts"))
    df.write.parquet(str(src / "b1"))
    stream = (
        spark.readStream.schema("event_id long, ts timestamp")
        .parquet(str(src) + "/*")
        .withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["event_id"])
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("t_wdedup")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        got = spark.sql("select event_id from t_wdedup").toPandas()
    finally:
        q.stop()
    assert sorted(got.event_id.tolist()) == [1, 2]


def test_rate_source_smoke(spark):
    """Built-in rate source: the zero-dependency load-generator for
    streaming pipelines (useful for throughput tests on a cluster)."""
    stream = spark.readStream.format("rate").option("rowsPerSecond", 50).load()
    q = (
        stream.selectExpr("value % 5 AS k")
        .groupBy("k")
        .count()
        .writeStream.format("memory")
        .queryName("t_rate")
        .outputMode("complete")
        .start()
    )
    try:
        import time as _t

        _t.sleep(2.5)
        q.processAllAvailable()
        n = spark.sql("select sum(count) c from t_rate").collect()[0].c or 0
    finally:
        q.stop()
    assert n >= 0  # source started and the agg pipeline ran


def test_checkpoint_restart_resumes_without_duplicates(spark, tmp_path):
    """Checkpointed restart (the streaming face of A9 resume): stop a
    query mid-stream, add data, restart from the same checkpoint —
    every input row is delivered exactly once to the sink."""
    src = tmp_path / "cksrc"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    spark.createDataFrame([(1,), (2,)], "v long").write.parquet(str(src / "b1"))
    stream = spark.readStream.schema("v long").parquet(str(src) + "/*")
    q = (
        stream.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    spark.createDataFrame([(3,), (4,)], "v long").write.mode("append").parquet(
        str(src / "b2")
    )
    stream2 = spark.readStream.schema("v long").parquet(str(src) + "/*")
    q2 = (
        stream2.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .start()
    )
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()

    got = sorted(r.v for r in spark.read.parquet(out).collect())
    assert got == [1, 2, 3, 4]  # no duplicates, no losses


def test_transform_with_state_in_pandas(spark, events_dir):
    """Spark 4's transformWithStateInPandas (G6 modern path): a
    StatefulProcessor with ValueState keeping per-user running counts
    across micro-batches.

    Environment-gated: the TWS state-server protocol needs
    google.protobuf, which is not installed in this container (no
    network — verified crash: ImportError in StateMessage_pb2). The
    applyInPandasWithState test above covers keyed streaming state on
    the available runtime."""
    pytest.importorskip(
        "google.protobuf.descriptor",
        reason="transformWithStateInPandas needs protobuf (absent here)",
    )
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )
    from pyspark.sql.types import LongType, StructField, StructType

    class CountProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self.count_state = handle.getValueState(
                "count", StructType([StructField("n", LongType())])
            )

        def handleInputRows(self, key, rows, timerValues):
            total = self.count_state.get()[0] if self.count_state.exists() else 0
            for pdf in rows:
                total += len(pdf)
            self.count_state.update((total,))
            yield pd.DataFrame({"user_id": [key[0]], "n_events": [total]})

        def close(self) -> None:
            pass

    # transformWithState requires the RocksDB state store provider.
    provider_key = "spark.sql.streaming.stateStore.providerClass"
    old_provider = spark.conf.get(provider_key, None)
    spark.conf.set(
        provider_key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    stream = _stream(spark, events_dir)
    result = stream.groupBy("user_id").transformWithStateInPandas(
        CountProcessor(),
        outputStructType="user_id long, n_events long",
        outputMode="Update",
        timeMode="None",
    )
    q = (
        result.writeStream.format("memory")
        .queryName("t_tws")
        .outputMode("update")
        .start()
    )
    try:
        q.processAllAvailable()
        got = spark.sql(
            "select user_id, max(n_events) n from t_tws group by user_id"
        ).toPandas()
    finally:
        q.stop()
        if old_provider is None:
            spark.conf.unset(provider_key)
        else:
            spark.conf.set(provider_key, old_provider)
    want = (
        spark.read.parquet(events_dir)
        .groupBy("user_id")
        .count()
        .toPandas()
        .rename(columns={"count": "n"})
    )
    merged = got.merge(want, on="user_id", suffixes=("_got", "_want"))
    assert len(merged) == len(want)
    assert (merged.n_got == merged.n_want).all()


def test_stream_stream_interval_join(spark, events_dir):
    """G10 true stream-stream join: both sides are file streams with
    watermarks; the time-bound predicate lets Spark expire state.
    Append-mode result must equal the batch interval join."""
    from pdf2dataset_spark.streaming.windows import interval_join

    ev = spark.read.parquet(events_dir)
    schema = ev.schema
    # withWatermark demands TIMESTAMP (not NTZ); session TZ is UTC so
    # the cast is value-preserving.
    sel = ["event_id", "user_id", F.col("ts").cast("timestamp").alias("ts")]

    def side(kind):
        s = spark.readStream.schema(schema).parquet(events_dir)
        return s.filter(F.col("event_type") == kind).select(*sel)

    joined = interval_join(
        side("click"), side("purchase"), "user_id", "ts", "60 MINUTE",
        watermark="2 hours",
    )
    q = (
        joined.select("event_id", "r_event_id")
        .writeStream.format("memory")
        .queryName("t_ivjoin")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        got = spark.sql("select count(*) n from t_ivjoin").collect()[0].n
    finally:
        q.stop()
    batch_n = interval_join(
        ev.filter(F.col("event_type") == "click").select(*sel),
        ev.filter(F.col("event_type") == "purchase").select(*sel),
        "user_id", "ts", "60 MINUTE",
    ).count()
    assert got == batch_n > 0


def _poll(predicate, timeout_s=60):
    deadline = time.time() + timeout_s
    while time.time() < deadline:
        if predicate():
            return True
        time.sleep(0.5)
    return False


def test_ttl_dedup_expires_and_reemits(spark, tmp_path):
    """TTL-bounded streaming keep-first dedup (stateful.ttl_dedup_legacy
    here; stateful.ttl_dedup is the transformWithState twin for
    protobuf-equipped runtimes): a key is emitted once per TTL window,
    state is REMOVED on processing-time timeout, and a key reappearing
    after expiry is re-emitted — O(working set) state on an unbounded
    key domain. processAllAvailable() cannot be used with
    processing-time timeouts (the query runs continuous empty batches
    to evaluate them), so assertions poll the sink with deadlines."""
    from pdf2dataset_spark.streaming.stateful import ttl_dedup_legacy

    src = str(tmp_path / "src")
    spark.createDataFrame(
        [(1, "a"), (2, "b"), (2, "b2")], "k long, payload string"
    ).coalesce(1).write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    out = ttl_dedup_legacy(stream, ["k"], "k long, payload string", ttl_ms=4_000)
    q = (
        out.writeStream.format("memory")
        .queryName("t_ttldedup")
        .outputMode("append")
        .start()
    )
    try:
        def rows():
            return spark.sql("select * from t_ttldedup").toPandas()

        # batch 1: keys 1 and 2 once each, despite 2 appearing twice
        assert _poll(lambda: len(rows()) >= 2), rows()
        got = rows()
        assert sorted(got.k.tolist()) == [1, 2], got

        # wait past the TTL so key 2's state is evicted, then replay it
        time.sleep(8)
        spark.createDataFrame(
            [(2, "again"), (3, "c")], "k long, payload string"
        ).coalesce(1).write.mode("append").parquet(src)
        assert _poll(lambda: len(rows()) >= 4), rows()
        got = rows()
        # 3 is new; 2 re-emitted because its state expired
        assert sorted(got.k.tolist()) == [1, 2, 2, 3], got
    finally:
        q.stop()


def test_stream_stream_full_outer_join(spark, events_dir):
    """G15 true stream-stream FULL OUTER join: matched rows equal the
    inner join's; null-padded rows appear on BOTH sides, each a
    genuine no-match row; trailing tails stay pending by watermark
    design."""
    from pdf2dataset_spark.streaming.windows import interval_join

    ev = spark.read.parquet(events_dir)
    schema = ev.schema
    sel = ["event_id", "user_id", F.col("ts").cast("timestamp").alias("ts")]

    def side(kind):
        s = spark.readStream.schema(schema).parquet(events_dir)
        return s.filter(F.col("event_type") == kind).select(*sel)

    joined = interval_join(
        side("click"), side("purchase"), "user_id", "ts", "60 MINUTE",
        watermark="2 hours", how="full_outer",
    )
    q = (
        joined.select("event_id", "r_event_id")
        .writeStream.format("memory")
        .queryName("t_foj")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        got = spark.sql("select event_id, r_event_id from t_foj").collect()
    finally:
        q.stop()
    clicks = ev.filter(F.col("event_type") == "click").select(*sel)
    buys = ev.filter(F.col("event_type") == "purchase").select(*sel)
    inner = interval_join(clicks, buys, "user_id", "ts", "60 MINUTE")
    inner_pairs = {
        (r["event_id"], r["r_event_id"])
        for r in inner.select("event_id", "r_event_id").collect()
    }
    matched = {
        (r.event_id, r.r_event_id)
        for r in got
        if r.event_id is not None and r.r_event_id is not None
    }
    null_left = {r.r_event_id for r in got if r.event_id is None}
    null_right = {r.event_id for r in got if r.r_event_id is None}
    assert matched == inner_pairs
    # unmatched-purchase rows must not be matched purchases, and
    # unmatched-click rows must not be matched clicks
    assert not (null_left & {p[1] for p in inner_pairs})
    assert not (null_right & {p[0] for p in inner_pairs})
    assert null_left or null_right, "expected some null-padded rows"


def test_ttl_dedup_state_plateaus_under_key_churn(spark, tmp_path):
    """The O(working set) claim, asserted on the state store itself:
    four micro-batches of entirely FRESH keys with a short TTL — the
    stateOperators numRowsTotal must plateau (expired keys evicted),
    not grow with total distinct keys seen. This is the difference
    between bounded state and an unbounded-key stream OOMing a year
    into production."""
    from pdf2dataset_spark.streaming.stateful import ttl_dedup_legacy

    src = str(tmp_path / "src")
    schema = "k long, payload string"
    spark.createDataFrame([(0, "seed")], schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(src)
    read_schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(read_schema).parquet(src)
    out = ttl_dedup_legacy(stream, ["k"], schema, ttl_ms=3_000)
    # explicit checkpoint + 1 s trigger: the default ASAP trigger runs
    # no-data batches continuously, churning the temporary checkpoint
    # hard enough to hit spurious state-store commit failures locally.
    q = (
        out.writeStream.format("memory")
        .queryName("t_ttlplateau")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="1 second")
        .start()
    )
    try:

        def n_rows():
            return spark.sql("select count(*) c from t_ttlplateau").first().c

        def state_rows():
            p = q.lastProgress
            ops = (p or {}).get("stateOperators") or []
            return ops[0]["numRowsTotal"] if ops else None

        batch = 10
        total = 1
        peak = 0
        for b in range(4):
            keys = [(1 + b * batch + i, f"b{b}") for i in range(batch)]
            spark.createDataFrame(keys, schema).coalesce(1).write.mode(
                "append"
            ).parquet(src)
            total += batch
            assert _poll(lambda: n_rows() >= total, timeout_s=30), (
                b,
                n_rows(),
                total,
            )
            s = state_rows()
            if s is not None:
                peak = max(peak, s)
            # let this batch's keys age past the TTL before the next
            time.sleep(4.5)
        # 41 distinct keys seen; with eviction the store never holds
        # anywhere near all of them at once.
        def settled():
            s = state_rows()
            return s is not None and s <= 2 * batch + 1

        assert _poll(settled, timeout_s=30), q.lastProgress
        assert peak <= 3 * batch, peak  # never accumulated all batches
    finally:
        q.stop()


def test_streaming_curation_pipeline_end_to_end(spark, tmp_path):
    """The batch curation operators (quality gate, hash dedup) applied
    unchanged to a file STREAM, with a checkpointed parquet sink —
    i.e. the 100 TB ingest path: curate documents as they arrive
    instead of re-scanning the corpus."""
    from pdf2dataset_spark.operators import dedup as dd
    from pdf2dataset_spark.operators import text as tx

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    good = "the quick brown fox jumps over the lazy dog again and again"
    spark.createDataFrame(
        [(1, good), (2, "tiny"), (3, good)],  # 3 dups 1; 2 fails gate
        "doc_id long, text string",
    ).coalesce(1).write.parquet(src)

    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    gated = tx.quality_filter(stream, "text", min_tokens=5).select(
        "doc_id", "text"
    )
    curated = dd.exact_dedup(
        gated, "text", "doc_id", keep_hash=False, strategy="streaming"
    )
    q = (
        curated.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.read.parquet(out).collect()
    assert len(got) == 1 and got[0].doc_id == 1


def test_stream_stream_left_outer_join(spark, events_dir):
    """G12 true stream-stream LEFT OUTER join: matched rows equal the
    inner join's; null-padded rows appear only for left rows old
    enough that the final watermark proves no match can arrive, and
    every one of them is a genuine no-match row (subset of the batch
    anti side). The trailing tail of unmatched clicks stays pending by
    design — watermark semantics, not data loss."""
    from pdf2dataset_spark.streaming.windows import interval_join

    ev = spark.read.parquet(events_dir)
    schema = ev.schema
    sel = ["event_id", "user_id", F.col("ts").cast("timestamp").alias("ts")]

    def side(kind):
        s = spark.readStream.schema(schema).parquet(events_dir)
        return s.filter(F.col("event_type") == kind).select(*sel)

    joined = interval_join(
        side("click"), side("purchase"), "user_id", "ts", "60 MINUTE",
        watermark="2 hours", how="left_outer",
    )
    q = (
        joined.select("event_id", "r_event_id")
        .writeStream.format("memory")
        .queryName("t_loj")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        got = spark.sql("select event_id, r_event_id from t_loj").collect()
    finally:
        q.stop()
    clicks = ev.filter(F.col("event_type") == "click").select(*sel)
    buys = ev.filter(F.col("event_type") == "purchase").select(*sel)
    inner = interval_join(clicks, buys, "user_id", "ts", "60 MINUTE")
    inner_pairs = {
        (r["event_id"], r["r_event_id"])
        for r in inner.select("event_id", "r_event_id").collect()
    }
    matched = {(r.event_id, r.r_event_id) for r in got if r.r_event_id is not None}
    nulls = {r.event_id for r in got if r.r_event_id is None}
    assert matched == inner_pairs  # inner results identical & complete
    # null-padded rows: only for clicks with NO purchase within the hour
    matched_clicks = {p[0] for p in inner_pairs}
    assert nulls, "expected some null-padded unmatched clicks"
    assert not (nulls & matched_clicks)
