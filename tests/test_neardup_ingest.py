"""Streaming near-dup ingest (G×F) + shard materialization tests."""

from __future__ import annotations

import pyspark.sql.functions as F

from pdf2dataset_spark.streaming.neardup import neardup_ingest

BASE = (
    "the quick brown fox jumps over the lazy dog and keeps running "
    "through the quiet green field toward the distant river bank"
)
OTHER = (
    "completely different content about spark engines shuffling data "
    "across executors with adaptive query execution and broadcast joins"
)
THIRD = (
    "a third unrelated document discussing parquet row groups column "
    "pruning predicate pushdown and vectorized readers in depth"
)


def _near(text: str) -> str:
    return " ".join(text.split(" ")[:-1])  # drop last word


def test_streaming_neardup_ingest_across_batches(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    store = str(tmp_path / "buckets")
    ckpt = str(tmp_path / "ckpt")
    schema = "doc_id long, text string"

    # batch 1: two distinct docs
    spark.createDataFrame(
        [(1, BASE), (2, OTHER)], schema
    ).coalesce(1).write.mode("append").parquet(src)
    stream = spark.readStream.schema(
        spark.read.parquet(src).schema
    ).parquet(src)
    q = neardup_ingest(stream, out, store, ckpt)
    try:
        q.processAllAvailable()
        got = spark.read.parquet(out)
        assert sorted(r.doc_id for r in got.collect()) == [1, 2]

        # batch 2: near-copy of 1 (cross-batch dup), one new doc,
        # plus an intra-batch near-pair (5 ~ 6) → greedy keeps 5
        spark.createDataFrame(
            [(3, _near(BASE)), (4, THIRD), (5, "x " + THIRD), (6, "y " + THIRD)],
            schema,
        ).coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
        got = sorted(r.doc_id for r in spark.read.parquet(out).collect())
        # 3 dropped (near-dup of 1 via bucket store); 4 kept; of the
        # 4~5~6 near-family the smallest (4) survives greedy+store
        assert 3 not in got
        assert 4 in got

        # batch 3: near-copy of the RETAINED 4-family → dropped via
        # the bucket store even though its direct twin may not be 4
        spark.createDataFrame(
            [(7, _near(THIRD)), (8, BASE.upper() + " unique tail here")],
            schema,
        ).coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
        got = sorted(r.doc_id for r in spark.read.parquet(out).collect())
        assert 7 not in got
        assert 8 in got  # uppercase → different shingles → retained
    finally:
        q.stop()

    # bucket store only holds retained docs' bands
    store_ids = {
        r.doc_id
        for r in spark.read.parquet(store).select("doc_id").distinct().collect()
    }
    assert store_ids == set(got)


def test_shard_write_read_manifest(spark, tmp_path):
    from pdf2dataset_spark.operators.shards import (
        read_manifest,
        read_shard,
        write_shards,
    )

    docs = spark.range(0, 100).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 7 + 1).alias("n_tokens"),
        (F.col("id") % 4).alias("shard_id"),
    )
    out = str(tmp_path / "shards")
    write_shards(docs, out)
    man = read_manifest(spark, out)
    assert man.count() == 4
    tot = man.agg(
        F.sum("n_docs").alias("d"), F.sum("n_tokens").alias("t")
    ).first()
    want = docs.agg(
        F.count(F.lit(1)).alias("d"), F.sum("n_tokens").alias("t")
    ).first()
    assert (tot.d, tot.t) == (want.d, want.t)
    s2 = read_shard(spark, out, 2)
    assert s2.count() == 25
    assert set(r.doc_id % 4 for r in s2.collect()) == {2}
    # loader-side partition pruning must reach the scan
    plan = s2._jdf.queryExecution().executedPlan().toString()
    assert "shard_id" in plan


def test_streaming_semantic_ingest_across_batches(spark, tmp_path):
    """Embedding-space streaming dedup: within-batch near-dups keep
    the lowest id; cross-batch near-dups of RETAINED vectors drop via
    the cell-partitioned vector store; unrelated vectors pass."""
    import numpy as np

    from pdf2dataset_spark.streaming.semdedup import semantic_ingest

    rng = np.random.default_rng(11)
    base = rng.standard_normal((8, 16)).astype("float32")

    def rows(ids_vecs):
        return spark.createDataFrame(
            [(i, [float(x) for x in v]) for i, v in ids_vecs],
            "doc_id long, embedding array<float>",
        )

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    store = str(tmp_path / "vecstore")
    ckpt = str(tmp_path / "ckpt")
    cents = rows([(i, base[i]) for i in range(4)]).select(
        F.col("doc_id").alias("cent_id"), F.col("embedding").alias("cent_vec")
    )

    # batch 1: docs 1,2 distinct; doc 3 = scaled copy of doc 1 (dup)
    rows([(1, base[4]), (2, base[5]), (3, base[4] * 2)]).coalesce(
        1
    ).write.mode("append").parquet(src)
    stream = spark.readStream.schema(
        spark.read.parquet(src).schema
    ).parquet(src)
    q = semantic_ingest(stream, out, store, ckpt, cents, threshold=0.95)
    try:
        q.processAllAvailable()
        got = sorted(r.doc_id for r in spark.read.parquet(out).collect())
        assert got == [1, 2]

        # batch 2: doc 4 = near-copy of retained 1 (cross-batch drop);
        # doc 5 new; doc 6 = copy of 5 (within-batch drop)
        near1 = base[4] + rng.standard_normal(16).astype("float32") * 0.01
        rows([(4, near1), (5, base[6]), (6, base[6] * 3)]).coalesce(
            1
        ).write.mode("append").parquet(src)
        q.processAllAvailable()
        got = sorted(r.doc_id for r in spark.read.parquet(out).collect())
        assert got == [1, 2, 5], got

        # batch 3: near-copy of retained 5 drops; fresh doc passes
        near5 = base[6] * 0.5
        rows([(7, near5), (8, base[7])]).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        q.processAllAvailable()
        got = sorted(r.doc_id for r in spark.read.parquet(out).collect())
        assert got == [1, 2, 5, 8], got
        # store is partitioned by cell and holds only retained vectors
        st = spark.read.parquet(store)
        assert set(st.columns) >= {"doc_id", "embedding", "list_id"}
        assert {r.doc_id for r in st.select("doc_id").distinct().collect()} == {
            1, 2, 5, 8,
        }
    finally:
        q.stop()


def test_semantic_ingest_checkpoint_restart_no_duplicates(spark, tmp_path):
    """Stop the semantic ingest, add data, restart from the same
    checkpoint + stores: already-ingested files are not reprocessed
    (no duplicate output rows, no duplicate store rows) and the
    restarted query still deduplicates against pre-restart state."""
    import numpy as np

    from pdf2dataset_spark.streaming.semdedup import semantic_ingest

    rng = np.random.default_rng(21)
    base = rng.standard_normal((6, 16)).astype("float32")

    def rows(ids_vecs):
        return spark.createDataFrame(
            [(i, [float(x) for x in v]) for i, v in ids_vecs],
            "doc_id long, embedding array<float>",
        )

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    store = str(tmp_path / "vecstore")
    ckpt = str(tmp_path / "ckpt")
    cents = rows([(i, base[i]) for i in range(3)]).select(
        F.col("doc_id").alias("cent_id"), F.col("embedding").alias("cent_vec")
    )

    rows([(1, base[3]), (2, base[4])]).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    schema = spark.read.parquet(src).schema

    def start():
        return semantic_ingest(
            spark.readStream.schema(schema).parquet(src),
            out, store, ckpt, cents, threshold=0.95,
        )

    q = start()
    q.processAllAvailable()
    q.stop()

    # new batch AFTER the stop: one near-dup of retained 1, one new
    rows([(3, base[3] * 2), (4, base[5])]).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    q = start()
    try:
        q.processAllAvailable()
        got = [r.doc_id for r in spark.read.parquet(out).collect()]
        assert sorted(got) == [1, 2, 4], got  # 3 dropped, nothing re-run
        assert len(got) == len(set(got))  # no duplicate output rows
        st = spark.read.parquet(store).select("doc_id", "list_id").collect()
        assert len(st) == len({(r.doc_id, r.list_id) for r in st})
    finally:
        q.stop()


def test_streaming_boilerplate_ingest_across_batches(spark, tmp_path):
    """streaming/boilerplate.py: cumulative paragraph counts cross
    the min_docs threshold ACROSS micro-batches; suppression then
    holds store-driven even when the triggering batch carries a
    single copy."""
    from pdf2dataset_spark.streaming.boilerplate import boilerplate_ingest

    src = str(tmp_path / "bp_src")
    out = str(tmp_path / "bp_out")
    store = str(tmp_path / "bp_counts")
    ckpt = str(tmp_path / "bp_ckpt")
    schema = "doc_id long, text string"
    hdr = "Subscribe to our newsletter"

    def doc(i):  # unique letter-only body (digit-strip-safe)
        body = "body " + "x" * (i + 1) + " unique"
        return (i, f"{hdr}\n{body}")

    # batch 1: 3 docs — header count 3 < 4, everything survives
    spark.createDataFrame([doc(0), doc(1), doc(2)], schema) \
        .coalesce(1).write.mode("append").parquet(src)
    stream = spark.readStream.schema(
        spark.read.parquet(src).schema).parquet(src)
    q = boilerplate_ingest(stream, out, store, ckpt, min_docs=4)
    try:
        q.processAllAvailable()
        got = {r.doc_id: r.text for r in spark.read.parquet(out).collect()}
        assert all(t.startswith(hdr + "\n") for t in got.values())

        # batch 2: 2 more docs — cumulative 5 >= 4: header dropped
        # from batch 2 (batch 1's already-written rows keep theirs)
        spark.createDataFrame([doc(3), doc(4)], schema) \
            .coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
        got = {r.doc_id: r.text for r in spark.read.parquet(out).collect()}
        assert got[3] == "body xxxx unique"
        assert got[4] == "body xxxxx unique"
        assert got[0].startswith(hdr)  # history not rewritten

        # batch 3: ONE doc — suppression is store-driven now; a
        # year-varying copyright line (digit-stripped key) does not
        # yet hit the threshold and survives
        spark.createDataFrame(
            [(5, f"{hdr}\nbody yyy unique\nCopyright 2024 Corp")],
            schema).coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
        got = {r.doc_id: r.text for r in spark.read.parquet(out).collect()}
        assert got[5] == "body yyy unique\nCopyright 2024 Corp"

        # batch 4: an ALL-boilerplate document stays as ""
        spark.createDataFrame([(6, hdr)], schema) \
            .coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
        got = {r.doc_id: r.text for r in spark.read.parquet(out).collect()}
        assert got[6] == ""
        assert len(got) == 7
    finally:
        q.stop()


def test_boilerplate_ingest_key_matches_batch_operator(spark):
    """The streaming key IS the batch operator's key: digit-stripped
    normalized forms collide across year variants in both."""
    from pdf2dataset_spark.operators.dedup import boilerplate_key

    df = spark.createDataFrame(
        [("Copyright 2021 Corp",), ("copyright   2024 CORP",),
         ("Copyright Corp",), ("unrelated",)], ["p"])
    keys = [r.k for r in df.select(
        boilerplate_key("p").alias("k")).collect()]
    assert keys[0] == keys[1] == keys[2] != keys[3]
