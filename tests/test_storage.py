"""Storage-layer behaviors a long-lived pipeline depends on: cache
reuse, schema evolution on append, compression codecs."""

from __future__ import annotations

import pyspark.sql.functions as F

from pdf2dataset_spark.io import load_table
from pdf2dataset_spark.plans.audit import explain_string

SF = "/root/testdata/sf0.001"


def test_cache_reuse_in_plan(spark):
    li = load_table(spark, SF, "lineitem").select("l_orderkey", "l_quantity")
    cached = li.cache()
    try:
        cached.count()  # materialize
        plan = explain_string(cached.groupBy("l_orderkey").count())
        assert "InMemoryTableScan" in plan or "TableCacheQueryStage" in plan, plan
    finally:
        cached.unpersist()


def test_schema_evolution_merge_on_read(spark, tmp_path):
    """Appends with a new column are readable with mergeSchema — how
    feature columns get added to an existing corpus without rewrite."""
    out = str(tmp_path / "evolving")
    spark.createDataFrame([(1, "a")], "id long, text string").write.parquet(out)
    spark.createDataFrame(
        [(2, "b", "en")], "id long, text string, lang string"
    ).write.mode("append").parquet(out)
    df = spark.read.option("mergeSchema", "true").parquet(out)
    rows = {r.id: r.lang for r in df.collect()}
    assert rows == {1: None, 2: "en"}


def test_compression_codecs_roundtrip(spark, tmp_path):
    df = load_table(spark, SF, "region")
    for codec in ("gzip", "snappy", "zstd"):
        path = str(tmp_path / codec)
        df.write.option("compression", codec).parquet(path)
        assert spark.read.parquet(path).count() == 5


def test_ignore_corrupt_files_scan_survives(spark, tmp_path):
    """At 100 TB some objects WILL be corrupt; the scan must be able
    to skip them (spark.sql.files.ignoreCorruptFiles) instead of
    failing the whole job — and must fail loudly when not asked to."""
    import os

    import pytest
    from py4j.protocol import Py4JJavaError

    path = str(tmp_path / "data")
    spark.range(100).write.parquet(path)
    with open(os.path.join(path, "part-corrupt.parquet"), "wb") as f:
        f.write(b"this is not a parquet file")

    spark.conf.set("spark.sql.files.ignoreCorruptFiles", "false")
    with pytest.raises(Exception):
        spark.read.parquet(path).count()

    try:
        spark.conf.set("spark.sql.files.ignoreCorruptFiles", "true")
        assert spark.read.parquet(path).count() == 100
    finally:
        spark.conf.set("spark.sql.files.ignoreCorruptFiles", "false")


def test_custom_python_datasource_docsynth(spark):
    """Spark 4 custom Python DataSource: partition-parallel
    deterministic synthetic corpus (sources/pydatasource.py)."""
    from pdf2dataset_spark.sources.pydatasource import DocSynthDataSource

    spark.dataSource.register(DocSynthDataSource)
    df = (
        spark.read.format("docsynth")
        .option("numdocs", 500)
        .option("numpartitions", 7)
        .load()
    )
    assert df.rdd.getNumPartitions() == 7
    assert df.count() == 500
    # Deterministic: same id -> same text across independent reads
    a = df.filter("doc_id = 123").collect()[0].text
    b = (
        spark.read.format("docsynth")
        .option("numdocs", 200)
        .option("numpartitions", 3)
        .load()
        .filter("doc_id = 123")
        .collect()[0]
        .text
    )
    assert a == b and len(a.split()) == 40


def test_csv_json_roundtrip_with_declared_schema(spark, tmp_path):
    """Source/sink matrix: csv.gz and json.gz round-trip under a
    DECLARED schema (no inference pass, types exact)."""
    from pdf2dataset_spark.io import read_table_fmt, write_table_fmt

    df = spark.createDataFrame(
        [(1, "a,b", 1.5), (2, None, -0.25)],
        "id long, s string, x double",
    )
    for fmt in ("csv", "json"):
        p = str(tmp_path / fmt)
        write_table_fmt(df, p, fmt=fmt, compression="gzip")
        back = read_table_fmt(
            spark, p, "id long, s string, x double", fmt=fmt
        )
        assert back.schema == df.schema
        got = sorted(map(tuple, back.collect()))
        assert got == sorted(map(tuple, df.collect())), (fmt, got)


def test_python_datasource_stream_reader(spark):
    """Spark 4 DataSourceStreamReader surface: executor-parallel
    micro-batches, offset-range exactly-once by determinism (every
    id appears exactly once across batches; content is a pure
    function of id)."""
    import time

    from pdf2dataset_spark.sources.pydatasource import (
        DocSynthDataSource,
        _doc_text,
    )

    spark.dataSource.register(DocSynthDataSource)
    seen = []
    q = (
        spark.readStream.format("docsynth")
        .option("rowspermicrobatch", 40)
        .option("numpartitions", 4)
        .option("maxrows", 120)
        .load()
        .writeStream.foreachBatch(lambda df, _: seen.append(df.collect()))
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    deadline = time.time() + 60
    while time.time() < deadline and sum(map(len, seen)) < 120:
        time.sleep(0.5)
    q.stop()
    ids = sorted(r["doc_id"] for rows in seen for r in rows)
    assert ids == list(range(120))  # exactly-once, no gaps, capped
    some = next(r for rows in seen for r in rows if r["doc_id"] == 11)
    assert some["text"] == _doc_text(11)


def test_stream_reader_offsets_resume_after_driver_restart():
    """A restarted driver loses _cur (in-memory only); the engine
    replays the checkpointed start. partitions()/commit() must clamp
    the internal cursor to the engine-reported range so latestOffset
    is monotonic across restarts — no stall of empty ranges, and
    maxrows caps POSITION, not trigger count."""
    from pdf2dataset_spark.sources.pydatasource import DocSynthStreamReader

    # fresh reader simulating a restart with a committed offset of 500
    r = DocSynthStreamReader({"rowspermicrobatch": "100"})
    assert r.latestOffset() == {"id": 100}  # behind the checkpoint
    parts = r.partitions({"id": 500}, {"id": 100})  # engine replays start
    assert all(p.end <= p.start for p in parts)  # no backward reads
    # cursor clamped: the very next batch resumes past the checkpoint
    assert r.latestOffset() == {"id": 600}
    parts = r.partitions({"id": 500}, {"id": 600})
    covered = sorted((p.start, p.end) for p in parts)
    assert covered[0][0] == 500 and covered[-1][1] == 600

    # commit() alone must also advance the floor
    r2 = DocSynthStreamReader({"rowspermicrobatch": "50"})
    r2.commit({"id": 400})
    assert r2.latestOffset() == {"id": 450}


class TestWebDataset:
    """WebDataset tar shards (operators/shards.py): the multimodal
    training sink — deterministic tar bytes, manifest audit, loader
    round-trip, NULL-member skip, precomputed shard assignment."""

    def _df(self, spark):
        import pyspark.sql.functions as F

        return (
            spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
            .select(
                "doc_id",
                "text",
                F.when(
                    F.col("doc_id") % 3 != 0,
                    F.encode(F.concat(F.lit("IMG"), F.col("doc_id")), "utf-8"),
                ).alias("fake_img"),  # NULL every 3rd doc
            )
        )

    def test_roundtrip_and_manifest(self, spark, tmp_path):
        import hashlib
        import tarfile

        from pdf2dataset_spark.operators import shards as sh

        out = str(tmp_path / "wds")
        df = self._df(spark)
        man = sh.write_webdataset(
            df, out, {"txt": "text", "jpg": "fake_img"}, n_shards=4
        )
        rows = {r.shard_id: r for r in man.collect()}
        n_docs = df.count()
        n_null = df.filter("fake_img is null").count()
        assert sum(r.n_samples for r in rows.values()) == n_docs
        assert sum(r.n_members for r in rows.values()) == 2 * n_docs - n_null

        # loader-side: local tarfile read agrees with read_webdataset
        back = sh.read_webdataset(spark, out)
        got = {(r.key, r.ext): r.payload for r in back.collect()}
        want = {}
        for r in df.collect():
            want[(str(r.doc_id), "txt")] = r.text.encode()
            if r.fake_img is not None:
                want[(str(r.doc_id), "jpg")] = bytes(r.fake_img)
        assert got == want

        # manifest sha matches the bytes on disk; written manifest agrees
        for r in rows.values():
            with open(r.path, "rb") as f:
                data = f.read()
            assert hashlib.sha256(data).hexdigest() == r.sha256
            assert len(data) == r.n_bytes
            with tarfile.open(r.path) as tar:
                assert len(tar.getmembers()) == r.n_members
        stored = {
            r.shard_id: r.sha256
            for r in sh.read_manifest(spark, out).collect()
        }
        assert stored == {k: r.sha256 for k, r in rows.items()}

    def test_deterministic_bytes_across_writes(self, spark, tmp_path):
        from pdf2dataset_spark.operators import shards as sh

        df = self._df(spark)
        a = sh.write_webdataset(
            df, str(tmp_path / "a"), {"txt": "text"}, n_shards=3
        )
        b = sh.write_webdataset(
            df, str(tmp_path / "b"), {"txt": "text"}, n_shards=3
        )
        sa = {r.shard_id: r.sha256 for r in a.collect()}
        sb = {r.shard_id: r.sha256 for r in b.collect()}
        assert sa == sb  # zeroed tar metadata + sorted members

    def test_precomputed_shard_assignment(self, spark, tmp_path):
        import pyspark.sql.functions as F

        from pdf2dataset_spark.operators import shards as sh

        df = self._df(spark).withColumn(
            "bucket", (F.col("doc_id") % 2).cast("int")
        )
        man = sh.write_webdataset(
            df,
            str(tmp_path / "pre"),
            {"txt": "text"},
            shard_col="bucket",
        )
        assert {r.shard_id for r in man.collect()} == {0, 1}
