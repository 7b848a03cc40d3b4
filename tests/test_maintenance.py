"""Dataset maintenance: compaction and dynamic partition overwrite."""

from __future__ import annotations

import pytest

import glob
import os

import pyspark.sql.functions as F

from pdf2dataset_spark.io import load_table
from pdf2dataset_spark.operators.maintenance import compact

SF = "/root/testdata/sf0.001"


def test_compaction_reduces_files_preserves_rows(spark, tmp_path):
    out = str(tmp_path / "fragmented")
    li = load_table(spark, SF, "lineitem")
    # Simulate incremental appends: 40 tiny files.
    li.repartition(40).write.parquet(out)
    before_files = len(glob.glob(f"{out}/*.parquet"))
    before_rows = spark.read.parquet(out).count()
    before_sum = spark.read.parquet(out).agg(
        F.sum(F.col("l_quantity").cast("decimal(12,2)")).alias("s")
    ).collect()[0].s

    compact(spark, out, target_mb=128)

    after_files = len(glob.glob(f"{out}/*.parquet"))
    assert after_files < before_files
    assert spark.read.parquet(out).count() == before_rows
    after_sum = spark.read.parquet(out).agg(
        F.sum(F.col("l_quantity").cast("decimal(12,2)")).alias("s")
    ).collect()[0].s
    assert after_sum == before_sum


def test_dynamic_partition_overwrite_touches_only_matching(spark, tmp_path):
    """Reprocess one partition without clobbering siblings — the
    idempotent-backfill pattern for partitioned corpora."""
    out = str(tmp_path / "by_status")
    o = load_table(spark, SF, "orders")
    o.write.partitionBy("o_orderstatus").parquet(out)
    totals_before = {
        r.o_orderstatus: r.n
        for r in spark.read.parquet(out)
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }

    old_mode = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        # Rewrite ONLY status 'F', halved.
        replacement = (
            spark.read.parquet(out)
            .filter(F.col("o_orderstatus") == "F")
            .filter(F.col("o_orderkey") % 2 == 0)
        )
        replacement.write.mode("overwrite").partitionBy("o_orderstatus").parquet(out)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", old_mode)

    after = {
        r.o_orderstatus: r.n
        for r in spark.read.parquet(out)
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert after["O"] == totals_before["O"]  # untouched sibling
    assert after["P"] == totals_before["P"]
    assert 0 < after["F"] < totals_before["F"]  # only F replaced


def test_zorder_layout_enables_multi_column_pruning(spark, tmp_path):
    """Z-ordered files must have NARROW min/max footprints on BOTH
    z-ordered columns, so file-stats pruning works for filters on
    either — the property a single-column sort cannot give. Verified
    against the actual parquet footer statistics."""
    import pyarrow.parquet as pq

    from pdf2dataset_spark.operators.maintenance import write_zordered

    n = 4096
    df = (
        spark.range(n)
        .selectExpr(
            "cast(pmod(xxhash64(id), 1024) as long) AS a",
            "cast(pmod(xxhash64(id, 7), 1024) as long) AS b",
            "id AS payload",
        )
    )
    zpath = str(tmp_path / "z")
    write_zordered(df, zpath, ["a", "b"], bits=10, n_files=16)

    spans_a, spans_b, files = [], [], 0
    for f in os.listdir(zpath):
        if not f.endswith(".parquet"):
            continue
        files += 1
        md = pq.ParquetFile(os.path.join(zpath, f)).metadata
        lo_a = min(md.row_group(i).column(0).statistics.min for i in range(md.num_row_groups))
        hi_a = max(md.row_group(i).column(0).statistics.max for i in range(md.num_row_groups))
        lo_b = min(md.row_group(i).column(1).statistics.min for i in range(md.num_row_groups))
        hi_b = max(md.row_group(i).column(1).statistics.max for i in range(md.num_row_groups))
        spans_a.append((hi_a - lo_a) / 1023.0)
        spans_b.append((hi_b - lo_b) / 1023.0)
    assert files >= 8
    # A random layout gives every file ~full span (~1.0) on both
    # columns. Z-order with 16 files (4 z-bits) must split BOTH
    # dimensions: expect ~2-4 distinct quadrants per dim -> mean span
    # well under the random baseline on each column simultaneously.
    mean_a = sum(spans_a) / len(spans_a)
    mean_b = sum(spans_b) / len(spans_b)
    assert mean_a < 0.6, spans_a
    assert mean_b < 0.6, spans_b


def test_zorder_preserves_rows(spark, tmp_path):
    from pdf2dataset_spark.operators.maintenance import write_zordered

    df = spark.range(1000).selectExpr("id AS a", "id % 37 AS b", "id AS v")
    path = str(tmp_path / "z2")
    write_zordered(df, path, ["a", "b"], n_files=4)
    back = spark.read.parquet(path)
    assert back.count() == 1000
    assert back.selectExpr("sum(v)").collect()[0][0] == 499500


def test_merge_upsert_keeps_latest_by_key(spark, tmp_path):
    from pdf2dataset_spark.operators.maintenance import merge_upsert

    path = str(tmp_path / "tgt")
    base = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 10), (3, "c", 10)],
        "id long, val string, version long",
    )
    merge_upsert(spark, path, base, ["id"], "version")
    # batch 2: update id=2, insert id=4, stale update for id=3 loses
    upd = spark.createDataFrame(
        [(2, "b2", 20), (4, "d", 20), (3, "stale", 5)],
        "id long, val string, version long",
    )
    merge_upsert(spark, path, upd, ["id"], "version")
    got = {
        r.id: (r.val, r.version)
        for r in spark.read.parquet(path).collect()
    }
    assert got == {1: ("a", 10), 2: ("b2", 20), 3: ("c", 10), 4: ("d", 20)}


def test_merge_upsert_update_wins_version_tie(spark, tmp_path):
    from pdf2dataset_spark.operators.maintenance import merge_upsert

    path = str(tmp_path / "tgt2")
    merge_upsert(
        spark,
        path,
        spark.createDataFrame([(1, "old", 10)], "id long, val string, version long"),
        ["id"],
        "version",
    )
    merge_upsert(
        spark,
        path,
        spark.createDataFrame([(1, "new", 10)], "id long, val string, version long"),
        ["id"],
        "version",
    )
    [r] = spark.read.parquet(path).collect()
    assert (r.val, r.version) == ("new", 10)


def test_point_lookup_layout_writes_bloom_filters(spark, tmp_path):
    """The bloom option must actually reach parquet-mr: files carry
    the filter payload (~1.2 bytes/NDV), absent in the plain write."""
    from pdf2dataset_spark.operators.maintenance import (
        dataset_size_bytes,
        write_point_lookup_layout,
    )

    df = spark.range(100_000).selectExpr(
        "id", "cast(id as string) AS key"
    ).coalesce(1)
    plain, bloomed = str(tmp_path / "plain"), str(tmp_path / "bloomed")
    df.write.mode("overwrite").parquet(plain)
    write_point_lookup_layout(df, bloomed, {"key": 100_000})
    delta = dataset_size_bytes(bloomed) - dataset_size_bytes(plain)
    assert delta > 50_000, delta  # ~128KiB filter for 100k NDV
    # the layout stays readable and complete
    assert spark.read.parquet(bloomed).count() == 100_000


def test_write_read_packed_embeddings_roundtrip(spark, tmp_path):
    """Pack-at-ingest: write_packed_embeddings stores a binary column
    + sidecar meta; read side feeds topk_cosine_packed directly and
    agrees with brute force over the original arrays."""
    import numpy as np

    from pdf2dataset_spark.operators import maintenance as mt
    from pdf2dataset_spark.operators import similarity as sim

    n, dim = 200, 8
    rng = np.random.default_rng(5)
    vecs = rng.standard_normal((n, dim)).astype(np.float64)
    df = spark.createDataFrame(
        [(i, vecs[i].tolist()) for i in range(n)],
        "vec_id long, embedding array<double>",
    )
    store = str(tmp_path / "packed")
    meta = mt.write_packed_embeddings(df, store)  # dim inferred
    assert meta == {"packed_col": "embedding_bin", "dim": dim,
                    "dtype": "float32"}
    stored, meta2 = mt.read_packed_embeddings(spark, store)
    assert meta2 == meta
    assert dict(stored.dtypes)["embedding_bin"] == "binary"
    # bytes layout: fp32 little-endian, one frombuffer recovers vecs
    row = stored.filter(F.col("vec_id") == 3).first()
    got = np.frombuffer(bytes(row["embedding_bin"]), "<f4")
    assert np.allclose(got, vecs[3].astype(np.float32))

    queries = df.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    brute = sim.topk_cosine(df, queries, k=3)
    packed = sim.topk_cosine_packed(
        stored, queries, dim=meta["dim"], k=3,
        corpus_vec=meta["packed_col"], dtype=meta["dtype"],
    )
    b = {(r["query_id"], r["vec_id"]) for r in brute.collect()}
    p = {(r["query_id"], r["vec_id"]) for r in packed.collect()}
    assert b == p  # fp32 vs fp64 does not change the neighbor sets here


def test_write_packed_embeddings_empty_input_raises(spark, tmp_path):
    from pdf2dataset_spark.operators import maintenance as mt

    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="empty"):
        mt.write_packed_embeddings(empty, str(tmp_path / "x"))
