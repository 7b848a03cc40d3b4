"""Dataset maintenance: compaction and dynamic partition overwrite."""

from __future__ import annotations

import glob

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
