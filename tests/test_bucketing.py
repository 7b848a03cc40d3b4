"""Bucketed co-located joins (SURVEY optimization mandate): writing
both fact tables bucketed by the join key lets the join run with
ZERO shuffle — the plan-level proof that pre-partitioning works."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from pdf2dataset_spark.io import load_table
from pdf2dataset_spark.plans.audit import explain_string, shuffle_count

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("warehouse"))
    orders = load_table(spark, SF, "orders")
    lineitem = load_table(spark, SF, "lineitem")
    (
        orders.write.bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .option("path", f"{wh}/orders_bkt")
        .mode("overwrite")
        .saveAsTable("orders_bkt")
    )
    (
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey")
        .write.bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .option("path", f"{wh}/lineitem_bkt")
        .mode("overwrite")
        .saveAsTable("lineitem_bkt")
    )
    yield "orders_bkt", "lineitem_bkt"
    spark.sql("DROP TABLE IF EXISTS orders_bkt")
    spark.sql("DROP TABLE IF EXISTS lineitem_bkt")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    o_name, l_name = bucketed_tables
    # At test scale the planner prefers broadcast (also shuffle-free);
    # disable it to prove the bucketed path that matters when BOTH
    # sides are 100 TB facts and neither can broadcast.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        o = spark.table(o_name)
        li = spark.table(l_name)
        joined_only = o.join(li, "o_orderkey").select(o.o_orderkey)
        plan = explain_string(joined_only)
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan
        assert shuffle_count(joined_only) == 0, plan
        assert "Bucketed: true" in plan, plan
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_bucketed_join_matches_unbucketed(spark, bucketed_tables):
    o_name, l_name = bucketed_tables
    got = (
        spark.table(o_name)
        .join(spark.table(l_name), "o_orderkey")
        .count()
    )
    want = (
        load_table(spark, SF, "orders")
        .join(
            load_table(spark, SF, "lineitem").withColumnRenamed(
                "l_orderkey", "o_orderkey"
            ),
            "o_orderkey",
        )
        .count()
    )
    assert got == want > 0
