"""Tier C — aggregation (SURVEY.md §2 tier C).

All pure Catalyst: groupBy/agg lowers to partial+final
HashAggregateExec with map-side combine, so each query shuffles only
the (small) group keyspace, never the fact rows — the property that
matters at 100 TB. Decimal-exact money math per _util.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pdf2dataset_spark.queries import query
from pdf2dataset_spark.queries._util import davg, dec, dsum, sql_davg, sql_dsum, t


# --------------------------------------------------------------- C1
@query(
    "c1_pricing_summary",
    sql=f"""
    SELECT
      l_returnflag,
      l_linestatus,
      {sql_dsum('l_quantity')} AS sum_qty,
      {sql_dsum('l_extendedprice')} AS sum_base_price,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
               * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
        AS sum_disc_price,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
               * (1 - CAST(l_discount AS DECIMAL(4,2)))
               * (1 + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE)
        AS sum_charge,
      {sql_davg('l_quantity')} AS avg_qty,
      {sql_davg('l_extendedprice')} AS avg_price,
      {sql_davg('l_discount')} AS avg_disc,
      COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    tier="C",
)
def c1_pricing_summary(spark, sf_dir):
    """TPC-H Q1-shape pricing summary — the flagship end-to-end slice
    (scan → filter → project → groupBy/agg → sort), SURVEY §7 step 1."""
    li = t(spark, sf_dir, "lineitem")
    disc_price = dec("l_extendedprice") * (1 - dec("l_discount", 4))
    charge = disc_price * (1 + dec("l_tax", 4))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-09-02").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(disc_price).alias("sum_disc_price"),
            dsum(charge).alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )
