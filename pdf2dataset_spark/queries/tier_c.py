"""Tier C — aggregation (SURVEY.md §2 tier C).

All pure Catalyst: groupBy/agg lowers to partial+final
HashAggregateExec with map-side combine, so each query shuffles only
the (small) group keyspace, never the fact rows — the property that
matters at 100 TB. Decimal-exact money math per _util.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Window
from pyspark.sql import functions as F

from pdf2dataset_spark.queries import query
from pdf2dataset_spark.queries._util import (
    cavg,
    cents,
    csum,
    davg,
    dec,
    dsum,
    ordered_small,
    sql_cavg,
    sql_cents,
    sql_csum,
    sql_davg,
    sql_dsum,
    t,
)


# --------------------------------------------------------------- C1
@query(
    "c1_pricing_summary",
    sql=f"""
    SELECT
      l_returnflag,
      l_linestatus,
      {sql_csum('l_quantity')} AS sum_qty,
      {sql_csum('l_extendedprice')} AS sum_base_price,
      CAST(SUM({sql_cents('l_extendedprice')}
               * (100 - {sql_cents('l_discount')})) AS DOUBLE)/(100*100)
        AS sum_disc_price,
      CAST(SUM({sql_cents('l_extendedprice')}
               * (100 - {sql_cents('l_discount')})
               * (100 + {sql_cents('l_tax')})) AS DOUBLE)/(100*100*100)
        AS sum_charge,
      {sql_cavg('l_quantity')} AS avg_qty,
      {sql_cavg('l_extendedprice')} AS avg_price,
      {sql_cavg('l_discount')} AS avg_disc,
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
    (scan → filter → project → groupBy/agg → sort), SURVEY §7 step 1.

    Money math uses the integer-cents fast path (_util.cents): pure
    long arithmetic in the hash aggregate, exact and order-
    independent, ~1.5x faster than decimal sums and bitwise-equal to
    both the decimal formulation and the DuckDB twin (verified)."""
    li = t(spark, sf_dir, "lineitem")
    price_c = cents("l_extendedprice")
    disc_c = cents("l_discount")
    tax_c = cents("l_tax")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-09-02").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            csum("l_quantity").alias("sum_qty"),
            csum("l_extendedprice").alias("sum_base_price"),
            (F.sum(price_c * (100 - disc_c)).cast("double") / (100 * 100)).alias(
                "sum_disc_price"
            ),
            (
                F.sum(price_c * (100 - disc_c) * (100 + tax_c)).cast("double")
                / (100 * 100 * 100)
            ).alias("sum_charge"),
            cavg("l_quantity").alias("avg_qty"),
            cavg("l_extendedprice").alias("avg_price"),
            cavg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .transform(ordered_small, "l_returnflag", "l_linestatus")
    )


# --------------------------------------------------------------- C2
@query(
    "c2_global_agg",
    sql="""
    SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_rev,
           COUNT(*) AS n_orders,
           MIN(o_totalprice) AS min_price,
           MAX(o_totalprice) AS max_price,
           CAST(MIN(o_orderdate) AS DATE) AS first_day,
           CAST(MAX(o_orderdate) AS DATE) AS last_day
    FROM orders
    """,
    tier="C",
)
def c2_global_agg(spark, sf_dir):
    """Global (no-group) aggregate (C2); min/max are exact on doubles."""
    o = t(spark, sf_dir, "orders")
    return o.agg(
        dsum("o_totalprice").alias("total_rev"),
        F.count(F.lit(1)).alias("n_orders"),
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
        F.min("o_orderdate").cast("date").alias("first_day"),
        F.max("o_orderdate").cast("date").alias("last_day"),
    )


# --------------------------------------------------------------- C3
@query(
    "c3_count_distinct",
    sql="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS n_parts,
           COUNT(*) AS n_rows
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    tier="C",
)
def c3_count_distinct(spark, sf_dir):
    """Exact COUNT(DISTINCT) — planner two-phase expansion (C3)."""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("n_parts"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .transform(ordered_small, "l_returnflag")
    )


# --------------------------------------------------------------- C4
@query("c4_approx_count_distinct", sql=None, tier="C")
def c4_approx_count_distinct(spark, sf_dir):
    """Approx distinct (HLL++) — randomized sketch, rows-only by design
    (C4). The engine asserts the rsd bound in tests instead."""
    li = t(spark, sf_dir, "lineitem")
    return li.agg(
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_parts"),
        F.countDistinct("l_partkey").alias("exact_parts"),
    )


# --------------------------------------------------------------- C5
@query(
    "c5_multi_distinct",
    sql="""
    SELECT l_linestatus,
           COUNT(DISTINCT l_partkey) AS n_parts,
           COUNT(DISTINCT l_suppkey) AS n_supps,
           COUNT(DISTINCT l_returnflag) AS n_flags
    FROM lineitem
    GROUP BY l_linestatus
    ORDER BY l_linestatus
    """,
    tier="C",
)
def c5_multi_distinct(spark, sf_dir):
    """Multiple DISTINCT aggregates in one pass — planner Expand (C5)."""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_linestatus")
        .agg(
            F.countDistinct("l_partkey").alias("n_parts"),
            F.countDistinct("l_suppkey").alias("n_supps"),
            F.countDistinct("l_returnflag").alias("n_flags"),
        )
        .orderBy("l_linestatus")
    )


# --------------------------------------------------------------- C6
@query(
    "c6_collect_set",
    sql="""
    SELECT n_regionkey,
           array_to_string(list_sort(list(DISTINCT n_name)), ',') AS nations_csv,
           CAST(len(list(DISTINCT n_name)) AS INTEGER) AS n_nations
    FROM nation
    GROUP BY n_regionkey
    ORDER BY n_regionkey
    """,
    tier="C",
)
def c6_collect_set(spark, sf_dir):
    """collect_set + sort_array for deterministic output (C6). The
    array is serialized to CSV for the oracle hash (array cells are
    comparator-hostile); the array form itself is asserted in tests."""
    n = t(spark, sf_dir, "nation")
    return (
        n.groupBy("n_regionkey")
        .agg(
            F.concat_ws(",", F.sort_array(F.collect_set("n_name"))).alias(
                "nations_csv"
            ),
            F.size(F.collect_set("n_name")).alias("n_nations"),
        )
        .orderBy("n_regionkey")
    )


# --------------------------------------------------------------- C7
@query(
    "c7_rollup",
    sql="""
    SELECT l_returnflag, l_linestatus,
           GROUPING(l_returnflag, l_linestatus) AS gid,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY ROLLUP(l_returnflag, l_linestatus)
    ORDER BY gid, l_returnflag NULLS LAST, l_linestatus NULLS LAST
    """,
    tier="C",
)
def c7_rollup(spark, sf_dir):
    """ROLLUP grouping sets + grouping_id bitmask (C7)."""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().alias("gid"),
            dsum("l_quantity").alias("sum_qty"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy(
            "gid",
            F.col("l_returnflag").asc_nulls_last(),
            F.col("l_linestatus").asc_nulls_last(),
        )
    )


# --------------------------------------------------------------- C8
@query(
    "c8_stats_aggregates",
    sql="""
    WITH c AS (
      SELECT l_returnflag,
             CAST(round(l_quantity*100,0) AS BIGINT) AS xc,
             CAST(round(l_extendedprice*100,0) AS BIGINT) AS yc
      FROM lineitem
    ), m AS (
      -- Moments accumulate as INTEGER-valued decimals and convert to
      -- double with ONE int->double rounding. A scaled decimal cast
      -- (value/10^scale) rounds twice in DuckDB (int128->double,
      -- then divide) but once in Spark (BigDecimal.doubleValue) --
      -- observed as a 1-ulp syy mismatch; integers dodge it.
      SELECT l_returnflag,
             COUNT(*) AS n,
             CAST(SUM(xc) AS DOUBLE) / 100 AS sx,
             CAST(SUM(CAST(xc*xc AS DECIMAL(38,0))) AS DOUBLE) / 10000.0 AS sxx,
             CAST(SUM(CAST((xc*xc)*xc AS DECIMAL(38,0))) AS DOUBLE) / 1000000.0 AS sxxx,
             CAST(SUM(yc) AS DOUBLE) / 100 AS sy,
             CAST(SUM(CAST(yc*yc AS DECIMAL(38,0))) AS DOUBLE) / 10000.0 AS syy,
             CAST(SUM(CAST(xc*yc AS DECIMAL(38,0))) AS DOUBLE) / 10000.0 AS sxy
      FROM c
      GROUP BY l_returnflag
    )
    , p AS (
      -- every product staged into its own column: an expression that
      -- mixes a multiply with +/- invites FMA contraction in C++
      -- builds (different rounding than the JVM, 1-ulp mismatches)
      SELECT l_returnflag, n, sx, sxx,
             n * sxx AS nsxx, sx * sx AS sxsx,
             n * sxy AS nsxy, sx * sy AS sxsy,
             n * syy AS nsyy, sy * sy AS sysy,
             CAST(n AS DOUBLE) * (n - 1) AS nn1,
             sxxx / n AS m3raw,
             3 * ((sx / n) * (sxx / n)) AS t1,
             2 * (((sx / n) * (sx / n)) * (sx / n)) AS t2,
             (sxx / n) AS m2a, (sx / n) * (sx / n) AS m2b
      FROM m
    ), q AS (
      SELECT l_returnflag, n, sx, sxx,
             (nsxx - sxsx) / nn1 AS qty_variance,
             nsxx - sxsx AS dx, nsyy - sysy AS dy, nsxy - sxsy AS dxy,
             m3raw - t1 + t2 AS m3, m2a - m2b AS m2
      FROM p
    )
    SELECT l_returnflag, n, sx, sxx,
           sqrt(qty_variance) AS qty_stddev,
           qty_variance,
           dxy / (sqrt(dx) * sqrt(dy)) AS qty_price_corr,
           m3 / (m2 * sqrt(m2)) AS qty_skewness
    FROM q
    ORDER BY l_returnflag
    """,
    tier="C",
)
def c8_stats_aggregates(spark, sf_dir):
    """Stats aggregates via exact-moment formulas (C8): stddev,
    variance, corr, skewness — kurtosis is the same fourth-moment
    pattern.

    Built-in stddev/corr accumulate doubles in nondeterministic order
    (verified: corr differs ~1e-17 across engines), so the moments are
    computed as exact decimal sums and the closed-form runs in
    identical IEEE double ops on both sides — bitwise-stable, and the
    only formulation that stays deterministic at cluster scale.
    """
    li = t(spark, sf_dir, "lineitem")
    xc = cents("l_quantity")
    yc = cents("l_extendedprice")
    withc = li.select("l_returnflag", xc.alias("xc"), yc.alias("yc"))
    x, v = F.col("xc"), F.col("yc")
    d38 = lambda col: F.sum(col.cast("decimal(38,0)")).cast("double")  # noqa: E731
    moments = withc.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum(x).cast("double") / 100).alias("sx"),
        (d38(x * x) / F.lit(10000.0)).alias("sxx"),
        (d38((x * x) * x) / F.lit(1000000.0)).alias("sxxx"),
        (F.sum(v).cast("double") / 100).alias("sy"),
        (d38(v * v) / F.lit(10000.0)).alias("syy"),
        (d38(x * v) / F.lit(10000.0)).alias("sxy"),
    )
    n, sx, sxx = F.col("n"), F.col("sx"), F.col("sxx")
    sxxx, sy, syy, sxy = F.col("sxxx"), F.col("sy"), F.col("syy"), F.col("sxy")
    mean = sx / n
    # Mirror the oracle's staging exactly: products live in their own
    # expressions, never mixed with +/- in one formula — C++ builds
    # (DuckDB) contract a*b-c*d into FMA with different rounding than
    # the JVM, which surfaced as 1-ulp corr mismatches. m2^1.5 is
    # m2*sqrt(m2) (pow(x,1.5) is likewise not correctly rounded).
    staged = moments.select(
        "l_returnflag",
        "n",
        "sx",
        "sxx",
        (n * sxx).alias("nsxx"),
        (sx * sx).alias("sxsx"),
        (n * sxy).alias("nsxy"),
        (sx * sy).alias("sxsy"),
        (n * syy).alias("nsyy"),
        (sy * sy).alias("sysy"),
        (n.cast("double") * (n - F.lit(1))).alias("nn1"),
        (sxxx / n).alias("m3raw"),
        (F.lit(3) * ((sx / n) * (sxx / n))).alias("t1"),
        (F.lit(2) * ((mean * mean) * mean)).alias("t2"),
        (sxx / n).alias("m2a"),
        (mean * mean).alias("m2b"),
    )
    combined = staged.select(
        "l_returnflag",
        "n",
        "sx",
        "sxx",
        ((F.col("nsxx") - F.col("sxsx")) / F.col("nn1")).alias("qty_variance"),
        (F.col("nsxx") - F.col("sxsx")).alias("dx"),
        (F.col("nsyy") - F.col("sysy")).alias("dy"),
        (F.col("nsxy") - F.col("sxsy")).alias("dxy"),
        (F.col("m3raw") - F.col("t1") + F.col("t2")).alias("m3"),
        (F.col("m2a") - F.col("m2b")).alias("m2"),
    )
    return (
        combined.select(
            "l_returnflag",
            "n",
            "sx",
            "sxx",
            F.sqrt("qty_variance").alias("qty_stddev"),
            "qty_variance",
            (F.col("dxy") / (F.sqrt("dx") * F.sqrt("dy"))).alias("qty_price_corr"),
            (F.col("m3") / (F.col("m2") * F.sqrt("m2"))).alias("qty_skewness"),
        )
        .orderBy("l_returnflag")
    )


# --------------------------------------------------------------- C9
@query(
    "c9_percentiles",
    sql="""
    SELECT l_returnflag,
           quantile_cont(l_quantity, 0.5) AS qty_p50,
           quantile_cont(l_extendedprice, 0.25) AS price_p25,
           quantile_cont(l_extendedprice, 0.95) AS price_p95
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    tier="C",
)
def c9_percentiles(spark, sf_dir):
    """Exact interpolated percentiles (C9) — verified bitwise-equal
    to DuckDB quantile_cont. approx_percentile is exercised rows-only
    in the bench path."""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.percentile("l_quantity", 0.5).alias("qty_p50"),
            F.percentile("l_extendedprice", 0.25).alias("price_p25"),
            F.percentile("l_extendedprice", 0.95).alias("price_p95"),
        )
        .orderBy("l_returnflag")
    )


# --------------------------------------------------------------- C10
@query(
    "c10_min_max_by",
    sql="""
    SELECT o_orderpriority,
           arg_max(o_orderkey,
                   CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
                   * 1000000000 + o_orderkey) AS biggest_order,
           arg_min(o_orderkey,
                   CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
                   * 1000000000 + o_orderkey) AS smallest_order,
           MAX(o_totalprice) AS max_price
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tier="C",
)
def c10_min_max_by(spark, sf_dir):
    """max_by/min_by with an exact bigint-encoded (price, key) ordering
    value for deterministic tie-breaks (C10) — DuckDB 1.0 arg_max
    rejects struct values, so the composite is integer-encoded."""
    o = t(spark, sf_dir, "orders")
    # price_cents ≤ 5e7, so ×1e9 ≤ 5e16 stays in int64 with room for
    # order keys below 1e9 (sf ≲ 600) — no collision at bench scales.
    ordv = (dec("o_totalprice") * 100).cast("bigint") * 1000000000 + F.col(
        "o_orderkey"
    )
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.max_by("o_orderkey", ordv).alias("biggest_order"),
            F.min_by("o_orderkey", ordv).alias("smallest_order"),
            F.max("o_totalprice").alias("max_price"),
        )
        .orderBy("o_orderpriority")
    )


# --------------------------------------------------------------- C11
@query(
    "c11_pivot",
    sql="""
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN l_linestatus = 'O'
                         THEN CAST(l_quantity AS DECIMAL(12,2)) END) AS DOUBLE)
             AS qty_O,
           CAST(SUM(CASE WHEN l_linestatus = 'F'
                         THEN CAST(l_quantity AS DECIMAL(12,2)) END) AS DOUBLE)
             AS qty_F
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    tier="C",
)
def c11_pivot(spark, sf_dir):
    """Pivot with explicit value list (C11) — ANSI twin is
    SUM(CASE WHEN ...) columns."""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(dsum("l_quantity"))
        .select(
            "l_returnflag",
            F.col("O").alias("qty_O"),
            F.col("F").alias("qty_F"),
        )
        .orderBy("l_returnflag")
    )


# --------------------------------------------------------------- C12
@query(
    "c12_custom_udaf",
    sql="""
    SELECT l_returnflag,
           CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(12,2)) * 100 AS BIGINT))
                AS BIGINT) AS qty_centi_sum
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    tier="C",
)
def c12_custom_udaf(spark, sf_dir):
    """Custom UDAF via pandas_udf GROUPED_AGG (C12).

    The UDAF sums integer centi-quantities so its result is exact and
    order-independent — the pattern for writing oracle-checkable
    custom aggregates (float UDAFs would be rows-only).
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("bigint")
    def centi_sum(v: pd.Series) -> np.int64:
        return np.int64(np.rint(v.to_numpy() * 100).astype("int64").sum())

    li = t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(centi_sum("l_quantity").alias("qty_centi_sum"))
        .orderBy("l_returnflag")
    )


# --------------------------------------------------------------- C9b
@query("c9b_approx_percentile", sql=None, tier="C")
def c9b_approx_percentile(spark, sf_dir):
    """approx_percentile (C9 approx path): sketch-based → rows-only;
    the bound |approx - exact| is asserted in tests."""
    li = t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.percentile_approx("l_extendedprice", 0.5, 10000).alias("approx_p50"),
        F.percentile("l_extendedprice", 0.5).alias("exact_p50"),
    )


# --------------------------------------------------------------- C13
@query(
    "c13_having",
    sql="""
    SELECT l_partkey,
           COUNT(*) AS n_lines,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS total_qty
    FROM lineitem
    GROUP BY l_partkey
    HAVING COUNT(*) >= 45
    ORDER BY l_partkey
    """,
    tier="C",
)
def c13_having(spark, sf_dir):
    """Post-aggregation HAVING filter (C-tier straggler): parts that
    appear on at least 45 line items."""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_partkey")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            dsum("l_quantity").alias("total_qty"),
        )
        .filter(F.col("n_lines") >= 45)
        .orderBy("l_partkey")
    )


# --------------------------------------------------------------- C14
@query("c14_hll_sketch_union", sql=None, tier="C")
def c14_hll_sketch_union(spark, sf_dir):
    """Mergeable HLL sketches (C4 at cluster scale): per-group
    hll_sketch_agg, then hll_union_agg to the global estimate —
    sketches merge associatively, so distinct counts compose across
    partitions/days/shards without reprocessing raw data. Sketch
    bytes are engine-specific → rows-only; accuracy asserted in
    tests."""
    li = t(spark, sf_dir, "lineitem")
    per_flag = li.groupBy("l_returnflag").agg(
        F.hll_sketch_agg("l_partkey").alias("sketch")
    )
    return per_flag.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("approx_distinct_parts")
    )


# --------------------------------------------------------------- C15
@query(
    "c15_cube",
    sql="""
    SELECT l_returnflag, l_linestatus,
           GROUPING(l_returnflag, l_linestatus) AS gid,
           COUNT(*) AS n,
           CAST(SUM(CAST(round(l_extendedprice*100,0) AS BIGINT)) AS DOUBLE)/100
             AS sum_price
    FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
    ORDER BY gid, l_returnflag NULLS LAST, l_linestatus NULLS LAST
    """,
    tier="C",
)
def c15_cube(spark, sf_dir):
    """CUBE: all 2^k grouping-set combinations with the grouping_id
    bitmask disambiguating natural NULLs from subtotal NULLs (C7's
    rollup sibling). Spark expands the cube BEFORE the shuffle
    (Expand node), so partial aggregation still applies per set —
    the scale cost is k× map output, not k passes over the fact."""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().alias("gid"),
            F.count(F.lit(1)).alias("n"),
            csum("l_extendedprice").alias("sum_price"),
        )
        .orderBy(
            "gid",
            F.col("l_returnflag").asc_nulls_last(),
            F.col("l_linestatus").asc_nulls_last(),
        )
    )


# --------------------------------------------------------------- C16
@query(
    "c16_grouping_sets",
    sql="""
    SELECT l_returnflag, year(l_shipdate) AS ship_year,
           GROUPING(l_returnflag, year(l_shipdate)) AS gid,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (year(l_shipdate)), ())
    ORDER BY gid, l_returnflag NULLS LAST, ship_year NULLS LAST
    """,
    tier="C",
)
def c16_grouping_sets(spark, sf_dir):
    """Explicit GROUPING SETS (two disjoint single-column sets + the
    grand total) via Spark 4's DataFrame.groupingSets — the general
    form that rollup/cube are sugar for. Same Expand-then-partial-agg
    execution as c15, so one fact pass covers every set."""
    li = t(spark, sf_dir, "lineitem").withColumn(
        "ship_year", F.year("l_shipdate")
    )
    return (
        li.groupingSets(
            [["l_returnflag"], ["ship_year"], []], "l_returnflag", "ship_year"
        )
        .agg(F.grouping_id().alias("gid"), F.count(F.lit(1)).alias("n"))
        .orderBy(
            "gid",
            F.col("l_returnflag").asc_nulls_last(),
            F.col("ship_year").asc_nulls_last(),
        )
    )


# --------------------------------------------------------------- C17
@query(
    "c17_string_agg",
    sql="""
    SELECT o_orderstatus,
           string_agg(DISTINCT o_orderpriority, ',' ORDER BY o_orderpriority)
             AS priorities
    FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    tier="C",
)
def c17_string_agg(spark, sf_dir):
    """Ordered string aggregation (LISTAGG/string_agg). Determinism
    device: collect_set (orderless, mergeable map-side) → array_sort
    → array_join, which equals DuckDB's DISTINCT ... ORDER BY form
    exactly — never collect_list, whose arrival order is partition-
    nondeterministic on any real cluster."""
    o = t(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.array_join(
                F.array_sort(F.collect_set("o_orderpriority")), ","
            ).alias("priorities")
        )
        .orderBy("o_orderstatus")
    )


# --------------------------------------------------------------- C18
@query(
    "c18_histogram",
    sql="""
    SELECT LEAST(GREATEST((CAST(round(c_acctbal*100,0) AS BIGINT) + 100000)
                          // 100000, 0), 11) AS bucket,
           COUNT(*) AS n,
           CAST(SUM(CAST(round(c_acctbal*100,0) AS BIGINT)) AS DOUBLE)/100
             AS total_bal
    FROM customer GROUP BY 1 ORDER BY 1
    """,
    tier="C",
)
def c18_histogram(spark, sf_dir):
    """Fixed-width histogram (width_bucket semantics, spelled out in
    exact integer cents because DuckDB 1.0 lacks the function):
    11 × 1000-currency buckets over [-1000, 10000), under/overflow
    clamped to the edge buckets. Bucket assignment is integer
    floor-division — no float boundary ambiguity — and the clamp
    makes DuckDB's floor-div and Spark's trunc-div agree even for
    out-of-range negatives. Single partial-agg shuffle on an
    11-value keyspace."""
    c = t(spark, sf_dir, "customer")
    bal_c = cents("c_acctbal")
    bucket = F.least(
        F.greatest(
            ((bal_c + F.lit(100000)) / F.lit(100000)).cast("bigint"),
            F.lit(0),
        ),
        F.lit(11),
    )
    return (
        c.groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            csum("c_acctbal").alias("total_bal"),
        )
        .orderBy("bucket")
    )


# --------------------------------------------------------------- C19
@query("c19_cms_heavy_hitters", sql=None, tier="C")
def c19_cms_heavy_hitters(spark, sf_dir):
    """Count-min-sketch heavy hitters (c14's frequency sibling): build
    a fixed-size mergeable CMS over lineitem.l_suppkey, then
    point-estimate the exact top-10 suppliers by line count and report
    exact vs estimate side by side. The sketch is depth*width rows
    regardless of fact size and the estimate join broadcasts it, so
    the same plan holds at 100 TB: one partial-agg shuffle to build,
    zero shuffles to probe. Estimates are >= exact by construction
    (one-sided CMS error); sketch hashing is engine-specific
    (xxhash64) -> rows-only, accuracy bounds asserted in
    tests/test_sketch.py."""
    from pdf2dataset_spark.operators import sketch as sk

    li = t(spark, sf_dir, "lineitem")
    cms = sk.cms_build(li, "l_suppkey", depth=5, width=2048)
    top = (
        li.groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("exact_cnt"))
        .orderBy(F.desc("exact_cnt"), "l_suppkey")
        .limit(10)
    )
    return (
        sk.cms_estimate(cms, top, "l_suppkey", depth=5, width=2048)
        .join(top, "l_suppkey")
        .select("l_suppkey", "exact_cnt", "est_cnt")
        .orderBy(F.desc("exact_cnt"), "l_suppkey")
    )


# --------------------------------------------------------------- C20
@query("c20_freq_items", sql=None, tier="C")
def c20_freq_items(spark, sf_dir):
    """Approximate frequent items via Spark's built-in freqItems
    (Karp-Schenker-Papadimitriou single-pass; support 0.1) — the
    streaming-friendly complement to c19's CMS: KSP finds WHICH items
    are frequent in one pass with no candidate set, CMS estimates HOW
    OFTEN given candidates. False positives possible by contract ->
    rows-only; containment of every truly-frequent item asserted in
    tests/test_sketch.py."""
    o = t(spark, sf_dir, "orders")
    fi = o.freqItems(["o_orderpriority"], support=0.1)
    return fi.select(
        F.explode(F.sort_array(F.col("o_orderpriority_freqItems"))).alias(
            "frequent_priority"
        )
    )


# --------------------------------------------------------------- C21
@query(
    "c21_regression_aggregates",
    sql="""
    WITH c AS (
      SELECT l_returnflag,
             CAST(round(l_quantity*100,0) AS BIGINT) AS xc,
             CAST(round(l_extendedprice*100,0) AS BIGINT) AS yc
      FROM lineitem
    ), m AS (
      SELECT l_returnflag,
             COUNT(*) AS n,
             CAST(SUM(xc) AS DOUBLE) / 100 AS sx,
             CAST(SUM(CAST(xc*xc AS DECIMAL(38,0))) AS DOUBLE) / 10000.0 AS sxx,
             CAST(SUM(yc) AS DOUBLE) / 100 AS sy,
             CAST(SUM(CAST(yc*yc AS DECIMAL(38,0))) AS DOUBLE) / 10000.0 AS syy,
             CAST(SUM(CAST(xc*yc AS DECIMAL(38,0))) AS DOUBLE) / 10000.0 AS sxy
      FROM c GROUP BY l_returnflag
    ), p AS (
      -- one product per column: no FMA-contractable mixed expressions
      SELECT l_returnflag, n, sx, sy,
             n * sxy AS nsxy, sx * sy AS sxsy,
             n * sxx AS nsxx, sx * sx AS sxsx,
             n * syy AS nsyy, sy * sy AS sysy,
             sx / n AS mean_x, sy / n AS mean_y
      FROM m
    ), q AS (
      SELECT l_returnflag, n, mean_x, mean_y,
             nsxy - sxsy AS dxy, nsxx - sxsx AS dx, nsyy - sysy AS dy
      FROM p
    ), r AS (
      SELECT l_returnflag, n, mean_x, mean_y, dxy, dx, dy,
             dxy / dx AS slope
      FROM q
    ), s AS (
      SELECT l_returnflag, n, slope, mean_y,
             slope * mean_x AS slope_mx,
             dxy * dxy AS dxy2, dx * dy AS dxdy
      FROM r
    )
    SELECT l_returnflag,
           n AS regr_n,
           slope AS regr_slope,
           mean_y - slope_mx AS regr_intercept,
           dxy2 / dxdy AS regr_r2
    FROM s ORDER BY l_returnflag
    """,
    tier="C",
)
def c21_regression_aggregates(spark, sf_dir):
    """Linear-regression aggregates (regr_slope / regr_intercept /
    regr_r2 / regr_count) per group — c8's regression sibling.

    Spark's built-in regr_* (3.4+) accumulates raw double sums whose
    partial-aggregation order is nondeterministic at cluster scale, so
    the oracle-stable formulation computes the exact integer-cents
    moments (lossless on 2-decimal columns) and evaluates the closed
    forms in identically-staged IEEE double ops on both engines — each
    product in its own column so neither engine's compiler can fuse a
    multiply-add with different rounding. Agreement of Spark's
    built-in regr_* with this exact form is asserted in
    tests/test_operators.py."""
    li = t(spark, sf_dir, "lineitem")
    xc = cents("l_quantity")
    yc = cents("l_extendedprice")
    withc = li.select("l_returnflag", xc.alias("xc"), yc.alias("yc"))
    x, v = F.col("xc"), F.col("yc")
    d38 = lambda col: F.sum(col.cast("decimal(38,0)")).cast("double")  # noqa: E731
    m = withc.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum(x).cast("double") / 100).alias("sx"),
        (d38(x * x) / F.lit(10000.0)).alias("sxx"),
        (F.sum(v).cast("double") / 100).alias("sy"),
        (d38(v * v) / F.lit(10000.0)).alias("syy"),
        (d38(x * v) / F.lit(10000.0)).alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    p = m.select(
        "l_returnflag",
        n,
        sx,
        sy,
        (n * F.col("sxy")).alias("nsxy"),
        (sx * sy).alias("sxsy"),
        (n * F.col("sxx")).alias("nsxx"),
        (sx * sx).alias("sxsx"),
        (n * F.col("syy")).alias("nsyy"),
        (sy * sy).alias("sysy"),
        (sx / n).alias("mean_x"),
        (sy / n).alias("mean_y"),
    )
    q = p.select(
        "l_returnflag",
        "n",
        "mean_x",
        "mean_y",
        (F.col("nsxy") - F.col("sxsy")).alias("dxy"),
        (F.col("nsxx") - F.col("sxsx")).alias("dx"),
        (F.col("nsyy") - F.col("sysy")).alias("dy"),
    )
    r = q.select(
        "l_returnflag",
        "n",
        "mean_x",
        "mean_y",
        "dxy",
        "dx",
        "dy",
        (F.col("dxy") / F.col("dx")).alias("slope"),
    )
    s = r.select(
        "l_returnflag",
        "n",
        "slope",
        "mean_y",
        (F.col("slope") * F.col("mean_x")).alias("slope_mx"),
        (F.col("dxy") * F.col("dxy")).alias("dxy2"),
        (F.col("dx") * F.col("dy")).alias("dxdy"),
    )
    return s.select(
        "l_returnflag",
        F.col("n").alias("regr_n"),
        F.col("slope").alias("regr_slope"),
        (F.col("mean_y") - F.col("slope_mx")).alias("regr_intercept"),
        (F.col("dxy2") / F.col("dxdy")).alias("regr_r2"),
    ).orderBy("l_returnflag")


# --------------------------------------------------------------- C22
@query(
    "c22_misc_aggregates",
    sql="""
    SELECT mode(o_orderpriority) AS mode_priority,
           COUNT(*) FILTER (WHERE o_totalprice > 100000) AS n_big,
           bool_or(o_orderstatus = 'P') AS has_pending,
           bool_and(o_totalprice > 0) AS all_positive
    FROM orders
    """,
    tier="C",
)
def c22_misc_aggregates(spark, sf_dir):
    """Small-surface aggregates: mode / count_if / bool_or / bool_and
    (C-tier completeness row). mode() tie-breaking is engine-defined,
    so this registers only because the testdata's o_orderpriority mode
    is unique at every scale factor (verified sf0.001/0.01/0.1);
    bool_and/bool_or are lattice aggregates (associative, idempotent)
    and count_if is a guarded count — all partial-agg safe, one
    group-less shuffle of a single partial row per partition."""
    o = t(spark, sf_dir, "orders")
    return o.agg(
        F.mode("o_orderpriority").alias("mode_priority"),
        F.count_if(F.col("o_totalprice") > 100000).alias("n_big"),
        F.bool_or(F.col("o_orderstatus") == "P").alias("has_pending"),
        F.bool_and(F.col("o_totalprice") > 0).alias("all_positive"),
    )


# --------------------------------------------------------------- C23
@query(
    "c23_percentile_disc",
    sql="""
    WITH cd AS (
      SELECT l_returnflag, l_quantity,
             cume_dist() OVER (
               PARTITION BY l_returnflag ORDER BY l_quantity
             ) AS cd
      FROM lineitem
    )
    SELECT l_returnflag,
           min(CASE WHEN cd >= 0.25 THEN l_quantity END) AS p25,
           min(CASE WHEN cd >= 0.50 THEN l_quantity END) AS p50,
           min(CASE WHEN cd >= 0.75 THEN l_quantity END) AS p75
    FROM cd GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    tier="C",
)
def c23_percentile_disc(spark, sf_dir):
    """Discrete percentiles (C23; c9's PERCENTILE_DISC sibling —
    returns actual data values, never interpolates). Engines differ
    on PERCENTILE_DISC tie/boundary fine print, so both sides run the
    one canonical definition: smallest value whose cume_dist reaches
    p. cume_dist is an exact rank/n rational in double on both
    engines, so the >= p comparisons are engine-invariant. One window
    shuffle on the group key, then a partial-aggregable min-CASE."""
    li = t(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_returnflag").orderBy("l_quantity")
    cd = li.select(
        "l_returnflag",
        "l_quantity",
        F.cume_dist().over(w).alias("cd"),
    )
    pick = lambda p: F.min(  # noqa: E731
        F.when(F.col("cd") >= p, F.col("l_quantity"))
    )
    return (
        cd.groupBy("l_returnflag")
        .agg(
            pick(0.25).alias("p25"),
            pick(0.50).alias("p50"),
            pick(0.75).alias("p75"),
        )
        .orderBy("l_returnflag")
    )


# --------------------------------------------------------------- C24
@query(
    "c24_metadata_stats",
    sql="""
    SELECT COUNT(*) AS n_rows,
           MIN(l_orderkey) AS min_l_orderkey,
           MAX(l_orderkey) AS max_l_orderkey,
           MIN(l_quantity) AS min_l_quantity,
           MAX(l_quantity) AS max_l_quantity
    FROM lineitem
    """,
    tier="C",
)
def c24_metadata_stats(spark, sf_dir):
    """Footer-metadata-only table stats (C-tier scan elision):
    COUNT(*)/MIN/MAX answered from parquet row-group footers via the
    v2 ParquetScan aggregate pushdown (io.table_stats) — zero data
    pages decoded. At 100 TB this is a metadata read (MBs of footers,
    one tiny task per file) instead of a full-table scan; the plan
    test pins the non-empty PushedAggregation in the BatchScan.
    DuckDB answers the twin from its own parquet metadata, so the
    oracle doubles as a footer-stats cross-check. Pushdown supports
    numeric min/max only (timestamp/string min-max fall back to a
    real scan — still correct, pinned in plan tests)."""
    from pdf2dataset_spark.io import table_stats

    return table_stats(
        spark, sf_dir, "lineitem", cols=("l_orderkey", "l_quantity")
    )


# --------------------------------------------------------------- C25
@query("c25_kmv_set_sketches", sql=None, tier="C")
def c25_kmv_set_sketches(spark, sf_dir):
    """KMV/theta sketches with SET operations (C25): per-source
    distinct-vocabulary sketches over documents, estimated distinct
    count per source plus estimated jaccard/intersection of each
    source's vocabulary with source 'src0'. HLL (c14) can only union;
    KMV also intersects — the Druid/DataSketches capability —
    and merge is EXACT (sketch(A)∪sketch(B) == sketch(A∪B),
    property-tested in tests/test_sketch.py). Rows-only: estimates
    hinge on xxhash64, which the oracle engine lacks; accuracy and
    exact-merge semantics are pytest-pinned."""
    from pdf2dataset_spark.operators import sketch as sk

    d = t(spark, sf_dir, "documents").select(
        "source", F.explode(F.split("text", r"\s+")).alias("word")
    )
    k = 256
    sketches = sk.kmv_build(d, "word", k=k, by=["source"])
    ref = (
        sketches.filter(F.col("source") == "src0")
        .select(F.col("kmv").alias("ref_kmv"))
    )
    jacc, inter = sk.kmv_intersection("kmv", "ref_kmv", k=k)
    return (
        sketches.crossJoin(F.broadcast(ref))
        .select(
            "source",
            F.round(sk.kmv_estimate("kmv", k=k), 1).alias("vocab_est"),
            F.round(jacc, 4).alias("jaccard_vs_src0"),
            F.round(inter, 1).alias("overlap_est"),
        )
        .orderBy("source")
    )
