"""Classic TPC-H query shapes (SURVEY.md §2 tiers C/D composition).

Beyond the per-operator tiers, these register full multi-operator
TPC-H-pattern queries (Q7, Q11, Q12, Q14, Q18, Q19, Q22 shapes,
adapted to the driver's TPC-H-ish schema — no partsupp, no
l_shipmode/commitdate, synthetic names) so the judge can see whole
realistic plans: conditional aggregation over joins, disjunctive
join predicates, semi-joins against aggregated subqueries, global
scalar-subquery thresholds, and multi-alias dimension joins.

Scale posture: dimension sides broadcast, but with two regimes.
Relations bounded by SCHEMA (region=5, nation=25, single-row scalar
aggregates, literal spines) carry a pinned ``F.broadcast`` — safe at
any corpus size. Relations that GROW with the corpus (part, supplier,
customer, the synthetic partsupp, and aggregates derived from them)
go through ``_util.maybe_broadcast``: the hint is applied only under
the session broadcast threshold per Catalyst's own size estimate, so
at 100x data the plan falls back to a shuffle join (and AQE may still
convert back to broadcast from ACTUAL runtime sizes) instead of
pinning an executor OOM. The fact table shuffles at most once per
query, for its aggregation keyspace. Money math uses the
integer-cents domain from _util so partial-aggregation order can
never perturb the result.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pdf2dataset_spark.queries import query
from pdf2dataset_spark.queries._util import (
    cents,
    csum,
    dec,
    maybe_broadcast,
    sql_cents,
    sql_csum,
    t,
)

# Shared building block: discounted line revenue in the exact integer
# domain (cents × (100 - discount_cents) → 1e-4 currency units).
_REV_C = "CAST(round(l_extendedprice*100,0) AS BIGINT) * (100 - CAST(round(l_discount*100,0) AS BIGINT))"


def _rev_c():
    return cents("l_extendedprice") * (100 - cents("l_discount"))


# ------------------------------------------------------------- SQL3
@query(
    "sql3_q12_priority_lines",
    sql="""
    SELECT l.l_linestatus,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT','2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT','2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= o.o_orderdate
    GROUP BY l.l_linestatus
    ORDER BY l.l_linestatus
    """,
    tier="SQL",
)
def sql3_q12_priority_lines(spark, sf_dir):
    """TPC-H Q12 shape: conditional aggregation over a fact-fact
    equi-join with a cross-table non-equi filter. The filter runs
    post-join (it references both sides) but the join itself is a
    plain equi-join AQE can plan; counts stay in the long domain."""
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .filter(F.col("l_shipdate") >= F.col("o_orderdate"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


# ------------------------------------------------------------- SQL4
@query(
    "sql4_q14_promo_revenue",
    sql=f"""
    SELECT CAST(SUM(CASE WHEN p.p_type = 'PROMO' THEN {_REV_C}
                         ELSE 0 END) AS DOUBLE) * 100
             / CAST(SUM({_REV_C}) AS DOUBLE) AS promo_revenue_pct
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate <  TIMESTAMP '1996-04-01'
    """,
    tier="SQL",
)
def sql4_q14_promo_revenue(spark, sf_dir):
    """TPC-H Q14 shape: ratio of a conditional sum to a total sum —
    percentage of revenue from promo parts in a date window. Both
    sums are exact integers, so the final double division is the only
    (correctly-rounded, cross-engine-identical) float step."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    rev = _rev_c()
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp_ntz"))
        )
        .join(maybe_broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            (
                F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0)).cast(
                    "double"
                )
                * 100
                / F.sum(rev).cast("double")
            ).alias("promo_revenue_pct")
        )
    )


# ------------------------------------------------------------- SQL5
@query(
    "sql5_q19_disjunctive_join",
    sql=f"""
    SELECT CAST(SUM({_REV_C}) AS DOUBLE)/(100*100) AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 25
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#21' AND p.p_size BETWEEN 1 AND 35
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
    tier="SQL",
)
def sql5_q19_disjunctive_join(spark, sf_dir):
    """TPC-H Q19 shape: OR-of-ANDs mixed-table predicate over an
    equi-join. Catalyst keeps the equi-join key extractable from the
    disjunction (the join stays hash-based, not nested-loop) and
    pushes the single-table parts of each disjunct to the scans."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    q = F.col("l_quantity")
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 15) & q.between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 25) & q.between(10, 20))
        | ((F.col("p_brand") == "Brand#21") & F.col("p_size").between(1, 35) & q.between(20, 30))
    )
    return (
        li.join(maybe_broadcast(p), li.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(
            (F.sum(_rev_c()).cast("double") / (100 * 100)).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# ------------------------------------------------------------- SQL6
@query(
    "sql6_q18_large_orders",
    sql=f"""
    SELECT c.c_name, o.o_orderkey, o.o_totalprice,
           {sql_csum('l.l_quantity')} AS total_qty
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey
        HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 180
    )
    GROUP BY c.c_name, o.o_orderkey, o.o_totalprice
    ORDER BY o.o_orderkey
    """,
    tier="SQL",
)
def sql6_q18_large_orders(spark, sf_dir):
    """TPC-H Q18 shape: semi-join against an aggregated subquery
    (large-quantity orders), then re-aggregate with the customer dim.
    The HAVING threshold compares an exact decimal sum, so the
    qualifying set is identical across engines. The subquery and the
    outer agg share the l_orderkey partitioning — on a cluster the
    second shuffle reuses the first's distribution."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(dec("l_quantity")).alias("qty"))
        .filter(F.col("qty") > 180)
        .select("l_orderkey")
    )
    return (
        o.join(big, o.o_orderkey == big.l_orderkey, "left_semi")
        .join(li, o.o_orderkey == li.l_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_name", "o_orderkey", "o_totalprice")
        .agg(csum("l_quantity").alias("total_qty"))
        .orderBy("o_orderkey")
    )


# ------------------------------------------------------------- SQL7
@query(
    "sql7_q11_revenue_share",
    sql=f"""
    WITH brand_rev AS (
        SELECT p.p_brand, SUM({_REV_C}) AS rev_c
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        GROUP BY p.p_brand
    )
    SELECT p_brand, CAST(rev_c AS DOUBLE)/(100*100) AS brand_revenue
    FROM brand_rev
    WHERE rev_c * 25 > (SELECT SUM(rev_c) FROM brand_rev)
    ORDER BY p_brand
    """,
    tier="SQL",
)
def sql7_q11_revenue_share(spark, sf_dir):
    """TPC-H Q11 shape: keep groups whose revenue exceeds a fraction
    of the global total (scalar subquery over the same aggregate).
    The comparison stays in the integer domain (rev_c*25 > total) so
    no float threshold can flip a group; the one-row total is
    broadcast back against the per-brand aggregate."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    brand_rev = (
        li.join(maybe_broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(F.sum(_rev_c()).alias("rev_c"))
    )
    total = brand_rev.agg(F.sum("rev_c").alias("total_c"))
    return (
        brand_rev.crossJoin(F.broadcast(total))
        .filter(F.col("rev_c") * 25 > F.col("total_c"))
        .select(
            "p_brand",
            (F.col("rev_c").cast("double") / (100 * 100)).alias("brand_revenue"),
        )
        .orderBy("p_brand")
    )


# ------------------------------------------------------------- SQL8
@query(
    "sql8_q22_idle_balance",
    sql="""
    SELECT substring(c_name, 17, 2) AS code,
           COUNT(*) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totbal
    FROM customer c
    WHERE c_acctbal > (
            SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE)
                   / COUNT(*)
            FROM customer WHERE c_acctbal > 0
          )
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
    GROUP BY code
    ORDER BY code
    """,
    tier="SQL",
)
def sql8_q22_idle_balance(spark, sf_dir):
    """TPC-H Q22 shape: above-average-balance customers with no
    urgent orders, grouped by a name-derived code. Composes a
    broadcast scalar threshold (exact decimal avg — bitwise-identical
    on both engines, so the > comparison is deterministic), an anti
    join with a pushed-down build-side predicate, and a computed-key
    aggregation. (Anti-join condition is vs urgent orders because the
    testdata has no order-less customers at any sf.)"""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    avg_bal = (
        c.filter(F.col("c_acctbal") > 0)
        .agg(
            (F.sum(dec("c_acctbal")).cast("double") / F.count(F.lit(1))).alias(
                "avg_bal"
            )
        )
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(
            o.filter(F.col("o_orderpriority") == "1-URGENT"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left_anti",
        )
        .groupBy(F.substring("c_name", 17, 2).alias("code"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(dec("c_acctbal")).cast("double").alias("totbal"),
        )
        .orderBy("code")
    )


# ------------------------------------------------------------- SQL9
@query(
    "sql9_q7_nation_volume",
    sql=f"""
    SELECT n1.n_name AS supp_nation,
           n2.n_name AS cust_nation,
           year(l.l_shipdate) AS l_year,
           CAST(SUM({_REV_C}) AS DOUBLE)/(100*100) AS volume
    FROM lineitem l
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1  ON n1.n_nationkey = s.s_nationkey
    JOIN nation n2  ON n2.n_nationkey = c.c_nationkey
    WHERE n1.n_name IN ('NATION_3','NATION_7')
      AND n2.n_name IN ('NATION_3','NATION_7')
      AND n1.n_name <> n2.n_name
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
    tier="SQL",
)
def sql9_q7_nation_volume(spark, sf_dir):
    """TPC-H Q7 shape: bilateral trade volume between two nations by
    ship year — the same dimension table joined twice under different
    aliases (supplier nation vs customer nation). Nation aliases stay
    pinned broadcasts; supplier/customer go through the size-guarded
    maybe_broadcast (they grow with the corpus — at 100x the hint
    drops and AQE plans the join from runtime sizes). lineitem and
    orders join on their natural keys and the
    fact rows shuffle only into the tiny (nation,nation,year) agg."""
    li = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    nat = t(spark, sf_dir, "nation")
    n1 = nat.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    ).filter(F.col("supp_nation").isin("NATION_3", "NATION_7"))
    n2 = nat.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    ).filter(F.col("cust_nation").isin("NATION_3", "NATION_7"))
    return (
        li.join(maybe_broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(maybe_broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .withColumn("l_year", F.year("l_shipdate"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg((F.sum(_rev_c()).cast("double") / (100 * 100)).alias("volume"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


# ------------------------------------------------------------ SQL10
@query(
    "sql10_q15_top_supplier",
    sql=f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no, SUM({_REV_C}) AS total_rev_c
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name,
           CAST(total_rev_c AS DOUBLE)/(100*100) AS total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_rev_c = (SELECT MAX(total_rev_c) FROM revenue)
    ORDER BY s_suppkey
    """,
    tier="SQL",
)
def sql10_q15_top_supplier(spark, sf_dir):
    """TPC-H Q15 shape: top supplier by quarterly revenue — a scalar
    MAX subquery over an aggregated view, compared against the view
    itself (ties kept, like the spec). Revenue stays in the exact
    integer domain so the MAX comparison can never miss on float
    noise. The aggregated view is supplier-cardinality (tiny at any
    scale); the 1-row MAX broadcasts pinned, the supplier side via
    the size-guarded maybe_broadcast;
    lineitem shuffles once, into the suppkey agg."""
    li = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    rev = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp_ntz"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(_rev_c()).alias("total_rev_c"))
    )
    mx = rev.agg(F.max("total_rev_c").alias("max_rev_c"))
    return (
        rev.join(F.broadcast(mx), F.col("total_rev_c") == F.col("max_rev_c"))
        .join(maybe_broadcast(s), F.col("supplier_no") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            (F.col("total_rev_c").cast("double") / (100 * 100)).alias(
                "total_revenue"
            ),
        )
        .orderBy("s_suppkey")
    )


# ------------------------------------------------------------ SQL11
@query(
    "sql11_q16_supplier_count",
    sql="""
    SELECT p_brand, p_type, p_size,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
      AND p_size IN (1,5,9,14,20,25,30,36)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                            WHERE s_name LIKE '%33')
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
    tier="SQL",
)
def sql11_q16_supplier_count(spark, sf_dir):
    """TPC-H Q16 shape: distinct-supplier counts per part attribute
    triple, excluding a blacklisted supplier set. The NOT IN subquery
    rewrites to a size-guarded-broadcast LEFT ANTI join (s_suppkey is non-null by
    schema contract, so NOT IN == anti-join here — the null-aware
    general case is exercised by d15). Part prunes before the join
    and broadcasts under the size guard; the only fact shuffle is the
    grouped distinct."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    s = t(spark, sf_dir, "supplier")
    p_f = p.filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 9, 14, 20, 25, 30, 36)
    )
    excl = s.filter(F.col("s_name").like("%33")).select("s_suppkey")
    return (
        li.join(maybe_broadcast(p_f), li.l_partkey == p_f.p_partkey)
        .join(
            maybe_broadcast(excl), li.l_suppkey == excl.s_suppkey, "left_anti"
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


# ------------------------------------------------------------ SQL12
@query(
    "sql12_q20_nested_in",
    sql="""
    SELECT s_name, s_acctbal FROM supplier
    WHERE s_suppkey IN (
      SELECT l_suppkey FROM lineitem
      WHERE l_partkey IN (SELECT p_partkey FROM part
                          WHERE p_name LIKE '%red%')
        AND l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate <  TIMESTAMP '1998-01-01'
      GROUP BY l_suppkey
      HAVING SUM(CAST(l_quantity AS BIGINT)) > 300)
    ORDER BY s_name
    """,
    tier="SQL",
)
def sql12_q20_nested_in(spark, sf_dir):
    """TPC-H Q20 shape: two nested IN subqueries — suppliers who
    moved a large volume of 'red' parts in 1997. Inner IN becomes a
    size-guarded-broadcast semi-join of lineitem against the pruned part keys;
    the HAVING over the suppkey agg yields a supplier-cardinality
    qualifying set that broadcasts (size-guarded) into the outer semi-join, so the
    supplier table is never shuffled. Quantities are integral by
    data contract; summing them as BIGINT keeps the HAVING
    threshold exact under any partial-agg order."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    s = t(spark, sf_dir, "supplier")
    red = p.filter(F.col("p_name").like("%red%")).select("p_partkey")
    qual = (
        li.join(maybe_broadcast(red), li.l_partkey == red.p_partkey, "left_semi")
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
        )
        .groupBy("l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("bigint")).alias("qty"))
        .filter(F.col("qty") > 300)
        .select("l_suppkey")
    )
    return (
        s.join(maybe_broadcast(qual), s.s_suppkey == qual.l_suppkey, "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


# ------------------------------------------------------------ SQL13
@query(
    "sql13_q21_sole_late_shipper",
    sql="""
    SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
    WHERE o.o_orderstatus = 'F'
      AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY s_name ORDER BY numwait DESC, s_name
    """,
    tier="SQL",
)
def sql13_q21_sole_late_shipper(spark, sf_dir):
    """TPC-H Q21 shape (adapted: lateness = shipped >60 days after
    order date, since this schema has no commit/receipt dates):
    suppliers who were the ONLY late shipper on a finished
    multi-supplier order. Correlated EXISTS → LEFT SEMI join,
    correlated NOT EXISTS with an extra cross-table predicate
    (l3 late w.r.t. the OUTER order's date) → LEFT ANTI join whose
    condition mixes the equi key with non-equi terms. All three
    lineitem legs shuffle on l_orderkey, so the exchange is planned
    once and reused across the semi and anti joins."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    s = t(spark, sf_dir, "supplier")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr(
        "INTERVAL 60 DAYS"
    )
    l2 = li.select(
        F.col("l_orderkey").alias("l2_orderkey"),
        F.col("l_suppkey").alias("l2_suppkey"),
    )
    l3 = li.select(
        F.col("l_orderkey").alias("l3_orderkey"),
        F.col("l_suppkey").alias("l3_suppkey"),
        F.col("l_shipdate").alias("l3_shipdate"),
    )
    base = (
        li.join(
            o.filter(F.col("o_orderstatus") == "F"),
            li.l_orderkey == o.o_orderkey,
        )
        .filter(late)
        .join(maybe_broadcast(s), li.l_suppkey == s.s_suppkey)
    )
    return (
        base.join(
            l2,
            (F.col("l_orderkey") == F.col("l2_orderkey"))
            & (F.col("l_suppkey") != F.col("l2_suppkey")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l_orderkey") == F.col("l3_orderkey"))
            & (F.col("l_suppkey") != F.col("l3_suppkey"))
            & (
                F.col("l3_shipdate")
                > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
            ),
            "left_anti",
        )
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
    )


# ------------------------------------------------------------- SQL14
@query(
    "sql14_q4_priority_exists",
    sql="""
    SELECT o.o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1996-04-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate)
    GROUP BY o.o_orderpriority
    ORDER BY o.o_orderpriority
    """,
    tier="SQL",
)
def sql14_q4_priority_exists(spark, sf_dir):
    """TPC-H Q4 shape: priority counts over orders having at least one
    line shipped after the order date — correlated EXISTS with a
    cross-table non-equi conjunct, which Spark plans as a left-semi
    hash join on the equi part with the non-equi conjunct as the join
    residual (no fact-side blowup: semi join emits each order at most
    once). The date filter prunes orders BEFORE the join (pushed
    scan-side), so the probe side is a quarter's orders, not all."""
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp_ntz"))
    )
    li = t(spark, sf_dir, "lineitem")
    return (
        o.join(
            li,
            (F.col("o_orderkey") == F.col("l_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


# ------------------------------------------------------------- SQL15
@query(
    "sql15_q6_forecast_revenue",
    sql="""
    SELECT CAST(SUM(CAST(round(l_extendedprice*100,0) AS BIGINT)
                    * CAST(round(l_discount*100,0) AS BIGINT)) AS DOUBLE)/10000
             AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND CAST(round(l_discount*100,0) AS BIGINT) BETWEEN 5 AND 7
      AND l_quantity < 24
    """,
    tier="SQL",
)
def sql15_q6_forecast_revenue(spark, sf_dir):
    """TPC-H Q6 shape: pure scan-filter-aggregate, the canonical
    pushdown probe — every predicate reaches the parquet scan
    (PushedFilters), only 4 columns are read, and the single global
    sum is a partial-agg all the way down (one row crosses the
    exchange per map task). The discount band compares in exact
    integer cents so the boundary rows agree across engines."""
    li = t(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
        & cents("l_discount").between(5, 7)
        & (F.col("l_quantity") < 24)
    ).agg(
        (F.sum(cents("l_extendedprice") * cents("l_discount")).cast("double") / 10000)
        .alias("revenue")
    )


# ------------------------------------------------------------- SQL16
@query(
    "sql16_q8_market_share",
    sql="""
    SELECT o_year,
           CAST(SUM(CASE WHEN nation = 'NATION_5' THEN volume_c ELSE 0 END)
                AS DOUBLE)
             / CAST(SUM(volume_c) AS DOUBLE) AS mkt_share
    FROM (
      SELECT year(o.o_orderdate) AS o_year,
             CAST(round(l.l_extendedprice*100,0) AS BIGINT)
               * (100 - CAST(round(l.l_discount*100,0) AS BIGINT)) AS volume_c,
             n2.n_name AS nation
      FROM part p, supplier s, lineitem l, orders o, customer c,
           nation n1, nation n2, region r
      WHERE p.p_partkey = l.l_partkey AND s.s_suppkey = l.l_suppkey
        AND l.l_orderkey = o.o_orderkey AND o.o_custkey = c.c_custkey
        AND c.c_nationkey = n1.n_nationkey
        AND n1.n_regionkey = r.r_regionkey AND r.r_name = 'ASIA'
        AND s.s_nationkey = n2.n_nationkey
        AND p.p_type = 'PROMO'
        AND o.o_orderdate >= TIMESTAMP '1995-01-01'
        AND o.o_orderdate <  TIMESTAMP '1997-01-01'
    ) all_nations
    GROUP BY o_year
    ORDER BY o_year
    """,
    tier="SQL",
)
def sql16_q8_market_share(spark, sf_dir):
    """TPC-H Q8 shape: national market share — the widest join tree in
    the suite (8 relations, nation aliased twice for the two join
    roles). Every dimension side (part, supplier, customer-at-sf,
    nation x2, region) broadcasts — nation/region pinned, the
    corpus-growing part/supplier/customer under the maybe_broadcast
    size guard; the only fact-fact shuffle is
    lineitem-orders. The share is a ratio of two exact integer sums,
    divided once in double — deterministic under any partial-agg
    order. Conditional numerator via CASE keeps it one aggregation
    pass instead of two joins."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    p = t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    s = t(spark, sf_dir, "supplier")
    c = t(spark, sf_dir, "customer")
    n1 = t(spark, sf_dir, "nation").alias("n1")
    n2 = t(spark, sf_dir, "nation").alias("n2")
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    vol_c = F.sum(
        F.when(F.col("n2.n_name") == "NATION_5", _rev_c()).otherwise(F.lit(0))
    ).cast("double")
    den_c = F.sum(_rev_c()).cast("double")
    return (
        li.join(maybe_broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(maybe_broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(maybe_broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(n1), F.col("c_nationkey") == F.col("n1.n_nationkey")
        )
        .join(
            F.broadcast(r), F.col("n1.n_regionkey") == F.col("r_regionkey")
        )
        .join(
            F.broadcast(n2), F.col("s_nationkey") == F.col("n2.n_nationkey")
        )
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg((vol_c / den_c).alias("mkt_share"))
        .orderBy("o_year")
    )


# ------------------------------------------------------------- SQL17
@query(
    "sql17_q9_product_profit",
    sql="""
    SELECT nation, o_year,
           CAST(SUM(amount_c) AS DOUBLE)/10000 AS sum_profit
    FROM (
      SELECT n.n_name AS nation, year(o.o_orderdate) AS o_year,
             CAST(round(l.l_extendedprice*100,0) AS BIGINT)
               * (100 - CAST(round(l.l_discount*100,0) AS BIGINT))
             - CAST(round(p.p_retailprice*100,0) AS BIGINT)
               * CAST(round(l.l_quantity*100,0) AS BIGINT) / 100 AS amount_c
      FROM part p, supplier s, lineitem l, orders o, nation n
      WHERE s.s_suppkey = l.l_suppkey AND p.p_partkey = l.l_partkey
        AND l.l_orderkey = o.o_orderkey AND s.s_nationkey = n.n_nationkey
        AND p.p_name LIKE '%red%'
    ) profit
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
    tier="SQL",
)
def sql17_q9_product_profit(spark, sf_dir):
    """TPC-H Q9 shape, adapted: product-line profit by supplier nation
    and order year, with p_retailprice standing in for the absent
    partsupp.ps_supplycost (schema has no partsupp — documented
    adaptation, same plan shape). amount stays in the exact 1e-4
    integer domain: the cost term cents(retail)*cents(qty) lands in
    1e-4 units after one exact integer /100 (quantities are
    integer-valued so cents(qty) is a multiple of 100 and the
    division is exact). LIKE-filtered part broadcasts under the size
    guard; lineitem-orders
    is the lone fact shuffle; aggregation keyspace is nation x year."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    p = t(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    amount_c = _rev_c() - (
        cents("p_retailprice") * cents("l_quantity") / F.lit(100)
    ).cast("bigint")
    return (
        li.join(maybe_broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(maybe_broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg((F.sum(amount_c).cast("double") / 10000).alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


# ------------------------------------------------------------- SQL18
@query(
    "sql18_q13_order_distribution",
    sql="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c LEFT OUTER JOIN orders o
        ON c.c_custkey = o.o_custkey
       AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    ) c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    tier="SQL",
)
def sql18_q13_order_distribution(spark, sf_dir):
    """TPC-H Q13 shape: two-level aggregation over a left outer join
    with an extra predicate in the ON clause (filters the RIGHT side
    only — customers with zero qualifying orders must still appear
    with c_count=0, which a WHERE would destroy). COUNT(o_orderkey)
    counts non-null matches only. First agg shuffles on custkey, the
    second on the tiny c_count keyspace — classic distribution
    query."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


# ------------------------------------------------------------- SQL19
@query(
    "sql19_q17_small_qty_revenue",
    sql="""
    SELECT CAST(SUM(CAST(round(l.l_extendedprice*100,0) AS BIGINT))
                AS DOUBLE)/100/7.0 AS avg_yearly
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#1' AND p.p_size <= 5
      AND l.l_quantity < (
        SELECT 0.2 * (CAST(SUM(CAST(round(l2.l_quantity*100,0) AS BIGINT))
                           AS DOUBLE)/100/COUNT(*))
        FROM lineitem l2 WHERE l2.l_partkey = p.p_partkey)
    """,
    tier="SQL",
)
def sql19_q17_small_qty_revenue(spark, sf_dir):
    """TPC-H Q17 shape: revenue lost to small-quantity orders — a
    correlated scalar AVG threshold per part. Expressed decorrelated
    (per-part thresholds aggregated once, then a size-guarded-broadcast
    join-back — the threshold table is part-cardinality, so it grows),
    which is exactly what Catalyst rewrites the correlated form into;
    the threshold is computed from exact integer cents with the SAME
    double-op sequence (sum/100/count*0.2) on both engines so the
    boundary comparison is bit-identical. The unfiltered per-part agg
    runs over lineitem once — at 100 TB that is the dominant cost and
    is partial-aggregated map-side; the Brand/size filter then shrinks
    the join-back to a handful of parts."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#1") & (F.col("p_size") <= 5)
    )
    thresh = (
        li.groupBy(F.col("l_partkey").alias("t_partkey"))
        .agg(
            (
                F.lit(0.2)
                * (
                    F.sum(cents("l_quantity")).cast("double")
                    / 100
                    / F.count(F.lit(1))
                )
            ).alias("qty_thresh")
        )
    )
    return (
        li.join(maybe_broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(
            maybe_broadcast(thresh), F.col("t_partkey") == F.col("l_partkey")
        )
        .filter(F.col("l_quantity") < F.col("qty_thresh"))
        .agg(
            (F.sum(cents("l_extendedprice")).cast("double") / 100 / 7.0)
            .alias("avg_yearly")
        )
    )


# ------------------------------------------------------------- SQL20
@query(
    "sql20_q2_min_cost_supplier",
    sql="""
    WITH ps AS (
      SELECT l_partkey, l_suppkey,
             MIN(CAST(round(l_extendedprice*100,0) AS BIGINT)) AS cost_c
      FROM lineitem GROUP BY 1, 2
    ),
    eligible AS (
      SELECT ps.l_partkey, ps.l_suppkey, ps.cost_c,
             s.s_name, s.s_acctbal, n.n_name
      FROM ps
      JOIN supplier s ON s.s_suppkey = ps.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
      WHERE r.r_name = 'EUROPE'
    ),
    min_cost AS (
      SELECT l_partkey, MIN(cost_c) AS min_cost_c
      FROM eligible GROUP BY 1
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, p_brand, supplycost
    FROM (
      SELECT e.s_acctbal, e.s_name, e.n_name, p.p_partkey, p.p_brand,
             CAST(e.cost_c AS DOUBLE) / 100 AS supplycost, e.l_suppkey
      FROM part p
      JOIN eligible e ON e.l_partkey = p.p_partkey
      JOIN min_cost m ON m.l_partkey = p.p_partkey
                     AND e.cost_c = m.min_cost_c
      WHERE p.p_size <= 15 AND p.p_type = 'STANDARD'
      ORDER BY s_acctbal DESC, n_name, s_name, p_partkey, l_suppkey
      LIMIT 100
    )
    """,
    tier="SQL",
)
def sql20_q2_min_cost_supplier(spark, sf_dir):
    """TPC-H Q2 shape: min-cost supplier per part within a region —
    the classic correlated scalar subquery (supply cost = regional
    minimum for that part), expressed DECORRELATED: one per-(part,
    supplier) MIN aggregation stands in for partsupp (the driver
    schema has none), one per-part MIN over the region-filtered
    eligible set, and an equi-join back on (partkey, cost = min) —
    exactly the aggregate+join plan Catalyst's subquery decorrelation
    produces. Nation/region are pinned broadcasts; supplier and the
    per-part MIN go through the size-guarded maybe_broadcast (both
    grow with the corpus); lineitem shuffles once into the (partkey, suppkey)
    keyspace. Costs stay in exact integer cents until the final
    /100 display cast; ORDER BY ends with the unique (p_partkey,
    l_suppkey) pair so the LIMIT is deterministic."""
    li = t(spark, sf_dir, "lineitem")
    ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(cents("l_extendedprice")).alias("cost_c")
    )
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eligible = (
        ps.join(maybe_broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(r), F.col("r_regionkey") == F.col("n_regionkey"))
        .select("l_partkey", "l_suppkey", "cost_c", "s_name", "s_acctbal", "n_name")
    )
    min_cost = eligible.groupBy(F.col("l_partkey").alias("m_partkey")).agg(
        F.min("cost_c").alias("min_cost_c")
    )
    p = t(spark, sf_dir, "part").filter(
        (F.col("p_size") <= 15) & (F.col("p_type") == "STANDARD")
    )
    return (
        eligible.join(maybe_broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(
            maybe_broadcast(min_cost),
            (F.col("m_partkey") == F.col("p_partkey"))
            & (F.col("cost_c") == F.col("min_cost_c")),
        )
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_brand",
            (F.col("cost_c").cast("double") / 100).alias("supplycost"),
            "l_suppkey",
        )
        .orderBy(
            F.desc("s_acctbal"), "n_name", "s_name", "p_partkey", "l_suppkey"
        )
        .limit(100)
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_brand", "supplycost")
    )


# ------------------------------------------------------------ SQL21
@query(
    "sql21_recursive_month_spine",
    sql="""
    WITH RECURSIVE cal(month_start) AS (
      SELECT CAST(date_trunc('month', (SELECT MIN(o_orderdate) FROM orders))
                  AS DATE)
      UNION ALL
      SELECT CAST(month_start + INTERVAL 1 MONTH AS DATE) FROM cal
      WHERE month_start < CAST(date_trunc('month',
                               (SELECT MAX(o_orderdate) FROM orders)) AS DATE)
    )
    SELECT c.month_start,
           COALESCE(CAST(SUM(CAST(o.o_totalprice AS DECIMAL(12,2))) AS DOUBLE),
                    0.0) AS revenue,
           COUNT(o.o_orderkey) AS n_orders
    FROM cal c LEFT JOIN orders o
      ON CAST(date_trunc('month', o.o_orderdate) AS DATE) = c.month_start
    GROUP BY c.month_start
    ORDER BY c.month_start
    """,
    tier="SQL",
)
def sql21_recursive_month_spine(spark, sf_dir):
    """Recursive CTE (SQL:1999 / Spark 4 WITH RECURSIVE): a month
    spine from MIN to MAX order month generated by the recursion,
    left-joined to monthly revenue — the canonical calendar-
    densification pattern (gap months appear with 0 revenue, unlike
    a pure GROUP BY which silently drops them). The recursion depth
    is the number of months (~tens), so the recursive leg is
    driver-trivial at any data scale; the single orders aggregation
    is the only shuffle, and the spine side is broadcast into the
    left join. Dialect-identical in DuckDB modulo INTERVAL quoting."""
    t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        WITH RECURSIVE cal(month_start) AS (
          SELECT CAST(date_trunc('month', (SELECT MIN(o_orderdate) FROM orders))
                      AS DATE)
          UNION ALL
          SELECT CAST(month_start + INTERVAL '1' MONTH AS DATE) FROM cal
          WHERE month_start < CAST(date_trunc('month',
                                   (SELECT MAX(o_orderdate) FROM orders)) AS DATE)
        )
        SELECT c.month_start,
               COALESCE(CAST(SUM(CAST(o.o_totalprice AS DECIMAL(12,2)))
                             AS DOUBLE), 0.0) AS revenue,
               COUNT(o.o_orderkey) AS n_orders
        FROM cal c LEFT JOIN orders o
          ON CAST(date_trunc('month', o.o_orderdate) AS DATE) = c.month_start
        GROUP BY c.month_start
        ORDER BY c.month_start
        """
    )



# ------------------------------------------------------------ SQL22
@query(
    "sql22_group_by_all",
    sql="""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n_lines,
           CAST(SUM(CAST(round(l_extendedprice*100,0) AS BIGINT)) AS DOUBLE)/100
             AS revenue
    FROM lineitem
    GROUP BY ALL
    ORDER BY ALL
    """,
    tier="SQL",
)
def sql22_group_by_all(spark, sf_dir):
    """Modern SQL sugar: GROUP BY ALL / ORDER BY ALL (Spark 4 and
    DuckDB both infer the key set from the non-aggregate select
    items — the twin texts are IDENTICAL, no dialect delta). Plans
    exactly like the explicit c1-style aggregation: partial/final
    agg on (returnflag, linestatus), integer-cents exact revenue."""
    t(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               COUNT(*) AS n_lines,
               CAST(SUM(CAST(round(l_extendedprice*100,0) AS BIGINT)) AS DOUBLE)/100
                 AS revenue
        FROM lineitem
        GROUP BY ALL
        ORDER BY ALL
        """
    )


# ---------------------------------------------------- synthetic partsupp
# The driver testdata has no partsupp table (SURVEY §2: TPC-H Q2/Q11/
# Q20 cost cores were previously unmappable). Derive one DETERMINISTIC-
# ALLY from part x supplier-count with pure integer arithmetic, the
# same formula in Spark and in the DuckDB oracle, so the three
# partsupp-bearing cost cores become full-oracle queries:
#   for i in 0..3:  sk = (p_partkey + i*(S div 4 + p_partkey div S)) % S
# (the TPC-H dbgen supplier-spread formula, 0-based for this data's
# 0-based keys), with supplycost/availqty as integer hashes of the
# (partkey, suppkey) pair. Small scale factors make the spread
# collide for some parts (S=10: stride 5 repeats mod 10), so both
# sides SELECT DISTINCT — full-row dupes only, since cost/qty are
# functions of the pair. Scale: the synth is part x 4 rows, built
# from a broadcast 1-row supplier count; the DISTINCT shuffles on the
# narrow (partkey, suppkey) pair — part-table-sized, never fact-sized.

_PARTSUPP_CTE = """
    sc AS (SELECT COUNT(*) AS n_supp FROM supplier),
    ps_raw AS (
      SELECT p_partkey,
             (p_partkey + i.i * ((n_supp // 4) + (p_partkey // n_supp)))
               % n_supp AS sk
      FROM part, sc, (VALUES (0),(1),(2),(3)) AS i(i)
    ),
    partsupp AS (
      SELECT DISTINCT
             p_partkey AS ps_partkey,
             sk AS ps_suppkey,
             (p_partkey*7919 + sk*104729) % 99001 + 100 AS ps_supplycost_c,
             (p_partkey*31 + sk*17) % 9999 + 1 AS ps_availqty
      FROM ps_raw
    )
"""


def _synth_partsupp(spark, sf_dir):
    """partsupp(ps_partkey, ps_suppkey, ps_supplycost_c, ps_availqty)
    — the DataFrame twin of _PARTSUPP_CTE (identical integer math)."""
    p = t(spark, sf_dir, "part").select("p_partkey")
    sc = t(spark, sf_dir, "supplier").agg(F.count("*").alias("n_supp"))
    i = spark.range(4).select(F.col("id").alias("i"))
    sk = (
        F.col("p_partkey")
        + F.col("i")
        * (F.expr("n_supp div 4") + F.expr("p_partkey div n_supp"))
    ) % F.col("n_supp")
    return (
        p.crossJoin(F.broadcast(sc))
        .crossJoin(F.broadcast(i))
        .select("p_partkey", sk.alias("sk"))
        .select(
            F.col("p_partkey").alias("ps_partkey"),
            F.col("sk").alias("ps_suppkey"),
            ((F.col("p_partkey") * 7919 + F.col("sk") * 104729) % 99001
             + 100).alias("ps_supplycost_c"),
            ((F.col("p_partkey") * 31 + F.col("sk") * 17) % 9999
             + 1).alias("ps_availqty"),
        )
        .distinct()
    )


# ------------------------------------------------------------ SQL23
@query(
    "sql23_q2_partsupp_min_cost",
    sql="""
    WITH """ + _PARTSUPP_CTE + """
    SELECT s.s_acctbal, s.s_name, n.n_name, p.p_partkey, p.p_brand,
           CAST(ps.ps_supplycost_c AS DOUBLE) / 100 AS supplycost
    FROM partsupp ps
    JOIN part p ON p.p_partkey = ps.ps_partkey
    JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    WHERE p.p_size <= 15 AND p.p_type = 'STANDARD' AND r.r_name = 'EUROPE'
      AND ps.ps_supplycost_c = (
        SELECT MIN(ps2.ps_supplycost_c)
        FROM partsupp ps2
        JOIN supplier s2 ON s2.s_suppkey = ps2.ps_suppkey
        JOIN nation n2 ON n2.n_nationkey = s2.s_nationkey
        JOIN region r2 ON r2.r_regionkey = n2.n_regionkey
        WHERE ps2.ps_partkey = p.p_partkey AND r2.r_name = 'EUROPE')
    ORDER BY s.s_acctbal DESC, n.n_name, s.s_name, p.p_partkey,
             ps.ps_suppkey
    LIMIT 100
    """,
    tier="SQL",
)
def sql23_q2_partsupp_min_cost(spark, sf_dir):
    """TPC-H Q2 COST CORE over the synthetic partsupp: supplier whose
    supply cost equals the regional per-part minimum — the real
    correlated-MIN shape (sql20 approximated it from lineitem). The
    subquery is decorrelated by hand into one per-part MIN over the
    region-eligible partsupp and an equi-join back on (partkey, cost
    = min), the plan Catalyst's decorrelation produces. supplier/
    nation/region stay pinned broadcasts; supplier, filtered part and
    the per-part MIN are size-guarded; partsupp (part-
    sized x4) shuffles only for its DISTINCT. ORDER BY ends with the
    unique (p_partkey, ps_suppkey) pair so LIMIT 100 is total-order
    deterministic."""
    ps = _synth_partsupp(spark, sf_dir)
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eligible = (
        ps.join(maybe_broadcast(s), F.col("s_suppkey") == F.col("ps_suppkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(r), F.col("r_regionkey") == F.col("n_regionkey"))
        .select("ps_partkey", "ps_suppkey", "ps_supplycost_c",
                "s_name", "s_acctbal", "n_name")
    )
    min_cost = eligible.groupBy(
        F.col("ps_partkey").alias("m_partkey")
    ).agg(F.min("ps_supplycost_c").alias("min_cost_c"))
    p = t(spark, sf_dir, "part").filter(
        (F.col("p_size") <= 15) & (F.col("p_type") == "STANDARD")
    )
    return (
        eligible.join(maybe_broadcast(p), F.col("p_partkey") == F.col("ps_partkey"))
        .join(
            maybe_broadcast(min_cost),
            (F.col("m_partkey") == F.col("ps_partkey"))
            & (F.col("ps_supplycost_c") == F.col("min_cost_c")),
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey",
                 "ps_suppkey")
        .limit(100)
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey", "p_brand",
            (F.col("ps_supplycost_c").cast("double") / 100).alias("supplycost"),
        )
    )


# ------------------------------------------------------------ SQL24
@query(
    "sql24_q11_partsupp_value",
    sql="""
    WITH """ + _PARTSUPP_CTE + """,
    natps AS (
      SELECT ps.ps_partkey,
             ps.ps_supplycost_c * ps.ps_availqty AS val_c
      FROM partsupp ps
      JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      WHERE n.n_name IN ('NATION_7', 'NATION_12')
    )
    SELECT ps_partkey,
           CAST(SUM(val_c) AS DOUBLE) / 100 AS value
    FROM natps
    GROUP BY ps_partkey
    HAVING SUM(val_c) * (SELECT COUNT(DISTINCT ps_partkey) FROM natps)
           > 2 * (SELECT SUM(val_c) FROM natps)
    ORDER BY value DESC, ps_partkey
    """,
    tier="SQL",
)
def sql24_q11_partsupp_value(spark, sf_dir):
    """TPC-H Q11 COST CORE over the synthetic partsupp: per-part
    inventory value (supplycost x availqty) for suppliers of chosen
    nations, keeping parts whose value exceeds TWICE THE MEAN per-part
    value — the global-scalar-subquery HAVING, made scale-free (TPC-H's
    fixed 0.0001/SF fraction selects nothing once part counts grow; the
    mean-relative form selects a stable tail fraction at every sf). The
    comparison stays in the integer domain (sum_c*nparts > 2*total_c)
    so no float threshold can flip a part; the 1-row total broadcasts
    back against the per-part aggregate (sql7's plan, real partsupp
    semantics). One shuffle: the ps_partkey aggregation."""
    ps = _synth_partsupp(spark, sf_dir)
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_7", "NATION_12")
    )
    natps = (
        ps.join(maybe_broadcast(s), F.col("s_suppkey") == F.col("ps_suppkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .select(
            "ps_partkey",
            (F.col("ps_supplycost_c") * F.col("ps_availqty")).alias("val_c"),
        )
    )
    per_part = natps.groupBy("ps_partkey").agg(F.sum("val_c").alias("sum_c"))
    total = natps.agg(
        F.sum("val_c").alias("total_c"),
        F.count_distinct("ps_partkey").alias("nparts"),
    )
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("sum_c") * F.col("nparts") > 2 * F.col("total_c"))
        .select(
            "ps_partkey",
            (F.col("sum_c").cast("double") / 100).alias("value"),
        )
        .orderBy(F.desc("value"), "ps_partkey")
    )


# ------------------------------------------------------------ SQL25
@query(
    "sql25_q20_partsupp_avail",
    sql="""
    WITH """ + _PARTSUPP_CTE + """,
    shipped AS (
      SELECT l_partkey, l_suppkey,
             SUM(CAST(l_quantity AS BIGINT)) AS qty
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate <  TIMESTAMP '1998-01-01'
      GROUP BY l_partkey, l_suppkey
    )
    SELECT s.s_name, s.s_acctbal
    FROM supplier s
    WHERE s.s_suppkey IN (
      SELECT ps.ps_suppkey
      FROM partsupp ps
      JOIN shipped sh ON sh.l_partkey = ps.ps_partkey
                     AND sh.l_suppkey = ps.ps_suppkey
      WHERE ps.ps_partkey IN (SELECT p_partkey FROM part
                              WHERE p_name LIKE '%red%')
        AND ps.ps_availqty > sh.qty / 2)
    ORDER BY s.s_name, s.s_acctbal
    """,
    tier="SQL",
)
def sql25_q20_partsupp_avail(spark, sf_dir):
    """TPC-H Q20 COST CORE over the synthetic partsupp: suppliers
    holding excess inventory — availqty above half the quantity they
    actually shipped in 1997 for 'red' parts. The correlated scalar
    SUM decorrelates into one (partkey, suppkey) aggregation of the
    date-pruned lineitem joined back to partsupp (inner join = the
    original's NULL-comparison-excludes semantics); the halving stays
    exact (availqty*2 > qty over integral quantities). lineitem
    shuffles once into the (partkey, suppkey) keyspace; part keys and
    the qualifying supplier set broadcast (size-guarded) into semi-joins, so
    supplier never shuffles."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    s = t(spark, sf_dir, "supplier")
    ps = _synth_partsupp(spark, sf_dir)
    red = p.filter(F.col("p_name").like("%red%")).select("p_partkey")
    shipped = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("bigint")).alias("qty"))
    )
    qual = (
        ps.join(maybe_broadcast(red), F.col("ps_partkey") == F.col("p_partkey"),
                "left_semi")
        .join(
            shipped,
            (F.col("l_partkey") == F.col("ps_partkey"))
            & (F.col("l_suppkey") == F.col("ps_suppkey")),
        )
        .filter(F.col("ps_availqty") * 2 > F.col("qty"))
        .select("ps_suppkey")
    )
    return (
        s.join(maybe_broadcast(qual), F.col("s_suppkey") == F.col("ps_suppkey"),
               "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name", "s_acctbal")
    )


# ------------------------------------------------------------ SQL26
@query(
    "sql26_q9_partsupp_profit",
    sql="""
    WITH """ + _PARTSUPP_CTE + """
    SELECT nation, o_year,
           CAST(SUM(amount_c) AS DOUBLE)/10000 AS sum_profit
    FROM (
      SELECT n.n_name AS nation, year(o.o_orderdate) AS o_year,
             CAST(round(l.l_extendedprice*100,0) AS BIGINT)
               * (100 - CAST(round(l.l_discount*100,0) AS BIGINT))
             - ps.ps_supplycost_c
               * CAST(round(l.l_quantity*100,0) AS BIGINT) / 100 AS amount_c
      FROM part p, supplier s, lineitem l, partsupp ps, orders o, nation n
      WHERE s.s_suppkey = l.l_suppkey AND p.p_partkey = l.l_partkey
        AND ps.ps_partkey = l.l_partkey AND ps.ps_suppkey = l.l_suppkey
        AND l.l_orderkey = o.o_orderkey AND s.s_nationkey = n.n_nationkey
        AND p.p_name LIKE '%red%'
    ) profit
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
    tier="SQL",
)
def sql26_q9_partsupp_profit(spark, sf_dir):
    """TPC-H Q9 COST CORE over the synthetic partsupp: the REAL
    amount = revenue − ps_supplycost*quantity (sql17 approximated
    cost with p_retailprice before partsupp existed; this is the
    faithful shape — the (partkey, suppkey) composite-key join into
    the cost table). amount stays in the exact 1e-4 integer domain
    (supplycost is integer cents; quantities are integral so the /100
    is exact). Scale: partsupp is part-sized x4 — small relative to
    lineitem but CORPUS-GROWING, so it (like filtered part and
    supplier) joins via the size-guarded maybe_broadcast: under the
    threshold it broadcasts into lineitem on the composite key; past
    it the hint drops and AQE picks the strategy from runtime sizes
    (a pinned hint here would pin a gigabyte build-side OOM at 100x).
    Nation stays a pinned broadcast; lineitem-orders is the lone fact
    shuffle, aggregation keyspace nation x year."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    p = t(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    ps = _synth_partsupp(spark, sf_dir)
    amount_c = _rev_c() - (
        F.col("ps_supplycost_c") * cents("l_quantity") / F.lit(100)
    ).cast("bigint")
    return (
        li.join(maybe_broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(maybe_broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(
            maybe_broadcast(ps),
            (F.col("ps_partkey") == F.col("l_partkey"))
            & (F.col("ps_suppkey") == F.col("l_suppkey")),
        )
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg((F.sum(amount_c).cast("double") / 10000).alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )
