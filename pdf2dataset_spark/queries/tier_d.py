"""Tier D — joins (SURVEY.md §2 tier D).

Scale posture per join: small dims (region/nation/part/supplier)
are explicitly broadcast so the fact side never shuffles; the
orders⋈customer equi-join relies on AQE to pick SMJ/SHJ vs broadcast
by runtime stats; skew is AQE's skew-join splitting (D12 — config,
session.py). The as-of join avoids a per-key Python path entirely:
it's a window over a single shuffle by user_id.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from pdf2dataset_spark.queries import query
from pdf2dataset_spark.queries._util import (
    cents,
    csum,
    dec,
    dsum,
    maybe_broadcast,
    ordered_small,
    t,
)


# --------------------------------------------------------------- D1
@query(
    "d1_orders_customer_join",
    sql="""
    SELECT o.o_orderkey, c.c_name, c.c_mktsegment, o.o_totalprice
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    """,
    tier="D",
)
def d1_orders_customer_join(spark, sf_dir):
    """Inner equi-join; planner/AQE picks the physical strategy (D1)."""
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    return o.join(c, o.o_custkey == c.c_custkey, "inner").select(
        "o_orderkey", "c_name", "c_mktsegment", "o_totalprice"
    )


# --------------------------------------------------------------- D2
@query(
    "d2_broadcast_part_join",
    sql="""
    SELECT p.p_brand,
           COUNT(*) AS n_lines,
           CAST(SUM(CAST(round(l.l_extendedprice*100,0) AS BIGINT)) AS DOUBLE)/100
             AS brand_revenue
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY p.p_brand
    ORDER BY p.p_brand
    """,
    tier="D",
)
def d2_broadcast_part_join(spark, sf_dir):
    """Explicit broadcast hash join: the fact table never shuffles for
    the join — only the tiny agg keyspace moves (D2). This query IS
    the pinned-hint operator demo, so the hint stays unconditional
    here; production queries over corpus-growing relations use the
    size-guarded _util.maybe_broadcast instead (see tier_tpch)."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            csum("l_extendedprice").alias("brand_revenue"),
        )
        .transform(ordered_small, "p_brand")
    )


# --------------------------------------------------------------- D3
@query(
    "d3_left_outer_join",
    sql="""
    SELECT c.c_custkey,
           COUNT(o.o_orderkey) AS n_big_orders,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
             AS big_total
    FROM customer c
    LEFT JOIN orders o
      ON c.c_custkey = o.o_custkey AND o.o_totalprice > 300000
    GROUP BY c.c_custkey
    """,
    tier="D",
)
def d3_left_outer_join(spark, sf_dir):
    """Left outer join with an extra join-side predicate; unmatched
    customers keep NULL aggregates (D3)."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    cond = (c.c_custkey == o.o_custkey) & (o.o_totalprice > 300000)
    return (
        c.join(o, cond, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_big_orders"),
            dsum("o_totalprice").alias("big_total"),
        )
    )


# --------------------------------------------------------------- D4
@query(
    "d4_cross_join",
    sql="""
    SELECT r.r_name, n.n_name
    FROM region r CROSS JOIN nation n
    """,
    tier="D",
)
def d4_cross_join(spark, sf_dir):
    """Cartesian product of two tiny dims (D4)."""
    r = t(spark, sf_dir, "region")
    n = t(spark, sf_dir, "nation")
    return r.crossJoin(n).select("r_name", "n_name")


# --------------------------------------------------------------- D5
@query(
    "d5_theta_join",
    sql="""
    SELECT a.s_suppkey AS s1, b.s_suppkey AS s2
    FROM supplier a JOIN supplier b
      ON a.s_nationkey = b.s_nationkey AND a.s_acctbal > b.s_acctbal
    """,
    tier="D",
)
def d5_theta_join(spark, sf_dir):
    """Theta (non-equi) join: equi key + inequality — planner uses the
    equi part for partitioning, inequality as residual (D5)."""
    a = t(spark, sf_dir, "supplier").alias("a")
    b = t(spark, sf_dir, "supplier").alias("b")
    cond = (F.col("a.s_nationkey") == F.col("b.s_nationkey")) & (
        F.col("a.s_acctbal") > F.col("b.s_acctbal")
    )
    return a.join(b, cond).select(
        F.col("a.s_suppkey").alias("s1"), F.col("b.s_suppkey").alias("s2")
    )


# --------------------------------------------------------------- D6
@query(
    "d6_semi_join",
    sql="""
    SELECT o_orderkey, o_totalprice
    FROM orders o
    WHERE EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 49)
    """,
    tier="D",
)
def d6_semi_join(spark, sf_dir):
    """Left semi join ≡ WHERE EXISTS (D6)."""
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 49)
    return o.join(li, o.o_orderkey == li.l_orderkey, "left_semi").select(
        "o_orderkey", "o_totalprice"
    )


# --------------------------------------------------------------- D7
@query(
    "d7_anti_join_resume",
    sql="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > 450000)
    """,
    tier="D",
)
def d7_anti_join_resume(spark, sf_dir):
    """Left anti join ≡ NOT EXISTS — the same primitive as the
    extraction pipeline's resume filter (SURVEY §2 A9/D7)."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 450000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


# --------------------------------------------------------------- D8
@query(
    "d8_range_join",
    sql="""
    SELECT h.hour_start, COUNT(*) AS n_events
    FROM (SELECT unnest(generate_series(TIMESTAMP '2024-01-01',
                                        TIMESTAMP '2024-01-31',
                                        INTERVAL 1 HOUR)) AS hour_start) h
    JOIN events e
      ON e.ts >= h.hour_start AND e.ts < h.hour_start + INTERVAL 1 HOUR
    GROUP BY h.hour_start
    ORDER BY h.hour_start
    """,
    tier="D",
)
def d8_range_join(spark, sf_dir):
    """Range/interval join of events against generated hour buckets
    (D8). The bucket dim is broadcast; at 100 TB the equivalent
    rewrite is a date_trunc equi-join (G1) — this form exists to
    exercise non-equi range predicates."""
    e = t(spark, sf_dir, "events")
    hours = spark.range(1).select(
        F.explode(
            F.expr(
                "sequence(timestamp_ntz'2024-01-01 00:00:00',"
                " timestamp_ntz'2024-01-31 00:00:00', interval 1 hour)"
            )
        ).alias("hour_start")
    )
    cond = (e.ts >= hours.hour_start) & (
        e.ts < hours.hour_start + F.expr("interval 1 hour")
    )
    return (
        hours.join(e, cond)
        .groupBy("hour_start")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .orderBy("hour_start")
    )


# --------------------------------------------------------------- D9
@query(
    "d9_asof_join",
    sql="""
    SELECT e.event_id, e.user_id, e.ts,
           (SELECT max(c.ts) FROM events c
            WHERE c.user_id = e.user_id AND c.event_type = 'click'
              AND c.ts < e.ts) AS last_click_ts
    FROM events e
    WHERE e.event_type = 'purchase'
    """,
    tier="D",
)
def d9_asof_join(spark, sf_dir):
    """As-of join: nearest prior 'click' per user for each purchase
    (D9). Spark has no ASOF JOIN; the scalable expression is a single
    window pass — last(click_ts, ignorenulls) over (user, ts) — one
    shuffle by user_id, no Python. See operators/asof.py for the
    applyInPandas merge_asof variant for arbitrary tolerance/direction.
    """
    e = t(spark, sf_dir, "events")
    # clicks sort AFTER non-clicks at equal ts so a same-timestamp
    # click never counts as "prior" — the window stays strict
    # (c.ts < e.ts), exactly the oracle's predicate (see
    # operators/asof.py for the tie-semantics note)
    is_click = (F.col("event_type") == "click").cast("int")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", is_click, "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    click_ts = F.when(F.col("event_type") == "click", F.col("ts"))
    return (
        e.withColumn("last_click_ts", F.last(click_ts, ignorenulls=True).over(w))
        .filter(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "ts", "last_click_ts")
    )


# --------------------------------------------------------------- D10
@query(
    "d10_self_join_pairs",
    sql="""
    SELECT a.n_name AS n1, b.n_name AS n2, a.n_regionkey
    FROM nation a JOIN nation b
      ON a.n_regionkey = b.n_regionkey AND a.n_nationkey < b.n_nationkey
    """,
    tier="D",
)
def d10_self_join_pairs(spark, sf_dir):
    """Self join: unordered nation pairs within a region (D10)."""
    a = t(spark, sf_dir, "nation").alias("a")
    b = t(spark, sf_dir, "nation").alias("b")
    cond = (F.col("a.n_regionkey") == F.col("b.n_regionkey")) & (
        F.col("a.n_nationkey") < F.col("b.n_nationkey")
    )
    return a.join(b, cond).select(
        F.col("a.n_name").alias("n1"),
        F.col("b.n_name").alias("n2"),
        F.col("a.n_regionkey").alias("n_regionkey"),
    )


# --------------------------------------------------------------- D11
@query(
    "d11_star_join_revenue",
    sql="""
    SELECT n.n_name,
           CAST(SUM(CAST(round(l.l_extendedprice*100,0) AS BIGINT)
                    * (100 - CAST(round(l.l_discount*100,0) AS BIGINT))) AS DOUBLE)
             / (100*100) AS revenue,
           COUNT(*) AS n_lines
    FROM region r
    JOIN nation n   ON n.n_regionkey = r.r_regionkey
    JOIN supplier s ON s.s_nationkey = n.n_nationkey
    JOIN lineitem l ON l.l_suppkey = s.s_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
    GROUP BY n.n_name
    ORDER BY n.n_name
    """,
    tier="D",
)
def d11_star_join_revenue(spark, sf_dir):
    """TPC-H Q5-shape multi-way star join (D11): three broadcast dims
    + two fact-fact joins; CBO/AQE handles ordering. Revenue by
    supplier nation within ASIA. nation/region are pinned broadcasts
    (schema-bounded); supplier grows with the corpus so it goes
    through the size-guarded maybe_broadcast."""
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = t(spark, sf_dir, "nation")
    s = t(spark, sf_dir, "supplier")
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz")
    )
    c = t(spark, sf_dir, "customer")
    revenue_c = cents("l_extendedprice") * (100 - cents("l_discount"))
    return (
        li.join(maybe_broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .join(F.broadcast(r), F.col("n_regionkey") == r.r_regionkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("n_name")
        .agg(
            (F.sum(revenue_c).cast("double") / (100 * 100)).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .transform(ordered_small, "n_name")
    )


# ------------------------------------------------------------- SQL1
@query(
    "sql1_raw_sql_q3_shape",
    sql="""
    SELECT o.o_orderkey,
           CAST(o.o_orderdate AS DATE) AS order_date,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE)
             AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-01-01'
      AND l.l_shipdate > TIMESTAMP '1998-01-07'
    GROUP BY o.o_orderkey, o.o_orderdate
    ORDER BY revenue DESC, o.o_orderkey
    LIMIT 10
    """,
    tier="D",
)
def sql1_raw_sql_q3_shape(spark, sf_dir):
    """Raw-SQL entry point (TPC-H Q3 shape): the engine's spark.sql
    surface — temp views per table, identical twin text modulo
    dialect. Proves users can run plain SQL against the engine."""
    for name in ("customer", "orders", "lineitem"):
        t(spark, sf_dir, name).createOrReplaceTempView(name)
    return spark.sql(
        """
        SELECT o.o_orderkey,
               CAST(o.o_orderdate AS DATE) AS order_date,
               CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                        * (1 - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE)
                 AS revenue
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE c.c_mktsegment = 'BUILDING'
          AND o.o_orderdate < TIMESTAMP_NTZ '1998-01-01'
          AND l.l_shipdate > TIMESTAMP_NTZ '1998-01-07'
        GROUP BY o.o_orderkey, o.o_orderdate
        ORDER BY revenue DESC, o.o_orderkey
        LIMIT 10
        """
    )


# ------------------------------------------------------------- SQL2
@query(
    "sql2_correlated_scalar_subquery",
    sql="""
    SELECT o_orderkey, o_totalprice
    FROM orders o
    WHERE o_totalprice > 2 * (SELECT AVG(o2.o_totalprice) FROM orders o2
                              WHERE o2.o_custkey = o.o_custkey)
    """,
    tier="D",
)
def sql2_correlated_scalar_subquery(spark, sf_dir):
    """Correlated scalar subquery (Catalyst decorrelates to an
    aggregate + join): orders worth twice their customer's average.
    AVG over doubles is safe here because it feeds a strict >
    comparison with a 2x margin, not the output hash."""
    t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice
        FROM orders o
        WHERE o_totalprice > 2 * (SELECT AVG(o2.o_totalprice) FROM orders o2
                                  WHERE o2.o_custkey = o.o_custkey)
        """
    )


# --------------------------------------------------------------- D12
@query(
    "d12_salted_skew_join",
    sql="""
    SELECT l.l_orderkey, l.l_linenumber, p.p_brand
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    """,
    tier="D",
)
def d12_salted_skew_join(spark, sf_dir):
    """Salted skew join (D12): the salt spreads each hot key over 8
    subpartitions and the dim side explodes 8-fold — the result is
    bit-identical to the plain join (that IS the oracle), while the
    hottest key's partition shrinks 8x. AQE skew-split handles the
    common case; salting is the explicit tool for single-key
    pathologies it can't split further."""
    from pdf2dataset_spark.operators.skew import salted_join

    li = t(spark, sf_dir, "lineitem")
    # salted_join joins on a shared column name; align part's key.
    p = t(spark, sf_dir, "part").withColumnRenamed("p_partkey", "l_partkey")
    out = salted_join(
        li,
        p,
        on="l_partkey",
        salt=8,
        entropy_col=F.col("l_linenumber") + F.col("l_orderkey"),
    )
    return out.select("l_orderkey", "l_linenumber", "p_brand")


# --------------------------------------------------------------- D13
@query(
    "d13_q10_returned_items",
    sql="""
    SELECT c.c_custkey, c.c_name,
           CAST(SUM(CAST(round(l.l_extendedprice*100,0) AS BIGINT)
                    * (100 - CAST(round(l.l_discount*100,0) AS BIGINT))) AS DOUBLE)
             / (100*100) AS lost_revenue,
           COUNT(*) AS n_returned_lines
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1997-01-01'
    GROUP BY c.c_custkey, c.c_name
    ORDER BY lost_revenue DESC, c.c_custkey
    LIMIT 20
    """,
    tier="D",
)
def d13_q10_returned_items(spark, sf_dir):
    """TPC-H Q10 shape: top customers by returned-item revenue — the
    classic fact-fact-dim join + agg + global top-k pattern."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp_ntz")
    )
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    revenue_c = cents("l_extendedprice") * (100 - cents("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(
            (F.sum(revenue_c).cast("double") / (100 * 100)).alias("lost_revenue"),
            F.count(F.lit(1)).alias("n_returned_lines"),
        )
        .orderBy(F.col("lost_revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


# --------------------------------------------------------------- D14
@query(
    "d14_in_and_scalar_subquery",
    sql="""
    SELECT l_orderkey, l_linenumber, l_partkey
    FROM lineitem
    WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size >= 45)
      AND l_extendedprice > (SELECT AVG(l_extendedprice) FROM lineitem)
    """,
    tier="D",
)
def d14_in_and_scalar_subquery(spark, sf_dir):
    """Uncorrelated IN subquery (→ left semi join) + uncorrelated
    scalar subquery (→ broadcast scalar) — the two remaining
    RewritePredicateSubquery paths after d6/d7/sql2. AVG feeds a
    strict > comparison, not the output hash, so double averaging is
    safe here."""
    t(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    t(spark, sf_dir, "part").createOrReplaceTempView("part")
    return spark.sql(
        """
        SELECT l_orderkey, l_linenumber, l_partkey
        FROM lineitem
        WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size >= 45)
          AND l_extendedprice > (SELECT AVG(l_extendedprice) FROM lineitem)
        """
    )


# --------------------------------------------------------------- D15
@query(
    "d15_not_in_null_aware",
    sql="""
    SELECT p_partkey, p_name
    FROM part
    WHERE p_partkey NOT IN (SELECT l_partkey FROM lineitem
                            WHERE l_quantity >= 49)
    """,
    tier="D",
)
def d15_not_in_null_aware(spark, sf_dir):
    """NOT IN subquery → Spark's null-aware anti join (a dedicated
    physical operator: one NULL in the subquery legally empties the
    result — here the key is non-null so it degenerates to anti join,
    but the NAAJ plan path is what's exercised)."""
    t(spark, sf_dir, "part").createOrReplaceTempView("part")
    t(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT p_partkey, p_name
        FROM part
        WHERE p_partkey NOT IN (SELECT l_partkey FROM lineitem
                                WHERE l_quantity >= 49)
        """
    )


# --------------------------------------------------------------- D16
@query(
    "d16_nullsafe_join",
    sql="""
    WITH a AS (SELECT NULLIF(c_nationkey, 5) AS k, COUNT(*) AS n_cust
               FROM customer GROUP BY 1),
         b AS (SELECT NULLIF(s_nationkey, 5) AS k, COUNT(*) AS n_supp
               FROM supplier GROUP BY 1)
    SELECT a.k AS nation_key, n_cust, n_supp
    FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
    ORDER BY nation_key NULLS LAST
    """,
    tier="D",
)
def d16_nullsafe_join(spark, sf_dir):
    """Null-safe equality join (<=> / IS NOT DISTINCT FROM): NULL
    keys match each other instead of dropping out. eqNullSafe is a
    hashable equi-predicate for Spark, so this still plans as a
    (broadcast) hash join — not a theta join."""
    c = t(spark, sf_dir, "customer")
    s = t(spark, sf_dir, "supplier")
    a = (
        c.groupBy(F.nullif(F.col("c_nationkey"), F.lit(5)).alias("k"))
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    b = (
        s.groupBy(F.nullif(F.col("s_nationkey"), F.lit(5)).alias("bk"))
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    return (
        a.join(F.broadcast(b), a.k.eqNullSafe(b.bk))
        .select(F.col("k").alias("nation_key"), "n_cust", "n_supp")
        .orderBy(F.col("nation_key").asc_nulls_last())
    )


# --------------------------------------------------------------- D17
@query(
    "d17_lateral_topk_join",
    sql="""
    SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
    FROM customer c, LATERAL (
      SELECT o_orderkey, o_totalprice FROM orders
      WHERE o_custkey = c.c_custkey
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
    ORDER BY c_custkey, o_orderkey
    """,
    tier="D",
)
def d17_lateral_topk_join(spark, sf_dir):
    """Correlated LATERAL subquery join: each customer's top-2
    orders by price. Catalyst decorrelates the per-row LIMIT into a
    WindowGroupLimit (partial top-k before the shuffle, final after)
    joined back on the key — the scalable rewrite of what would
    naively be one subquery execution per outer row. Identical twin
    SQL runs on both engines; tie-break on o_orderkey keeps the
    LIMIT deterministic."""
    for name in ("customer", "orders"):
        t(spark, sf_dir, name).createOrReplaceTempView(name)
    return spark.sql(
        """
        SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
        FROM customer c, LATERAL (
          SELECT o_orderkey, o_totalprice FROM orders
          WHERE o_custkey = c.c_custkey
          ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
        ORDER BY c_custkey, o_orderkey
        """
    )


# --------------------------------------------------------------- D18
@query(
    "d18_full_outer_join",
    sql="""
    WITH c AS (SELECT c_nationkey AS nk, COUNT(*) AS n_cust
               FROM customer WHERE c_acctbal > 7000 GROUP BY 1),
         s AS (SELECT s_nationkey AS nk, COUNT(*) AS n_supp
               FROM supplier WHERE s_acctbal < 2000 GROUP BY 1)
    SELECT COALESCE(c.nk, s.nk) AS nationkey,
           COALESCE(n_cust, 0) AS n_cust,
           COALESCE(n_supp, 0) AS n_supp
    FROM c FULL OUTER JOIN s ON c.nk = s.nk
    ORDER BY nationkey
    """,
    tier="D",
)
def d18_full_outer_join(spark, sf_dir):
    """FULL OUTER join (completes the join-type matrix with d1-d17):
    rich-customer counts vs low-balance-supplier counts per nation,
    with asymmetric filters so BOTH null sides occur and COALESCE
    repairs them. Both inputs are aggregated before the join, so the
    full-outer shuffle carries one row per nation per side — full
    outer forces a shuffle join (no broadcast), which is exactly why
    you aggregate first at scale."""
    c = (
        t(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 7000)
        .groupBy(F.col("c_nationkey").alias("c_nk"))
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    s = (
        t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 2000)
        .groupBy(F.col("s_nationkey").alias("s_nk"))
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    return (
        c.join(s, F.col("c_nk") == F.col("s_nk"), "full")
        .select(
            F.coalesce(F.col("c_nk"), F.col("s_nk")).alias("nationkey"),
            F.coalesce(F.col("n_cust"), F.lit(0)).alias("n_cust"),
            F.coalesce(F.col("n_supp"), F.lit(0)).alias("n_supp"),
        )
        .orderBy("nationkey")
    )


# --------------------------------------------------------------- D19
@query(
    "d19_interval_overlap_join",
    sql="""
    WITH ua AS (
      SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
             min(ts) AS u_start, max(ts) AS u_end
      FROM events GROUP BY 1, 2
    ), ew AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
             min(ts) AS e_start, max(ts) AS e_end
      FROM events WHERE event_type = 'error' GROUP BY 1
    )
    SELECT ua.user_id, ua.day,
           date_diff('second',
                     greatest(ua.u_start, ew.e_start),
                     least(ua.u_end, ew.e_end)) AS overlap_s
    FROM ua JOIN ew
      ON ua.day = ew.day
     AND ua.u_start <= ew.e_end AND ew.e_start <= ua.u_end
    ORDER BY ua.user_id, ua.day
    """,
    tier="D",
)
def d19_interval_overlap_join(spark, sf_dir):
    """Interval-overlap join (D19): each user's daily activity span
    [first event, last event] joined to that day's error window
    [first error, last error] where the two intervals overlap —
    the incident-impact query (which users were active while the
    system was erroring, and for how long).

    Canonical overlap predicate a.start <= b.end AND b.start <= a.end
    rides on a DAY equi key, so the join co-partitions on day and the
    range residual evaluates inside partitions — the blocked form that
    survives 100 TB (a pure non-equi overlap join would be a
    broadcast-nested-loop). Both sides pre-aggregate to interval grain
    before joining; overlap length in whole seconds stays integer."""
    e = t(spark, sf_dir, "events")
    ua = e.groupBy(
        "user_id", F.to_date(F.date_trunc("day", "ts")).alias("day")
    ).agg(F.min("ts").alias("u_start"), F.max("ts").alias("u_end"))
    ew = (
        e.filter(F.col("event_type") == "error")
        .groupBy(F.to_date(F.date_trunc("day", "ts")).alias("day"))
        .agg(F.min("ts").alias("e_start"), F.max("ts").alias("e_end"))
    )
    joined = ua.join(
        ew,
        (ua["day"] == ew["day"])
        & (F.col("u_start") <= F.col("e_end"))
        & (F.col("e_start") <= F.col("u_end")),
    )
    overlap = (
        F.unix_timestamp(F.least(F.col("u_end"), F.col("e_end")))
        - F.unix_timestamp(F.greatest(F.col("u_start"), F.col("e_start")))
    )
    return joined.select(
        "user_id", ua["day"].alias("day"), overlap.alias("overlap_s")
    ).orderBy("user_id", "day")


# --------------------------------------------------------------- D20
@query(
    "d20_bloom_filtered_join",
    sql="""
    SELECT o.o_orderkey,
           COUNT(*) AS n_lines,
           CAST(SUM(CAST(round(l.l_extendedprice*100,0) AS BIGINT)) AS DOUBLE)/100
             AS revenue
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderpriority = '1-URGENT'
    GROUP BY o.o_orderkey
    """,
    tier="D",
)
def d20_bloom_filtered_join(spark, sf_dir):
    """Bloom-runtime-filtered large-large join (D20): per-order line
    count and revenue for URGENT orders. The selective orders side
    builds a bloom filter over its keys (one bounded-output
    aggregation); lineitem is probed by an Arrow-batched bit test on
    JVM-computed xxhash64 positions BEFORE its shuffle, so ~80% of
    the fact rows never enter the exchange. Bloom false positives
    are eliminated by the exact join, so the result is identical to
    the plain join — the oracle IS the plain join. This is the
    explicit form of Trino dynamic filtering / Spark's runtime
    bloom-filter rule for when the author knows the build side is
    selective (operators/runtime_filter.py)."""
    from pdf2dataset_spark.operators import runtime_filter as rtf

    urgent = t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    li = t(spark, sf_dir, "lineitem")
    joined = rtf.bloom_filtered_join(
        li,
        urgent.select("o_orderkey"),
        on=F.col("l_orderkey") == F.col("o_orderkey"),
        probe_key="l_orderkey",
        build_key="o_orderkey",
    )
    return joined.groupBy("o_orderkey").agg(
        F.count(F.lit(1)).alias("n_lines"),
        csum("l_extendedprice").alias("revenue"),
    )
