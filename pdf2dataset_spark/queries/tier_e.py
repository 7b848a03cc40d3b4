"""Tier E — windows, sort, limit, set operations (SURVEY.md §2).

Windows shuffle once on the partition key and sort within partitions;
global sort is range-partitioned; ORDER BY + LIMIT lowers to
TakeOrderedAndProject (no full sort at scale). Every ordering carries
a unique tie-break key so results are deterministic — the driver's
hash is order-insensitive but rank values themselves must be stable.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from pdf2dataset_spark.queries import query
from pdf2dataset_spark.queries._util import dec, t


# --------------------------------------------------------------- E1
@query(
    "e1_rank_orders_per_cust",
    sql="""
    SELECT o_orderkey, o_custkey,
           row_number() OVER w AS rn,
           rank() OVER w AS rnk,
           dense_rank() OVER w AS drnk,
           ntile(4) OVER w AS quartile,
           percent_rank() OVER w AS prank
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey
                 ORDER BY o_totalprice DESC, o_orderkey)
    """,
    tier="E",
)
def e1_rank_orders_per_cust(spark, sf_dir):
    """Ranking family over a per-customer price ordering (E1)."""
    o = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("prank"),
    )


# --------------------------------------------------------------- E2
@query(
    "e2_lag_lead",
    sql="""
    SELECT event_id, user_id, value,
           lag(value) OVER w AS prev_value,
           lead(value) OVER w AS next_value,
           first_value(value) OVER w AS first_val,
           lag(ts) OVER w AS prev_ts,
           cume_dist() OVER w AS cdist
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    tier="E",
)
def e2_lag_lead(spark, sf_dir):
    """Analytic lag/lead/first/cume_dist over per-user streams (E2).
    cume_dist is rank/count — identical integer division in both
    engines, so it hash-checks."""
    e = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "event_id",
        "user_id",
        "value",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        F.first("value").over(w).alias("first_val"),
        F.lag("ts").over(w).alias("prev_ts"),
        F.cume_dist().over(w).alias("cdist"),
    )


# --------------------------------------------------------------- E3
@query(
    "e3_running_sum_frame",
    sql="""
    SELECT o_orderkey, o_custkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)))
                OVER (PARTITION BY o_custkey
                      ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS running_total,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)))
                OVER (PARTITION BY o_custkey
                      ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS rolling_3
    FROM orders
    """,
    tier="E",
)
def e3_running_sum_frame(spark, sf_dir):
    """Aggregates over explicit ROWS frames: running + rolling sums,
    decimal-exact (E3)."""
    o = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    price = dec("o_totalprice")
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.sum(price)
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("double")
        .alias("running_total"),
        F.sum(price)
        .over(w.rowsBetween(-2, Window.currentRow))
        .cast("double")
        .alias("rolling_3"),
    )


# --------------------------------------------------------------- E4
@query(
    "e4_topk_per_group",
    sql="""
    SELECT o_custkey, o_orderkey, o_totalprice, rn
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    )
    WHERE rn <= 3
    """,
    tier="E",
)
def e4_topk_per_group(spark, sf_dir):
    """Top-k per group via ranked-window filter (E4)."""
    o = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


# --------------------------------------------------------------- E5
@query(
    "e5_global_sort",
    sql="""
    SELECT o_orderkey, o_orderstatus, o_totalprice,
           row_number() OVER (ORDER BY o_orderstatus DESC,
                              o_totalprice DESC, o_orderkey) AS global_rank
    FROM orders
    """,
    tier="E",
)
def e5_global_sort(spark, sf_dir):
    """Global multi-key sort, materialized as a rank column so the
    order-insensitive hash still proves ordering (E5). Computed with
    the SCALABLE pattern (operators/rank.py): range repartition +
    per-partition row_number + broadcast offset join — bit-identical
    to `row_number() OVER (ORDER BY ...)` but with no single-
    partition window bottleneck."""
    from pdf2dataset_spark.operators.rank import global_rank

    o = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    order = [
        F.col("o_orderstatus").desc(),
        F.col("o_totalprice").desc(),
        F.col("o_orderkey"),
    ]
    return global_rank(o, order)


# --------------------------------------------------------------- E6
@query(
    "e6_global_topk",
    sql="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
    tier="E",
)
def e6_global_topk(spark, sf_dir):
    """ORDER BY + LIMIT → TakeOrderedAndProject: per-partition top-k
    then driver merge of k×partitions rows, no global sort (E6)."""
    o = t(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_totalprice")
    )


# --------------------------------------------------------------- E7
@query(
    "e7_union_all",
    sql="""
    SELECT c_name AS name, 'customer' AS kind FROM customer
    UNION ALL
    SELECT s_name AS name, 'supplier' AS kind FROM supplier
    """,
    tier="E",
)
def e7_union_all(spark, sf_dir):
    """UNION ALL via unionByName (E7)."""
    c = t(spark, sf_dir, "customer").select(
        F.col("c_name").alias("name"), F.lit("customer").alias("kind")
    )
    s = t(spark, sf_dir, "supplier").select(
        F.col("s_name").alias("name"), F.lit("supplier").alias("kind")
    )
    return c.unionByName(s)


# --------------------------------------------------------------- E8
@query(
    "e8_union_distinct",
    sql="""
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey FROM supplier
    """,
    tier="E",
)
def e8_union_distinct(spark, sf_dir):
    """UNION with distinct semantics (E8)."""
    c = t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.union(s).distinct()


# --------------------------------------------------------------- E9
@query(
    "e9_intersect",
    sql="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey FROM supplier
    """,
    tier="E",
)
def e9_intersect(spark, sf_dir):
    """INTERSECT (distinct) (E9); intersectAll exercised in tests."""
    c = t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


# --------------------------------------------------------------- E10
@query(
    "e10_except",
    sql="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey FROM supplier WHERE s_acctbal > 5000
    """,
    tier="E",
)
def e10_except(spark, sf_dir):
    """EXCEPT (distinct) (E10); exceptAll exercised in tests. The
    supplier side is filtered so the difference is non-empty."""
    c = t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = (
        t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 5000)
        .select(F.col("s_nationkey").alias("nationkey"))
    )
    return c.subtract(s)


# --------------------------------------------------------------- E11
@query(
    "e11_dedup_subset_keep_first",
    sql="""
    SELECT lang, source, doc_id AS first_doc
    FROM (
      SELECT lang, source, doc_id,
             row_number() OVER (PARTITION BY lang, source
                                ORDER BY doc_id) AS rn
      FROM documents
    )
    WHERE rn = 1
    """,
    tier="E",
)
def e11_dedup_subset_keep_first(spark, sf_dir):
    """dropDuplicates(subset) with deterministic keep-first semantics
    (E11). Spark's dropDuplicates keeps an *arbitrary* row, so the
    engine's canonical dedup is the ranked-window form — same as the
    exact-dedup operator (F1)."""
    d = t(spark, sf_dir, "documents")
    w = Window.partitionBy("lang", "source").orderBy("doc_id")
    return (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("lang", "source", F.col("doc_id").alias("first_doc"))
    )


# --------------------------------------------------------------- E12
@query("e12_sample", sql=None, tier="E")
def e12_sample(spark, sf_dir):
    """Seeded Bernoulli sample (E12) — engines' RNG streams differ, so
    rows-only by design; statistical properties asserted in tests."""
    li = t(spark, sf_dir, "lineitem")
    return li.sample(fraction=0.1, seed=42).select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )


# --------------------------------------------------------------- E3b
@query(
    "e3b_range_frame",
    sql="""
    SELECT o_orderkey, o_custkey, o_totalprice,
           COUNT(*) OVER (PARTITION BY o_custkey
                          ORDER BY o_totalprice
                          RANGE BETWEEN 50000 PRECEDING AND CURRENT ROW)
             AS n_within_50k,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)))
                OVER (PARTITION BY o_custkey
                      ORDER BY o_totalprice
                      RANGE BETWEEN 50000 PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS sum_within_50k
    FROM orders
    """,
    tier="E",
)
def e3b_range_frame(spark, sf_dir):
    """RANGE frames (E3 value-based variant): peers within a 50k price
    band below the current order. RANGE (unlike ROWS) is insensitive
    to tie order, so the frame is deterministic without a tiebreak."""
    o = t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_totalprice")
        .rangeBetween(-50000, Window.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.count(F.lit(1)).over(w).alias("n_within_50k"),
        F.sum(dec("o_totalprice")).over(w).cast("double").alias("sum_within_50k"),
    )


# --------------------------------------------------------------- E13
@query(
    "e13_gap_fill_forward",
    sql="""
    WITH bounds AS (
      SELECT user_id,
             time_bucket(INTERVAL '1 hour', MIN(ts)) AS t0,
             time_bucket(INTERVAL '1 hour', MAX(ts)) AS t1
      FROM events WHERE user_id < 10 GROUP BY user_id
    ),
    grid AS (
      SELECT user_id, unnest(generate_series(t0, t1, INTERVAL 1 HOUR)) AS hour_start
      FROM bounds
    ),
    hourly AS (
      SELECT user_id, time_bucket(INTERVAL '1 hour', ts) AS hour_start,
             COUNT(*) AS n
      FROM events WHERE user_id < 10
      GROUP BY 1, 2
    )
    SELECT g.user_id, g.hour_start,
           COALESCE(h.n, 0) AS n_events,
           CAST(SUM(CASE WHEN h.n IS NOT NULL THEN 1 ELSE 0 END)
                OVER (PARTITION BY g.user_id ORDER BY g.hour_start
                      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS hours_active_so_far
    FROM grid g LEFT JOIN hourly h
      ON g.user_id = h.user_id AND g.hour_start = h.hour_start
    ORDER BY g.user_id, g.hour_start
    """,
    tier="E",
)
def e13_gap_fill_forward(spark, sf_dir):
    """Time-series gap filling (E/G extension): generate each user's
    dense hourly grid (sequence+explode), left-join the sparse hourly
    counts, zero-fill gaps, and carry a running active-hours counter —
    the standard densification step before resampling/forward-fill."""
    e = t(spark, sf_dir, "events").filter(F.col("user_id") < 10)
    hour = lambda c: F.date_trunc("hour", c)  # noqa: E731
    bounds = e.groupBy("user_id").agg(
        hour(F.min("ts")).alias("t0"), hour(F.max("ts")).alias("t1")
    )
    grid = bounds.select(
        "user_id",
        F.explode(
            F.expr("sequence(t0, t1, interval 1 hour)")
        ).alias("hour_start"),
    )
    hourly = (
        e.groupBy("user_id", hour(F.col("ts")).alias("hour_start"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    joined = grid.join(hourly, ["user_id", "hour_start"], "left")
    w = (
        Window.partitionBy("user_id")
        .orderBy("hour_start")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        "user_id",
        "hour_start",
        F.coalesce(F.col("n"), F.lit(0)).alias("n_events"),
        F.sum(F.when(F.col("n").isNotNull(), 1).otherwise(0))
        .over(w)
        .cast("bigint")
        .alias("hours_active_so_far"),
    ).orderBy("user_id", "hour_start")


# --------------------------------------------------------------- E14
@query(
    "e14_unpivot",
    sql="""
    SELECT p_partkey, attr, val
    FROM (SELECT p_partkey, CAST(p_size AS DOUBLE) AS p_size,
                 p_retailprice FROM part)
    UNPIVOT (val FOR attr IN (p_size, p_retailprice))
    ORDER BY p_partkey, attr
    """,
    tier="E",
)
def e14_unpivot(spark, sf_dir):
    """UNPIVOT / melt: wide→long reshaping via DataFrame.unpivot
    (c11's pivot inverse). Narrow, shuffle-free Expand — each input
    row emits one row per value column, so it streams at any scale."""
    p = t(spark, sf_dir, "part")
    return (
        p.select(
            "p_partkey",
            F.col("p_size").cast("double").alias("p_size"),
            "p_retailprice",
        )
        .unpivot(["p_partkey"], ["p_size", "p_retailprice"], "attr", "val")
        .orderBy("p_partkey", "attr")
    )


# --------------------------------------------------------------- E15
@query(
    "e15_ntile_nth_value",
    sql="""
    SELECT c_custkey, c_mktsegment,
           ntile(4) OVER w AS quartile,
           nth_value(c_acctbal, 3) OVER
             (PARTITION BY c_mktsegment
              ORDER BY c_acctbal DESC, c_custkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS third_bal
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
    ORDER BY c_custkey
    """,
    tier="E",
)
def e15_ntile_nth_value(spark, sf_dir):
    """ntile + nth_value window functions (e1/e2 family stragglers):
    balance quartile within market segment and the running
    3rd-highest balance. Total order inside each partition (custkey
    tie-break) + an explicit ROWS frame make both engines agree
    bitwise; the window partitions by segment, so the data shuffles
    once into segment-hash partitions — no global sort."""
    c = t(spark, sf_dir, "customer")
    from pyspark.sql import Window

    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("c_acctbal"), F.col("c_custkey")
    )
    return c.select(
        "c_custkey",
        "c_mktsegment",
        F.ntile(4).over(w).alias("quartile"),
        F.nth_value("c_acctbal", 3)
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("third_bal"),
    ).orderBy("c_custkey")


# --------------------------------------------------------------- E16
@query(
    "e16_funnel_conversion",
    sql="""
    WITH fv AS (
      SELECT user_id, min(ts) AS first_view
      FROM events WHERE event_type = 'view' GROUP BY user_id
    ),
    conv AS (
      SELECT DISTINCT f.user_id
      FROM fv f JOIN events e
        ON e.user_id = f.user_id
       AND e.event_type = 'purchase'
       AND e.ts > f.first_view
       AND e.ts <= f.first_view + INTERVAL 1 HOUR
    )
    SELECT (SELECT COUNT(*) FROM fv) AS n_viewers,
           (SELECT COUNT(*) FROM conv) AS n_converted,
           CAST((SELECT COUNT(*) FROM conv) AS DOUBLE)
             / (SELECT COUNT(*) FROM fv) AS conversion_rate
    """,
    tier="E",
)
def e16_funnel_conversion(spark, sf_dir):
    """Funnel / sequence analysis: users whose FIRST 'view' is
    followed by a 'purchase' within one hour — the event-sequence
    shape (step anchor → time-bounded follow-up) that sessionization
    and windows don't express. Plan: one filtered agg for the anchor
    (map-side partial on user_id), a left-semi join with a non-equi
    time band for the follow-up — the anchor side is the small,
    broadcastable one at any scale — then two tiny counts combined
    crossJoin-style into one row. Exact integer counts; the rate is
    one double division."""
    ev = t(spark, sf_dir, "events")
    fv = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_view"))
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    conv = fv.join(
        purchases,
        (F.col("user_id") == F.col("p_user"))
        & (F.col("p_ts") > F.col("first_view"))
        & (F.col("p_ts") <= F.col("first_view") + F.expr("INTERVAL 1 HOUR")),
        "left_semi",
    )
    return (
        fv.agg(F.count(F.lit(1)).alias("n_viewers"))
        .crossJoin(conv.agg(F.count(F.lit(1)).alias("n_converted")))
        .select(
            "n_viewers",
            "n_converted",
            (
                F.col("n_converted").cast("double") / F.col("n_viewers")
            ).alias("conversion_rate"),
        )
    )


# --------------------------------------------------------------- E17
@query(
    "e17_cohort_retention",
    sql="""
    WITH su AS (
      SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
      FROM events WHERE event_type = 'signup' GROUP BY user_id
    ),
    act AS (
      SELECT DISTINCT user_id, date_trunc('week', ts) AS act_week
      FROM events
    )
    SELECT s.cohort_week,
           date_diff('day', CAST(s.cohort_week AS DATE),
                     CAST(a.act_week AS DATE)) // 7 AS week_n,
           COUNT(DISTINCT s.user_id) AS n_active
    FROM su s JOIN act a ON s.user_id = a.user_id
    WHERE a.act_week >= s.cohort_week
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
    tier="E",
)
def e17_cohort_retention(spark, sf_dir):
    """Cohort retention matrix: users grouped by signup week, counted
    distinct in each subsequent activity week — the standard retention
    workload (funnel e16's longitudinal sibling). Both sides reduce
    BEFORE the join (cohort = one row per user, activity = distinct
    user-weeks), so the join input is bounded by users x weeks, not
    raw events; the final agg keyspace is cohorts x weeks. Integer
    day-diff // 7 keeps week bucketing exact across engines."""
    ev = t(spark, sf_dir, "events")
    su = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.date_trunc("week", F.min("ts")).alias("cohort_week"))
    )
    act = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("act_week")
    ).distinct()
    return (
        su.join(act, "user_id")
        .filter(F.col("act_week") >= F.col("cohort_week"))
        .groupBy(
            "cohort_week",
            F.floor(
                F.datediff(F.col("act_week"), F.col("cohort_week")) / 7
            ).alias("week_n"),
        )
        .agg(F.count_distinct("user_id").alias("n_active"))
        .orderBy("cohort_week", "week_n")
    )


# --------------------------------------------------------------- E18
@query(
    "e18_rolling_7day_revenue",
    sql="""
    WITH d AS (
      SELECT date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
               AS day_n,
             SUM(CAST(round(o_totalprice*100,0) AS BIGINT)) AS rev_c
      FROM orders GROUP BY 1
    )
    SELECT day_n,
           CAST(rev_c AS DOUBLE)/100 AS day_revenue,
           CAST(SUM(rev_c) OVER (
             ORDER BY day_n
             RANGE BETWEEN 6 PRECEDING AND CURRENT ROW
           ) AS DOUBLE)/100 AS rolling_7d_revenue
    FROM d ORDER BY day_n
    """,
    tier="E",
)
def e18_rolling_7day_revenue(spark, sf_dir):
    """Time-based rolling 7-day revenue (E18) — prefix-sum formulation.

    The oracle's `RANGE BETWEEN 6 PRECEDING AND CURRENT ROW` frame is
    re-expressed as rolling(d) = prefix(d) − prefix(d−7) over a
    DENSIFIED day spine, so no unpartitioned data window appears in
    the plan at all: (1) revenue pre-aggregates to one row per day in
    exact integer cents; (2) a 1-row min/max agg generates the dense
    day spine via `sequence` + explode (bounded by the date domain);
    (3) the inclusive prefix sum runs through the scale-safe
    `rank.global_prefix_sum` (range partition + broadcast offsets —
    the only remaining windows are partition-local and the one-row-
    per-partition offsets table); (4) the day−7 lookup is a plain
    equi-join on the dense spine (exact because every day exists);
    (5) filler days are dropped by an inner join back to the observed
    days. Bit-identical to the RANGE-frame twin for integer cents."""
    from pdf2dataset_spark.operators.rank import global_prefix_sum

    o = t(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.datediff(F.col("o_orderdate"), F.lit("1970-01-01")).alias("day_n")
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint")).alias(
            "rev_c"
        )
    )
    spine = (
        daily.agg(
            F.min("day_n").alias("lo"), F.max("day_n").alias("hi")
        )
        .select(F.explode(F.sequence("lo", "hi")).alias("day_n"))
    )
    dense = spine.join(daily, "day_n", "left").select(
        "day_n", F.coalesce("rev_c", F.lit(0).cast("bigint")).alias("rev_c")
    )
    pref = global_prefix_sum(
        dense, [F.col("day_n")], "rev_c", sum_col="pfx"
    )
    prev = pref.select(
        (F.col("day_n") + 7).alias("day_n"), F.col("pfx").alias("pfx_prev")
    )
    rolled = pref.join(prev, "day_n", "left").select(
        "day_n",
        "rev_c",
        (F.col("pfx") - F.coalesce("pfx_prev", F.lit(0).cast("bigint"))).alias(
            "roll_c"
        ),
    )
    return (
        rolled.join(daily.select("day_n"), "day_n")  # observed days only
        .select(
            "day_n",
            (F.col("rev_c").cast("double") / 100).alias("day_revenue"),
            (F.col("roll_c").cast("double") / 100).alias("rolling_7d_revenue"),
        )
        .orderBy("day_n")
    )


# --------------------------------------------------------------- E19
@query(
    "e19_rolling_zscore_anomaly",
    sql="""
    WITH c AS (
      SELECT l_partkey, l_orderkey, l_linenumber, l_suppkey, l_shipdate,
             CAST(round(l_extendedprice*100,0) AS BIGINT) AS pc
      FROM lineitem
    ), w AS (
      SELECT l_partkey, l_orderkey, l_linenumber, pc,
             COUNT(*) OVER f AS n,
             SUM(pc) OVER f AS s1,
             SUM(CAST(pc*pc AS DECIMAL(38,0))) OVER f AS s2
      FROM c
      WINDOW f AS (
        PARTITION BY l_partkey
        ORDER BY l_shipdate, l_orderkey, l_linenumber, l_suppkey, pc
        ROWS BETWEEN 9 PRECEDING AND CURRENT ROW
      )
    ), m AS (
      SELECT l_partkey, l_orderkey, l_linenumber, n,
             CAST(pc AS DOUBLE)/100 AS price,
             (CAST(s1 AS DOUBLE)/100) / n AS mean_p,
             CAST(n AS DOUBLE) * (CAST(s2 AS DOUBLE)/10000.0) AS ns2,
             (CAST(s1 AS DOUBLE)/100) * (CAST(s1 AS DOUBLE)/100) AS s1s1,
             CAST(n AS DOUBLE) * n AS nn
      FROM w
    ), v AS (
      SELECT l_partkey, l_orderkey, l_linenumber, n, price, mean_p,
             (ns2 - s1s1) / nn AS var_p
      FROM m
    )
    SELECT l_partkey, l_orderkey, l_linenumber, price, mean_p,
           (price - mean_p) / sqrt(var_p) AS zscore
    FROM v
    WHERE n >= 10 AND var_p > 0
      AND (price - mean_p) / sqrt(var_p) > 2.5
    ORDER BY l_partkey, l_orderkey, l_linenumber
    """,
    tier="E",
)
def e19_rolling_zscore_anomaly(spark, sf_dir):
    """Rolling z-score anomaly detection (E19): flag line items whose
    price is >2.5 population-σ above the trailing-10 mean for the same
    part — the standard per-key outlier screen for metric streams.

    One shuffle on the partition key; moments accumulate in exact
    integer cents inside the ROWS frame (sum-of-squares as
    DECIMAL(38,0) — bigint would overflow at 10-digit cents²) and the
    z closed-form runs in identically-staged double ops on both
    engines. Windows shorter than 10 rows are suppressed (warm-up)."""
    li = t(spark, sf_dir, "lineitem")
    c = li.select(
        "l_partkey",
        "l_orderkey",
        "l_linenumber",
        "l_suppkey",
        "l_shipdate",
        F.round(F.col("l_extendedprice") * 100, 0)
        .cast("bigint")
        .alias("pc"),
    )
    f = (
        Window.partitionBy("l_partkey")
        # (l_orderkey, l_linenumber) is NOT unique in the synthetic
        # data; suppkey + price-cents complete the provably-total
        # order so the rolling frame can never be tie-order-dependent
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber", "l_suppkey", "pc")
        .rowsBetween(-9, Window.currentRow)
    )
    pc = F.col("pc")
    w = c.select(
        "l_partkey",
        "l_orderkey",
        "l_linenumber",
        "pc",
        F.count(F.lit(1)).over(f).alias("n"),
        F.sum("pc").over(f).alias("s1"),
        F.sum((pc * pc).cast("decimal(38,0)")).over(f).alias("s2"),
    )
    n = F.col("n")
    m = w.select(
        "l_partkey",
        "l_orderkey",
        "l_linenumber",
        "n",
        (pc.cast("double") / 100).alias("price"),
        ((F.col("s1").cast("double") / 100) / n).alias("mean_p"),
        (n.cast("double") * (F.col("s2").cast("double") / F.lit(10000.0))).alias(
            "ns2"
        ),
        (
            (F.col("s1").cast("double") / 100)
            * (F.col("s1").cast("double") / 100)
        ).alias("s1s1"),
        (n.cast("double") * n).alias("nn"),
    )
    v = m.select(
        "l_partkey",
        "l_orderkey",
        "l_linenumber",
        "n",
        "price",
        "mean_p",
        ((F.col("ns2") - F.col("s1s1")) / F.col("nn")).alias("var_p"),
    )
    z = (F.col("price") - F.col("mean_p")) / F.sqrt(F.col("var_p"))
    return (
        v.filter((F.col("n") >= 10) & (F.col("var_p") > 0) & (z > 2.5))
        .select(
            "l_partkey",
            "l_orderkey",
            "l_linenumber",
            "price",
            "mean_p",
            z.alias("zscore"),
        )
        .orderBy("l_partkey", "l_orderkey", "l_linenumber")
    )


# --------------------------------------------------------------- E20
@query(
    "e20_sequential_pattern",
    sql="""
    WITH s AS (
      SELECT user_id, event_id, event_type,
             lead(event_type, 1) OVER w AS t1,
             lead(event_id, 1) OVER w AS id1,
             lead(event_type, 2) OVER w AS t2,
             lead(event_id, 2) OVER w AS id2
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id, event_id AS view_id, id1 AS click_id,
           id2 AS purchase_id
    FROM s
    WHERE event_type = 'view' AND t1 = 'click' AND t2 = 'purchase'
    ORDER BY user_id, view_id
    """,
    tier="E",
)
def e20_sequential_pattern(spark, sf_dir):
    """MATCH_RECOGNIZE-style strictly-consecutive pattern detection
    (E20): per user, find view → click → purchase with NO intervening
    events — the sequence-mining shape SQL engines bolt on as
    MATCH_RECOGNIZE, expressed as a lead() chain over one per-user
    window (funnel e16 is the time-banded, gap-tolerant cousin). One
    shuffle on user_id; pattern width k needs k-1 leads, all inside
    the same window pass. Tie-break (ts, event_id) makes the event
    order — and thus the match set — engine-invariant."""
    e = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = e.select(
        "user_id",
        "event_id",
        "event_type",
        F.lead("event_type", 1).over(w).alias("t1"),
        F.lead("event_id", 1).over(w).alias("id1"),
        F.lead("event_type", 2).over(w).alias("t2"),
        F.lead("event_id", 2).over(w).alias("id2"),
    )
    return (
        s.filter(
            (F.col("event_type") == "view")
            & (F.col("t1") == "click")
            & (F.col("t2") == "purchase")
        )
        .select(
            "user_id",
            F.col("event_id").alias("view_id"),
            F.col("id1").alias("click_id"),
            F.col("id2").alias("purchase_id"),
        )
        .orderBy("user_id", "view_id")
    )


# --------------------------------------------------------------- E21
@query(
    "e21_scd2_history",
    sql="""
    WITH h AS (
      SELECT o_custkey, o_orderkey, o_totalprice, o_orderdate,
             lead(o_orderdate) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ) AS valid_to
      FROM orders
    )
    SELECT o_custkey, o_orderkey, o_totalprice,
           o_orderdate AS valid_from, valid_to,
           valid_to IS NULL AS is_current
    FROM h ORDER BY o_custkey, valid_from, o_orderkey
    """,
    tier="E",
)
def e21_scd2_history(spark, sf_dir):
    """Slowly-changing-dimension type-2 history build (E21): turn a
    change-event log (orders per customer) into validity intervals —
    valid_from = event time, valid_to = next event's time, open
    interval + is_current flag on the latest. The standard dimension-
    versioning pass a warehouse build runs after CDC ingest
    (maintenance.merge_upsert keeps latest-only; this keeps the full
    history). One lead() window per entity key — single shuffle,
    deterministic (date, key) tie-break."""
    o = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.col("o_orderdate").alias("valid_from"),
            F.lead("o_orderdate").over(w).alias("valid_to"),
        )
        .withColumn("is_current", F.col("valid_to").isNull())
        .select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            "valid_from",
            "valid_to",
            "is_current",
        )
        .orderBy("o_custkey", "valid_from", "o_orderkey")
    )
