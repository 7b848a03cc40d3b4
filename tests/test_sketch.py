"""Count-min sketch properties: one-sided error, bound, mergeability."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from pdf2dataset_spark.operators import sketch as sk

DEPTH, WIDTH = 5, 512


def _zipf_df(spark, n=20000, n_keys=200):
    # Deterministic skewed key stream: key = floor(n_keys / (1 + (id % n_keys)))
    # gives a heavy head without RNG (hash-free, reproducible).
    return spark.range(n).select(
        (F.lit(n_keys) / (F.pmod(F.col("id"), F.lit(n_keys)) + 1))
        .cast("long")
        .alias("k")
    )


def test_cms_estimate_is_one_sided_and_bounded(spark):
    df = _zipf_df(spark)
    n = df.count()
    cms = sk.cms_build(df, "k", depth=DEPTH, width=WIDTH)
    exact = df.groupBy("k").agg(F.count(F.lit(1)).alias("exact"))
    est = sk.cms_estimate(cms, exact.select("k"), "k", depth=DEPTH, width=WIDTH)
    rows = exact.join(est, "k").collect()
    assert rows, "no keys"
    eps_bound = math.e / WIDTH * n  # classic CMS overshoot bound
    for r in rows:
        assert r.est_cnt >= r.exact, f"undercount at k={r.k}"
        assert r.est_cnt - r.exact <= eps_bound, f"overshoot blown at k={r.k}"


def test_cms_sketch_size_is_fixed(spark):
    df = _zipf_df(spark, n=5000)
    cms = sk.cms_build(df, "k", depth=DEPTH, width=WIDTH)
    assert cms.count() <= DEPTH * WIDTH


def test_cms_merge_equals_whole(spark):
    df = _zipf_df(spark)
    half1 = df.filter(F.col("k") % 2 == 0)
    half2 = df.filter(F.col("k") % 2 == 1)
    whole = sk.cms_build(df, "k", depth=DEPTH, width=WIDTH)
    merged = sk.cms_merge(
        sk.cms_build(half1, "k", depth=DEPTH, width=WIDTH),
        sk.cms_build(half2, "k", depth=DEPTH, width=WIDTH),
    )
    # Relational sketches over the same hash family must agree COUNTER
    # BY COUNTER, not just in estimates.
    assert whole.exceptAll(merged).count() == 0
    assert merged.exceptAll(whole).count() == 0


def test_cms_unseen_key_estimates_small(spark):
    df = _zipf_df(spark)
    cms = sk.cms_build(df, "k", depth=DEPTH, width=WIDTH)
    probe = spark.range(1).select(F.lit(10_000_000).alias("k"))
    [row] = sk.cms_estimate(cms, probe, "k", depth=DEPTH, width=WIDTH).collect()
    # Never-inserted key: estimate is pure collision noise, bounded by eps*N.
    assert row.est_cnt <= math.e / WIDTH * df.count()


def test_cms_weighted_build(spark):
    df = spark.range(100).select(
        F.pmod(F.col("id"), F.lit(10)).alias("k"), F.lit(3).alias("w")
    )
    cms = sk.cms_build(df, "k", weight_col="w", depth=DEPTH, width=WIDTH)
    est = sk.cms_estimate(
        cms, df.select("k").distinct(), "k", depth=DEPTH, width=WIDTH
    )
    for r in est.collect():
        assert r.est_cnt >= 30  # 10 occurrences x weight 3


def test_freq_items_contains_all_truly_frequent(spark):
    """KSP guarantee: every item above the support threshold IS in the
    result (false positives allowed, false negatives not)."""
    from pyspark.sql import functions as F

    # 60% a, 20% b, 20% junk singletons
    df = spark.range(1000).select(
        F.when(F.col("id") % 10 < 6, "a")
        .when(F.col("id") % 10 < 8, "b")
        .otherwise(F.concat(F.lit("x"), F.col("id").cast("string")))
        .alias("k")
    )
    [row] = df.freqItems(["k"], support=0.3).collect()
    assert "a" in row.k_freqItems


# ---------------- KMV / theta sketch -------------------------------


def _ids(spark, lo, hi, col="k"):
    return spark.range(lo, hi).select(F.col("id").alias(col))


def test_kmv_estimate_within_bounds(spark):
    from pdf2dataset_spark.operators import sketch as sk

    k = 256
    for n in (100, 1000, 20000):
        [row] = (
            sk.kmv_build(_ids(spark, 0, n), "k", k=k)
            .select(sk.kmv_estimate("kmv", k=k).alias("est"))
            .collect()
        )
        # full-sketch rel error ~1/sqrt(k)=6.25%; 4-sigma slack.
        # n=100 < k is EXACT (sampling mode, p=1).
        tol = 0.0 if n <= k else 0.25
        assert abs(row["est"] - n) <= tol * n, (n, row["est"])


def test_kmv_merge_is_exact_set_function(spark):
    """merge(sketch(A), sketch(B)) == sketch(A∪B) bit-for-bit."""
    from pdf2dataset_spark.operators import sketch as sk

    k = 64
    a = sk.kmv_build(_ids(spark, 0, 5000), "k", k=k).withColumnRenamed("kmv", "a")
    b = sk.kmv_build(_ids(spark, 2500, 7500), "k", k=k).withColumnRenamed("kmv", "b")
    [m] = a.crossJoin(b).select(sk.kmv_merge("a", "b", k).alias("m")).collect()
    [w] = sk.kmv_build(_ids(spark, 0, 7500), "k", k=k).collect()
    assert list(m["m"]) == list(w["kmv"])


def test_kmv_intersection_estimate(spark):
    from pdf2dataset_spark.operators import sketch as sk

    k = 512
    # |A|=10000, |B|=10000, |A∩B|=5000, |A∪B|=15000, J=1/3
    a = sk.kmv_build(_ids(spark, 0, 10000), "k", k=k).withColumnRenamed("kmv", "a")
    b = sk.kmv_build(_ids(spark, 5000, 15000), "k", k=k).withColumnRenamed("kmv", "b")
    jacc, inter = sk.kmv_intersection("a", "b", k=k)
    [row] = a.crossJoin(b).select(jacc.alias("j"), inter.alias("i")).collect()
    assert abs(row["j"] - 1 / 3) < 0.1, row
    assert abs(row["i"] - 5000) < 0.25 * 5000, row


def test_kmv_sampling_mode_and_grouped_build(spark):
    from pdf2dataset_spark.operators import sketch as sk

    k, p = 64, 0.25
    df = spark.range(0, 8000).select(
        (F.col("id") % 2).alias("g"), F.col("id").alias("k")
    )
    out = {
        r["g"]: r["est"]
        for r in sk.kmv_build(df, "k", k=k, p=p, by=["g"])
        .select("g", sk.kmv_estimate("kmv", k=k, p=p).alias("est"))
        .collect()
    }
    assert set(out) == {0, 1}
    for g, est in out.items():
        assert abs(est - 4000) < 0.3 * 4000, (g, est)


def test_kmv_build_is_memory_bounded(spark):
    """No aggregation buffer may hold a group's full distinct-hash set:
    the plan must select the k minima as ROWS (distinct + TakeOrdered /
    rank window) and only collect_list over the ≤k survivors — a
    collect_set of the raw hash stream is the reducer-memory blowup
    the sketch exists to avoid."""
    from pdf2dataset_spark.operators import sketch as sk
    from pdf2dataset_spark.plans.audit import explain_string, shuffle_count

    df = sk.kmv_build(_ids(spark, 0, 1000), "k", k=64)
    plan = explain_string(df)
    assert "collect_set" not in plan, plan
    assert "TakeOrderedAndProject" in plan, plan
    assert shuffle_count(df) <= 3

    grouped = sk.kmv_build(
        _ids(spark, 0, 1000).withColumn("g", F.pmod("k", F.lit(3))),
        "k",
        k=64,
        by=["g"],
    )
    gplan = explain_string(grouped)
    assert "collect_set" not in gplan, gplan
    # per-group rank window caps rows pre-collect; sort-based, spills
    assert "row_number" in gplan, gplan


def test_kmv_grouped_equals_global_per_group(spark):
    """The bounded grouped build must produce exactly the same sketch
    as a global build restricted to each group's rows."""
    from pdf2dataset_spark.operators import sketch as sk

    base = _ids(spark, 0, 500).withColumn("g", F.pmod("k", F.lit(4)))
    grouped = {
        r["g"]: list(r["kmv"])
        for r in sk.kmv_build(base, "k", k=32, by=["g"]).collect()
    }
    for g in range(4):
        solo = sk.kmv_build(base.filter(F.col("g") == g), "k", k=32).collect()
        assert grouped[g] == list(solo[0]["kmv"]), g
