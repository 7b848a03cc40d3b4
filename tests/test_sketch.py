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
