"""operators/mixture — deterministic data-mix construction (f28)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pdf2dataset_spark.operators.mixture import (
    frac_threshold_hex,
    mix_sources,
    mixture_case_sql,
)

SF = "/root/testdata/sf0.01"


def test_weights_semantics(spark):
    d = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "source")
    mixed = mix_sources(
        d, {"src0": 3.0, "src1": 0.5, "src2": 0.0}, default=1.0
    )
    counts = {
        r["source"]: r["n"]
        for r in mixed.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    base = {
        r["source"]: r["n"]
        for r in d.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert counts["src0"] == 3 * base["src0"]  # integer weight: exact
    assert "src2" not in counts  # weight 0 drops everything
    assert 0 < counts["src1"] < base["src1"]  # fractional: proper subset
    assert counts["src3"] == base["src3"]  # default 1.0 untouched


def test_copy_ids_and_determinism(spark):
    d = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "source")
    a = mix_sources(d, {"src0": 2.5}, default=1.0).collect()
    b = mix_sources(d, {"src0": 2.5}, default=1.0).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))  # no RNG state
    per_doc = {}
    for r in a:
        per_doc.setdefault(r["doc_id"], []).append(r["copy_id"])
    for copies in per_doc.values():
        assert sorted(copies) == list(range(1, len(copies) + 1))


def test_fractional_rate_statistics(spark):
    """Hashed-id Bernoulli at w=0.5 must keep roughly half (binomial
    3-sigma band), and a different salt must make different choices."""
    rows = spark.range(0, 4000).select(
        F.col("id").alias("doc_id"), F.lit("s").alias("source")
    )
    kept = mix_sources(rows, {"s": 0.5}).count()
    assert abs(kept - 2000) < 3 * (4000 * 0.25) ** 0.5
    kept_ids = {
        r["doc_id"] for r in mix_sources(rows, {"s": 0.5}).collect()
    }
    other_ids = {
        r["doc_id"]
        for r in mix_sources(rows, {"s": 0.5}, salt="epoch2").collect()
    }
    assert kept_ids != other_ids  # salt = epoch knob


def test_plan_is_shuffle_free(spark):
    from pdf2dataset_spark.plans.audit import explain_string

    d = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "source")
    plan = explain_string(mix_sources(d, {"src0": 2.5}, default=1.0))
    assert "Exchange" not in plan, plan


def test_threshold_hex_and_case_sql():
    assert frac_threshold_hex(0.0) == "00000000"
    assert frac_threshold_hex(0.5) == "80000000"
    assert frac_threshold_hex(1.0) == "ffffffff"
    case = mixture_case_sql({"a": 2.0}, default=1.0)
    assert "WHEN 'a' THEN CAST(2.0 AS DOUBLE)" in case


def test_dsir_scores_rank_target_like_docs_first(spark):
    """Planted invariant: docs made of TARGET-exclusive words must
    outscore docs of RAW-exclusive words (delta_b > 0 exactly for
    target-over-represented buckets); a mixed doc sits between."""
    from pdf2dataset_spark.operators.mixture import dsir_scores

    rows = [
        (1, "en", "alpha beta alpha beta"),       # target doc
        (2, "en", "alpha alpha beta beta"),       # target doc
        (3, "zz", "gamma delta gamma delta"),     # raw-only words
        (4, "zz", "alpha beta gamma delta"),      # mixed
        (5, "zz", "alpha beta alpha beta"),       # raw doc, target words
    ]
    df = spark.createDataFrame(rows, ["doc_id", "lang", "text"])
    got = {
        r["doc_id"]: r["score"]
        for r in dsir_scores(df, F.col("lang") == "en").collect()
    }
    # target-exclusive words -> positive; raw-exclusive -> negative
    assert got[5] > 0 > got[3]
    assert got[3] < got[4] < got[5]
    # doc 5 shares doc 1/2's profile: identical score
    assert got[5] == got[1] == got[2]


def test_dsir_plan_shape(spark):
    """Weight table must broadcast (no shuffle join on the token
    stream) and the top-k query must plan as TakeOrderedAndProject."""
    from pdf2dataset_spark.operators.mixture import dsir_scores
    from pdf2dataset_spark.plans.audit import explain_string

    d = spark.read.parquet(f"{SF}/documents.parquet")
    scores = dsir_scores(d, F.col("lang") == "en")
    plan = explain_string(
        scores.orderBy(F.col("score").desc(), "doc_id").limit(20)
    )
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "TakeOrderedAndProject" in plan, plan
