"""Property-based tests (hypothesis) for operator invariants —
beyond the upstream's example-based style (SURVEY §5.1 notes no
property testing upstream; the invariants here hold at any scale).

One shared strategy note: Spark round-trips are slow, so each
property runs on a small number of generated examples with
deadline disabled.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

import pyspark.sql.functions as F

from pdf2dataset_spark.operators import dedup as dd
from pdf2dataset_spark.operators import text as tx

WORD = st.text(alphabet="abcdefg", min_size=1, max_size=6)
TEXT = st.lists(WORD, min_size=1, max_size=20).map(" ".join)

prop = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@prop
@given(texts=st.lists(TEXT, min_size=1, max_size=8))
def test_exact_dedup_idempotent_and_complete(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    once = dd.exact_dedup(df)
    twice = dd.exact_dedup(once.select("doc_id", "text"))
    n_once, n_twice = once.count(), twice.count()
    # Idempotent: dedup of a deduped set is a no-op.
    assert n_once == n_twice
    # Complete: one survivor per distinct normalized text.
    n_distinct = df.select(dd.normalize_text("text")).distinct().count()
    assert n_once == n_distinct


@prop
@given(text=TEXT)
def test_shingles_bounded_by_tokens(spark, text):
    df = spark.createDataFrame([(text,)], "text string")
    row = df.select(
        F.size(dd.shingles("text", 3)).alias("n_sh"),
        F.size(F.split("text", " ")).alias("n_tok"),
    ).collect()[0]
    assert 1 <= row.n_sh <= max(row.n_tok - 2, 1)


@prop
@given(a=TEXT, b=TEXT)
def test_jaccard_symmetric_bounded(spark, a, b):
    df = spark.createDataFrame([(1, a), (2, b)], "id long, text string")
    sh = df.withColumn("sh", dd.shingles("text", 2))
    pairs = dd.jaccard_pairs(sh, "id", "sh", threshold=-1.0).collect()
    assert len(pairs) == 1
    j = pairs[0].jaccard
    assert 0.0 <= j <= 1.0
    if a == b:
        assert j == 1.0


@prop
@given(text=TEXT)
def test_quality_features_consistency(spark, text):
    df = spark.createDataFrame([(text,)], "text string")
    row = tx.quality_features(df).collect()[0]
    assert row.q_n_chars == len(text)
    assert row.q_n_tokens == len(text.split(" "))
    assert 0.0 < row.q_type_token_ratio <= 1.0
