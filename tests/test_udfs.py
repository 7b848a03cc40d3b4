"""Tier H UDF-surface tests: every flavor declares its type from the
same pyarrow names the feature registry uses."""

from __future__ import annotations

import pandas as pd

import pyspark.sql.functions as F

from pdf2dataset_spark.functions.udfs import (
    iterator_udf,
    page_split_udtf,
    scalar_udf,
    vectorized_udf,
    with_error_capture,
)


def test_scalar_udf_declared_type(spark):
    u = scalar_udf(lambda s: len(s), "int32")
    df = spark.createDataFrame([("abc",)], "t string").select(u("t").alias("n"))
    assert df.schema["n"].dataType.typeName() == "integer"
    assert df.collect()[0].n == 3


def test_vectorized_udf(spark):
    u = vectorized_udf(lambda s: s.str.upper(), "string")
    df = spark.createDataFrame([("ab",), ("cd",)], "t string")
    assert [r.u for r in df.select(u("t").alias("u")).collect()] == ["AB", "CD"]


def test_iterator_udf_inits_state_once_per_worker(spark):
    def make_state():
        return {"prefix": "X"}

    def fn(state, batch: pd.Series) -> pd.Series:
        return state["prefix"] + batch

    u = iterator_udf(make_state, fn, "string")
    df = spark.createDataFrame([("a",), ("b",)], "t string").repartition(1)
    assert sorted(r.u for r in df.select(u("t").alias("u")).collect()) == ["Xa", "Xb"]


def test_error_capture_struct(spark):
    u = with_error_capture(lambda v: 10 // v, "int64")
    df = spark.createDataFrame([(2,), (0,)], "v int").select(u("v").alias("r"))
    rows = {r.r.value: r.r.error for r in df.collect()}
    assert rows[5] is None
    (err,) = [e for v, e in rows.items() if v is None]
    assert "ZeroDivisionError" in err


def test_page_split_udtf(spark):
    PageSplit = page_split_udtf()
    spark.udtf.register("page_split", PageSplit)
    df = spark.createDataFrame(
        [("a.pdf", "p1\fp2".encode())], "path string, content binary"
    )
    df.createOrReplaceTempView("docs_udtf_test")
    out = spark.sql(
        "SELECT s.* FROM docs_udtf_test, LATERAL page_split(path, content) s"
    ).collect()
    assert [(r.page, r.text) for r in out] == [(1, "p1"), (2, "p2")]
