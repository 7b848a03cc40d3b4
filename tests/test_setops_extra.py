"""Multiset set-op semantics (E9/E10 docstrings promise these)."""

from __future__ import annotations


def test_intersect_all_keeps_multiplicity(spark):
    a = spark.createDataFrame([(1,), (1,), (2,), (3,)], "v int")
    b = spark.createDataFrame([(1,), (1,), (1,), (3,)], "v int")
    got = sorted(r.v for r in a.intersectAll(b).collect())
    assert got == [1, 1, 3]  # min multiplicity per value


def test_except_all_keeps_multiplicity(spark):
    a = spark.createDataFrame([(1,), (1,), (2,), (2,), (3,)], "v int")
    b = spark.createDataFrame([(1,), (2,)], "v int")
    got = sorted(r.v for r in a.exceptAll(b).collect())
    assert got == [1, 2, 3]  # one of each removed


def test_union_by_name_missing_columns(spark):
    a = spark.createDataFrame([(1, "x")], "id int, extra string")
    b = spark.createDataFrame([(2,)], "id int")
    got = a.unionByName(b, allowMissingColumns=True)
    rows = {r.id: r.extra for r in got.collect()}
    assert rows == {1: "x", 2: None}
