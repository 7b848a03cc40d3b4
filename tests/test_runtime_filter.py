"""Bloom runtime-filter join pruning (operators/runtime_filter.py).

Pins the three properties that make a runtime filter usable:
zero false negatives (exactness of the downstream join), a bounded
false-positive rate (it actually prunes), and a narrow probe plan
(the filter runs before any exchange — the whole point)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from pdf2dataset_spark.io import load_table
from pdf2dataset_spark.operators import runtime_filter as rtf
from pdf2dataset_spark.plans.audit import explain_string, shuffle_count

SF = "/root/testdata/sf0.001"


def test_suggest_params_math():
    bits, k = rtf.suggest_params(1000, fpp=0.01)
    # textbook m ~ 9585 bits -> next pow2 16384; k ~ 7
    assert bits == 16384 and 5 <= k <= 8
    # clamps
    assert rtf.suggest_params(0) == (1 << 10, 1)
    assert rtf.suggest_params(10**12)[0] == rtf.MAX_BITS


def test_build_rejects_bad_sizes(spark):
    df = spark.range(5)
    for bad in (0, 100, rtf.MAX_BITS * 2):
        try:
            rtf.bloom_build(df, "id", num_bits=bad)
            assert False, bad
        except ValueError:
            pass


def test_no_false_negatives_and_bounded_fp(spark):
    # keys 0..999 in the filter; probe 0..9999
    build = spark.range(1000)
    probe = spark.range(10000)
    words = rtf.bloom_build(build, "id", num_bits=16384, k=7)
    kept = rtf.bloom_probe(probe, "id", words, k=7).collect()
    kept_ids = {r["id"] for r in kept}
    assert set(range(1000)) <= kept_ids  # every true key survives
    fp = len(kept_ids) - 1000
    assert fp / 9000 < 0.05, fp  # sized for ~1% fpp; 5x slack


def test_probe_is_narrow(spark):
    build = spark.range(100)
    words = rtf.bloom_build(build, "id", num_bits=1 << 12, k=3)
    probed = rtf.bloom_probe(load_table(spark, SF, "lineitem"), "l_orderkey", words, 3)
    assert shuffle_count(probed) == 0
    plan = explain_string(probed)
    assert "ArrowEvalPython" in plan or "Python" in plan, plan


def test_bloom_filtered_join_is_exact(spark):
    li = load_table(spark, SF, "lineitem")
    urgent = load_table(spark, SF, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    on = F.col("l_orderkey") == F.col("o_orderkey")
    plain = (
        li.join(urgent.select("o_orderkey"), on)
        .groupBy("o_orderkey")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    bloomed = (
        rtf.bloom_filtered_join(
            li,
            urgent.select("o_orderkey"),
            on=on,
            probe_key="l_orderkey",
            build_key="o_orderkey",
        )
        .groupBy("o_orderkey")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    a = {(r["o_orderkey"], r["n"]) for r in plain.collect()}
    b = {(r["o_orderkey"], r["n"]) for r in bloomed.collect()}
    assert a == b and len(a) > 0


def test_probe_word_array_is_uint64():
    # the probe's bit arithmetic assumes uint64 views; pin the dtype
    words = np.zeros(4, dtype=np.uint64)
    assert words.dtype == np.uint64


def test_no_false_negatives_property(spark):
    """Hypothesis: for arbitrary build/probe key sets (incl.
    negatives and collisions), every probe key present in the build
    set survives the bloom probe — the exactness invariant."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    ints = st.integers(min_value=-(2**40), max_value=2**40)

    @settings(
        max_examples=10,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        build_keys=st.lists(ints, min_size=1, max_size=50, unique=True),
        probe_keys=st.lists(ints, min_size=1, max_size=80, unique=True),
    )
    def prop(build_keys, probe_keys):
        build = spark.createDataFrame([(k,) for k in build_keys], "k long")
        probe = spark.createDataFrame([(k,) for k in probe_keys], "k long")
        words = rtf.bloom_build(build, "k", num_bits=1 << 12, k=3)
        kept = {r["k"] for r in rtf.bloom_probe(probe, "k", words, 3).collect()}
        assert set(build_keys) & set(probe_keys) <= kept

    prop()


def test_bloom_filtered_join_rejects_unsound_join_types(spark):
    """Pruning the probe side drops non-matching probe rows before the
    join — sound only when those rows produce no output anyway. left/
    full/left_anti/cross must raise instead of silently losing rows."""
    import pytest

    probe = spark.createDataFrame([(1,), (2,)], "k long")
    build = spark.createDataFrame([(1,)], "j long")
    cond = probe["k"] == build["j"]
    for bad in ("left", "full", "left_anti", "leftouter", "cross", "anti"):
        with pytest.raises(ValueError, match="unsound"):
            rtf.bloom_filtered_join(probe, build, cond, "k", "j", how=bad)
    # sound types still work and match the plain join
    for ok in ("inner", "left_semi", "right"):
        got = rtf.bloom_filtered_join(
            probe, build, cond, "k", "j", how=ok, n_keys_hint=1
        ).count()
        want = probe.join(build, cond, ok).count()
        assert got == want, ok
