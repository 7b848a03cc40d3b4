"""Meta-tests for the correctness gate itself
(tools/verify_local.compare): a harness that cannot FAIL is worse
than no harness — prove it detects every mismatch class the driver
checks (row count, column set, values incl. float drift), and that
its normalize step is genuinely order-insensitive."""

from __future__ import annotations

import os
import sys

import pandas as pd

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)

from verify_local import compare, normalize  # noqa: E402


def test_compare_passes_on_equal_and_reordered():
    a = pd.DataFrame({"k": [1, 2, 3], "v": ["x", "y", "z"]})
    b = a.iloc[[2, 0, 1]].reset_index(drop=True)  # rows shuffled
    c = b[["v", "k"]]  # columns shuffled
    ok, _ = compare("t", a, c)
    assert ok


def test_compare_detects_row_count_mismatch():
    a = pd.DataFrame({"k": [1, 2, 3]})
    ok, msg = compare("t", a, a.iloc[:2])
    assert not ok and "row count" in msg


def test_compare_detects_column_set_mismatch():
    a = pd.DataFrame({"k": [1]})
    b = pd.DataFrame({"j": [1]})
    ok, msg = compare("t", a, b)
    assert not ok and "columns" in msg


def test_compare_detects_value_mismatch():
    a = pd.DataFrame({"k": [1, 2, 3]})
    b = pd.DataFrame({"k": [1, 2, 4]})
    ok, _ = compare("t", a, b)
    assert not ok


def test_compare_detects_float_drift():
    a = pd.DataFrame({"x": [1.0, 2.0]})
    b = pd.DataFrame({"x": [1.0, 2.0 + 1e-9]})
    ok, _ = compare("t", a, b)
    assert not ok  # bitwise-strict on floats


def test_normalize_handles_array_columns():
    a = pd.DataFrame({"k": [2, 1], "arr": [[3, 4], [1, 2]]})
    n = normalize(a)
    assert list(n["k"]) == [1, 2]
    assert list(n["arr"]) == [(1, 2), (3, 4)]


def test_f41_twins_agree_on_multi_space_text(spark):
    """Bigram pairing must match between the Spark zip_with (over the
    empty-filtered array) and the DuckDB twin (positions re-ranked
    after the empty filter): a run of 2+ spaces is the divergence
    case — 'a  b' must pair ('a','b') on BOTH sides."""
    import duckdb
    import pandas as pd

    from pdf2dataset_spark.queries import load_all

    reg = load_all()
    spec = reg["f41_lm_coverage_quality"]
    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": ["a  b a b", "a b c", "solo"],
        }
    )
    sf_dir = "/tmp/f41_multispace_fixture"
    import pyarrow as pa
    import pyarrow.parquet as pq
    import os

    os.makedirs(sf_dir, exist_ok=True)
    pq.write_table(
        pa.Table.from_pandas(docs), f"{sf_dir}/documents.parquet"
    )
    got = (
        spec.fn(spark, sf_dir)
        .orderBy("doc_id")
        .toPandas()
        .to_dict("records")
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS "
        f"SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    want = (
        con.execute(spec.sql + " ORDER BY doc_id")
        .fetchdf()
        .to_dict("records")
    )
    assert len(got) == len(want) == 3
    for g, w in zip(got, want):
        for k in ("n_tokens", "n_oov", "n_bigrams"):
            assert g[k] == w[k], (k, g, w)
        import math

        gv, wv = g["bigram_coverage"], w["bigram_coverage"]
        g_null = gv is None or (isinstance(gv, float) and math.isnan(gv))
        w_null = wv is None or (isinstance(wv, float) and math.isnan(wv))
        assert g_null == w_null
        if not g_null:
            assert gv == wv
    # doc 1 has 3 bigrams from the filtered stream (a b, b a, a b)
    assert got[0]["n_bigrams"] == 3


class TestBenchQuietWindow:
    """Round-6 bench protocol: the run compares its starting loadavg
    to the most recent round's and stamps ``noisy`` accordingly."""

    def test_reference_load_parses_prior_round(self):
        import bench

        ref = bench._reference_load("/root/repo")
        assert ref is not None
        rnd, la = ref
        assert rnd >= 5 and la > 0

    def test_quiet_window_reports_threshold(self):
        import bench

        noisy, info = bench._quiet_window()
        assert isinstance(noisy, bool)
        assert info["reference_round"] is not None
        assert info["threshold"] == max(2.0 * info["reference_loadavg"], 1.0)

    def test_reference_load_handles_missing_dir(self, tmp_path):
        import bench

        assert bench._reference_load(str(tmp_path)) is None
