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
