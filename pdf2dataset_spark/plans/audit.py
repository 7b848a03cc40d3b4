"""Physical-plan auditing (the 100 TB discipline, SURVEY.md §4).

A query that is correct at sf0.01 but scans every column, misses a
predicate pushdown, or shuffles a broadcastable dim will fall over at
cluster scale. These helpers make the plan itself testable:
tests/test_plans.py asserts pushdown/broadcast/codegen properties for
the headline queries, so a regression in plan shape fails CI exactly
like a wrong answer would.
"""

from __future__ import annotations

import contextlib
import re
import uuid

from pyspark.sql import DataFrame, SparkSession


def explain_string(df: DataFrame, mode: str = "formatted") -> str:
    """The explain output as a string (what df.explain() prints)."""
    jdf = df._jdf  # noqa: SLF001 - no public capture API
    jvm = df.sparkSession._jvm  # noqa: SLF001
    explain_mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    return jdf.queryExecution().explainString(explain_mode)


@contextlib.contextmanager
def job_counter(spark: SparkSession):
    """Count Spark jobs triggered inside the block (result in
    ``holder['jobs']`` on exit).

    Plan *construction* must be lazy — an eager action at plan-build
    time (a `.count()` for a scalar, a `.collect()` for a closure) is
    a full extra scan per build and a 100 TB scale-killer. Tests wrap
    query-builder calls in this to assert zero jobs. Implementation:
    a unique job group + StatusTracker, public API only."""
    sc = spark.sparkContext
    group = f"plan-audit-{uuid.uuid4().hex[:8]}"
    sc.setJobGroup(group, "plan-build job audit")
    holder: dict = {}
    try:
        yield holder
    finally:
        holder["jobs"] = len(sc.statusTracker().getJobIdsForGroup(group))
        sc.setLocalProperty("spark.jobGroup.id", None)


def pushed_filters(df: DataFrame) -> list[str]:
    """Filters the parquet scan will apply at row-group level."""
    plan = explain_string(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        out.extend(s.strip() for s in m.group(1).split(",") if s.strip())
    return out


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema of every parquet scan — column pruning evidence."""
    plan = explain_string(df)
    return [m.group(1) for m in re.finditer(r"ReadSchema: (struct<[^\n]*)", plan)]


def scan_columns(df: DataFrame) -> set[str]:
    cols: set[str] = set()
    for schema in read_schemas(df):
        cols.update(re.findall(r"(\w+):", schema))
    return cols


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_string(df) or "BroadcastNestedLoopJoin" in explain_string(df)


def _nodes(df: DataFrame) -> list[str]:
    """Distinct physical nodes as '(id) Name' from formatted explain.

    After AQE execution the explain carries BOTH the final and the
    initial plan; only the final one (before the 'Initial Plan'
    marker) is counted.
    """
    plan = explain_string(df)
    # The tree comes first ('Name (id)' refs, with Final/Initial
    # sections once AQE has run); node details ('(id) Name') follow.
    tree = plan.split("== Initial Plan ==")[0]
    seen: dict[str, str] = {}
    for m in re.finditer(r"(\w+) \((\d+)\)", tree):
        seen[m.group(2)] = m.group(1)
    if not seen:  # pragma: no cover - defensive fallback
        for m in re.finditer(r"^\((\d+)\) (\w+)", plan, re.MULTILINE):
            seen[m.group(1)] = m.group(2)
    return list(seen.values())


def shuffle_count(df: DataFrame) -> int:
    """Number of shuffle exchanges (broadcast exchanges excluded) —
    the scale currency."""
    return sum(1 for n in _nodes(df) if n == "Exchange")


def broadcast_exchange_count(df: DataFrame) -> int:
    return sum(1 for n in _nodes(df) if n == "BroadcastExchange")


def codegen_stage_count(df: DataFrame) -> int:
    """Distinct whole-stage-codegen spans (from simple explain of the
    final plan; 0 until an AQE plan has executed)."""
    plan = explain_string(df, mode="simple").split("Initial Plan")[0]
    return len(set(re.findall(r"\*\((\d+)\)", plan)))


def audit(df: DataFrame) -> dict:
    """One-stop plan summary for notebooks / PLAN_AUDIT reporting."""
    return {
        "pushed_filters": pushed_filters(df),
        "scan_columns": sorted(scan_columns(df)),
        "broadcast_join": has_broadcast_join(df),
        "shuffles": shuffle_count(df),
        "broadcasts": broadcast_exchange_count(df),
        "codegen_stages": codegen_stage_count(df),
    }
