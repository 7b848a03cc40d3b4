"""Resume / skip-processed (SURVEY.md §2 A9).

Upstream diffs the pending task list against results already written
by an interrupted run. The Spark-native expression is a LEFT ANTI
join on the task identity (path, page at page grain; path at
document grain) — fully distributed, no driver state, and at scale
the planner broadcasts whichever side is small (or AQE converts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.utils import AnalysisException


def resume_filter(pending: DataFrame, done: DataFrame, keys: list[str]) -> DataFrame:
    """Rows of ``pending`` whose key is absent from ``done``."""
    return pending.join(done.select(*keys).dropDuplicates(keys), on=keys, how="left_anti")


def load_done(spark: SparkSession, output_path: str, keys: list[str]) -> DataFrame | None:
    """Previously-written results' keys, or None on first run."""
    try:
        return spark.read.parquet(output_path).select(*keys)
    except AnalysisException:
        return None
