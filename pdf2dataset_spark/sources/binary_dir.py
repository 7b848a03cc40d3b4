"""Recursive document-directory source (SURVEY.md §2 A1).

Upstream walks the input root for ``*.pdf`` on the driver; the Spark
native equivalent is the ``binaryFile`` data source, which performs
the listing in parallel, splits the file set across executors, and
exposes ``(path, modificationTime, length, content)``. At 100 TB the
listing itself is distributed and the per-file bytes never pass
through the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def scan_documents(
    spark: SparkSession,
    input_dir: str,
    glob: str = "*.pdf",
    relative_to: str | None = None,
) -> DataFrame:
    """Manifest DataFrame (path, content) for every matching file.

    ``path`` is made relative to ``relative_to`` (default:
    ``input_dir``) to match upstream's relative-path convention.
    """
    base = (relative_to or input_dir).rstrip("/") + "/"
    df = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .option("recursiveFileLookup", "true")
        .load(input_dir)
    )
    # binaryFile paths are URIs (file:/...); strip scheme + base prefix.
    rel = F.regexp_replace(F.col("path"), r"^[a-z0-9+.-]+:/+", "/")
    rel = F.regexp_replace(rel, "^" + _re_escape(base), "")
    return df.select(rel.alias("path"), F.col("content"))


def _re_escape(s: str) -> str:
    import re

    return re.escape(s)
