"""In-memory document source (SURVEY.md §2 A2).

Upstream: ``extract({'doc.pdf': b'...', ...})``. Spark-native:
``createDataFrame`` with an explicit (path, content) schema. Only
appropriate for small inputs (the dict already fits in driver
memory); large corpora should land on storage and use
:func:`pdf2dataset_spark.sources.binary_dir.scan_documents`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def from_dict(spark: SparkSession, docs: dict[str, bytes]) -> DataFrame:
    pairs = [(name, content) for name, content in sorted(docs.items())]
    return spark.createDataFrame(pairs, schema="path string, content binary")
