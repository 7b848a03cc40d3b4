"""Training-shard materialization (tier F: the f22 assignment made
physical).

`f22_token_shard_packing` computes a deterministic doc→shard map by
token budget; this module writes it out the way a training job reads
it: one parquet directory per shard (`partitionBy(shard_id)` — the
files ARE the shards, so a loader reads shard k with one partition-
pruned scan) plus a one-row-per-shard **manifest** (doc count, token
count, id range) that a data-mix recipe can audit without touching
the data.

Scale posture: partitionBy writes each shard from the tasks that hold
its rows — no extra shuffle beyond the upstream assignment window;
the manifest is one narrow aggregation. Both are pure DataFrame ops.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_shards(
    df: DataFrame,
    out_path: str,
    shard_col: str = "shard_id",
    id_col: str = "doc_id",
    token_col: str = "n_tokens",
) -> None:
    """Write shard-partitioned data + manifest under ``out_path``
    (``data/shard_id=K/`` directories and ``manifest/``)."""
    df.write.partitionBy(shard_col).mode("overwrite").parquet(
        os.path.join(out_path, "data")
    )
    manifest = df.groupBy(shard_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_col).alias("n_tokens"),
        F.min(id_col).alias("min_id"),
        F.max(id_col).alias("max_id"),
    )
    manifest.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(out_path, "manifest")
    )


def read_manifest(spark: SparkSession, out_path: str) -> DataFrame:
    return spark.read.parquet(os.path.join(out_path, "manifest"))


def read_shard(
    spark: SparkSession, out_path: str, shard_id: int, shard_col: str = "shard_id"
) -> DataFrame:
    """One shard via partition pruning (the loader-side contract)."""
    return spark.read.parquet(os.path.join(out_path, "data")).filter(
        F.col(shard_col) == shard_id
    )
