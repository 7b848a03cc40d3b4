"""Dataset maintenance operators a long-lived corpus needs.

- `compact`: small-file compaction. Incremental appends (A10) leave
  many tiny files; at 100 TB the resulting listing/open overhead
  dominates scans. Rewrites a parquet dataset into ~`target_mb`
  files (size-derived count), atomically via write-new + swap.
- Dynamic partition overwrite (reprocess one day/shard without
  touching siblings) is a Spark conf + write mode; see
  tests/test_maintenance.py for the exercised pattern.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import SparkSession


def dataset_size_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        total += sum(os.path.getsize(os.path.join(root, f)) for f in files)
    return total


def compact(
    spark: SparkSession,
    path: str,
    target_mb: int = 128,
    compression: str = "gzip",
) -> int:
    """Rewrite `path` into ceil(size/target_mb) files; returns the new
    file count. Swap is write-to-sibling + rename (atomic on a local
    FS; object stores would use a manifest/commit protocol instead).
    """
    size = dataset_size_bytes(path)
    n_files = max(1, -(-size // (target_mb * 1024 * 1024)))
    tmp = f"{path}.__compact_{uuid.uuid4().hex[:8]}"
    (
        spark.read.parquet(path)
        .repartition(n_files)
        .write.option("compression", compression)
        .parquet(tmp)
    )
    old = f"{path}.__old_{uuid.uuid4().hex[:8]}"
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    return n_files
