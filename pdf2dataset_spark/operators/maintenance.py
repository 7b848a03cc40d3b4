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


def zorder_key(cols, bits: int = 16, ranges=None):
    """Interleaved-bit (Morton) sort key over 2+ numeric columns.

    `ranges` maps each column to its (min, max); values are scaled to
    [0, 2^bits) and their bits interleaved JVM-side (shift/AND/OR
    expressions — no UDF). Sorting by this key clusters rows so that
    EVERY participating column's min/max footprint per output file is
    narrow — the multi-dimensional generalization of sort-by-one-column
    layout, and what makes file/row-group stats pruning work for
    filters on any of the z-ordered columns (Delta/Iceberg OPTIMIZE
    ZORDER semantics, in plain Spark).
    """
    from pyspark.sql import functions as F

    ncols = len(cols)
    scaled = []
    for c, (lo, hi) in zip(cols, ranges):
        col = F.col(c).cast("double")
        span = float(hi - lo) or 1.0
        q = F.least(
            F.greatest(
                ((col - float(lo)) / span * ((1 << bits) - 1)).cast("long"),
                F.lit(0).cast("long"),
            ),
            F.lit((1 << bits) - 1).cast("long"),
        )
        scaled.append(q)
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, q in enumerate(scaled):
            bit = F.shiftright(q, i).bitwiseAND(F.lit(1).cast("long"))
            z = z.bitwiseOR(F.shiftleft(bit, i * ncols + j))
    return z


def write_zordered(
    df,
    path: str,
    cols,
    bits: int = 16,
    n_files: int = 8,
    compression: str = "snappy",
) -> None:
    """Write `df` range-partitioned and sorted by its z-order key.

    Column ranges come from one tiny agg (2 scalars/column). The
    range-repartition gives n_files near-equal files each covering a
    compact z-range; the within-partition sort tightens row-group
    stats inside each file. At 100 TB this is the layout-maintenance
    job you run after ingest so that subsequent scans prune on any
    z-ordered dimension.
    """
    from pyspark.sql import functions as F

    aggs = []
    for c in cols:
        aggs += [F.min(F.col(c).cast("double")), F.max(F.col(c).cast("double"))]
    row = df.agg(*aggs).collect()[0]
    ranges = [(row[2 * i], row[2 * i + 1]) for i in range(len(cols))]
    z = zorder_key(cols, bits=bits, ranges=ranges).alias("__z")
    (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .option("compression", compression)
        .parquet(path)
    )


def merge_upsert(
    spark,
    target_path: str,
    updates,
    key_cols,
    order_col: str,
    compression: str = "snappy",
) -> None:
    """Batch MERGE INTO for plain-parquet datasets: upsert `updates`
    into `target_path`, keeping per key the row with the highest
    `order_col` (version/timestamp — updates win ties).

    Keep-latest is one window over key, ordered by (order_col, source
    precedence) — a single shuffle on the merge keys. The rewrite is
    write-new + atomic swap like `compact`. At 100 TB you would
    partition the target and rewrite ONLY partitions whose keys appear
    in `updates` (dynamic partition overwrite — see
    tests/test_maintenance.py) or use a table format with row-level
    deletes; the merge semantics here are exactly what those layer
    underneath.
    """
    import os as _os
    import shutil as _shutil
    import uuid as _uuid

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    updates = updates.withColumn("__src", F.lit(1))
    if _os.path.exists(target_path):
        target = spark.read.parquet(target_path).withColumn("__src", F.lit(0))
        all_rows = target.unionByName(updates)
    else:
        all_rows = updates
    w = Window.partitionBy(*key_cols).orderBy(
        F.col(order_col).desc(), F.col("__src").desc()
    )
    merged = (
        all_rows.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__src")
    )
    tmp = f"{target_path}.__merge_{_uuid.uuid4().hex[:8]}"
    merged.write.option("compression", compression).parquet(tmp)
    if _os.path.exists(target_path):
        old = f"{target_path}.__old_{_uuid.uuid4().hex[:8]}"
        _os.rename(target_path, old)
        _os.rename(tmp, target_path)
        _shutil.rmtree(old)
    else:
        _os.rename(tmp, target_path)


def write_point_lookup_layout(
    df,
    path: str,
    bloom_cols: dict[str, int],
    mode: str = "overwrite",
) -> None:
    """Write parquet with per-column BLOOM FILTERS for point-lookup
    pruning: ``bloom_cols`` maps column name → expected distinct
    count. Row-group min/max stats only prune range/sorted layouts
    (the z-order path above); an equality probe on a high-cardinality
    UNSORTED column (doc_id, url hash) matches every row group's
    [min,max] span, so at 100 TB it reads everything. A parquet bloom
    filter (split-block, parquet-mr writes it; Spark's reader
    consults it for = and IN predicates) lets the scan skip row
    groups that cannot contain the key at ~1.2 bytes/NDV footprint
    (tests pin the written footprint). Keep NDV honest: undersizing
    inflates the false-positive rate toward 'no pruning'."""
    w = df.write
    for col, ndv in bloom_cols.items():
        w = w.option(f"parquet.bloom.filter.enabled#{col}", "true")
        w = w.option(f"parquet.bloom.filter.expected.ndv#{col}", str(ndv))
    w.mode(mode).parquet(path)


def write_packed_embeddings(
    df,
    path: str,
    vec_col: str = "embedding",
    dim: int | None = None,
    dtype: str = "float32",
    packed_col: str = "embedding_bin",
    mode: str = "overwrite",
) -> dict:
    """PACK-AT-INGEST for embeddings (the BASELINE.md lesson: at
    100 TB, store embeddings as fixed-dtype binary — pack ONCE at
    ingest, not per query). Writes ``df`` to parquet with ``vec_col``
    replaced by a packed little-endian binary column, plus a
    ``_PACKED_META.json`` sidecar recording (packed_col, dim, dtype)
    so readers never guess the layout. Returns the metadata dict.

    Why this beats array<float> storage for the ANN paths: parquet
    list columns decode into one Python object per ELEMENT at the
    Arrow/pandas UDF boundary (~20 us/row at dim 64), while the
    binary column decodes per BATCH with one frombuffer+reshape —
    and fp32 halves the bytes scanned/shuffled. `topk_cosine_packed`
    / the IVF packed variants consume this layout directly.
    """
    import json as _json

    from pyspark.sql import functions as F

    from pdf2dataset_spark.operators import similarity as sim

    if dim is None:
        row = df.select(F.size(F.col(vec_col)).alias("d")).first()
        if row is None:
            raise ValueError("cannot infer dim from an empty DataFrame")
        dim = int(row["d"])
    out = df.withColumn(
        packed_col, sim.pack_embedding(F.col(vec_col), dtype=dtype)
    ).drop(vec_col)
    out.write.mode(mode).parquet(path)
    meta = {"packed_col": packed_col, "dim": dim, "dtype": dtype}
    # sidecar through Hadoop FileSystem, not local open(): the store
    # path may be hdfs:// / s3a:// (the deployment this exists for)
    fs, jpath = _hadoop_fs(df.sparkSession, path + "/_PACKED_META.json")
    stream = fs.create(jpath, True)
    try:
        stream.write(bytearray(_json.dumps(meta).encode("utf-8")))
    finally:
        stream.close()
    return meta


def read_packed_embeddings(spark: SparkSession, path: str):
    """Read a :func:`write_packed_embeddings` dataset: returns
    ``(DataFrame, meta)`` where meta carries (packed_col, dim, dtype)
    from the sidecar — everything `topk_cosine_packed` needs."""
    import json as _json

    fs, jpath = _hadoop_fs(spark, path + "/_PACKED_META.json")
    stream = fs.open(jpath)
    try:
        buf = bytearray()
        while True:
            b = stream.read()
            if b < 0:
                break
            buf.append(b)
        meta = _json.loads(bytes(buf).decode("utf-8"))
    finally:
        stream.close()
    return spark.read.parquet(path), meta


def _hadoop_fs(spark: SparkSession, path: str):
    """(FileSystem, Path) for any Spark-reachable URI (the
    private-but-stable spark._jvm bridge, same as dedup.ingest_exact)."""
    jpath = spark._jvm.org.apache.hadoop.fs.Path(path)  # type: ignore[union-attr]
    fs = jpath.getFileSystem(
        spark._jsc.hadoopConfiguration()  # type: ignore[union-attr]
    )
    return fs, jpath
