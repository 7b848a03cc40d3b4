"""Count-min sketch as a relation — mergeable frequency estimates.

Companion to the HLL distinct-count sketches (queries/tier_c.py c14):
where HLL answers "how many distinct keys", CMS answers "about how
often does key x occur" in fixed space with a one-sided error
guarantee (estimate >= truth; overshoot <= e/width * N with
probability 1 - (1/e)^depth).

The sketch is stored RELATIONALLY: one row per (d, bucket) counter,
``depth * width`` rows total regardless of input size. That makes it

- **mergeable**: union two sketches and SUM matching counters —
  associative/commutative, so per-day / per-shard sketches compose
  without touching raw data again;
- **broadcastable**: depth*width rows (default 5 * 2048 = 10k) is
  kilobytes, so point estimates join against it broadcast-side with
  no shuffle of the sketch;
- **pure JVM**: build is explode(depth) + groupBy with map-side
  combine; no Python crossing.

Scale posture: the build's only shuffle carries at most
depth * width * n_map_partitions rows after partial aggregation —
independent of row count. At 100 TB the sketch is still 10k rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _bucket(key: Column, d: Column | int, width: int) -> Column:
    """Row-hash family: depth-indexed xxhash64, folded into [0, width)."""
    return F.pmod(F.xxhash64(key, F.lit(d) if isinstance(d, int) else d), F.lit(width))


def cms_build(
    df: DataFrame,
    key_col: str,
    weight_col: str | None = None,
    depth: int = 5,
    width: int = 2048,
) -> DataFrame:
    """Build a count-min sketch over ``key_col``.

    Returns the sketch relation ``(d, bucket, cnt)`` with exactly the
    touched counters present (absent counter == 0). ``weight_col``
    lets each row add an integer weight instead of 1 (e.g. token
    counts per doc).
    """
    w = F.col(weight_col).cast("long") if weight_col else F.lit(1).cast("long")
    rows = df.select(
        F.col(key_col).alias("k"),
        w.alias("w"),
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("d"),
    )
    return (
        rows.select("d", _bucket(F.col("k"), F.col("d"), width).alias("bucket"), "w")
        .groupBy("d", "bucket")
        .agg(F.sum("w").alias("cnt"))
    )


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two sketches built with the same (depth, width): counters add."""
    return (
        a.unionByName(b)
        .groupBy("d", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = 5,
    width: int = 2048,
) -> DataFrame:
    """Point-estimate each key in ``keys``: min over d of its counter.

    The sketch side is broadcast (it is tiny by construction), so the
    estimate is a map-side join however large the key set is. Keys
    whose counters were never touched estimate to 0.
    """
    probes = keys.select(
        F.col(key_col),
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("d"),
    ).withColumn("bucket", _bucket(F.col(key_col), F.col("d"), width))
    joined = probes.join(F.broadcast(sketch), ["d", "bucket"], "left")
    return (
        joined.groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est_cnt"))
    )
