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

from pyspark.sql import Column, DataFrame, Window, functions as F


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


# ------------------------------------------------------------------
# KMV / theta sketch — distinct counts WITH set operations
# ------------------------------------------------------------------
# HLL (c14) gives mergeable distinct counts but only UNION composes;
# the KMV (k-minimum-values) theta sketch also estimates INTERSECTION
# and difference — the Druid/DataSketches capability. The sketch is a
# sorted array of the k smallest distinct key hashes (below sampling
# threshold p): bounded size, pure JVM build, and EXACTLY mergeable —
# "k smallest distinct hashes of A∪B" is a deterministic set function,
# so merge(sketch(A), sketch(B)) == sketch(A ∪ B) bit-for-bit
# (property-tested), unlike probabilistic-merge structures.
#
# Hash order: xxhash64 is signed; XOR with the sign bit maps unsigned
# order onto signed order so array_sort ranks hashes as uniform
# [0,1) draws. Estimators (standard KMV/theta):
#   full (|S| = k):      est = (k-1) / u_k      u_k = normalized kth min
#   sampling (|S| < k):  est = |S| / p
#   A∩B: jaccard * union_est, jaccard = |U ∩ A ∩ B| / |U| over the
#        union sketch U (k smallest of A ∪ B).
#
# Scale: selection of the k minima is row-wise and spillable end to
# end (hash-distinct → sort-based rank window / TakeOrdered; p
# pre-filters the stream JVM-side first) — no aggregation buffer ever
# holds a group's full distinct-hash set. Sketches are KBs,
# broadcastable, and compose across shards/days without re-reading
# data.

_SIGN = -(1 << 63)


def kmv_hash(key: Column | str) -> Column:
    """Uniform-order 64-bit key hash (signed order == unsigned order)."""
    c = F.col(key) if isinstance(key, str) else key
    return F.xxhash64(c).bitwiseXOR(F.lit(_SIGN))


def _unit(h: Column) -> Column:
    """Normalized hash in [0, 1): (flipped + 2^63) / 2^64."""
    return (h.cast("double") - _SIGN) / F.lit(float(1 << 64))


def kmv_build(
    df: DataFrame,
    key_col: str,
    k: int = 256,
    p: float = 1.0,
    by: list[str] | None = None,
) -> DataFrame:
    """Sketch column ``kmv`` (sorted long array, ≤ k entries) per
    ``by`` group (global when None). ``p`` < 1 pre-filters the hash
    stream (theta sampling mode).

    Memory-bounded by construction: the k smallest hashes are selected
    as ROWS (spillable sort/limit), never by materializing a group's
    full distinct-hash set in one aggregation buffer — a
    ``collect_set``-then-slice formulation would build an O(NDV) array
    per group on one reducer, which is exactly the blowup a sketch
    exists to avoid. Grouped: hash-distinct, then a per-group rank
    window (sort-based, spills) keeps rank ≤ k before a ≤k-element
    ``collect_list``. Global: distinct + ``orderBy().limit(k)`` plans
    as TakeOrderedAndProject (per-partition top-k, k rows merged)."""
    h = kmv_hash(key_col).alias("__h")
    src = df.select(*(by or []), h)
    if p < 1.0:
        thresh = int(p * (1 << 64)) + _SIGN
        src = src.filter(F.col("__h") < F.lit(thresh))
    distinct = src.dropDuplicates([*(by or []), "__h"])
    if by:
        w = Window.partitionBy(*by).orderBy("__h")
        kept = (
            distinct.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= k)
            .drop("__rn")
        )
        return kept.groupBy(*by).agg(
            F.array_sort(F.collect_list("__h")).alias("kmv")
        )
    kept = distinct.orderBy("__h").limit(k)
    return kept.agg(F.array_sort(F.collect_list("__h")).alias("kmv"))


def kmv_merge(a: Column | str, b: Column | str, k: int = 256) -> Column:
    """Union of two sketches — exact: k smallest of the merged sets."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    return F.slice(F.array_sort(F.array_union(ca, cb)), 1, k)


def kmv_estimate(sketch: Column | str, k: int = 256, p: float = 1.0) -> Column:
    """Distinct-count estimate (double) from a sketch array."""
    s = F.col(sketch) if isinstance(sketch, str) else sketch
    n = F.size(s)
    full = (F.lit(k - 1).cast("double")) / _unit(F.element_at(s, k))
    sampling = n.cast("double") / F.lit(float(p))
    return F.when(n >= k, full).otherwise(sampling)


def kmv_intersection(
    a: Column | str, b: Column | str, k: int = 256, p: float = 1.0
) -> tuple[Column, Column]:
    """(jaccard_est, intersection_est) from two sketches."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    u = kmv_merge(ca, cb, k)
    in_both = F.size(F.array_intersect(F.array_intersect(u, ca), cb))
    jacc = F.when(F.size(u) > 0, in_both.cast("double") / F.size(u)).otherwise(
        F.lit(0.0)
    )
    return jacc, jacc * kmv_estimate(u, k, p)
