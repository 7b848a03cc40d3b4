"""Scalable global ranking (SURVEY §2 E5 at 100 TB).

``row_number() OVER (ORDER BY ...)`` forces every row through ONE
partition — correct, and a guaranteed bottleneck at scale. The
scalable equivalent splits it into:

1. ``repartitionByRange`` on the sort keys (range partitioner ⇒
   partition i holds strictly earlier keys than partition i+1);
2. per-partition ``row_number`` (parallel, partition-local window);
3. a tiny per-partition row-count table, cumulated into offsets and
   broadcast-joined back: global_rank = offset + local row_number.

Output is bit-identical to the single-partition window as long as
the ordering is total (include a unique tie-break key).

CORRECTNESS NOTE (found by tools/bench_rank.py at 10M rows): the
local-window branch and the offsets branch both consume the
``repartitionByRange`` output, and Spark's range exchange picks its
partition boundaries by SAMPLING at execution time. When the
optimizer does not reuse the exchange across the two branches (it
reliably does not at scale), each branch samples DIFFERENT
boundaries, the offsets no longer match the partition counts, and
the "rank" silently stops being a permutation (observed: 10M rows →
9.70M distinct ranks; at <=1M rows the sample is effectively
exhaustive, so small-scale tests cannot catch it). The fix is to
persist the ranged frame (MEMORY_AND_DISK): both branches then read
the SAME materialized partitioning — one boundary sample, one scan
of the input instead of two, and the rank is a permutation at any
scale (pinned by tests/test_operators.py::test_global_rank_is_
permutation_at_scale).
"""

from __future__ import annotations

import contextvars
import threading
from contextlib import contextmanager

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: Ranged frames persisted by global_rank/global_prefix_sum. The cache
#: must outlive the CALLER's action (unpersisting earlier would let the
#: two plan branches resample range boundaries — the exact bug the
#: persist fixes), so the functions cannot unpersist themselves; frames
#: are tracked here and released via :func:`release_caches`. Long-lived
#: sessions that build many ranked plans in a loop (fuzzers, shard
#: packers, multi-stage curate runs) should call it between iterations
#: or the cached RDDs accumulate for the session lifetime.
#:
#: Thread safety: the global list is lock-guarded, but a GLOBAL
#: release from one thread would still unpersist frames another
#: thread's not-yet-executed plan depends on — multi-threaded callers
#: must wrap each plan-build-and-consume in :func:`cache_scope`, which
#: tracks (and releases) only that block's frames.
_LIVE_CACHES: list[DataFrame] = []
_CACHE_LOCK = threading.Lock()
#: Per-context override: inside cache_scope() frames go to a scoped
#: list instead of the global one. ContextVars are per-thread (a new
#: thread sees the default), so scopes never leak across threads.
_CACHE_SCOPE: contextvars.ContextVar[list[DataFrame] | None] = (
    contextvars.ContextVar("rank_cache_scope", default=None)
)


def _track_cache(df: DataFrame) -> None:
    scope = _CACHE_SCOPE.get()
    if scope is not None:
        scope.append(df)
    else:
        with _CACHE_LOCK:
            _LIVE_CACHES.append(df)


def _release_list(frames: list[DataFrame]) -> int:
    n = 0
    while frames:
        df = frames.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:
            pass  # session already stopped — nothing to release
    return n


@contextmanager
def cache_scope():
    """Scope ranked-frame caches to this block: frames persisted by
    global_rank/global_prefix_sum inside the ``with`` are released on
    exit, and a concurrent thread's :func:`release_caches` cannot free
    them early. Consume the ranked plan (run its actions) INSIDE the
    block — on exit the persisted boundaries are gone and re-executing
    the plan would resample them."""
    frames: list[DataFrame] = []
    token = _CACHE_SCOPE.set(frames)
    try:
        yield frames
    finally:
        _CACHE_SCOPE.reset(token)
        _release_list(frames)


def release_caches() -> int:
    """Unpersist every GLOBALLY tracked ranged frame (frames inside an
    active :func:`cache_scope` are not touched).

    Call only AFTER the consuming actions have run, and do NOT
    re-execute a previously built ranked plan afterwards — without the
    cache its two branches would sample range boundaries independently
    again (build a fresh plan instead). Returns the number of frames
    released."""
    with _CACHE_LOCK:
        frames = list(_LIVE_CACHES)
        _LIVE_CACHES.clear()
    return _release_list(frames)


def global_rank(
    df: DataFrame,
    order_cols: list[Column],
    rank_col: str = "global_rank",
    num_partitions: int | None = None,
) -> DataFrame:
    """Append a dense global row number following ``order_cols``
    (must be a total order) without a single-partition window."""
    from pyspark import StorageLevel

    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    ranged = (
        df.repartitionByRange(n, *order_cols)
        .withColumn("__pid", F.spark_partition_id())
        .persist(StorageLevel.MEMORY_AND_DISK)  # ONE boundary sample
    )
    _track_cache(ranged)
    w_local = Window.partitionBy("__pid").orderBy(*order_cols)
    local = ranged.withColumn("__rn", F.row_number().over(w_local))
    # Per-partition counts → running offsets (tiny: one row/partition).
    w_off = (
        Window.orderBy("__pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        local.groupBy("__pid")
        .agg(F.count(F.lit(1)).alias("__cnt"))
        .withColumn("__offset", F.coalesce(F.sum("__cnt").over(w_off), F.lit(0)))
        .select("__pid", "__offset")
    )
    out = local.join(F.broadcast(offsets), "__pid").withColumn(
        rank_col, (F.col("__rn") + F.col("__offset")).cast("int")
    )
    return out.drop("__pid", "__rn", "__offset")


def global_prefix_sum(
    df: DataFrame,
    order_cols: list[Column],
    value_col: str,
    sum_col: str = "prefix_sum",
    num_partitions: int | None = None,
) -> DataFrame:
    """Append the inclusive running sum of ``value_col`` following
    ``order_cols`` (must be a total order) without a single-partition
    window — the same split as :func:`global_rank`: range partition,
    partition-local running-sum window, then per-partition TOTALS
    (one row each) cumulated into offsets and broadcast back. Exact
    for integer values; bit-identical to the global window for them.
    Used by f22 shard packing (exclusive prefix = inclusive − value)."""
    from pyspark import StorageLevel

    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    ranged = (
        df.repartitionByRange(n, *order_cols)
        .withColumn("__pid", F.spark_partition_id())
        .persist(StorageLevel.MEMORY_AND_DISK)  # ONE boundary sample
    )
    _track_cache(ranged)
    w_local = (
        Window.partitionBy("__pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = ranged.withColumn("__ps", F.sum(value_col).over(w_local))
    w_off = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        local.groupBy("__pid")
        .agg(F.sum(value_col).alias("__tot"))
        .withColumn("__offset", F.coalesce(F.sum("__tot").over(w_off), F.lit(0)))
        .select("__pid", "__offset")
    )
    out = local.join(F.broadcast(offsets), "__pid").withColumn(
        sum_col, F.col("__ps") + F.col("__offset")
    )
    return out.drop("__pid", "__ps", "__offset")
