"""Shared helpers for the query registry.

The central correctness device is *decimal-exact arithmetic*: the
testdata's double columns all carry exactly 2 decimal places
(verified at sf0.01), so casting them to DECIMAL(p,2) is lossless in
both Spark and DuckDB, decimal products/sums are exact and
associative (order-independent — critical: Spark partial aggregation
order is nondeterministic, catastrophically so on a 1000-executor
cluster), and one final cast back to DOUBLE is deterministic and
identical across engines. Raw double sums can never hash-match.
"""

from __future__ import annotations

from time import monotonic as _monotonic

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from pdf2dataset_spark.io import load_table


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _session_broadcast_threshold(spark: SparkSession) -> int:
    """``spark.sql.autoBroadcastJoinThreshold`` in bytes (-1 = off)."""
    try:
        return int(
            spark._jsparkSession.sessionState().conf().autoBroadcastJoinThreshold()
        )
    except Exception:
        # string fallback (e.g. Spark Connect): parse Spark byte-size
        # syntax; anything unparseable degrades to the Spark default
        # (10 MB) rather than crashing query construction
        raw = str(
            spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
        ).strip().lower()
        try:
            units = {"k": 1 << 10, "m": 1 << 20, "g": 1 << 30,
                     "t": 1 << 40, "p": 1 << 50}
            for suffix, mult in (
                ("kb", 1 << 10), ("mb", 1 << 20), ("gb", 1 << 30),
                ("tb", 1 << 40), ("pb", 1 << 50), ("b", 1),
            ):
                if raw.endswith(suffix):
                    return int(float(raw[: -len(suffix)]) * mult)
            if raw and raw[-1] in units:
                return int(float(raw[:-1]) * units[raw[-1]])
            return int(float(raw))
        except ValueError:
            return 10 * (1 << 20)


def maybe_broadcast(df: DataFrame, threshold: int | None = None) -> DataFrame:
    """Size-GUARDED broadcast hint for relations that grow with the
    corpus (part / supplier / customer / partsupp and anything derived
    from them).

    A pinned ``F.broadcast`` is a scale liability on such relations: at
    100x data the build side is gigabytes, and a hint — unlike a
    threshold-guarded planner choice — removes Catalyst's ability to
    fall back to a shuffle join, pinning an executor OOM. This helper
    hints only when Catalyst's own size estimate for the optimized
    logical plan sits under ``spark.sql.autoBroadcastJoinThreshold``
    (or an explicit byte ``threshold``); otherwise it returns the frame
    un-hinted so AQE can pick the join strategy from ACTUAL runtime
    sizes at the shuffle boundary (which also rescues the case where
    the static estimate is pessimistic — e.g. post-aggregation frames
    whose non-CBO estimate inherits a join-product size).

    Keep plain ``F.broadcast`` only for relations bounded by SCHEMA,
    not by corpus size: region (5 rows), nation (25), single-row
    scalar aggregates, literal spines. Those are safe at any scale.
    """
    spark = df.sparkSession
    if threshold is None:
        threshold = _session_broadcast_threshold(spark)
    if threshold <= 0:
        # Auto-broadcast disabled for the session: never force a hint —
        # honor the operator's explicit "no broadcasts" choice.
        return df
    # The estimate (optimizedPlan().stats()) runs Catalyst analysis +
    # optimization and, for file relations, a file-size listing — per
    # guarded relation, per query BUILD. Cache it per (session,
    # canonical plan): semanticHash is computed over the canonicalized
    # analyzed plan (which distinguishes source paths, so sf0.001 vs
    # sf0.01 reads of the same schema do not collide), and the schema
    # string disambiguates residual hash collisions. The estimate does
    # not depend on the threshold, so the comparison below stays live
    # against the CURRENT session threshold even on a cache hit.
    try:
        key = (id(spark._jsparkSession), df.semanticHash(), str(df.schema))
    except Exception:
        key = None
    est = None
    if key is not None:
        hit = _EST_CACHE.get(key)
        # TTL expiry: an estimate must not outlive the data — a
        # relation that grows in place mid-session (or an id() reused
        # by a recreated JVM session) would otherwise keep serving a
        # stale small estimate and pin a broadcast hint forever
        if hit is not None and _monotonic() - hit[1] < _EST_TTL_S:
            est = hit[0]
    if est is None:
        try:
            est = int(
                str(
                    df._jdf.queryExecution().optimizedPlan().stats()
                    .sizeInBytes()
                )
            )
        except Exception:
            # No usable estimate: leave un-hinted, the planner decides.
            return df
        if key is not None:
            if len(_EST_CACHE) > 1024:
                _EST_CACHE.clear()
            _EST_CACHE[key] = (est, _monotonic())
    return F.broadcast(df) if est <= threshold else df


_EST_TTL_S = 120.0
_EST_CACHE: dict = {}  # (session id, semanticHash, schema) -> (bytes, t)


def ordered_small(df: DataFrame, *cols) -> DataFrame:
    """Total ORDER BY for a result whose row count is bounded by a
    FIXED KEYSPACE (return flags, brands, nations — not by corpus
    size): route the result through one partition and sort within it.

    A plain ``orderBy`` plans a range-partitioned sort, which costs a
    separate range-boundary SAMPLING JOB plus a range exchange into
    ``spark.sql.shuffle.partitions`` reducers — pure overhead when the
    output is a handful of rows at any scale (measured −0.07 s per
    bench headliner at sf0.1; the sampling pass re-executes the
    aggregate child). Here the upstream aggregate keeps its parallel
    reducers; only the bounded result rows cross one single-partition
    exchange, and the in-partition sort over one partition IS a total
    order. Do NOT use for outputs that grow with the corpus (global
    sorts, per-user/session results) — those need the range sort."""
    return df.repartition(1).sortWithinPartitions(*cols)


def dec(col: Column | str, prec: int = 12, scale: int = 2) -> Column:
    """Lossless decimal view of a 2-decimal double column."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({prec},{scale})")


def dsum(expr: Column | str) -> Column:
    """Exact sum of a decimal expression, surfaced as double."""
    e = dec(expr) if isinstance(expr, str) else expr
    return F.sum(e).cast("double")


def davg(expr: Column | str) -> Column:
    """Order-independent average: exact decimal sum ÷ count (double div)."""
    e = dec(expr) if isinstance(expr, str) else expr
    return F.sum(e).cast("double") / F.count(F.lit(1))


def sql_dec(expr: str, prec: int = 12, scale: int = 2) -> str:
    return f"CAST({expr} AS DECIMAL({prec},{scale}))"


# --- integer-cents fast path -------------------------------------
# For 2-decimal columns, long arithmetic beats Spark's decimal sums
# ~1.5-3x (decimals >18 digits leave the compact-long representation).
# round(x*100) is unambiguous because x*100 is always within 1e-10 of
# an integer — the cross-engine round() divergence only affects
# arbitrary fractional arguments. Exact, order-independent, and
# bitwise-identical to the decimal formulation (verified at sf0.1).
# Overflow headroom: sums fit int64 up to ~9e16 cents; at larger
# partial sums, fall back to dec()/dsum().


def cents(col: Column | str, scale: int = 100) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * scale, 0).cast("bigint")


def csum(col: Column | str) -> Column:
    """Exact cents-sum of a 2-decimal column, surfaced as double."""
    return F.sum(cents(col)).cast("double") / 100


def cavg(col: Column | str) -> Column:
    """Order-independent average via cents-sum (mirrors sql_cavg)."""
    return F.sum(cents(col)).cast("double") / 100 / F.count(F.lit(1))


def sql_cents(expr: str) -> str:
    return f"CAST(round(({expr})*100,0) AS BIGINT)"


def sql_csum(expr: str) -> str:
    return f"CAST(SUM({sql_cents(expr)}) AS DOUBLE)/100"


def sql_cavg(expr: str) -> str:
    return f"CAST(SUM({sql_cents(expr)}) AS DOUBLE)/100/COUNT(*)"


def sql_dsum(expr: str) -> str:
    """DuckDB twin of :func:`dsum` for a plain 2-decimal column."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(12,2))) AS DOUBLE)"


def sql_davg(expr: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)"
