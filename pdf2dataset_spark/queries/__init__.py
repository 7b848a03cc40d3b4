"""Query registry — the driver-facing contract (SURVEY.md §2).

Every implemented operator registers one named query here via the
:func:`query` decorator: a Spark DataFrame callable plus (when the
semantics are SQL-expressible) a twin DuckDB oracle SQL string. The
driver runs both at sf0.01 and compares row-count + schema +
order-insensitive value-hash, so:

- every computed column is aliased identically on both sides;
- float aggregates use the decimal-exact-sum-then-cast-to-double
  trick (bitwise-reproducible across engines, no rounding slop);
- ties in top-k / limit queries are broken deterministically.

Randomized / streaming-semantic operators register with ``sql=None``
→ rows-only check (SURVEY.md §2 legend).
"""

from __future__ import annotations

import functools
import os
import weakref
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from pdf2dataset_spark.session import apply_runtime_conf

#: Per-session prepared-plan cache: SparkSession -> {(name, sf_dir): DataFrame}.
#: A registered query is a pure function of (session, sf_dir) returning an
#: immutable logical plan, so re-invoking it only repays the py4j DSL
#: construction cost (~0.1-0.3 s for wide plans). Caching the built
#: DataFrame is the engine's prepared-statement / plan cache; execution
#: still happens fresh on every action. Weak keys let a stopped session
#: drop its plans.
_PLAN_CACHE: "weakref.WeakKeyDictionary[SparkSession, dict]" = (
    weakref.WeakKeyDictionary()
)


@dataclass
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    sql: str | None  # DuckDB oracle; None → rows-only check
    tier: str
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, sql: str | None = None, tier: str = "") -> Callable:
    """Register a (spark, sf_dir) -> DataFrame query under ``name``."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        @functools.wraps(fn)
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            cache = _PLAN_CACHE.setdefault(spark, {})
            key = (name, os.path.abspath(sf_dir))
            df = cache.get(key)
            if df is None:
                # The driver owns the session; make correctness-relevant
                # runtime confs (UTC, Arrow) hold no matter who built it.
                apply_runtime_conf(spark)
                df = fn(spark, sf_dir)
                cache[key] = df
            return df

        REGISTRY[name] = QuerySpec(
            name=name, fn=wrapped, sql=sql, tier=tier, doc=fn.__doc__ or ""
        )
        return wrapped

    return deco


_LOADED = False


def load_all() -> dict[str, QuerySpec]:
    """Import every tier module (side effect: registry population)."""
    global _LOADED
    if not _LOADED:
        from pdf2dataset_spark.queries import (  # noqa: F401
            tier_a,
            tier_b,
            tier_c,
            tier_d,
            tier_e,
            tier_f,
            tier_g,
            tier_tpch,
        )

        _LOADED = True
    return REGISTRY
