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

#: Driver-facing registry order. The verification driver emits CORRECTNESS
#: rows for a bounded prefix of the registry (50 entries in round 1), so
#: ordering is the mechanism for rotating which queries earn a hard driver
#: row each round. Round 1 proved tiers A/B/C + d1 (all green); round 2
#: fronts the oracle-backed join/window/streaming queries plus the round-2
#: perf-fix queries (f1/f2b/f9) and the new TPC-H Q2 shape. Everything not
#: listed keeps its import order after the prioritised prefix, so the full
#: 148-entry registry is unchanged in content — only iteration order moves.
DRIVER_PRIORITY: tuple[str, ...] = (
    # Tier D — joins (d1 proved in r01, moved to the back)
    "d2_broadcast_part_join",
    "d3_left_outer_join",
    "d4_cross_join",
    "d5_theta_join",
    "d6_semi_join",
    "d7_anti_join_resume",
    "d8_range_join",
    "d9_asof_join",
    "d10_self_join_pairs",
    "d11_star_join_revenue",
    "d12_salted_skew_join",
    "d13_q10_returned_items",
    "d14_in_and_scalar_subquery",
    "d15_not_in_null_aware",
    "d16_nullsafe_join",
    "d17_lateral_topk_join",
    "d18_full_outer_join",
    "d19_interval_overlap_join",
    # Tier E — windows / sort / set ops (e12 is rows-only by design → back)
    "e1_rank_orders_per_cust",
    "e2_lag_lead",
    "e3_running_sum_frame",
    "e4_topk_per_group",
    "e5_global_sort",
    "e6_global_topk",
    "e7_union_all",
    "e8_union_distinct",
    "e9_intersect",
    "e10_except",
    "e11_dedup_subset_keep_first",
    "e13_gap_fill_forward",
    "e14_unpivot",
    "e16_funnel_conversion",
    "e17_cohort_retention",
    "e18_rolling_7day_revenue",
    "e19_rolling_zscore_anomaly",
    "e20_sequential_pattern",
    "e21_scd2_history",
    # Tier G — streaming (oracle-backed batch analogs)
    "g1_tumbling_window",
    "g2_sliding_window",
    "g3_session_window",
    "g5_streaming_dedup",
    "g7_stream_static_join",
    "g9_reaggregation_rollup",
    "g10_interval_join",
    "g12_interval_left_outer_join",
    "g13_trending_topk_sliding",
    # Round-2 perf-fix queries + new TPC-H Q2 — earn driver rows for them now
    "f1_exact_dedup",
    "f2b_jaccard_neardup",
    "f9_tfidf_top_terms",
    "sql20_q2_min_cost_supplier",
    # ---- end of the expected 50-entry window ----
    # Overflow preference: if the driver's budget admits more than 50,
    # the next rows should also be oracle-backed queries with no
    # driver row yet (TPC-H shapes, remaining F, A-tier golden
    # oracles, E variants) — r01-proven A/B/C and rows-only entries
    # stay last either way.
    "sql1_raw_sql_q3_shape",
    "sql2_correlated_scalar_subquery",
    "sql3_q12_priority_lines",
    "sql4_q14_promo_revenue",
    "sql5_q19_disjunctive_join",
    "sql6_q18_large_orders",
    "sql7_q11_revenue_share",
    "sql8_q22_idle_balance",
    "sql9_q7_nation_volume",
    "sql10_q15_top_supplier",
    "sql11_q16_supplier_count",
    "sql12_q20_nested_in",
    "sql13_q21_sole_late_shipper",
    "sql14_q4_priority_exists",
    "sql15_q6_forecast_revenue",
    "sql16_q8_market_share",
    "sql17_q9_product_profit",
    "sql18_q13_order_distribution",
    "sql19_q17_small_qty_revenue",
    "f3_cosine_similarity",
    "f4_topk_cosine",
    "f6_text_statistics",
    "f7_quality_language_filter",
    "f10_doc_fingerprint",
    "f12_lang_id_heuristic",
    "f13_embedding_neardup",
    "f14_text_cleaning",
    "f17_hash_train_test_split",
    "f18_neardup_clustering",
    "f19_token_chunking",
    "f20_repetition_stats",
    "f21_contamination_check",
    "f22_token_shard_packing",
    "f23_pii_redaction",
    "f24_deterministic_group_sample",
    "f25_line_dedup",
    "f26_token_rarity_score",
    "f27_embedding_quantization",
    "g15_interval_full_outer_join",
    "e3b_range_frame",
    "e15_ntile_nth_value",
    "a0_extract_pipeline",
    "a5_pdf_extract",
    "a6_page_render_ocr",
    "a15_pipeline_composition",
)


def _reorder_for_driver() -> None:
    """Rebuild REGISTRY with DRIVER_PRIORITY names first (dicts keep
    insertion order). Unknown names are ignored; unlisted queries keep
    their relative import order after the prefix."""
    prioritized = {n: REGISTRY[n] for n in DRIVER_PRIORITY if n in REGISTRY}
    rest = {n: s for n, s in REGISTRY.items() if n not in prioritized}
    REGISTRY.clear()
    REGISTRY.update(prioritized)
    REGISTRY.update(rest)


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

        _reorder_for_driver()
        _LOADED = True
    return REGISTRY
