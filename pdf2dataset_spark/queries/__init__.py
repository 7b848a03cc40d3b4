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
#: row each round. Round 1 proved tiers A/B/C + d1; round 2 proved the
#: join/window/streaming tiers plus f1/f2b/f9/sql20 (all green). Round 3
#: fronts the 43 oracle-backed queries that have never had a driver row
#: (TPC-H sql1–sql19, the F-tier pipeline group, g15, e3b/e15, a5/a6)
#: plus a0/a15 — driver-checked in r1 but only as no_oracle rows; both
#: now carry golden oracles worth converting to hard rows — and fills the
#: last 5 slots with this round's new oracle-backed flagships (encrypted-
#: PDF and CID-font extraction goldens, SemDeDup exact + multi-probe, the
#: hashed quality classifier): an oracle PASS is strictly stronger driver
#: evidence than a rows-only row, so the rows-only tail waits for r4's
#: window along with the other post-rotation additions (f28–f31, f35,
#: d20, sql21). Everything not listed keeps its import order after the
#: prefix, so the registry is unchanged in content.
DRIVER_PRIORITY: tuple[str, ...] = (
    # TPC-H SQL shapes — never driver-checked (local oracle green)
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
    # F-tier LLM-pipeline — never driver-checked (local oracle green)
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
    # Remaining oracle-backed never-checked E/G/A entries
    "g15_interval_full_outer_join",
    "e3b_range_frame",
    "e15_ntile_nth_value",
    "a5_pdf_extract",
    "a6_page_render_ocr",
    # a0/a15 were no_oracle rows in r1; both carry golden oracles now
    "a0_extract_pipeline",
    "a15_pipeline_composition",
    # Round-3 oracle-backed flagships (added after the r3 rotation)
    "a16_encrypted_pdf_extract",
    "a17_cid_font_extract",
    "f34_semantic_dedup",
    "f36_quality_classifier",
    "f38_semantic_dedup_nprobe",
    # ---- end of the expected 50-entry window ----
    # Oracle-backed entries awaiting their first driver row (r4 front)
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
    # Rows-only-by-design tail — a driver rows-only row still beats none
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
