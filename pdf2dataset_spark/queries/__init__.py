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

#: Queries whose CODE PATHS changed in the CURRENT round. This is the
#: one manual input to the otherwise mechanical rotation below: list a
#: query here when this round's diffs touch code it executes, so every
#: change lands with fresh driver evidence. Reset each round.
TOUCHED_THIS_ROUND: tuple[str, ...] = (
    # round 12 — a19's environment-sensitive CMYK payload golden
    # re-pinned to the value this runtime reproducibly measures
    "a19_color_image_extract",
    # round 12 — the fused extraction pass now runs through
    # mapInArrow (column-wise Arrow batch assembly, typed feature
    # columns); a0 pins the manifest plan law, a45/a46 the
    # int/bool/double metadata columns, a18/a44 binary payloads
    "a0_extract_pipeline",
    "a18_embedded_image_extract",
    "a44_indexed_image_extract",
    "a45_metadata_extract",
    "a46_doc_profile_extract",
    # round 12 — findall total tokenizer for clean content streams +
    # show()/_emit_lines fast paths run inside EVERY text extraction;
    # these pin the authored, real-world, RTL, CID, encrypted,
    # ActualText/artifact/OCG and paragraph goldens over that path
    "a5_pdf_extract",
    "a38_realworld_extract",
    "a39_rtl_extract",
    "a30_paragraph_extract",
    "a17_cid_font_extract",
    "a16_encrypted_pdf_extract",
    "a22_embedded_font_cmap_extract",
    "a29_word_boxes_extract",
    "a40_incremental_update_extract",
    "a41_actualtext_hidden_extract",
    "a42_artifact_body_extract",
    "a43_ocg_layer_extract",
    # round 12 — JPX tier-1 pass walkers rebuilt on numpy snapshots
    # with the MQ decode inlined (decode_codeblock); a26/a27 pin the
    # lossless/lossy/ROI/subsampled families
    "a26_jpx_image_extract",
    "a27_lossy_jpx_extract",
)

#: Driver-window size: the verification driver emits CORRECTNESS rows
#: for this many registry-prefix entries per round.
DRIVER_WINDOW = 50


def compute_driver_priority(repo_root: str | None = None) -> tuple[str, ...]:
    """MECHANICAL staleness-driven driver-window rotation (the round-4
    verdict's prescription, replacing the hand-curated list used in
    rounds 1-4). The registry prefix — and therefore the driver's
    50-row CORRECTNESS window — is ordered by:

    1. never-driver-verified queries (no row in any CORRECTNESS_r*.json
       — i.e. queries added this round) first;
    2. then :data:`TOUCHED_THIS_ROUND` (code paths changed this round);
    3. then everything else ASCENDING by the last round that gave the
       query a driver row (stalest evidence first), ties keeping
       registry import order.

    Evidence comes from the CORRECTNESS_r{NN}.json files the driver
    itself writes at the repo root, so the rotation needs no manual
    bookkeeping beyond TOUCHED_THIS_ROUND: with 175+ entries and a
    50-row window every entry is re-verified at least every ~4 rounds
    automatically. Missing/unreadable evidence files degrade to
    treating all queries as never-verified (import order)."""
    import glob
    import json
    import re

    root = repo_root or os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    last_round: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        try:
            with open(path) as f:
                data = json.load(f)
        except (OSError, ValueError):
            continue
        rnd = int(m.group(1))
        for name in data:
            last_round[name] = max(rnd, last_round.get(name, 0))
    touched = {n for n in TOUCHED_THIS_ROUND if n in REGISTRY}
    import_order = {n: i for i, n in enumerate(REGISTRY)}

    def sort_key(n: str):
        if n not in last_round:
            bucket, stale = 0, 0  # never verified: front
        elif n in touched:
            bucket, stale = 1, last_round[n]
        else:
            bucket, stale = 2, last_round[n]
        return (bucket, stale, import_order[n])

    return tuple(sorted(REGISTRY, key=sort_key))


def _reorder_for_driver() -> None:
    """Rebuild REGISTRY in :func:`compute_driver_priority` order
    (dicts keep insertion order), so the driver's window-prefix is the
    staleness-rotated one."""
    for n in compute_driver_priority():
        REGISTRY[n] = REGISTRY.pop(n)


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
