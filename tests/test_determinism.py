"""Partition-count invariance: the cluster-scale determinism claim.

On a 1000-executor cluster, partial aggregation order, shuffle
fan-in, and merge order all change with the partition count. The
engine's determinism devices (integer-cents / decimal-exact sums,
exact-moment stats, sorted collect_set) claim the RESULT is
bit-identical anyway. This suite runs the numerically-sensitive
queries under deliberately different shuffle widths and asserts the
collected rows match exactly — a local[32] stand-in for re-running
the job on a differently-sized cluster.
"""

from __future__ import annotations

import pytest

from pdf2dataset_spark.queries import load_all

SF = "/root/testdata/sf0.001"

SENSITIVE = [
    "c1_pricing_summary",  # cents sums
    "c8_stats_aggregates",  # variance/corr/skewness via exact moments
    "e3_running_sum_frame",  # windowed decimal running sums
    "sql4_q14_promo_revenue",  # ratio of cents sums (single double div)
    "c17_string_agg",  # sorted collect_set join
    "c18_histogram",  # integer bucket arithmetic
    "c19_cms_heavy_hitters",  # sketch counters summed across partitions
    "sql16_q8_market_share",  # CASE-conditional integer ratio
    "sql19_q17_small_qty_revenue",  # double threshold from exact ints
    "f20_repetition_stats",  # per-row double ratios (no shuffle at all)
    "f34_semantic_dedup",  # float cosine threshold drops (bitwise fold)
    "f36_quality_classifier",  # integer weights until one division
]


def test_semantic_dedup_fast_invariant_under_input_partitioning(spark):
    """The numpy path's Arrow batch boundaries move with the input
    partitioning; drop decisions must not (per-row normalization +
    per-cluster grouping are batch-independent)."""
    import numpy as np
    import pandas as pd

    from pdf2dataset_spark.operators import similarity as sim

    rng = np.random.default_rng(9)
    base = rng.standard_normal((2000, 16)).astype(np.float32)
    dup = rng.choice(2000, 100, replace=False)
    pdf = pd.DataFrame(
        {
            "vec_id": np.concatenate([np.arange(2000), dup + 100000]),
            "embedding": list(base) + list(base[dup] * 2),
        }
    )
    corpus = spark.createDataFrame(pdf)

    def run(parts):
        out = sim.semantic_dedup_fast(
            corpus.repartition(parts), n_centroids=32, threshold=0.9, nprobe=2
        )
        return sorted(map(tuple, out.collect()))

    assert run(2) == run(29)


@pytest.fixture(scope="module")
def registry():
    return load_all()


def _rows(spark, registry, name, partitions):
    from pdf2dataset_spark.queries import _PLAN_CACHE

    spark.conf.set("spark.sql.shuffle.partitions", str(partitions))
    # Drop the prepared-plan cache so each width re-plans from scratch
    # (AQE reads the conf at execution, but be explicit about it).
    _PLAN_CACHE.pop(spark, None)
    df = registry[name].fn(spark, SF)
    return sorted(map(tuple, df.collect()))


@pytest.mark.parametrize("name", SENSITIVE)
def test_result_invariant_under_shuffle_width(spark, registry, name):
    try:
        narrow = _rows(spark, registry, name, 2)
        wide = _rows(spark, registry, name, 37)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        from pdf2dataset_spark.queries import _PLAN_CACHE

        _PLAN_CACHE.pop(spark, None)
    assert narrow == wide
