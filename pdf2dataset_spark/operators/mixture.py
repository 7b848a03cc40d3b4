"""Data-mixture construction: deterministic per-source sampling and
up-sampling (the "data mix recipe" step of a training-data pipeline).

A trained-on corpus is rarely the raw corpus: high-quality sources
are repeated (weight > 1), low-quality ones down-sampled
(0 < weight < 1), some excluded (weight 0). At 100 TB the recipe must
be reproducible WITHOUT coordination — no RNG state, no global pass:
every decision is a pure function of the row's id, so re-running the
mix on a different cluster layout yields byte-identical output.

Mechanism: weight w splits into floor(w) guaranteed copies plus one
extra copy with probability frac(w), decided by comparing a
lexicographic md5 prefix against a precomputed hex threshold — the
same engine-invariant trick as the f17 train/test split. Copies are
materialized with explode(sequence(...)), so up-sampling is one
narrow projection; nothing shuffles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def frac_threshold_hex(frac: float) -> str:
    """8-hex-digit threshold t such that P[md5(x) < t] ≈ frac for a
    uniformly distributed md5 hex string. Exact for frac 0 and 1."""
    if not 0.0 <= frac <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {frac}")
    return format(min(0xFFFFFFFF, int(frac * 0x100000000)), "08x")


def _copies_col(
    weight: Column, id_col: Column, salt: str
) -> Column:
    """Deterministic copy count: floor(w) + Bernoulli(frac(w)) via
    hashed id — engine-invariant, coordination-free."""
    whole = F.floor(weight).cast("long")
    frac = weight - F.floor(weight)
    # threshold as a hex *string column* computed from the fraction:
    # lpad(hex(floor(frac * 2^32))) is exactly frac_threshold_hex in
    # both engines (hex digits lowercased for byte-order parity).
    thr = F.lower(
        F.lpad(
            F.conv(
                F.floor(frac * F.lit(float(0x100000000))).cast("string"),
                10,
                16,
            ),
            8,
            "0",
        )
    )
    h = F.md5(F.concat(F.lit(salt), id_col.cast("string")))
    return whole + F.when(h < thr, F.lit(1)).otherwise(F.lit(0)).cast("long")


def mix_sources(
    df: DataFrame,
    weights: dict[str, float],
    default: float = 1.0,
    source_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "mix",
) -> DataFrame:
    """Emit each row `copies` times according to its source's weight
    (0 drops, 0<w<1 samples, w>1 up-samples; fractional parts decided
    per-row by hashed id). Adds a ``copy_id`` column (1..copies) so
    repeated rows stay distinguishable downstream (e.g. for shuffle
    position assignment).

    Scale shape: a single narrow projection + explode — no shuffle,
    no RNG, no driver state; safe to re-run per partition."""
    w = F.lit(float(default))
    for src, wt in sorted(weights.items()):
        if wt < 0:
            raise ValueError(f"negative weight for {src!r}")
        w = F.when(F.col(source_col) == src, F.lit(float(wt))).otherwise(w)
    copies = _copies_col(w, F.col(id_col), salt)
    seq = F.when(
        copies >= 1, F.sequence(F.lit(1).cast("long"), copies)
    ).otherwise(F.array().cast("array<long>"))
    return (
        df.withColumn("__copies", copies)
        .withColumn("copy_id", F.explode(seq))
        .drop("__copies")
    )


def mixture_case_sql(
    weights: dict[str, float],
    default: float = 1.0,
    source_col: str = "source",
) -> str:
    """DuckDB CASE expression mirroring `mix_sources`' weight lookup —
    used by oracle twins."""
    arms = " ".join(
        f"WHEN '{src}' THEN CAST({float(wt)!r} AS DOUBLE)"
        for src, wt in sorted(weights.items())
    )
    return f"CASE {source_col} {arms} ELSE CAST({float(default)!r} AS DOUBLE) END"


def dsir_scores(
    df: DataFrame,
    target: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    bucket_hex: int = 2,
) -> DataFrame:
    """DSIR-style hashed n-gram importance scoring (Xie et al. 2023,
    "Data Selection for Language Models via Importance Resampling"):
    rank raw documents by how much their hashed-unigram profile
    resembles a TARGET subset (``target`` is a boolean Column over
    ``df``, e.g. ``F.col("lang") == "en"``).

    Feature buckets are the first ``bucket_hex`` hex chars of
    md5(token) — kept as STRINGS so Spark and a DuckDB oracle bucket
    bit-identically with no integer conversion (16^bucket_hex
    buckets). Classic DSIR weighs buckets by log(p_b/q_b); logs are
    not cross-engine bitwise, so this operator uses the EXACT-INTEGER
    distributional difference

        delta_b = tgt_b * R - raw_b * T
        score(d) = sum over d's tokens of delta_bucket(token)

    (tgt_b/raw_b = bucket counts in target/raw, T/R their totals) —
    the same sign structure (over-represented-in-target buckets score
    positive), verifiable bitwise against any ANSI engine. BIGINT
    bounds: |score| <= n_tokens(d) * tgt_b * R <= 2^63 holds through
    ~3e9 total tokens; switch the two products to DECIMAL(38,0) past
    that.

    Scale shape: the exploded token stream moves twice, both times
    behind map-side partial aggregation — once keyed by bucket
    (16^bucket_hex result rows), once keyed by doc id; the bucket
    weight table is broadcast (map-side join), totals ride a 1-row
    broadcast cross join. Corpus text itself never shuffles; no RNG,
    no driver state.
    """
    toks = df.select(
        F.col(id_col).alias("__id"),
        target.alias("__tgt"),
        F.explode(F.split(F.col(text_col), " ")).alias("__tok"),
    ).withColumn("__b", F.substring(F.md5("__tok"), 1, bucket_hex))
    stats = toks.groupBy("__b").agg(
        F.sum(F.when(F.col("__tgt"), 1).otherwise(0)).alias("__tgt_n"),
        F.count(F.lit(1)).alias("__raw_n"),
    )
    totals = stats.agg(
        F.sum("__tgt_n").alias("__t_total"),
        F.sum("__raw_n").alias("__r_total"),
    )
    weights = stats.crossJoin(F.broadcast(totals)).select(
        "__b",
        (
            F.col("__tgt_n") * F.col("__r_total")
            - F.col("__raw_n") * F.col("__t_total")
        ).alias("__delta"),
    )
    return (
        toks.join(F.broadcast(weights), "__b")
        .groupBy("__id")
        .agg(F.sum("__delta").alias("score"))
        .select(F.col("__id").alias(id_col), "score")
    )
