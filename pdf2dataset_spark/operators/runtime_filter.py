"""Bloom-filter runtime join pruning (semi-join reduction).

Runtime filters are the standard large-large join optimization in
distributed engines (Trino dynamic filtering, Snowflake join
pruning, Spark's own ``spark.sql.optimizer.runtime.bloomFilter``
rule): build a compact bloom filter over the build side's join keys,
broadcast it, and filter the probe side BEFORE its shuffle so rows
that cannot match never move. Spark's built-in rule only fires on
shapes its heuristics recognise (and ``might_contain`` is not part
of the public function surface in 4.1.x); this module is the
explicit, user-directed variant for when the pipeline author knows
the build side is selective.

Scale design
------------
- **Build** (:func:`bloom_build`): the k bit positions per key are
  computed JVM-side — ``xxhash64(key, lit(slot))`` per slot, so each
  slot is an independent hash — exploded and ``bit_or``-folded into
  at most ``num_bits/64`` words. That is ONE aggregation whose
  output is bounded by the *filter* size, never the key count; at
  the default cap (2**27 bits) the driver materializes at most
  16 MiB of words, once, regardless of whether the build side has
  1e3 or 1e10 keys.
- **Probe** (:func:`bloom_probe`): the SAME JVM ``xxhash64``
  expressions produce the k positions on the probe side — hash
  parity between build and probe is guaranteed by construction, not
  by re-implementing xxhash in Python — and an Arrow-batched pandas
  UDF does the vectorized word/bit test against a closure-captured
  numpy array (shipped to executors via task broadcast). The probe
  is a pure narrow filter: no shuffle, no join, evaluated on top of
  the scan before the probe side's exchange.
- **Exactness**: bloom filters admit false positives only. Every
  true-matching row survives the probe, so the downstream exact join
  returns exactly the un-pruned join's result — the filter is a pure
  IO/shuffle reducer. ``tests/test_runtime_filter.py`` pins both the
  zero-false-negative property and end-to-end plan equality.
- **Sizing** (:func:`suggest_params`): standard bloom calculus,
  m = -n·ln(p)/ln(2)^2 and k = (m/n)·ln(2), rounded to a power-of-
  two bit count so the pmod stays cheap.

The build runs a Spark job at construction time — inherent to any
runtime filter (Spark's own rule plans it as an executed subquery);
callers that need a fully lazy plan should use a plain semi-join.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

#: Hard cap on filter size: 2**27 bits = 16 MiB of words — safely
#: broadcastable and far past the point of diminishing returns (a
#: larger build side should broadcast-semi-join instead).
MAX_BITS = 1 << 27


def suggest_params(n_keys: int, fpp: float = 0.01) -> tuple[int, int]:
    """(num_bits, k) for an expected key count and false-positive rate.

    num_bits rounds UP to a power of two (keeps ``pmod`` cheap and
    the false-positive rate at-or-below target), clamped to
    [2**10, MAX_BITS]; k is the textbook optimum for the pre-
    rounding bit count, clamped to [1, 8].
    """
    if n_keys <= 0:
        return 1 << 10, 1
    m = -n_keys * math.log(fpp) / (math.log(2) ** 2)
    num_bits = 1 << max(10, min(MAX_BITS.bit_length() - 1, math.ceil(math.log2(m))))
    k = max(1, min(8, round(m / n_keys * math.log(2))))
    return num_bits, k


def bloom_positions(key: Column | str, num_bits: int, k: int) -> list[Column]:
    """The k bit positions of ``key`` — pure JVM expressions, shared
    verbatim by build and probe so hash parity is structural."""
    c = F.col(key) if isinstance(key, str) else key
    return [
        F.pmod(F.xxhash64(c, F.lit(slot)), F.lit(num_bits)).cast("long")
        for slot in range(k)
    ]


def bloom_build(
    df: DataFrame, key: Column | str, num_bits: int = 1 << 20, k: int = 5
) -> np.ndarray:
    """Aggregate ``df``'s keys into a bloom bit array (uint64 words).

    One explode + one bit_or aggregation; the collected result is
    bounded by ``num_bits/64`` words independent of ``df``'s size.
    """
    if not 0 < num_bits <= MAX_BITS or num_bits % 64:
        raise ValueError(f"num_bits must be a multiple of 64 in (0, {MAX_BITS}]")
    pos = F.explode(F.array(*bloom_positions(key, num_bits, k))).alias("pos")
    words = (
        df.select(pos)
        .select(
            (F.col("pos") / 64).cast("int").alias("w"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pmod(pos, 64) AS INT))").alias(
                "bit"
            ),
        )
        .groupBy("w")
        .agg(F.bit_or("bit").alias("word"))
        .collect()
    )
    bits = np.zeros(num_bits // 64, dtype=np.int64)
    for r in words:
        bits[r["w"]] = r["word"]
    return bits.view(np.uint64)


def bloom_probe(
    df: DataFrame,
    key: Column | str,
    words: np.ndarray,
    k: int,
) -> DataFrame:
    """Filter ``df`` to rows whose key MIGHT be in the filter.

    Narrow (no shuffle): JVM-computed positions feed an Arrow-batched
    bit test. ``words`` must come from :func:`bloom_build` with the
    same (num_bits, k).
    """
    num_bits = int(words.shape[0]) * 64

    @pandas_udf("boolean")
    def might_contain(*pos_cols: pd.Series) -> pd.Series:
        out = None
        for p in pos_cols:
            a = p.to_numpy(dtype=np.int64).view(np.uint64)
            hit = (words[a >> np.uint64(6)] >> (a & np.uint64(63))) & np.uint64(1)
            out = hit if out is None else (out & hit)
        return pd.Series(out.astype(bool))

    return df.filter(might_contain(*bloom_positions(key, num_bits, k)))


#: Join types for which dropping non-matching PROBE (left) rows before
#: the join cannot change the result: non-matching left rows produce no
#: output row under these types. Pruning is UNSOUND for left/full outer
#: (null-extended left rows would vanish), left_anti (the pruned rows
#: are exactly the result), and cross (no join key at all).
_PRUNE_SOUND_HOW = {
    "inner",
    "semi",
    "leftsemi",
    "left_semi",
    "right",
    "rightouter",
    "right_outer",
}


def bloom_filtered_join(
    probe: DataFrame,
    build: DataFrame,
    on: Column,
    probe_key: Column | str,
    build_key: Column | str,
    how: str = "inner",
    fpp: float = 0.01,
    n_keys_hint: int | None = None,
) -> DataFrame:
    """``probe.join(build, on, how)`` with the probe side bloom-pruned
    before its shuffle. Exact: identical result to the plain join.

    Only join types where a non-matching probe row contributes nothing
    to the output are accepted (``inner``/``left_semi``/``right``
    spellings); for ``left``/``full``/``left_anti``/``cross`` the
    pruning would silently drop rows the join must keep, so those
    raise ``ValueError`` — use a plain join there.

    ``n_keys_hint`` sizes the filter without an extra counting job;
    when omitted, one count() of the build side runs first (cheap —
    count aggregates scan-local).
    """
    if how.lower().replace(" ", "") not in _PRUNE_SOUND_HOW:
        raise ValueError(
            f"bloom_filtered_join: how={how!r} is unsound with a bloom-"
            "pruned probe side (non-matching probe rows must appear in "
            "the result); use inner/left_semi/right or a plain join"
        )
    n = n_keys_hint if n_keys_hint is not None else build.count()
    num_bits, k = suggest_params(n, fpp)
    words = bloom_build(build, build_key, num_bits, k)
    return bloom_probe(probe, probe_key, words, k).join(build, on, how)
