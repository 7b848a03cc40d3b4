"""Skew mitigation: salted joins + bucketing guidance (SURVEY §2 D12).

AQE's skew-join splitting (on in session.py) handles most skew at
runtime by splitting oversized partitions. `salted_join` is the
explicit fallback for the pathological case AQE can't fix: a single
join key so hot that even one map-split of it overwhelms a task
(classic 100 TB crawl-data shape: one domain = 30% of rows).

Mechanics: the skewed (large) side gets a deterministic salt derived
from a high-entropy sibling column, spreading each hot key over
`salt` subpartitions; the build side is exploded `salt`-fold so every
subpartition finds its match. Join output is IDENTICAL to the
unsalted join (oracle-checkable — see d12 query), cost is
build-side × salt, which is why the build side should be the smaller
table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: str,
    salt: int = 8,
    entropy_col: Column | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the hot-key pressure spread over `salt` buckets.

    `entropy_col`: any column of the large side with per-row entropy
    (a line number, an id); defaults to a whole-row hash via
    monotonically varying xxhash64 over all large-side columns.
    """
    if entropy_col is None:
        entropy_col = F.xxhash64(*[F.col(c) for c in large.columns])
    l_salted = large.withColumn("__salt", F.pmod(entropy_col, F.lit(salt)).cast("int"))
    s_exploded = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    out = l_salted.join(s_exploded, [on, "__salt"], how)
    return out.drop("__salt")
