"""As-of join (SURVEY.md §2 D9) — two strategies.

1. `asof_join_window` (default, used by query d9): union-style window
   pass — `last(right_ts, ignorenulls)` over (key, time). One shuffle
   on the key, pure JVM, arbitrary data volume. Backward-only.
2. `asof_join_pandas`: per-key `pd.merge_asof` via applyInPandas —
   supports tolerance and forward/nearest directions that the window
   form can't express. One shuffle + Python; each key group must fit
   in worker memory (fine for per-user/per-symbol groups; do NOT use
   with a single giant key).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join_window(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    value_cols: list[str] | None = None,
) -> DataFrame:
    """Backward as-of join: for each left row, latest right row with
    right.on < left.on within the same `by` key. Implemented as a
    union + window (no Python, one shuffle)."""
    value_cols = value_cols or [c for c in right.columns if c not in (on, by)]
    l_tag = left.withColumn("__is_left", F.lit(1))
    r_tag = right.select(
        F.col(by),
        F.col(on),
        *[F.col(c) for c in value_cols],
    ).withColumn("__is_left", F.lit(0))
    unioned = l_tag.unionByName(r_tag, allowMissingColumns=True)
    w = (
        Window.partitionBy(by)
        # At equal `on` values the LEFT row must sort FIRST (desc on
        # the tag) so an equal-timestamp right row stays OUT of its
        # preceding frame — that is what makes the join STRICT
        # (right.on < left.on), matching the docstring and the
        # merge_asof twin (allow_exact_matches=False). With the tag
        # ascending, equal-ts right rows landed in the frame and the
        # semantics silently became inclusive on ties — caught by the
        # 5M-row cross-check vs DuckDB ASOF JOIN in
        # tools/scale_check.py, invisible in tie-free test data.
        .orderBy(F.col(on), F.col("__is_left").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    filled = unioned.select(
        "*",
        *[
            F.last(
                F.when(F.col("__is_left") == 0, F.col(c)), ignorenulls=True
            )
            .over(w)
            .alias(f"asof_{c}")
            for c in [on] + value_cols
        ],
    )
    return (
        filled.filter(F.col("__is_left") == 1)
        .drop("__is_left", *value_cols)
    )


def asof_join_pandas(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    direction: str = "backward",
    tolerance: str | None = None,
) -> DataFrame:
    """pd.merge_asof per key group (H5 grouped-map pattern): supports
    direction ∈ {backward, forward, nearest} and a tolerance like
    '5 minutes'."""
    from pyspark.sql import types as T

    out_schema = T.StructType(
        left.schema.fields
        + [
            T.StructField(f"asof_{f.name}", f.dataType)
            for f in right.schema.fields
            if f.name not in (by,)
        ]
    )
    r_cols = [f.name for f in right.schema.fields if f.name != by]
    tol = pd.Timedelta(tolerance) if tolerance else None

    # cogroup keeps both sides separate — the natural fit here.
    def cogroup_merge(lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        lpdf = lpdf.sort_values(on)
        rpdf = rpdf.sort_values(on)[r_cols].rename(
            columns={c: f"asof_{c}" for c in r_cols}
        )
        if lpdf.empty:
            return pd.DataFrame(columns=[f.name for f in out_schema.fields])
        merged = pd.merge_asof(
            lpdf,
            rpdf,
            left_on=on,
            right_on=f"asof_{on}",
            direction=direction,
            tolerance=tol,
            allow_exact_matches=False,
        )
        return merged

    return (
        left.groupBy(by)
        .cogroup(right.groupBy(by))
        .applyInPandas(cogroup_merge, schema=out_schema)
    )
