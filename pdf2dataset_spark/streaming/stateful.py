"""Stateful streaming operators on the Spark 4 transformWithState API.

`applyInPandasWithState` (see tests/test_streaming.py, G6) is the
legacy keyed-state surface; `transformWithStateInPandas` adds typed
state handles (Value/List/Map), per-key timers, and — crucial at
scale — NATIVE STATE TTL: the state store evicts expired entries
itself, so unbounded-key streams (dedup over an infinite event
stream) hold only the recent working set instead of growing forever.

Runtime note: transformWithState's Python state server speaks
protobuf; on deployments without `google.protobuf` (this container)
`ttl_dedup` fails at query start and `ttl_dedup_legacy` — same
semantics on the applyInPandasWithState timeout API — is the tested
path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

try:  # transformWithState runtime dependency, absent in some images
    from google.protobuf import descriptor as _pb_descriptor  # noqa: F401

    HAS_PROTOBUF = True
except ImportError:
    HAS_PROTOBUF = False


class _TtlDedupProcessor(StatefulProcessor):
    """Emit only the first row seen per key; remember keys for
    `ttl_ms` (None = forever). One boolean ValueState per key — the
    store's TTL handles eviction, no manual timer bookkeeping."""

    def __init__(self, ttl_ms: int | None):
        self._ttl_ms = ttl_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._seen = handle.getValueState(
            "seen", "seen boolean", ttlDurationMs=self._ttl_ms
        )

    def handleInputRows(self, key, rows, timerValues):
        first = not self._seen.exists()
        if first:
            self._seen.update((True,))
        for pdf in rows:
            if first and len(pdf):
                yield pdf.iloc[[0]]
                first = False

    def close(self) -> None:
        pass


def ttl_dedup(
    stream: DataFrame,
    key_cols: list[str],
    output_schema: str,
    ttl_ms: int | None = None,
    time_mode: str = "ProcessingTime",
) -> DataFrame:
    """Streaming keep-first dedup with TTL-bounded state.

    Unlike `dropDuplicates` on a stream (state grows with distinct
    keys forever) or `dropDuplicatesWithinWatermark` (needs an
    event-time column), this holds one boolean per key that the state
    store itself expires after `ttl_ms` — the only formulation whose
    state is O(working set) on an unbounded key domain. Emits each
    key's first row within any TTL window.

    `output_schema` must cover the emitted columns (the grouping keys
    plus whatever payload the stream carries).
    """
    return stream.groupBy(*key_cols).transformWithStateInPandas(
        _TtlDedupProcessor(ttl_ms),
        outputStructType=output_schema,
        outputMode="Append",
        timeMode=time_mode,
    )


def ttl_dedup_legacy(
    stream: DataFrame,
    key_cols: list[str],
    output_schema: str,
    ttl_ms: int = 3_600_000,
) -> DataFrame:
    """TTL-bounded streaming keep-first dedup on the legacy
    applyInPandasWithState API: per-key boolean state with a
    processing-time timeout; on timeout the state is removed, so the
    key becomes emittable again and total state stays O(keys seen
    within one TTL window). Works on any Spark 3.4+ deployment (no
    protobuf dependency)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    def dedup_fn(key, pdf_iter, state):
        if state.hasTimedOut:
            state.remove()
            return
        first = not state.exists
        if first:
            state.update((True,))
        state.setTimeoutDuration(ttl_ms)
        if first:
            for pdf in pdf_iter:
                if len(pdf):
                    yield pdf.iloc[[0]]
                    return

    return stream.groupBy(*key_cols).applyInPandasWithState(
        dedup_fn,
        outputStructType=output_schema,
        stateStructType="seen boolean",
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
