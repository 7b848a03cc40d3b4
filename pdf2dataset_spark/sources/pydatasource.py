"""Custom Python DataSource (Spark 4 `pyspark.sql.datasource` API).

`docsynth` generates deterministic synthetic documents
partition-parallel — each InputPartition derives its rows purely from
(doc_id) hashes, so any executor produces identical bytes for a given
id (rerun- and speculation-safe). Useful as a benchmark/test corpus
source without materializing input files.

This demonstrates the modern custom-source surface: schema
declaration, options, partition planning on the driver, per-partition
generator reads on executors. A production source for a remote corpus
(object store manifest, crawl frontier) has exactly this shape — the
partition list is the unit of parallelism and retry.

Usage:
    spark.dataSource.register(DocSynthDataSource)
    df = (spark.read.format("docsynth")
          .option("numdocs", 100000).option("numpartitions", 32).load())
"""

from __future__ import annotations

import hashlib

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

_WORDS = (
    "the of and to in is was for on that with as his they at be this "
    "have from or one had by word but not what all were we when your"
).split()


class _Range(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


def _doc_text(doc_id: int, n_words: int = 40) -> str:
    out = []
    for i in range(n_words):
        h = hashlib.blake2b(
            f"{doc_id}:{i}".encode(), digest_size=8
        ).digest()
        out.append(_WORDS[int.from_bytes(h, "big") % len(_WORDS)])
    return " ".join(out)


class DocSynthReader(DataSourceReader):
    def __init__(self, options):
        self.n = int(options.get("numdocs", 1000))
        self.parts = int(options.get("numpartitions", 8))

    def partitions(self):
        step = -(-self.n // self.parts)
        return [
            _Range(lo, min(lo + step, self.n))
            for lo in range(0, self.n, step)
        ]

    def read(self, partition: _Range):
        for doc_id in range(partition.start, partition.end):
            yield (doc_id, _doc_text(doc_id))


class DocSynthDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "docsynth"

    def schema(self) -> str:
        return "doc_id bigint, text string"

    def reader(self, schema) -> DocSynthReader:
        return DocSynthReader(self.options)

    def streamReader(self, schema) -> "DocSynthStreamReader":
        return DocSynthStreamReader(self.options)


class DocSynthStreamReader(DataSourceStreamReader):
    """Streaming twin of the batch reader (Spark 4
    `DataSourceStreamReader`): offsets are plain doc-id watermarks
    ({"id": N}), each micro-batch covers [start, start+rate), and the
    batch range is split across `numpartitions` InputPartitions so
    the read itself is executor-parallel (the `SimpleDataSourceStream
    Reader` variant would funnel rows through the driver — wrong
    shape for a high-volume ingest). Rows derive purely from doc_id,
    so replaying a committed offset range after a crash regenerates
    byte-identical rows — exactly-once by determinism, no
    source-side state beyond the offset."""

    def __init__(self, options):
        self.rate = int(options.get("rowspermicrobatch", 100))
        self.parts = int(options.get("numpartitions", 4))
        self.maxrows = int(options.get("maxrows", 1 << 40))

    def initialOffset(self) -> dict:
        return {"id": 0}

    def latestOffset(self) -> dict:
        # driver-side monotonic advance, capped at maxrows
        cur = getattr(self, "_cur", 0)
        self._cur = min(cur + self.rate, self.maxrows)
        return {"id": self._cur}

    def partitions(self, start: dict, end: dict):
        lo, hi = int(start["id"]), int(end["id"])
        # _cur lives only in driver memory; after a checkpoint restart
        # it restarts at 0 while the engine replays the committed start
        # offset. Clamp to the engine-reported range so latestOffset
        # stays monotonic across restarts (without this, the stream
        # stalls emitting empty/backward ranges until _cur re-advances
        # past the checkpoint, and maxrows caps trigger COUNT rather
        # than resuming position).
        self._cur = max(getattr(self, "_cur", 0), lo, hi)
        if hi <= lo:
            return [_Range(lo, lo)]
        step = -(-(hi - lo) // self.parts)
        return [_Range(a, min(a + step, hi)) for a in range(lo, hi, step)]

    def commit(self, end: dict) -> None:
        # committed end is also a restart-resume floor (see partitions)
        self._cur = max(getattr(self, "_cur", 0), int(end["id"]))

    def read(self, partition: _Range):
        for doc_id in range(partition.start, partition.end):
            yield (doc_id, _doc_text(doc_id))

