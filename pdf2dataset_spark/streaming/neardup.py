"""Streaming near-duplicate ingest (tier G × tier F composition).

The 100 TB ingest problem: documents arrive continuously and the
corpus must stay near-dup-free WITHOUT re-scanning itself per batch.
This operator runs MinHash+LSH dedup incrementally via foreachBatch
(G8) and a persistent **bucket store** — a parquet table of every
retained document's (band_id, band_hash) rows:

per micro-batch
  1. minhash signatures + banding (JVM HOFs, same primitives as the
     batch path — operators/dedup.py),
  2. within-batch dedup: LSH candidate pairs, greedy keep-smallest
     (every `id2` of a pair drops — the standard greedy MinHash
     dedup; transitive chains collapse to their minimum),
  3. cross-batch dedup: LEFT SEMI against the bucket store — any doc
     sharing ANY band bucket with a previously retained doc drops,
  4. survivors append to the output sink AND their band rows append
     to the bucket store.

Scale posture: the bucket store is narrow (id + two longs per band,
16 rows/doc at the defaults) and is probed with an equi-join on the
high-entropy (band_id, band_hash) key; the batch side is a
micro-batch (small). State grows with the RETAINED corpus — the
theoretical floor for exact-over-history near-dup — and can be aged
by partitioning the store on ingest date and dropping old partitions
(recall-vs-state tradeoff, the same knob every production dedup
runs). Exactly-once: foreachBatch epochs re-run idempotently only if
the sink/store appends are made transactional (e.g. write to
epoch-keyed subdirs); this local implementation documents the seam
rather than hiding it.

INGESTION ATOMICITY: the landing directory must gain files
atomically (write to staging + move — one parquet file appears
atomically; multi-file in-place appends do not). If a trigger fires
mid-append, a logical batch splits across micro-batches and a
near-dup can arrive BEFORE its original — it is then kept,
registered in the bucket store, and knocks the original out
(keep-first-arrival is the only semantics a stream can offer).
tools/bench_stream_ingest.py demonstrates both: atomic feed → exact
planted-dup recovery (0 false kept / 0 false dropped); racy 4-file
appends → symmetric false_kept == false_dropped pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from pdf2dataset_spark.operators import cluster as cl
from pdf2dataset_spark.operators import dedup as dd


def _store_exists(spark, path: str) -> bool:
    """Explicit Hadoop-FS existence probe for the bucket store. The
    first epoch legitimately finds no store; any OTHER read failure
    (corrupt footer from a crashed append, permission error, schema
    drift) must fail the epoch so the streaming query surfaces it —
    swallowing it would silently disable cross-batch dedup."""
    jvm = spark._jvm  # noqa: SLF001 - no public FS API in pyspark
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())  # noqa: SLF001
    return bool(fs.exists(hpath))


def _batch_processor(
    out_path: str,
    bucket_store: str,
    id_col: str,
    text_col: str,
    bands: int,
    rows_per_band: int,
    shingle_n: int,
    threshold: float,
):
    def process(batch: DataFrame, epoch_id: int) -> None:
        spark = batch.sparkSession
        sigs = batch.select(id_col, text_col).withColumn(
            "minhash",
            dd.minhash_signature(
                dd.shingles(text_col, shingle_n), bands * rows_per_band
            ),
        )
        band_rows = dd.lsh_band_rows(
            sigs, id_col, "minhash", bands, rows_per_band
        ).withColumnRenamed("id", id_col)

        # within-batch: LSH candidates are VERIFIED with exact Jaccard
        # before anything drops (an LSH false positive must not delete
        # a unique document), then connected components keep the
        # smallest id per verified near-dup cluster — so a chain A~B,
        # B~C keeps exactly A instead of greedily dropping both B and
        # C. Mirrors the batch path (f2a candidates -> f2b verify).
        candidates = dd.lsh_candidate_pairs(
            sigs, id_col, "minhash", bands, rows_per_band
        )
        shingled = batch.select(
            id_col, dd.shingles(text_col, shingle_n).alias("__sh")
        )
        verified = dd.jaccard_pairs(
            shingled,
            id_col,
            "__sh",
            threshold=threshold,
            candidates=candidates,
        )
        survivors = cl.dedup_by_components(batch, verified, id_col=id_col)

        # cross-batch: any shared bucket with the retained corpus.
        # Join direction matters at scale: the bucket store is the
        # big side (grows with the retained corpus), the micro-batch
        # is small — so the BATCH's band rows broadcast and the store
        # streams through a broadcast hash join without ever
        # shuffling. (A left_semi with the batch on the left would
        # force the store through a shuffle instead.)
        if _store_exists(spark, bucket_store):
            seen = spark.read.parquet(bucket_store).select(
                "band_id", "band_hash"
            )
            dup_ids = (
                seen.join(
                    F.broadcast(
                        band_rows.select(id_col, "band_id", "band_hash")
                    ),
                    ["band_id", "band_hash"],
                )
                .select(id_col)
                .distinct()
            )
            survivors = survivors.join(dup_ids, id_col, "left_anti")

        survivors = survivors.localCheckpoint(eager=True)
        # Write ORDER is the crash-safety contract: survivors reach the
        # output sink BEFORE their band rows reach the bucket store. A
        # crash between the writes then leaves docs persisted but
        # unregistered — the next epoch may re-admit a near-dup of
        # them (recoverable duplication, cleaned by a batch dedup
        # pass). The reverse order would register docs that were never
        # persisted, permanently suppressing their future copies —
        # silent data loss. True exactly-once needs epoch-keyed
        # transactional appends (see module docstring).
        survivors.write.mode("append").parquet(out_path)
        (
            band_rows.join(survivors.select(id_col), id_col, "left_semi")
            .write.mode("append")
            .parquet(bucket_store)
        )

    return process


def neardup_ingest(
    stream: DataFrame,
    out_path: str,
    bucket_store: str,
    checkpoint: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    bands: int = 16,
    rows_per_band: int = 4,
    shingle_n: int = 3,
    threshold: float = 0.8,
) -> StreamingQuery:
    """Start the incremental near-dup ingest on a streaming DataFrame
    of documents; returns the StreamingQuery. Retained documents land
    in ``out_path``; their LSH band buckets accumulate in
    ``bucket_store`` and suppress future near-dups. Within-batch LSH
    candidates are verified at exact-Jaccard ``threshold`` before any
    document is dropped."""
    return (
        stream.writeStream.foreachBatch(
            _batch_processor(
                out_path,
                bucket_store,
                id_col,
                text_col,
                bands,
                rows_per_band,
                shingle_n,
                threshold,
            )
        )
        .option("checkpointLocation", checkpoint)
        .start()
    )
