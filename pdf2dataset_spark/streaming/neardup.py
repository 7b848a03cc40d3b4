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
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from pdf2dataset_spark.operators import dedup as dd


def _batch_processor(
    out_path: str,
    bucket_store: str,
    id_col: str,
    text_col: str,
    bands: int,
    rows_per_band: int,
    shingle_n: int,
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

        # within-batch: greedy keep-smallest over LSH candidates
        pairs = dd.lsh_candidate_pairs(
            sigs, id_col, "minhash", bands, rows_per_band
        )
        losers = pairs.select(F.col("id2").alias(id_col)).distinct()
        survivors = batch.join(losers, id_col, "left_anti")

        # cross-batch: any shared bucket with the retained corpus.
        # Join direction matters at scale: the bucket store is the
        # big side (grows with the retained corpus), the micro-batch
        # is small — so the BATCH's band rows broadcast and the store
        # streams through a broadcast hash join without ever
        # shuffling. (A left_semi with the batch on the left would
        # force the store through a shuffle instead.)
        try:
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
        except Exception:  # first epoch: store does not exist yet
            pass

        survivors = survivors.localCheckpoint(eager=True)
        (
            band_rows.join(survivors.select(id_col), id_col, "left_semi")
            .write.mode("append")
            .parquet(bucket_store)
        )
        survivors.write.mode("append").parquet(out_path)

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
) -> StreamingQuery:
    """Start the incremental near-dup ingest on a streaming DataFrame
    of documents; returns the StreamingQuery. Retained documents land
    in ``out_path``; their LSH band buckets accumulate in
    ``bucket_store`` and suppress future near-dups."""
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
            )
        )
        .option("checkpointLocation", checkpoint)
        .start()
    )
