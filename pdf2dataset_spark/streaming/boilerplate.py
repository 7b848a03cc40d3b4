"""Streaming boilerplate suppression (tier G × tier F composition).

The batch operator (operators/dedup.remove_boilerplate) needs the
whole corpus to count how many documents share a paragraph; an
INGEST pipeline sees documents incrementally. This twin runs the
same paragraph-hash cut via foreachBatch (G8) and a persistent
**count store** — a parquet table of per-epoch (key, n_docs) rows
whose per-key SUM is the cumulative distinct-document count:

per micro-batch
  1. explode documents to (id, idx, para) rows, key each paragraph
     with the SHARED normalization (dedup.boilerplate_key:
     whitespace-collapse + lowercase + digit-strip + xxhash64 — the
     batch operator's exact key, so batch-built stores carry over),
  2. cumulative counts: the store is probed ONLY for the batch's
     keys (broadcast semi-join — the store, which grows with the
     corpus, is never shuffled whole) and summed; batch-local
     distinct-doc counts add on top,
  3. a paragraph whose cumulative count reaches ``min_docs`` is
     boilerplate: dropped from THIS batch's documents (earlier
     copies already written stay — retroactive cleanup is a batch
     `remove_boilerplate` pass over the sink, same key either way),
  4. cleaned documents append to the output sink, THEN the batch's
     per-key counts append to the store (survivors-first: a crash
     between the writes undercounts — late suppression, recoverable
     — never counts documents that were not persisted).

Scale posture: store rows are (long, long) pairs per distinct
paragraph per epoch; reads aggregate per key AFTER a broadcast
semi-join on the micro-batch's keys, so probe cost scales with the
batch, not the corpus. Per-epoch appends accumulate — compact by
rewriting the store as ``groupBy(key).sum`` whenever epoch-file
count grows (the same maintenance seam every log-structured store
has). Keep-first-arrival semantics: a paragraph's first ``min_docs``
appearances survive; everything after is suppressed — the only
semantics a stream can offer without rewriting its own history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from pdf2dataset_spark.operators import dedup as dd
from pdf2dataset_spark.streaming.neardup import _store_exists


def _batch_processor(
    out_path: str,
    count_store: str,
    id_col: str,
    text_col: str,
    sep: str,
    min_docs: int,
):
    def process(batch: DataFrame, epoch_id: int) -> None:
        spark = batch.sparkSession
        seg = batch.select(
            F.col(id_col).alias("__id"),
            F.posexplode(F.split(F.col(text_col), sep)).alias(
                "__idx", "__para"
            ),
        ).withColumn("__key", dd.boilerplate_key(F.col("__para")))
        seg = seg.localCheckpoint(eager=True)

        batch_counts = seg.groupBy("__key").agg(
            F.countDistinct("__id").alias("__n")
        )
        cumulative = batch_counts
        if _store_exists(spark, count_store):
            # probe the store ONLY for this batch's keys: broadcast
            # the (small) batch key set, stream the store through a
            # broadcast semi-join, THEN aggregate — the store never
            # shuffles whole
            prior = (
                spark.read.parquet(count_store)
                .join(
                    F.broadcast(batch_counts.select("__key")),
                    "__key",
                    "left_semi",
                )
                .groupBy("__key")
                .agg(F.sum("__n").alias("__n"))
            )
            cumulative = (
                batch_counts.unionByName(prior)
                .groupBy("__key")
                .agg(F.sum("__n").alias("__n"))
            )
        boiler = cumulative.filter(
            F.col("__n") >= min_docs
        ).select("__key")

        kept = seg.join(F.broadcast(boiler), "__key", "left_anti")
        rebuilt = kept.groupBy("__id").agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("__idx", "__para"))
                    ),
                    lambda s: s["__para"],
                ),
                sep,
            ).alias(text_col)
        )
        # all-boilerplate documents stay, as empty strings (stable
        # row counts for downstream joins — the batch operator's
        # keep_empty contract)
        rebuilt = (
            batch.select(F.col(id_col).alias("__id"))
            .distinct()
            .join(rebuilt, "__id", "left")
            .withColumn(
                text_col, F.coalesce(F.col(text_col), F.lit(""))
            )
            .select(F.col("__id").alias(id_col), text_col)
        )
        rebuilt.write.mode("append").parquet(out_path)
        batch_counts.write.mode("append").parquet(count_store)

    return process


def boilerplate_ingest(
    stream: DataFrame,
    out_path: str,
    count_store: str,
    checkpoint: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n",
    min_docs: int = 100,
) -> StreamingQuery:
    """Start incremental boilerplate suppression on a streaming
    DataFrame of documents; returns the StreamingQuery. Cleaned
    documents land in ``out_path``; per-epoch paragraph counts
    accumulate in ``count_store`` and suppress paragraphs from the
    moment their cumulative distinct-document count reaches
    ``min_docs``."""
    return (
        stream.writeStream.foreachBatch(
            _batch_processor(
                out_path, count_store, id_col, text_col, sep, min_docs
            )
        )
        .option("checkpointLocation", checkpoint)
        .start()
    )
