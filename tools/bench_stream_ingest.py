"""Streaming near-dup ingest bench (streaming/neardup.py).

Synthesizes B micro-batches of documents with planted near-duplicates
(10% near-copies of docs from EARLIER batches + 5% within-batch
near-pairs), runs the incremental MinHash+LSH ingest, and reports
docs/s plus dedup accuracy (planted dups dropped, originals kept).

Usage: python tools/bench_stream_ingest.py [--docs 20000] [--batches 4]
"""

from __future__ import annotations

import argparse
import json
import os
import random
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=20000)
    ap.add_argument("--batches", type=int, default=4)
    ap.add_argument("--words", type=int, default=60)
    args = ap.parse_args()

    from pdf2dataset_spark.session import get_spark
    from pdf2dataset_spark.streaming.neardup import neardup_ingest

    spark = get_spark("bench-stream-ingest")
    spark.sparkContext.setLogLevel("ERROR")

    rng = random.Random(42)
    vocab = [f"tok{i}" for i in range(5000)]
    per_batch = args.docs // args.batches

    def fresh_doc() -> str:
        return " ".join(rng.choice(vocab) for _ in range(args.words))

    root = tempfile.mkdtemp(prefix="bench_ingest_")
    try:
        src = os.path.join(root, "src")
        out = os.path.join(root, "out")
        store = os.path.join(root, "buckets")
        ckpt = os.path.join(root, "ckpt")

        batches: list[list[tuple[int, str]]] = []
        originals: list[str] = []
        planted_ids: set[int] = set()
        original_ids: set[int] = set()
        doc_id = 0
        for b in range(args.batches):
            rows: list[tuple[int, str]] = []
            for _ in range(per_batch):
                r = rng.random()
                if b > 0 and r < 0.10 and originals:
                    # cross-batch near-dup: earlier original minus last word
                    base = rng.choice(originals)
                    rows.append((doc_id, base.rsplit(" ", 1)[0]))
                    planted_ids.add(doc_id)
                elif r < 0.15 and rows:
                    # within-batch near-dup of a doc from THIS batch
                    base = rng.choice(rows)[1]
                    rows.append((doc_id, base.rsplit(" ", 1)[0]))
                    planted_ids.add(doc_id)
                else:
                    d = fresh_doc()
                    originals.append(d)
                    original_ids.add(doc_id)
                    rows.append((doc_id, d))
                doc_id += 1
            batches.append(rows)
        n_planted = len(planted_ids)

        schema = "doc_id long, text string"
        spark.createDataFrame(batches[0], schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        stream = spark.readStream.schema(
            spark.read.parquet(src).schema
        ).parquet(src)
        t0 = time.perf_counter()
        q = neardup_ingest(stream, out, store, ckpt)
        try:
            q.processAllAvailable()
            for rows in batches[1:]:
                # ONE file per logical batch: parquet files appear
                # atomically (rename from _temporary), so the running
                # query can never observe a partial batch. With 4
                # concurrent files, a trigger could fire mid-append and
                # split a batch — a planted dup then arrives BEFORE its
                # original, survives, and knocks the original out via
                # the bucket store (observed as symmetric false_kept ==
                # false_dropped). Production ingest needs the same
                # discipline: atomic per-file appearance in the landing
                # dir (write to staging + move), never in-place
                # multi-file appends.
                spark.createDataFrame(rows, schema).coalesce(1).write.mode(
                    "append"
                ).parquet(src)
                q.processAllAvailable()
        finally:
            q.stop()
        elapsed = time.perf_counter() - t0

        kept_ids = {
            r[0] for r in spark.read.parquet(out).select("doc_id").collect()
        }
        kept = len(kept_ids)
        expected = args.docs - n_planted  # if dedup were oracle-perfect
        # Two-sided accuracy: false-kept (planted dups that survived)
        # AND false-dropped (unique originals wrongly deleted) — a
        # clamped kept-vs-expected count hides false drops.
        false_kept = len(planted_ids & kept_ids)
        false_dropped = len(original_ids - kept_ids)
        print(
            json.dumps(
                {
                    "metric": "stream_neardup_ingest",
                    "docs": args.docs,
                    "batches": args.batches,
                    "planted_dups": n_planted,
                    "kept": kept,
                    "expected_kept": expected,
                    "false_kept": false_kept,
                    "false_kept_frac": round(
                        false_kept / max(n_planted, 1), 4
                    ),
                    "false_dropped": false_dropped,
                    "false_dropped_frac": round(
                        false_dropped / max(len(original_ids), 1), 4
                    ),
                    "elapsed_s": round(elapsed, 2),
                    "docs_per_s": round(args.docs / elapsed, 1),
                }
            )
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
