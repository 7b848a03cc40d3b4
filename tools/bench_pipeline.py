"""End-to-end training-data pipeline benchmark (the 100 TB use case).

Generates N synthetic documents (default 1M) with planted exact and
near duplicates, then runs the full curation pipeline the engine is
built for, each stage timed:

  1. quality filter   (Gopher-style length/shape gates)
  2. repetition gate  (duplicate-bigram fraction cut — loops/boilerplate)
  3. exact dedup      (sha256 keep-first, join strategy: wide text
                       column never shuffles)
  4. near-dup LSH     (MinHash 64 → 16×4 banding → candidate pairs →
                       drop the higher doc_id of verified pairs)
  5. chunking         (overlapping token windows → training samples)
  6. train/test split (deterministic md5-threshold)
  7. sink             (partitioned parquet write to /tmp)

Plus an out-of-chain ALTERNATIVE near-dup stage (hashed-BoW
embeddings → `semantic_dedup_fast`) timed separately so the 1..7
chain total stays comparable across rounds; its drop count shows
what embedding-space dedup catches on the same corpus (recall is
bounded by IVF cell-boundary splits — pairs straddling two cells
are invisible, the standard SemDeDup trade-off).

Prints one JSON line: per-stage seconds, end-to-end docs/s, and the
row counts at each stage (so throughput claims are auditable).

Usage: python tools/bench_pipeline.py [n_docs]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from pdf2dataset_spark.operators import dedup as dd  # noqa: E402
from pdf2dataset_spark.operators import text as tx  # noqa: E402
from pdf2dataset_spark.session import get_spark  # noqa: E402

OUT = "/tmp/pipeline_bench_out"


def synth_docs(spark, n: int):
    """n docs: 72% unique base texts, 8% exact dups of a base row,
    8% near dups (base text + one appended word), 12% junk that
    fails the quality gate."""
    words = (
        "the of and to in is was for on that with as his they at be this "
        "have from or one had by word but not what all were we when your "
        "can said there use an each which she do how their if will up "
        "other about out many then them these so some her would make like "
        "him into time has look two more write go see number no way could "
        "people my than first water been call who oil its now find long "
        "down day did get come made may part"
    ).split()
    arr = F.array(*[F.lit(w) for w in words])

    def sent(seed_col, k):
        return F.concat_ws(
            " ",
            *[
                F.element_at(
                    arr,
                    (
                        F.pmod(F.xxhash64(seed_col, F.lit(i)), F.lit(len(words)))
                        + 1
                    ).cast("int"),
                )
                for i in range(k)
            ],
        )

    n_base, n_exact, n_near = int(n * 0.72), int(n * 0.80), int(n * 0.88)
    df = spark.range(n).select(F.col("id").alias("doc_id"))
    d = F.col("doc_id")
    text = (
        F.when(d < n_base, sent(d, 40))
        .when(d < n_exact, sent(d - n_base, 40))  # exact dup of base row
        .when(
            d < n_near,
            F.concat(sent(d - n_exact, 40), F.lit(" extraword")),  # near dup
        )
        .otherwise(F.lit("tiny"))  # junk: fails min_tokens
    )
    return df.select("doc_id", text.alias("text"))


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    spark = get_spark("pdf2dataset-spark-pipeline-bench")
    spark.sparkContext.setLogLevel("ERROR")
    shutil.rmtree(OUT, ignore_errors=True)

    docs = synth_docs(spark, n)
    docs.write.mode("overwrite").parquet(OUT + "_src")
    docs = spark.read.parquet(OUT + "_src")

    stages: dict[str, float] = {}
    counts: dict[str, int] = {}
    t_all = time.perf_counter()

    t0 = time.perf_counter()
    clean = tx.quality_filter(docs, "text", min_tokens=10).persist()
    counts["after_quality"] = clean.count()
    stages["quality_filter_s"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    rep = tx.repetition_stats(clean, "text", "doc_id")
    keep = rep.filter(F.col("dup_bigram_frac") < 0.5).select("doc_id")
    clean = clean.join(keep, "doc_id", "left_semi").persist()
    counts["after_repetition_gate"] = clean.count()
    stages["repetition_gate_s"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    uniq = dd.exact_dedup(
        clean.select("doc_id", "text"), "text", "doc_id", strategy="join"
    ).persist()
    counts["after_exact_dedup"] = uniq.count()
    stages["exact_dedup_s"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    sigs = uniq.select(
        "doc_id",
        dd.minhash_signature(dd.shingles("text", n=3), num_hashes=64).alias(
            "minhash"
        ),
    )
    pairs = dd.lsh_candidate_pairs(sigs, "doc_id", "minhash", 16, 4)
    losers = pairs.select(F.col("id2").alias("doc_id")).distinct()
    neardeduped = uniq.join(losers, "doc_id", "left_anti").persist()
    counts["after_near_dedup"] = neardeduped.count()
    stages["minhash_lsh_dedup_s"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    chunks = tx.chunk_tokens(
        neardeduped, "text", "doc_id", window=32, overlap=8
    ).persist()
    counts["training_chunks"] = chunks.count()
    stages["chunking_s"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    split = neardeduped.withColumn(
        "split",
        F.when(
            F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10)
            .cast("long")
            < int(0.9 * 65536),
            "train",
        ).otherwise("test"),
    )
    split.write.mode("overwrite").partitionBy("split").parquet(OUT)
    stages["split_and_sink_s"] = round(time.perf_counter() - t0, 2)
    counts["train"] = spark.read.parquet(OUT).filter("split='train'").count()
    counts["test"] = spark.read.parquet(OUT).filter("split='test'").count()

    total = time.perf_counter() - t_all

    # ALTERNATIVE near-dup stage, measured OUTSIDE the chain total
    # so stage-1..7 docs/s stays comparable across rounds: hashed
    # bag-of-words embeddings (crc32 buckets — deterministic, text-
    # derived, so planted near-dups land at cosine ~0.99) →
    # semantic_dedup_fast. Reports what the embedding-space detector
    # catches on the SAME post-exact-dedup corpus the LSH stage sees.
    import zlib as _zlib

    from pdf2dataset_spark.operators import similarity as sim

    def _bow(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            vecs = []
            for text in pdf["text"]:
                v = np.zeros(64, dtype=np.float32)
                for w in str(text).split(" "):
                    v[_zlib.crc32(w.encode()) % 64] += 1.0
                vecs.append(v)
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "embedding": [v.tolist() for v in vecs]}
            )

    t0 = time.perf_counter()
    emb = uniq.select("doc_id", "text").mapInPandas(
        _bow, "doc_id long, embedding array<float>"
    )
    sem = sim.semantic_dedup_fast(
        emb,
        n_centroids=max(64, n // 2000),
        threshold=0.95,
        corpus_id="doc_id",
        nprobe=2,  # recovers pairs split across a cell boundary
    )
    counts["semantic_alt_dropped"] = sem.filter("NOT kept").count()
    stages["semantic_dedup_alt_s"] = round(time.perf_counter() - t0, 2)

    print(
        json.dumps(
            {
                "docs": n,
                "stages": stages,
                "counts": counts,
                "total_s": round(total, 2),
                "docs_per_s": round(n / total),
            }
        )
    )


if __name__ == "__main__":
    main()
