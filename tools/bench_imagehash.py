"""Image pHash pipeline benchmark: render → hash → Hamming-LSH pairs
throughput on synthetic page images (engine raster).

The decode+DCT is the per-image cost a real codec would also pay;
the hash/banding stages are the scale-relevant part (narrow Arrow
pass + one bucket shuffle). Prints one JSON line.

Usage: python tools/bench_imagehash.py [n_images]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from pdf2dataset_spark.operators import image_hash as ih  # noqa: E402
from pdf2dataset_spark.session import get_spark  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    dup_every = 100  # plant 1% exact dups
    spark = get_spark("bench-imagehash", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    # dup rows reuse their source row's text -> identical image; all
    # other pages get md5-derived pseudo-words so unrelated pages are
    # visually distinct (single-digit deltas would be LEGIT near-dups)
    src_id = (
        F.when(F.col("id") % dup_every == 1, F.col("id") - 1)
        .otherwise(F.col("id"))
        .cast("string")
    )
    base = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.substring(F.md5(src_id), 1, 16),
            F.lit("\n"),
            F.substring(F.md5(F.concat(src_id, F.lit("b"))), 1, 16),
        ).alias("page_text"),
    )

    t0 = time.time()
    hashed = ih.with_image_hash(
        ih.render_text_images(base), "image", out="phash"
    ).select("doc_id", "phash")
    hashed.cache().count()
    t_hash = time.time() - t0

    t0 = time.time()
    pairs = ih.phash_neardup_pairs(hashed, max_hamming=3, bands=4)
    n_pairs = pairs.count()
    t_pairs = time.time() - t0

    expected = (n - 2) // dup_every + 1  # ids 1, 101, 201, ...
    print(
        json.dumps(
            {
                "n_images": n,
                "render_hash_s": round(t_hash, 2),
                "images_per_s": round(n / t_hash),
                "lsh_pairs_s": round(t_pairs, 2),
                "pairs_found": n_pairs,
                "planted_dups": expected,
            }
        )
    )
    assert n_pairs >= expected, (n_pairs, expected)
    spark.stop()


if __name__ == "__main__":
    main()
