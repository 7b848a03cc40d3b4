"""Semantic-dedup scale bench: N synthetic 64-dim vectors with a
planted duplicate fraction, clustered by `ivf_assign_fast` and
deduped by `semantic_dedup_fast` (per-cluster numpy Gram matrices).

Reports wall time, vectors/s, and two-sided accuracy: every planted
scaled copy must be dropped (they have cosine exactly 1 with their
original and land in the same cluster), and no original may be
falsely dropped (random 64-dim cosines concentrate near 0, far
below the 0.85 threshold).

Usage: python tools/bench_semdedup.py [--n 1000000] [--dup-frac 0.01]
       [--centroids 1024]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--dup-frac", type=float, default=0.01)
    ap.add_argument("--centroids", type=int, default=1024)
    ap.add_argument("--dim", type=int, default=64)
    args = ap.parse_args()

    from pdf2dataset_spark.operators import similarity as sim
    from pdf2dataset_spark.session import get_spark

    spark = get_spark("bench-semdedup")
    spark.sparkContext.setLogLevel("ERROR")

    rng = np.random.default_rng(7)
    base = rng.standard_normal((args.n, args.dim)).astype(np.float32)
    n_dup = int(args.n * args.dup_frac)
    dup_src = rng.choice(args.n, size=n_dup, replace=False)
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "vec_id": np.concatenate(
                [np.arange(args.n), dup_src + 10 * args.n]
            ),
            "embedding": list(base) + list(base[dup_src] * 2.0),
        }
    )
    corpus = spark.createDataFrame(pdf)
    corpus = corpus.repartition(64).cache()
    corpus.count()  # materialize outside the timed region

    t0 = time.perf_counter()
    out = sim.semantic_dedup_fast(
        corpus, n_centroids=args.centroids, threshold=0.85
    )
    res = out.groupBy("kept").count().collect()
    elapsed = time.perf_counter() - t0
    counts = {r["kept"]: r["count"] for r in res}

    dropped_ids = {
        r["vec_id"]
        for r in out.filter("NOT kept").select("vec_id").collect()
    }
    planted = {int(i) + 10 * args.n for i in dup_src}
    false_dropped = len(dropped_ids - planted)
    missed = len(planted - dropped_ids)
    total = args.n + n_dup
    print(
        {
            "vectors": total,
            "planted_dups": n_dup,
            "centroids": args.centroids,
            "elapsed_s": round(elapsed, 2),
            "vectors_per_s": round(total / elapsed, 1),
            "dropped": counts.get(False, 0),
            "kept": counts.get(True, 0),
            "planted_missed": missed,
            "false_dropped": false_dropped,
        }
    )


if __name__ == "__main__":
    main()
