"""Bloom runtime-filter benchmark: large-large join with a selective
build side, broadcast disabled (the honest cluster scenario — at
100 TB neither side broadcasts). Measures wall time and rows entering
the probe-side shuffle for the plain sort-merge join vs the
bloom-pruned one (operators/runtime_filter.py).

Usage: python tools/bench_bloom.py [n_probe] [n_build_keys]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from pdf2dataset_spark.operators import runtime_filter as rtf
from pdf2dataset_spark.session import get_spark


def main() -> None:
    n_probe = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    n_build = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000
    key_space = n_probe // 5  # ~1% of probe rows match at defaults

    spark = get_spark("bench-bloom", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    probe = spark.range(n_probe).select(
        (F.xxhash64("id") % key_space).alias("k"),
        F.col("id").alias("payload"),
    )
    build = spark.range(n_build).select(
        (F.xxhash64("id", F.lit(99)) % key_space).alias("bk")
    ).distinct()
    on = F.col("k") == F.col("bk")

    def timed(df):
        t0 = time.time()
        n = df.count()
        return n, time.time() - t0

    # warm both inputs once (file-less, but JIT + codegen warmup)
    probe.count(), build.count()

    n_plain, t_plain = timed(probe.join(build, on))
    num_bits, k = rtf.suggest_params(n_build, fpp=0.01)
    t0 = time.time()
    words = rtf.bloom_build(build, "bk", num_bits, k)
    t_build = time.time() - t0
    pruned = rtf.bloom_probe(probe, "k", words, k)
    n_pruned, t_prune = timed(pruned)
    n_bloom, t_bloom = timed(pruned.join(build, on))

    assert n_bloom == n_plain, (n_bloom, n_plain)
    print(
        f"probe={n_probe:,} build_keys={n_build:,} "
        f"bits={num_bits} k={k} ({num_bits // 8 / 1024:.0f} KiB)"
    )
    print(f"plain SMJ join:   {t_plain:6.2f}s  ({n_plain:,} result rows)")
    print(
        f"bloom build:      {t_build:6.2f}s; probe survivors "
        f"{n_pruned:,}/{n_probe:,} ({100 * n_pruned / n_probe:.2f}% enter the shuffle)"
    )
    print(f"bloom-pruned join:{t_bloom:6.2f}s  (identical result)")
    print(f"speedup: {t_plain / t_bloom:.2f}x, shuffle rows cut {n_probe / max(1, n_pruned):.0f}x")
    spark.stop()


if __name__ == "__main__":
    main()
