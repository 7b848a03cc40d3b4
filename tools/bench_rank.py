"""Global-rank scale benchmark: the engine's range-partition +
broadcast-offset `rank.global_rank` vs the naive unpartitioned
`row_number() OVER (ORDER BY ...)` window — the single-partition trap
this engine systematically avoids (e5, f22, f29, f31 all route
through global_rank).

Both produce identical output; only the plan differs. The naive
window funnels EVERY row through one task, so its cost is
single-core-serial in corpus size while global_rank stays
cluster-parallel. Prints one JSON line with both timings and the
verified agreement.

Usage: python tools/bench_rank.py [n_rows]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from pdf2dataset_spark.operators import rank  # noqa: E402
from pdf2dataset_spark.session import get_spark  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    spark = get_spark("bench-rank", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    df = spark.range(n).select(
        F.col("id"),
        F.xxhash64("id").alias("sort_key"),  # uniform, unsorted
    )
    df.cache().count()

    t0 = time.time()
    fast = rank.global_rank(df, [F.col("sort_key"), F.col("id")])
    # checksum that pins the full rank assignment, not just a sample
    fast_sum = fast.agg(
        F.sum(F.col("global_rank") * (F.col("id") % 1000)).alias("s")
    ).collect()[0]["s"]
    t_fast = time.time() - t0

    t0 = time.time()
    w = Window.orderBy("sort_key", "id")  # no partition: the trap
    naive = df.withColumn("global_rank", F.row_number().over(w))
    naive_sum = naive.agg(
        F.sum(F.col("global_rank") * (F.col("id") % 1000)).alias("s")
    ).collect()[0]["s"]
    t_naive = time.time() - t0

    assert fast_sum == naive_sum, (fast_sum, naive_sum)
    print(
        json.dumps(
            {
                "n_rows": n,
                "global_rank_s": round(t_fast, 2),
                "single_partition_window_s": round(t_naive, 2),
                "speedup": round(t_naive / t_fast, 2),
                "identical_assignment": True,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
