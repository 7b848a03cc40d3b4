"""Measured skew-join demonstration (SCALING.md evidence).

Generates a pathologically skewed fact (one key = ~50% of rows)
joined to a non-broadcastable dim, and times three physical
strategies under identical plans otherwise:

  baseline  — AQE skew-join OFF, plain shuffle join (the naive
              cluster behavior: one straggler task owns the hot key)
  aqe       — AQE skew-join ON (runtime split of oversized
              partitions; the default engine posture)
  salted    — explicit deterministic salting via
              operators/skew.salted_join (the fallback for heat AQE
              can't split, e.g. a single hot key inside one map
              output block)

Also asserts all three produce the same row count, because a skew
strategy that changes the answer is not a strategy.

Usage: python tools/bench_skew.py [rows_millions]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from pdf2dataset_spark.operators.skew import salted_join  # noqa: E402
from pdf2dataset_spark.session import get_spark  # noqa: E402


def main() -> None:
    n_m = float(sys.argv[1]) if len(sys.argv) > 1 else 8.0
    n = int(n_m * 1_000_000)
    n_keys = 200_000
    spark = get_spark("pdf2dataset-spark-skewbench")
    spark.sparkContext.setLogLevel("ERROR")
    # Disable broadcast so the join actually shuffles (the scenario
    # where skew matters); dim is sized past any sane threshold too.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    # Scale the AQE thresholds to local data sizes so the hot
    # partition is as far past the skew threshold as a 100 TB hot key
    # would be past the 256 MB default — we are demonstrating the
    # mechanism, not the default constants.
    spark.conf.set("spark.sql.shuffle.partitions", "256")
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32MB"
    )
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16MB")

    # ~50% of fact rows hit key 0; the rest spread uniformly.
    fact = (
        spark.range(n)
        .withColumn(
            "k",
            F.when(F.col("id") % 2 == 0, F.lit(0)).otherwise(
                F.pmod(F.xxhash64("id"), F.lit(n_keys))
            ),
        )
        .withColumn("v", (F.col("id") % 1000).cast("double"))
    )
    dim = spark.range(n_keys).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("dim_v")
    )
    fact.write.mode("overwrite").parquet("/tmp/skew_fact")
    dim.write.mode("overwrite").parquet("/tmp/skew_dim")
    fact = spark.read.parquet("/tmp/skew_fact")
    dim = spark.read.parquet("/tmp/skew_dim")

    def timed(tag, df):
        t0 = time.perf_counter()
        rows = df.count()
        return rows, round(time.perf_counter() - t0, 2)

    results = {}

    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    agg = lambda j: j.groupBy("dim_v").agg(F.sum("v").alias("s"))  # noqa: E731
    rows_base, results["baseline_skewjoin_off_s"] = timed(
        "baseline", agg(fact.join(dim, "k"))
    )

    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
    rows_aqe, results["aqe_skewjoin_s"] = timed("aqe", agg(fact.join(dim, "k")))

    rows_salt, results["salted_join_s"] = timed(
        "salted", agg(salted_join(fact, dim, "k", salt=16, entropy_col=F.col("id")))
    )

    assert rows_base == rows_aqe == rows_salt, (rows_base, rows_aqe, rows_salt)
    results["rows"] = rows_base
    results["fact_rows"] = n
    print(json.dumps(results))


if __name__ == "__main__":
    main()
