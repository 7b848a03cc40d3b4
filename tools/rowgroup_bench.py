"""Scan-parallelism evidence (VERDICT r1 #8).

Every sf0.1 testdata parquet is ONE row group, and parquet scans
split only at row-group boundaries — so every scan in BENCH is a
single task no matter what `spark.sql.files.maxPartitionBytes` says,
hiding the engine's parallel-scan behavior. The testdata directory
is read-only, so this tool re-encodes lineitem into N row groups
under a scratch dir and times the same aggregation both ways.

Usage: python tools/rowgroup_bench.py [n_rowgroups=8]
Prints one JSON line with single-rowgroup vs multi-rowgroup timings
and the observed scan-task counts.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    n_groups = int(sys.argv[1]) if len(sys.argv) > 1 else 8

    import pyarrow.parquet as pq

    from pyspark.sql import functions as F

    from pdf2dataset_spark.session import get_spark, tune_for_input_size

    src = os.path.join(SF_DIR, "lineitem.parquet")
    table = pq.read_table(src)
    scratch = tempfile.mkdtemp(prefix="rowgroup_bench_")
    multi = os.path.join(scratch, "lineitem_rg.parquet")
    pq.write_table(
        table, multi, row_group_size=max(1, table.num_rows // n_groups)
    )

    spark = get_spark("rowgroup-bench")
    spark.sparkContext.setLogLevel("ERROR")
    tune_for_input_size(spark, [SF_DIR])

    def timed(path: str) -> tuple[float, int]:
        df = spark.read.parquet(path)
        agg = df.groupBy("l_returnflag").agg(
            F.sum(F.col("l_quantity").cast("decimal(12,2)")).alias("s"),
            F.count(F.lit(1)).alias("n"),
        )
        agg.write.format("noop").mode("overwrite").save()  # warm
        tasks = df.rdd.getNumPartitions()
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            agg.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        return best, tasks

    t_single, p_single = timed(src)
    t_multi, p_multi = timed(multi)
    print(
        json.dumps(
            {
                "metric": "rowgroup_scan_parallelism",
                "single_rowgroup_sec": round(t_single, 3),
                "single_rowgroup_scan_tasks": p_single,
                "multi_rowgroup_sec": round(t_multi, 3),
                "multi_rowgroup_scan_tasks": p_multi,
                "n_rowgroups": n_groups,
                "unit": "sec",
            }
        )
    )


if __name__ == "__main__":
    main()
