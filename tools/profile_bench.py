"""Phase-level profiling for the headline bench queries.

For each headline query at $SPARK_GRAFT_SF_DIR, separately times:
  build  — Python-side DataFrame construction (includes parquet
           footer/schema reads on first touch)
  plan   — analysis + optimization (df.explain to a sink)
  exec   — warm execution via noop write (best of N)

Prints one line per query so we can see whether the Spark-vs-DuckDB
gap is scheduling overhead, planning, or actual execution.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = int(os.environ.get("PROFILE_RUNS", "3"))
    from pdf2dataset_spark.queries import load_all
    from pdf2dataset_spark.session import get_spark

    spark = get_spark("pdf2dataset-spark-profile")
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_all()
    names = [n for n in HEADLINE if n in registry]
    registry[names[0]].fn(spark, sf_dir).limit(1).collect()

    print(f"{'query':28s} {'build':>7s} {'plan':>7s} {'exec':>7s}")
    total = 0.0
    for name in names:
        t0 = time.perf_counter()
        df = registry[name].fn(spark, sf_dir)
        t_build = time.perf_counter() - t0

        t0 = time.perf_counter()
        with contextlib.redirect_stdout(io.StringIO()):
            df.explain("formatted")
        t_plan = time.perf_counter() - t0

        best = float("inf")
        for _ in range(runs):
            df2 = registry[name].fn(spark, sf_dir)
            t0 = time.perf_counter()
            df2.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        total += best
        print(f"{name:28s} {t_build:7.3f} {t_plan:7.3f} {best:7.3f}")
    print(f"{'TOTAL exec':28s} {'':7s} {'':7s} {total:7.3f}")


if __name__ == "__main__":
    main()
