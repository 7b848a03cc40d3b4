"""SparkSession factory tuned for this engine (SURVEY.md §7 step 0).

Scale posture: these defaults are chosen so the same logical plans
survive a 1000-executor / 100 TB deployment — AQE handles runtime
partition coalescing and skew-join splitting, Arrow keeps the
Python boundary batched, and shuffle partitions default to the
local core count but should be raised (or left to AQE's initial
partition num) on a real cluster.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Runtime confs that are safe to (re)apply to an existing session.
RUNTIME_CONF = {
    # Deterministic timestamp behavior regardless of host timezone.
    "spark.sql.session.timeZone": "UTC",
    # Arrow for toPandas / pandas UDFs — the only sane Python boundary.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Keep Arrow batches bounded so wide binary rows (images) don't
    # blow executor memory (SURVEY §2 H8).
    "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
    # AQE: runtime partition coalescing, skew-join splitting,
    # broadcast conversion — all essential at 100 TB.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Coalesce post-shuffle partitions by target SIZE, not up to the
    # default parallelism — the Spark docs' recommended production
    # setting. At small scale this collapses tiny shuffles to a
    # handful of tasks (less scheduling); at 100 TB it yields
    # right-sized reducers instead of defaulting to cluster width.
    "spark.sql.adaptive.coalescePartitions.parallelismFirst": "false",
    "spark.sql.adaptive.coalescePartitions.minPartitionSize": "8MB",
}


def _default_parallelism() -> int:
    env = os.environ.get("SPARK_GRAFT_CPUS")
    if env:
        return max(int(env), 1)
    return os.cpu_count() or 8


def get_spark(
    app_name: str = "pdf2dataset-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults.

    On a real cluster pass ``master`` (or set it in spark-submit) and
    size ``shuffle_partitions`` to ~2-3× total executor cores; AQE
    coalesces downward at runtime so oversizing is cheap.
    """
    cores = _default_parallelism()
    builder = SparkSession.builder.appName(app_name)
    builder = builder.master(master or f"local[{cores}]")
    builder = builder.config(
        "spark.sql.shuffle.partitions", str(shuffle_partitions or cores)
    )
    builder = builder.config("spark.driver.maxResultSize", "4g")
    # local[N] runs driver AND all executor threads in ONE JVM whose
    # default heap is 1g — 32 concurrent tasks sharing 1g OOMs on any
    # real workload. Static conf: only effective at JVM launch (a
    # pre-existing session keeps its heap). On a real cluster this is
    # replaced by spark-submit --driver-memory/--executor-memory.
    builder = builder.config(
        "spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g")
    )
    for k, v in RUNTIME_CONF.items():
        builder = builder.config(k, v)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    apply_runtime_conf(spark)
    return spark


def apply_runtime_conf(spark: SparkSession) -> None:
    """Apply engine runtime confs to an externally-created session.

    The verification driver creates its own SparkSession; query
    callables run under it, so anything correctness-relevant
    (timezone, Arrow) must be settable post-hoc — and so must
    shuffle parallelism (a foreign session's default of 200
    partitions would add pure scheduling overhead at local scale).
    Static confs are skipped silently.
    """
    conf = dict(RUNTIME_CONF)
    conf["spark.sql.shuffle.partitions"] = str(_default_parallelism())
    for k, v in conf.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass
