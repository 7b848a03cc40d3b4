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
import re
import tempfile
import zipfile

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


#: applicationIds whose executors already received the package zip.
_SHIPPED_APPS: set[str] = set()


def ship_package(spark: SparkSession) -> str | None:
    """Make ``pdf2dataset_spark`` importable on executor Python workers.

    ``local[N]`` runs every task in the driver JVM, whose Python
    workers inherit the driver's ``sys.path`` — so imports "just work"
    and silently hide a real deployment gap: on ANY multi-JVM master
    (local-cluster, standalone, YARN, k8s) cloudpickled UDFs reference
    this package by module name and the executor worker must import it
    itself. This zips the installed package once per application and
    ships it via ``SparkContext.addPyFile`` (the ``--py-files``
    deployment pattern), which both distributes the file and prepends
    it to every worker's ``sys.path``. Returns the zip path, or None
    when the master is single-JVM local and shipping is unnecessary.
    """
    sc = spark.sparkContext
    if re.match(r"local(\[|$)", sc.master or ""):
        return None  # single JVM: workers see the driver's sys.path
    app = sc.applicationId
    if app in _SHIPPED_APPS:
        return None
    zpath = os.path.join(
        tempfile.gettempdir(), f"pdf2dataset_spark_{os.getpid()}.zip"
    )
    build_package_zip(zpath)
    sc.addPyFile(zpath)
    _SHIPPED_APPS.add(app)
    return zpath


def build_package_zip(zpath: str) -> str:
    """Zip every module of this package (import-layout paths) for
    ``addPyFile`` / ``spark-submit --py-files`` distribution."""
    pkg_root = os.path.dirname(os.path.abspath(__file__))
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(pkg_root):
            if "__pycache__" in root:
                continue
            for f in sorted(files):
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                rel = os.path.join(
                    "pdf2dataset_spark", os.path.relpath(full, pkg_root)
                )
                zf.write(full, rel)
    return zpath


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
    # Ship BEFORE apply_runtime_conf: both call ship_package, but this
    # one must RAISE on failure (an engine-built multi-JVM session
    # with unshipped code means every UDF dies with
    # ModuleNotFoundError later), while apply_runtime_conf's attempt
    # is swallowed because it also runs on foreign sessions it must
    # never break. _SHIPPED_APPS makes the second call a no-op.
    ship_package(spark)
    apply_runtime_conf(spark)
    return spark


#: Below this total input size, AQE's stage-by-stage materialization
#: barriers (~0.07-0.1 s per query stage locally) cost more than its
#: runtime re-planning can possibly save — there is nothing to
#: re-plan when every shuffle fits in one reducer. 1 GiB is ~2 orders
#: of magnitude under where skew/broadcast decisions start to matter.
SMALL_INPUT_BYTES = 1 << 30


def tune_for_input_size(spark: SparkSession, input_paths: list[str]) -> bool:
    """Statistics-driven execution-mode selection (the engine-side
    analog of a cost-based "don't optimize tiny queries" rule): sum
    the on-disk size of the inputs and disable AQE below
    ``SMALL_INPUT_BYTES``, re-enable it at or above.

    At 100 TB this always lands on AQE=on (skew splitting, runtime
    broadcast, partition coalescing are essential); on a laptop-scale
    input it removes a fixed ~0.5 s/query of adaptive stage barriers.
    Returns True when small-input mode was applied."""
    import os as _os

    total = 0
    for p in input_paths:
        if _os.path.isdir(p):
            for root, _dirs, files in _os.walk(p):
                total += sum(
                    _os.path.getsize(_os.path.join(root, f)) for f in files
                )
        elif _os.path.exists(p):
            total += _os.path.getsize(p)
    small = total < SMALL_INPUT_BYTES
    spark.conf.set("spark.sql.adaptive.enabled", "false" if small else "true")
    if small:
        # Size reducers to the DATA (the ~16 MB/partition floor), not
        # to core count: with AQE off nothing coalesces tiny shuffles,
        # and 32 near-empty reduce tasks are pure scheduling overhead
        # (measured −38% across the headline shuffles at sf0.1).
        parts = max(8, min(_default_parallelism(), total // (16 << 20)))
        spark.conf.set("spark.sql.shuffle.partitions", str(parts))
    # marker so apply_runtime_conf (re-run on every query build) does
    # not silently flip AQE back on or resize reducers under
    # small-input mode
    spark.conf.set("spark.pdf2dataset.smallInput", "true" if small else "false")
    return small


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
    try:
        if spark.conf.get("spark.pdf2dataset.smallInput", "false") == "true":
            # an explicit tune_for_input_size decision wins over the
            # default AQE=on + core-count reducers (see
            # SMALL_INPUT_BYTES rationale)
            conf.pop("spark.sql.adaptive.enabled", None)
            conf.pop("spark.sql.shuffle.partitions", None)
    except Exception:
        pass
    for k, v in conf.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass
    try:
        # a foreign session may run on a multi-JVM master too
        ship_package(spark)
    except Exception:
        pass
