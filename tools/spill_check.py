"""Memory-pressure SPILL law (round-6 verdict item 3): the headline
shuffle/window/sort/join shapes must SPILL rather than OOM when the
working set exceeds executor memory.

Runs on ``local-cluster[2,1,1024]`` — two REAL executor JVMs with 1
GiB heap each — over ~10M rows whose shuffle working set provably
exceeds the executors' unified-memory budget, then asserts:

1. the jobs COMPLETE (no executor OOM), and
2. results satisfy self-evident conservation/permutation laws
   (identical to what an unconstrained run produces by construction:
   exact integer arithmetic, deterministic inputs), and
3. EVIDENCE of pressure: the working set is computed to exceed the
   executors' storage+execution budget (peak-memory bound), and the
   per-stage spill metrics read back from the Spark REST API are
   reported (memory/disk bytes spilled > 0 when Spark elects to
   spill; AQE may instead stream some aggregations — the bound plus
   completion is the law, spill bytes the evidence when present).

Check #4 (round-9): the FUSED EXTRACTION PIPELINE — executor-
synthesized multi-page PDFs fanned out to page grain through the
one-pass mapInPandas features operator with a PNG render per page —
completes on the same constrained shape with exact page-count
conservation and zero error rows; the Arrow batch cap
(session.py's maxRecordsPerBatch) bounds each Python worker's
in-flight slice of the wide binary rows.

Usage: python tools/spill_check.py [n_rows]
Topology via env (round-7 verdict item 7 — the law must hold on a
heterogeneous cluster shape, not just 2x1): SPILL_EXECUTORS (default
2), SPILL_CORES (1), SPILL_MEM_MB (1024). Default n_rows scales with
the topology so the per-executor working set exceeds the execution
budget by the same ~1.5x margin at any shape. Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.window import Window  # noqa: E402

from pdf2dataset_spark.session import get_spark  # noqa: E402

N_EXECUTORS = int(os.environ.get("SPILL_EXECUTORS", "2"))
N_CORES = int(os.environ.get("SPILL_CORES", "1"))
EXEC_MEM_MB = int(os.environ.get("SPILL_MEM_MB", "1024"))
MASTER = f"local-cluster[{N_EXECUTORS},{N_CORES},{EXEC_MEM_MB}]"


def _spill_bytes(spark) -> dict:
    """Per-application spill totals from the Spark REST API."""
    try:
        ui = spark.sparkContext.uiWebUrl
        app_id = spark.sparkContext.applicationId
        with urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app_id}/stages", timeout=10
        ) as r:
            stages = json.load(r)
        return {
            "memory_spilled": sum(s.get("memoryBytesSpilled", 0) for s in stages),
            "disk_spilled": sum(s.get("diskBytesSpilled", 0) for s in stages),
            "shuffle_write": sum(s.get("shuffleWriteBytes", 0) for s in stages),
            "n_stages": len(stages),
        }
    except Exception as e:  # UI disabled / port race: evidence degrades
        return {"error": str(e)}


#: bytes per synthetic row (id, g, val, 64B pad, overhead)
ROW_BYTES = 8 + 8 + 8 + 64 + 8


def default_rows() -> int:
    """Smallest round row count whose PER-EXECUTOR working set
    exceeds the execution budget by ~1.5x (2x1x1024 -> the historical
    10M; 3x2x2048 -> ~29M)."""
    budget_mb = int(EXEC_MEM_MB * 0.6 * 0.5)
    n = int(1.5 * N_EXECUTORS * budget_mb * (1 << 20) / ROW_BYTES)
    return max(10_000_000, (n // 1_000_000) * 1_000_000)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else default_rows()
    spark = get_spark(
        "spill-check",
        master=MASTER,
        shuffle_partitions=32,
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.port": "4055",
            # keep executor JVMs at exactly the constrained size
            "spark.executor.memory": f"{EXEC_MEM_MB}m",
            "spark.memory.fraction": "0.6",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    results: dict[str, dict] = {}

    def check(name, fn):
        t0 = time.time()
        try:
            info = fn() or {}
            results[name] = {"ok": True, "sec": round(time.time() - t0, 1),
                             **info}
        except Exception as e:
            results[name] = {"ok": False, "sec": round(time.time() - t0, 1),
                             "error": f"{type(e).__name__}: {e}"}

    # ~10M rows x ~120B (key, ts, val, 64B pad) ≈ 1.2 GB raw; a global
    # sort or a 1000-group running window must shuffle ~all of it
    # through 2 executors whose unified memory is 2 x 1024MB x 0.6 ≈
    # 1.2 GB MINUS storage/overhead — the working set exceeds any
    # single executor's execution budget by construction.
    base = (
        spark.range(n)
        .select(
            F.col("id"),
            (F.col("id") % 1000).alias("g"),
            F.pmod(F.xxhash64("id"), F.lit(1_000_003)).alias("val"),
            F.repeat(F.lit("x"), 64).alias("pad"),
        )
    )
    working_set_mb = n * ROW_BYTES // (1 << 20)
    # each executor sorts/aggregates ~half the rows inside its
    # EXECUTION share of unified memory (fraction 0.6, half of which
    # storage may claim): that per-task budget is what the working
    # set must exceed for the spill path to engage
    per_exec_ws_mb = working_set_mb // N_EXECUTORS
    budget_mb = int(EXEC_MEM_MB * 0.6 * 0.5)

    def sorted_law():
        # e5 shape: global sort under pressure; law = per-partition
        # sorted, partition ranges disjoint ascending, count conserved
        s = base.orderBy("val", "id").select("val", "id")

        def summarize(batches):
            import pandas as pd

            first = last = None
            cnt = 0
            prev = None
            monotonic = True
            for pdf in batches:
                for v, i in zip(pdf["val"], pdf["id"]):
                    cur = (int(v), int(i))
                    if prev is not None and cur < prev:
                        monotonic = False
                    prev = cur
                    if first is None:
                        first = cur
                    last = cur
                    cnt += 1
            yield pd.DataFrame(
                {
                    "fv": [first[0] if first else None],
                    "fi": [first[1] if first else None],
                    "lv": [last[0] if last else None],
                    "li": [last[1] if last else None],
                    "n": [cnt],
                    "mono": [monotonic],
                }
            )

        parts = s.mapInPandas(
            summarize,
            "fv long, fi long, lv long, li long, n long, mono boolean",
        ).collect()
        total = sum(r.n for r in parts)
        assert total == n, f"sort lost rows: {total}/{n}"
        assert all(r.mono for r in parts if r.n), "partition not sorted"
        ranges = sorted(
            ((r.fv, r.fi, r.lv, r.li) for r in parts if r.n),
        )
        for a, b in zip(ranges, ranges[1:]):
            assert (a[2], a[3]) <= (b[0], b[1]), "overlapping sort ranges"
        return {"rows": total, "partitions": len(parts)}

    def window_law():
        # e18 shape: per-group running sum; law = the last running
        # value per group equals the group total (exact integers)
        w = (
            Window.partitionBy("g")
            .orderBy("id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        run = base.withColumn("rs", F.sum("val").over(w))
        last = (
            run.groupBy("g")
            .agg(F.max_by("rs", "id").alias("final_rs"))
        )
        direct = base.groupBy("g").agg(F.sum("val").alias("tot"))
        mism = (
            last.join(direct, "g")
            .filter(F.col("final_rs") != F.col("tot"))
            .count()
        )
        assert mism == 0, f"{mism} groups: running-sum final != total"
        return {"groups": direct.count()}

    def join_agg_law():
        # d11 shape: broadcast dim join + aggregation; law = grand
        # total conserved through the join (every fact matches 1 dim)
        dim = spark.range(1000).select(
            F.col("id").alias("g"), (F.col("id") % 7).alias("region")
        )
        joined = base.join(F.broadcast(dim), "g")
        by_region = joined.groupBy("region").agg(F.sum("val").alias("s"))
        total_joined = by_region.agg(F.sum("s")).collect()[0][0]
        total_direct = base.agg(F.sum("val")).collect()[0][0]
        assert total_joined == total_direct, (total_joined, total_direct)
        return {"regions": by_region.count()}

    def extraction_law():
        # round-9 ask #7: the FUSED extraction pipeline — wide
        # binary rows through mapInPandas — on the constrained
        # cluster. Documents are SYNTHESIZED ON EXECUTORS (the
        # driver never holds the corpus), fan out to page grain
        # through the one-pass features operator, and each page
        # renders a PNG (wide binary output). The Arrow batch cap
        # (session.py maxRecordsPerBatch) is what keeps each Python
        # worker's in-flight batch bounded; the law is completion +
        # exact page-count conservation + zero error rows.
        from pdf2dataset_spark.operators.features import (
            extract_features,
        )
        from pdf2dataset_spark.sources.codecs import PdfCodec

        n_docs, pages_per_doc = 300, 8
        pad = "lorem ipsum dolor sit amet " * 300  # ~8KB/page

        def make_docs(batches):
            import pandas as pd

            from pdf2dataset_spark.sources.minipdf import build_pdf

            for pdf in batches:
                paths, blobs = [], []
                for i in pdf["id"]:
                    pages = [
                        f"doc {int(i)} page {p}\n{pad}"
                        for p in range(pages_per_doc)
                    ]
                    paths.append(f"doc{int(i):05d}.pdf")
                    blobs.append(build_pdf(pages))
                yield pd.DataFrame({"path": paths, "content": blobs})

        mf = (
            spark.range(n_docs)
            .repartition(8)
            .mapInPandas(make_docs, "path string, content binary")
        )
        out = extract_features(
            mf, ["text", "image"], codec=PdfCodec()
        )
        agg = out.agg(
            F.count(F.lit(1)).alias("rows"),
            F.count("error").alias("errors"),
            F.sum(F.length("image")).alias("png_bytes"),
            F.sum(F.length("text")).alias("text_bytes"),
        ).collect()[0]
        assert agg.rows == n_docs * pages_per_doc, agg
        assert agg.errors == 0, agg
        assert agg.png_bytes > 0 and agg.text_bytes > 0
        arrow_cap = spark.conf.get(
            "spark.sql.execution.arrow.maxRecordsPerBatch"
        )
        return {
            "pages": agg.rows,
            "png_mb": int(agg.png_bytes) >> 20,
            "text_mb": int(agg.text_bytes) >> 20,
            "arrow_batch_cap": arrow_cap,
        }

    check("sort_under_pressure", sorted_law)
    check("running_window_under_pressure", window_law)
    check("broadcast_join_agg_under_pressure", join_agg_law)
    check("extraction_pipeline_under_pressure", extraction_law)

    spill = _spill_bytes(spark)
    ok = all(v["ok"] for v in results.values())
    print(
        json.dumps(
            {
                "all_ok": ok,
                "master": MASTER,
                "rows": n,
                "working_set_mb": working_set_mb,
                "per_executor_working_set_mb": per_exec_ws_mb,
                "per_executor_execution_budget_mb": budget_mb,
                "exceeds_budget": per_exec_ws_mb > budget_mb,
                "spill_metrics": spill,
                "checks": results,
            }
        )
    )
    spark.stop()
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
