"""Benchmark runner (driver contract: one JSON line on stdout).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...},
 "extract": {...pages/s...}, "sf": ...}. ``value`` totals the
relational headliners only; the real-PDF extraction timing
(round-10) rides ``queries``/``extract`` so the per-query gate
covers it without shifting the cross-round total.

Each query is executed once as a warm-up-free timed run with a
count()-style action that forces full evaluation without
driver-side materialization of payload rows.

Self-adjudication under host noise: this container shares a host, so
wall time alone cannot distinguish a plan regression from external
load. The JSON line therefore also carries a ``load`` block —
/proc/loadavg at start/end, every per-iteration wall time, and the
container-scoped CPU seconds (cgroup v2 cpu.stat) consumed by the
best iteration of each query. A real regression shows more CPU; a
noisy host shows the same CPU with stretched wall and a high loadavg.
tools/bench_compare.py reads the block and annotates (never gates)
when the two runs executed under materially different load.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _loadavg() -> list[float] | None:
    try:
        with open("/proc/loadavg") as f:
            return [float(x) for x in f.read().split()[:3]]
    except OSError:
        return None


def _proc_stat() -> tuple[int, int] | None:
    """(steal, total) jiffies from the aggregate /proc/stat cpu line.
    Hypervisor steal is invisible to loadavg: a co-tenant can halve
    the host's effective speed while the load average stays near
    zero. Deltas across the run let the bench JSON say so."""
    try:
        with open("/proc/stat") as f:
            parts = f.readline().split()
    except OSError:
        return None
    if parts[:1] != ["cpu"] or len(parts) < 9:
        return None
    vals = [int(x) for x in parts[1:]]
    return vals[7], sum(vals)


def _cpu_seconds() -> float | None:
    """Cumulative CPU seconds of THIS container (driver + JVM + python
    workers): cgroup v2 cpu.stat when present, else process-tree rusage
    is unavailable mid-run, so fall back to system-wide /proc/stat
    busy jiffies (coarser: includes neighbours)."""
    try:
        with open("/sys/fs/cgroup/cpu.stat") as f:
            for line in f:
                if line.startswith("usage_usec"):
                    return int(line.split()[1]) / 1e6
    except OSError:
        pass
    try:
        with open("/proc/stat") as f:
            parts = f.readline().split()[1:]
        jiffies = sum(int(x) for x in parts) - int(parts[3])  # minus idle
        return jiffies / os.sysconf("SC_CLK_TCK")
    except (OSError, ValueError, IndexError):
        return None

def _reference_load(repo_root: str) -> tuple[int, float] | None:
    """loadavg_start[0] of the most recent prior round's bench (the
    driver wraps our stdout JSON into BENCH_r{N}.json's ``tail``) —
    the comparison point for the quiet-window rule."""
    import glob
    import re

    best: tuple[int, float] | None = None
    for path in glob.glob(os.path.join(repo_root, "BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as f:
                wrapper = json.load(f)
        except (OSError, ValueError):
            continue
        tail = wrapper.get("tail", "") if isinstance(wrapper, dict) else ""
        start = tail.rfind('{"metric"')
        if start < 0:
            continue
        try:
            inner = json.loads(tail[start:].strip())
        except ValueError:
            # the JSON line may be followed by trailing log noise
            try:
                inner = json.loads(tail[start:].splitlines()[0])
            except ValueError:
                continue
        la = (inner.get("load") or {}).get("loadavg_start")
        if isinstance(la, list) and la:
            if best is None or rnd > best[0]:
                best = (rnd, float(la[0]))
    return best


#: Quiet-window rule (round-5 verdict item 9, extended round 12): a
#: run whose starting 1-min loadavg exceeds ~2x the comparison
#: round's (with a 1.0 absolute floor so near-idle references don't
#: trip on trivia) — OR whose sampled hypervisor CPU steal exceeds
#: _QUIET_STEAL_PCT, the slowdown loadavg cannot see (a co-tenant
#: burst made identical trees measure 1.7x apart this round) — first
#: WAITS for the host to calm down (up to _QUIET_TRIES sleeps), then
#: proceeds and stamps the JSON ``noisy: true`` so cross-round drift
#: adjudications become a one-line read.
_QUIET_TRIES = 6
_QUIET_SLEEP_S = 20.0
_QUIET_STEAL_PCT = 3.0
_STEAL_SAMPLE_S = 3.0


def _steal_sample() -> float | None:
    s0 = _proc_stat()
    if s0 is None:
        return None
    time.sleep(_STEAL_SAMPLE_S)
    s1 = _proc_stat()
    if s1 is None:
        return None
    return 100.0 * (s1[0] - s0[0]) / max(1, s1[1] - s0[1])


def _quiet_window() -> tuple[bool, dict]:
    ref = _reference_load(os.path.dirname(os.path.abspath(__file__)))
    info: dict = {"reference_round": ref[0] if ref else None,
                  "reference_loadavg": ref[1] if ref else None}
    threshold = max(2.0 * ref[1], 1.0) if ref else None
    if threshold is not None:
        info["threshold"] = round(threshold, 2)
    waited = 0.0
    la = steal = None
    for attempt in range(_QUIET_TRIES + 1):
        if attempt:
            time.sleep(_QUIET_SLEEP_S)
            waited += _QUIET_SLEEP_S
        la = _loadavg()
        la_ok = (
            threshold is None or la is None or la[0] <= threshold
        )
        steal = _steal_sample()
        waited += _STEAL_SAMPLE_S
        steal_ok = steal is None or steal <= _QUIET_STEAL_PCT
        if la_ok and steal_ok:
            info["waited_sec"] = round(waited, 1)
            info["start_steal_pct"] = (
                None if steal is None else round(steal, 1)
            )
            return False, info
    info["waited_sec"] = round(waited, 1)
    info["start_steal_pct"] = None if steal is None else round(steal, 1)
    noisy = (
        threshold is not None and la is not None and la[0] > threshold
    ) or (steal is not None and steal > _QUIET_STEAL_PCT)
    return noisy, info


HEADLINE = [
    "c1_pricing_summary",
    "c3_count_distinct",
    "d1_orders_customer_join",
    "d2_broadcast_part_join",
    "d11_star_join_revenue",
    "e1_rank_orders_per_cust",
    "e3_running_sum_frame",
    "f1_exact_dedup",
    "f4_topk_cosine",
    "f9_tfidf_top_terms",
    "g1_tumbling_window",
    "g3_session_window",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from pdf2dataset_spark.queries import load_all
    from pdf2dataset_spark.session import get_spark

    spark = get_spark("pdf2dataset-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")
    # statistics-driven execution mode: AQE's stage barriers are pure
    # overhead at laptop-scale inputs and essential at cluster scale —
    # pick from the actual input size (session.tune_for_input_size).
    from pdf2dataset_spark.session import tune_for_input_size

    tune_for_input_size(spark, [sf_dir])
    registry = load_all()
    names = [n for n in HEADLINE if n in registry] or list(registry)[:5]

    # JVM/session warm-up so the first timed query doesn't pay startup.
    registry[names[0]].fn(spark, sf_dir).limit(1).collect()

    # Five iterations, report the best: local-mode Spark pays a fixed
    # per-job planning/scheduling cost on early executions (codegen
    # compilation, JIT, broadcast build) that a long-lived cluster
    # amortizes; the warm run is the steady-state number, and best-of-N
    # damps transient host-load outliers. N=5 (was 3): with the grown
    # code footprint, broadcast-join queries now need ~4 runs to reach
    # JIT steady state (measured: d2 0.65→0.42→0.37→0.34→0.31 s), so
    # best-of-3 was reporting warm-up, not the plan.
    noisy, quiet_info = _quiet_window()
    load_start = _loadavg()
    stat_start = _proc_stat()
    timings: dict[str, float] = {}
    wall_runs: dict[str, list[float]] = {}
    cpu_best: dict[str, float] = {}
    for name in names:
        best = float("inf")
        runs: list[float] = []
        for _ in range(5):
            c0 = _cpu_seconds()
            t0 = time.perf_counter()
            df = registry[name].fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            wall = time.perf_counter() - t0
            c1 = _cpu_seconds()
            runs.append(round(wall, 3))
            if wall < best:
                best = wall
                if c0 is not None and c1 is not None:
                    cpu_best[name] = round(c1 - c0, 3)
        timings[name] = round(best, 3)
        wall_runs[name] = runs

    # Extraction hot path (round-10 verdict ask #8): BENCH_r*.json
    # previously carried only relational headliners, so a tier-A
    # fused-pipeline regression could hide from the driver artifact.
    # This times the REAL-PDF path (build_pdf fixtures -> PdfCodec
    # parse + layout text through the one fused mapInPandas pass)
    # under the same 5-run/load-annotation protocol. Its seconds ride
    # the ``queries`` map (so tools/bench_compare.py gates it from
    # the next round on) but NOT the headline ``value`` total, which
    # stays comparable across rounds; ``extract`` carries the
    # derived pages/s.
    from pdf2dataset_spark.extraction import ExtractionPipeline
    from pdf2dataset_spark.sources.codecs import PdfCodec
    from pdf2dataset_spark.sources.minipdf import build_pdf

    ex_docs, ex_pages = 128, 6
    body = " ".join(f"w{j}" for j in range(80))
    docs = {
        f"doc{i:04d}.pdf": build_pdf(
            [f"doc {i} page {p} {body}" for p in range(ex_pages)],
            compress=True,
        )
        for i in range(ex_docs)
    }
    pipe = ExtractionPipeline(
        spark=spark, features=["text"], codec=PdfCodec()
    )
    ex_name = "a5x_pdf_extract"
    best = float("inf")
    runs = []
    for _ in range(5):
        c0 = _cpu_seconds()
        t0 = time.perf_counter()
        pipe.pages(docs).select("path", "page", "text") \
            .write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        c1 = _cpu_seconds()
        runs.append(round(wall, 3))
        if wall < best:
            best = wall
            if c0 is not None and c1 is not None:
                cpu_best[ex_name] = round(c1 - c0, 3)
    timings[ex_name] = round(best, 3)
    wall_runs[ex_name] = runs
    extract_info = {
        "docs": ex_docs,
        "pages": ex_docs * ex_pages,
        "pages_per_sec": round(ex_docs * ex_pages / best, 1),
    }

    # NEW in round 12 (additive queries entry, headline total
    # untouched): the SCANNED-corpus decode path. The r11 verdict
    # noted the image decoders are invisible to the driver bench;
    # this line runs JPX + JBIG2 + CCITT embedded images through the
    # fused pass's embedded_image_meta probe (which fully decodes to
    # set `decodable`) under the same 5-run protocol.
    from pdf2dataset_spark.sources import ccitt as _ccitt
    from pdf2dataset_spark.sources import jbig2 as _jbig2
    from pdf2dataset_spark.sources import raster as _raster
    from pdf2dataset_spark.sources.jpx import encode_jpx

    sw, sh, spx = _raster._rasterize("SCANNED PAGE 1\nsecond line")
    spx = bytes(spx)
    bitmap = [
        bytearray(1 if spx[y * sw + x] < 128 else 0 for x in range(sw))
        for y in range(sh)
    ]
    jb2 = _jbig2.encode_generic_page(bitmap, template=0, tpgdon=True)
    g4 = _ccitt.encode_g4(spx, sw, sh)
    gw = gh = 64
    grad = bytes(
        ((x * 3 + y * 5) // 2) % 256
        for y in range(gh) for x in range(gw)
    )
    jpx_raw = encode_jpx(gw, gh, grad, 1, levels=2)
    sdocs = {
        f"scan{i:03d}.pdf": build_pdf(
            [""],
            images=[
                {"filter": "/JPXDecode", "width": gw, "height": gh,
                 "data": jpx_raw},
                {"filter": "/JBIG2Decode", "width": sw, "height": sh,
                 "data": jb2, "bits": 1},
                {"filter": "/CCITTFaxDecode", "width": sw, "height": sh,
                 "data": g4, "bits": 1,
                 "decode_parms": {"/K": -1, "/Columns": sw,
                                  "/Rows": sh}},
            ],
        )
        for i in range(8)
    }
    spipe = ExtractionPipeline(
        spark=spark,
        features=["n_images", "embedded_image_meta"],
        codec=PdfCodec(),
    )
    sc_name = "a6x_scanned_decode"
    spark.sparkContext.setJobDescription(sc_name)
    best_s = float("inf")
    runs_s = []
    for _ in range(5):
        c0 = _cpu_seconds()
        t0 = time.perf_counter()
        spipe.pages(sdocs) \
            .select("path", "page", "n_images", "embedded_image_meta") \
            .write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        c1 = _cpu_seconds()
        runs_s.append(round(wall, 3))
        if wall < best_s:
            best_s = wall
            if c0 is not None and c1 is not None:
                cpu_best[sc_name] = round(c1 - c0, 3)
    timings[sc_name] = round(best_s, 3)
    wall_runs[sc_name] = runs_s

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": round(
                    sum(v for k, v in timings.items()
                        if k not in (ex_name, sc_name)), 3
                ),
                "unit": "sec",
                "queries": timings,
                "extract": extract_info,
                "sf": sf_val,
                "noisy": noisy,
                "load": {
                    "n_runs": 5,
                    "loadavg_start": load_start,
                    "loadavg_end": _loadavg(),
                    "ncpus": os.cpu_count(),
                    # Effective parallelism evidence (round-11 verdict
                    # item 1): ncpus is the HOST core count; the knob
                    # that actually governs the run is SPARK_GRAFT_CPUS
                    # via master local[N]. Reporting all three lets a
                    # low-core run be verified from the JSON alone.
                    "spark_graft_cpus": os.environ.get("SPARK_GRAFT_CPUS"),
                    "master": spark.sparkContext.master,
                    "default_parallelism": spark.sparkContext.defaultParallelism,
                    "sf_dir": sf_dir,
                    # hypervisor steal across the whole bench window:
                    # the one slowdown loadavg cannot see. None when
                    # /proc/stat is unavailable.
                    "cpu_steal_pct": (
                        round(
                            100.0
                            * (stat_end[0] - stat_start[0])
                            / max(1, stat_end[1] - stat_start[1]),
                            1,
                        )
                        if stat_start and (stat_end := _proc_stat())
                        else None
                    ),
                    "wall_runs": wall_runs,
                    "cpu_sec_best_run": cpu_best,
                    "quiet_window": quiet_info,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
