"""Per-query bench regression gate.

Compares two bench results (either a raw `bench.py` JSON line or a
driver `BENCH_r{N}.json` wrapper with a `parsed` field) and fails —
exit 1 — if any query slowed by more than the threshold, or if the
total did. Run in CI so a round's perf story is "no regressions" by
construction:

    python bench.py > /tmp/bench_now.json
    python tools/bench_compare.py BENCH_r02.json /tmp/bench_now.json

Small absolute slips (< `--min-abs` seconds) are ignored even when
they exceed the ratio: sub-100 ms queries jitter by scheduler noise,
and a 20% gate on 0.1 s is a 20 ms coin flip, not a regression.
"""

from __future__ import annotations

import argparse
import json
import sys


def load_bench(path: str) -> dict:
    """Accept a driver BENCH_r{N}.json wrapper, a raw bench.py line,
    or a file whose last non-empty line is the JSON (bench.py piped
    with Spark log noise)."""
    with open(path) as f:
        text = f.read()
    try:
        obj = json.loads(text)
    except json.JSONDecodeError:
        lines = [ln for ln in text.splitlines() if ln.strip().startswith("{")]
        obj = json.loads(lines[-1])
    if "parsed" in obj:
        obj = obj["parsed"]
    if "queries" not in obj:
        raise SystemExit(f"{path}: no 'queries' field in bench JSON")
    return obj


def annotate_load(base: dict, cur: dict) -> None:
    """Print (never gate on) a host-load comparison when both runs
    carry bench.py's ``load`` block. A wall-time delta measured under
    materially different loadavg is a measurement artifact until the
    CPU numbers disagree too — this annotation exists so perf rounds
    stop re-litigating host noise by hand."""
    lb, lc = base.get("load"), cur.get("load")
    if not (lb and lc):
        return
    ncpus = lc.get("ncpus") or lb.get("ncpus") or 1

    def peak(load: dict) -> float | None:
        vals = [
            v[0]
            for v in (load.get("loadavg_start"), load.get("loadavg_end"))
            if v
        ]
        return max(vals) if vals else None

    pb, pc = peak(lb), peak(lc)
    if pb is None or pc is None:
        return
    print(
        f"  host load (1m avg, {ncpus} cpus): "
        f"baseline {pb:.1f} -> current {pc:.1f}"
    )
    if abs(pc - pb) > ncpus / 4:
        print(
            "  NOTE: runs executed under materially different host load; "
            "wall-time deltas are suspect — compare load.cpu_sec_best_run "
            "per query before believing a regression."
        )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("baseline", help="previous bench JSON (e.g. BENCH_r02.json)")
    ap.add_argument("current", help="new bench JSON (bench.py output)")
    ap.add_argument(
        "--threshold",
        type=float,
        default=0.20,
        help="max allowed fractional slowdown per query (default 0.20)",
    )
    ap.add_argument(
        "--min-abs",
        type=float,
        default=0.15,
        help="ignore slowdowns under this many seconds. Calibrated by "
        "A/B-ing identical code in fresh processes: broadcast-join "
        "queries swing ~±0.15 s run-to-run from JVM broadcast-build "
        "jitter alone, so a tighter floor flags phantom regressions",
    )
    args = ap.parse_args()

    base, cur = load_bench(args.baseline), load_bench(args.current)
    annotate_load(base, cur)
    failures: list[str] = []
    rows: list[str] = []
    for name, b in sorted(base["queries"].items()):
        c = cur["queries"].get(name)
        if c is None:
            failures.append(f"{name}: present in baseline, missing now")
            continue
        delta = c - b
        ratio = delta / b if b > 0 else 0.0
        flag = ""
        if delta > args.min_abs and ratio > args.threshold:
            flag = "  << REGRESSION"
            failures.append(f"{name}: {b:.3f}s -> {c:.3f}s (+{ratio:+.0%})")
        rows.append(f"  {name:32s} {b:7.3f}s -> {c:7.3f}s ({ratio:+.0%}){flag}")

    tb, tc = base.get("value", 0.0), cur.get("value", 0.0)
    tratio = (tc - tb) / tb if tb else 0.0
    if tc - tb > args.min_abs and tratio > args.threshold:
        failures.append(f"TOTAL: {tb:.2f}s -> {tc:.2f}s ({tratio:+.0%})")

    print("\n".join(rows))
    print(f"  {'TOTAL':32s} {tb:7.3f}s -> {tc:7.3f}s ({tratio:+.0%})")
    if failures:
        print("\nFAIL: performance regressions:", file=sys.stderr)
        for f in failures:
            print("  " + f, file=sys.stderr)
        return 1
    print("\nOK: no query regressed beyond "
          f"{args.threshold:.0%} (+{args.min_abs}s floor)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
