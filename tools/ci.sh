#!/usr/bin/env bash
# Full local gate: tests + oracle verification + bench.
# Usage: bash tools/ci.sh [sf_dir]
set -euo pipefail
cd "$(dirname "$0")/.."
SF="${1:-/root/testdata/sf0.01}"

echo "== pytest =="
python -m pytest tests/ -q

echo "== oracle gate ($SF) =="
python tools/verify_local.py --sf "$SF"

echo "== bench (sf0.1) =="
python bench.py | tee /tmp/bench_now.json

echo "== bench regression gate vs last round =="
LAST=$(ls BENCH_r*.json 2>/dev/null | sort | tail -1)
if [ -n "$LAST" ]; then
  python tools/bench_compare.py "$LAST" /tmp/bench_now.json
else
  echo "no BENCH_r*.json baseline yet; skipping"
fi

echo "== at-scale invariant checks (5-10M rows) =="
python tools/scale_check.py
