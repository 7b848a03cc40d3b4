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
python bench.py
