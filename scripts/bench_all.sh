#!/usr/bin/env bash
# Benchmark every shipped deck (one JSON line each) — the data source for
# BENCHMARKS.md. Run in a quiet window; see docs/DESIGN.md §6 on measurement.
set -uo pipefail
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"

for deck in 128x128 128x256 256x256 1024x1024 4096x4096; do
  python bench.py --grid "$deck" 2>/dev/null
done
