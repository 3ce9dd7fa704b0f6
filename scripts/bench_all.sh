#!/usr/bin/env bash
# Benchmark every shipped deck (one JSON line each) — the data source for
# BENCHMARKS.md. Run in a quiet window; see docs/DESIGN.md §6 on measurement.
set -uo pipefail
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
# keep the TPU plugin's site dir reachable (see CLAUDE.md)
case ":$PYTHONPATH:" in
  *:/root/.axon_site:*) ;;
  *) [ -d /root/.axon_site ] && export PYTHONPATH="$PYTHONPATH:/root/.axon_site" ;;
esac

# Each deck writes a committed JSON artifact (wall + device + window-health
# tag) under bench_artifacts/ — the data the BENCHMARKS.md tables cite.
ART_DIR="${ART_DIR:-bench_artifacts}"
mkdir -p "$ART_DIR"
fail=0
for deck in 128x128 128x256 256x256 1024x1024 2048x2048 4096x4096 8192x8192; do
  if ! python bench.py --grid "$deck" --out "$ART_DIR/$deck.json" 2>/dev/null; then
    echo "BENCH FAILED: $deck" >&2
    fail=1
  fi
done
exit $fail
