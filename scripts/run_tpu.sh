#!/usr/bin/env bash
# Launcher for TPU runs — the framework's counterpart of the reference's
# env.sh + mpi_submit PBS pipeline (module loads, pinning, mpirun -np 64).
# On TPU there is nothing to pin: one process drives the chip(s); the mesh
# size replaces -np.
#
#   scripts/run_tpu.sh <deck> [device_count] [extra args...]
#   e.g. scripts/run_tpu.sh 1024x1024 1 --backend pallas
set -euo pipefail
cd "$(dirname "$0")/.."

DECK="${1:?usage: run_tpu.sh <deck e.g. 128x128> [device_count] [args...]}"
DEVICES="${2:-1}"
shift $(( $# >= 2 ? 2 : 1 ))

export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
# keep the TPU plugin's site dir reachable (see CLAUDE.md)
case ":$PYTHONPATH:" in
  *:/root/.axon_site:*) ;;
  *) [ -d /root/.axon_site ] && export PYTHONPATH="$PYTHONPATH:/root/.axon_site" ;;
esac

exec python -m tpulbm "data/input_${DECK}.params" "data/obstacles_${DECK}.dat" \
    --device-count "$DEVICES" --out-dir "out/${DECK}" "$@"
