#!/usr/bin/env python
"""Run a shipped reference deck end-to-end through the Python API.

    PYTHONPATH=.. python examples/run_reference_deck.py [deck=128x128]
"""

import sys

from tpulbm import Simulation

deck = sys.argv[1] if len(sys.argv) > 1 else "128x128"
sim = Simulation.from_files(
    f"data/input_{deck}.params", f"data/obstacles_{deck}.dat"
)
result = sim.run(progress=False)
print(f"deck {deck}: {result.params.max_iters} steps in "
      f"{result.elapsed_s:.3f} s "
      f"({result.params.total_updates / result.elapsed_s / 1e6:.0f} MLUPS)")
print(f"Reynolds number: {result.reynolds:.4f}")
sim.write_outputs(f"out/{deck}")
print(f"wrote out/{deck}/final_state.dat and av_vels.dat")
