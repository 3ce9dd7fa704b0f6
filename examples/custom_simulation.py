#!/usr/bin/env python
"""Build a custom scenario programmatically: generate a deck with interior
obstacles, run with checkpointing and live metrics, then plot the flow.

    PYTHONPATH=.. python examples/custom_simulation.py
"""

import numpy as np

from tpulbm import LBMParams, Simulation
from tpulbm.tools.make_deck import box_obstacles

ny, nx = 256, 512
params = LBMParams(
    nx=nx, ny=ny, max_iters=20000, reynolds_dim=10,
    density=0.1, accel=0.005, omega=1.7,
)
# closed box with a cylinder-ish block in the stream
mask = box_obstacles(nx=nx, ny=ny, blocks=[(ny // 2 - 16, nx // 4, 32, 32)])

sim = Simulation(params, mask)
result = sim.run(
    checkpoint_every=5000,
    checkpoint_dir="out/custom_ckpts",
    metrics_file="out/custom_metrics.jsonl",
)
print(f"{params.max_iters} steps in {result.elapsed_s:.2f} s; "
      f"Reynolds {result.reynolds:.3f}")
sim.write_outputs("out/custom")

try:
    from tpulbm.viz import load_final_state, plot_speed

    _, _, u, _, _ = load_final_state("out/custom/final_state.dat")
    print(plot_speed(u, "out/custom/final_state.png"))
except RuntimeError as e:
    print(f"(no plot: {e})")

# resume demonstration: a fresh Simulation continues from the checkpoint
resumed = Simulation(params, mask)
resumed.restore_checkpoint("out/custom_ckpts")
print(f"resumed at step {resumed.step_count}; "
      f"av_vel so far {resumed.av_vels[resumed.step_count - 1]:.3e}")
