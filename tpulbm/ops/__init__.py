from tpulbm.ops.step_jnp import accelerate, collide_stream, lbm_step, run_steps

__all__ = ["accelerate", "collide_stream", "lbm_step", "run_steps"]
