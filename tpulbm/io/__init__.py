from tpulbm.io.params_file import read_params
from tpulbm.io.obstacles import read_obstacles
from tpulbm.io.writers import write_av_vels, write_final_state

__all__ = ["read_params", "read_obstacles", "write_av_vels", "write_final_state"]
