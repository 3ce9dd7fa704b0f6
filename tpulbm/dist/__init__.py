from tpulbm.dist.mesh import get_mesh
from tpulbm.dist.sharding import decompose_rows, row_sharding
from tpulbm.dist.runner import make_runner

__all__ = ["get_mesh", "decompose_rows", "row_sharding", "make_runner"]
