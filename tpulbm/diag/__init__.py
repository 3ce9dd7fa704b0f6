from tpulbm.diag.observables import (
    av_velocity,
    calc_reynolds,
    total_density,
    velocity_field,
)

__all__ = ["av_velocity", "calc_reynolds", "total_density", "velocity_field"]
