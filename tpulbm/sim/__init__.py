from tpulbm.sim.simulation import Simulation, SimulationResult

__all__ = ["Simulation", "SimulationResult"]
