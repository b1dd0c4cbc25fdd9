"""cilqr_tpu — TPU-native CILQR trajectory-optimization engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
C++/ROS/Eigen reference planner mpt0816/Cilqr (see SURVEY.md): DP coarse
search -> convex safe corridors -> LQR init guess -> barrier-CILQR solve,
expressed as pure fixed-shape functions that batch via vmap and shard over
device meshes via shard_map/pjit.
"""

from . import barriers, config, costs, geometry, model, reference_line, solver, types
from .config import DEFAULT_CONFIG, PlannerConfig
from .types import SolverStatus

__version__ = "0.1.0"
