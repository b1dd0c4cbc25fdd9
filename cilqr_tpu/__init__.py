"""cilqr_tpu — TPU-native CILQR trajectory-optimization engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
C++/ROS/Eigen reference planner mpt0816/Cilqr (see SURVEY.md): DP coarse
search -> convex safe corridors -> LQR init guess -> barrier-CILQR solve,
expressed as pure fixed-shape functions that batch via vmap and shard over
device meshes via shard_map/pjit.

Module map (bottom-up):
  geometry, reference_line, lqr       — math core
  types, config                       — data model + typed config tree
  world, scenario                     — environment tensors + generator
  model, barriers, costs              — dynamics + cost stack
  solver, tracker, dp, corridor       — the planners
  pipeline, batch, dist, mpc          — orchestration & scaling
  viz, checkpoint, profiling         — observability & IO (metrics in batch)
  native                              — C++ oracle (parity/baseline)
"""

from . import (barriers, batch, checkpoint, config, corridor, costs, dist,
               dp, geometry, lqr, model, mpc, pipeline, profiling,
               reference_line, scenario, solver, tracker, types, viz, world)
from .config import DEFAULT_CONFIG, PlannerConfig
from .types import SolverStatus

__version__ = "0.1.0"
