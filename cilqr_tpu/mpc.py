"""Receding-horizon MPC loop: warm-started CILQR re-solves along the
trajectory (BASELINE config 4).

The reference plans once per RViz click (planning_node.cc:82-112); real
deployments replan every cycle. Each MPC cycle shifts the previous solution
by one knot (warm start + goals), rebuilds the safe corridors at the new
absolute times (dynamic obstacles have moved), and re-solves. The per-cycle
step is one jitted function; vmap it over scenario batches for throughput
benchmarks.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import corridor as corridor_mod
from . import costs as costs_mod
from . import pipeline as pipeline_mod
from . import solver as solver_mod
from .config import PlannerConfig
from .types import Scenario, SolveResult, Traj


class MpcCarry(NamedTuple):
    xs: jnp.ndarray      # [N,6] current plan
    us: jnp.ndarray      # [T,2]
    cycle_time: jnp.ndarray  # absolute time of plan knot 0


def _shift_plan(xs, us):
    """Shift one knot forward; hold the tail."""
    xs_n = jnp.concatenate([xs[1:], xs[-1:]], axis=0)
    us_n = jnp.concatenate([us[1:], us[-1:]], axis=0)
    return xs_n, us_n


def mpc_step(scn: Scenario, carry: MpcCarry, cfg: PlannerConfig,
             grid, lane) -> tuple[MpcCarry, SolveResult]:
    """One replan cycle: shift, rebuild corridors at shifted absolute times,
    warm-started solve."""
    goals, warm_us = _shift_plan(carry.xs, carry.us)
    t_new = carry.cycle_time + cfg.delta_t
    n = goals.shape[0]
    times = t_new + cfg.delta_t * jnp.arange(n, dtype=goals.dtype)

    pred = Traj.zeros(n, goals.dtype).replace(
        x=goals[:, 0], y=goals[:, 1], theta=goals[:, 2], time=times)
    cors = corridor_mod.plan_corridors(scn, pred, cfg.corridor, lane)
    cons = costs_mod.shrink_and_normalize(
        cors.planes, cors.plane_mask,
        cors.left_planes, cors.left_segs, cors.left_mask,
        cors.right_planes, cors.right_segs, cors.right_mask,
        cfg.ilqr, cfg.vehicle)

    start_state = goals[0]
    res = solver_mod.solve(goals, start_state, cons, cfg.ilqr, cfg.vehicle,
                           cfg.delta_t, warm_start=(goals, warm_us))
    return MpcCarry(xs=res.xs, us=res.us, cycle_time=t_new), res


def run_mpc(scn: Scenario, start, cfg: PlannerConfig, n_cycles: int,
            grid=None, lane=None):
    """Initial full plan + n_cycles warm-started replans. Returns the list
    of SolveResults (host loop; each cycle jitted)."""
    if grid is None and cfg.dp.collision_mode == "grid":
        import numpy as np

        from .world import build_barrier_grid

        grid = build_barrier_grid(np.asarray(scn.barrier_xy), cfg.dp.grid_cell)
    if lane is None:
        lane = pipeline_mod.make_lane_tuple(scn.left_barrier_xy,
                                            scn.right_barrier_xy, cfg)

    out0 = pipeline_mod.plan(scn, start, cfg, grid, lane)
    carry = MpcCarry(xs=out0.solve.xs, us=out0.solve.us,
                     cycle_time=jnp.zeros((), out0.solve.xs.dtype))
    step = jax.jit(lambda c: mpc_step(scn, c, cfg, grid, lane))
    results = [out0.solve]
    for _ in range(n_cycles):
        carry, res = step(carry)
        results.append(res)
    return results


def mpc_scan(scn: Scenario, carry: MpcCarry, cfg: PlannerConfig, grid, lane,
             n_cycles: int):
    """Fully-jitted MPC rollout via lax.scan (for benchmarking): returns
    (final carry, stacked statuses/iters/final costs)."""
    def body(c, _):
        c2, res = mpc_step(scn, c, cfg, grid, lane)
        return c2, (res.status, res.iters, res.cost.total)

    return jax.lax.scan(body, carry, None, length=n_cycles)
