"""Batched solving + structured metrics.

The reference solves one problem at a time on one CPU core; the TPU win is
thousands of independent scenario solves per chip. This module provides the
vmapped batch APIs (BASELINE config 3) and the per-batch metrics the
reference only printf's (SURVEY.md §5 observability).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from . import costs as costs_mod
from . import solver as solver_mod
from .config import PlannerConfig
from .costs import ConstraintSet
from .types import SolveResult, SolverStatus


def solve_batch(goals, starts, cons: ConstraintSet, cfg, veh, dt,
                warm_start=None, backend: str = "blast") -> SolveResult:
    """Batched CILQR solve over a leading batch axis on every input.

    backend='blast' (default): batch-last layout solver
    (solver_blast.solve_batch_bl) — full vector-lane utilization on TPU;
    the measured fastest (docs/PERF.md).
    backend='mega': full-solve Pallas megakernel (pallas/megasolve.py) —
    the entire outer loop VMEM-resident per 128-lane block. QUARANTINED:
    measured 2,480 vs blast's ~6-7k solves/s at B=1024 (docs/PERF.md);
    kept parity-tested, not a production path.
    backend='vmap': jax.vmap of the single-problem solver — the semantic
    reference (identical decisions; controls agree to fp-reassociation
    noise, tests/test_solver_blast.py).
    """
    if backend == "mega":
        from .pallas.megasolve import solve_batch_mega

        return solve_batch_mega(goals, starts, cons, cfg, veh, dt,
                                warm_start=warm_start,
                                interpret=jax.default_backend() == "cpu")
    if backend == "blast":
        from .solver_blast import solve_batch_bl

        return solve_batch_bl(goals, starts, cons, cfg, veh, dt,
                              warm_start=warm_start)
    if warm_start is None:
        return jax.vmap(
            lambda g, s, c: solver_mod.solve(g, s, c, cfg, veh, dt))(
                goals, starts, cons)
    return jax.vmap(
        lambda g, s, c, w: solver_mod.solve(g, s, c, cfg, veh, dt,
                                            warm_start=w))(
            goals, starts, cons, warm_start)


def solve_batch_jit(cfg: PlannerConfig, backend: str = "blast"):
    """jit-compiled batched solver over static config."""
    ilqr = cfg.ilqr
    veh = cfg.vehicle
    dt = cfg.delta_t

    @jax.jit
    def _f(goals, starts, cons):
        return solve_batch(goals, starts, cons, ilqr, veh, dt,
                           backend=backend)

    return _f


class BatchMetrics(NamedTuple):
    """Structured per-batch metrics (replaces the reference's stdout prints,
    ilqr_optimizer.cc:174-313)."""

    n: int
    converged_fraction: float
    status_counts: dict
    iters_mean: float
    iters_p50: float
    iters_p99: float
    cost_total_mean: float
    cost_components_mean: dict
    # lanes whose windowed lane-segment search may have selected a wrong
    # plane (SolveResult.lane_clipped); investigate any nonzero count
    lane_clipped_count: int = 0

    @staticmethod
    def from_result(res: SolveResult) -> "BatchMetrics":
        status = np.asarray(res.status)
        iters = np.asarray(res.iters)
        succ = np.isin(status, (int(SolverStatus.SUCCESS_GNORM),
                                int(SolverStatus.SUCCESS_ABS_COST),
                                int(SolverStatus.SUCCESS_REL_COST)))
        counts = {SolverStatus(k).name: int((status == k).sum())
                  for k in np.unique(status)}
        return BatchMetrics(
            n=len(status),
            converged_fraction=float(succ.mean()),
            status_counts=counts,
            iters_mean=float(iters.mean()),
            iters_p50=float(np.percentile(iters, 50)),
            iters_p99=float(np.percentile(iters, 99)),
            cost_total_mean=float(np.asarray(res.cost.total).mean()),
            lane_clipped_count=(
                0 if res.lane_clipped is None
                else int(np.asarray(res.lane_clipped).sum())),
            cost_components_mean={
                "target": float(np.asarray(res.cost.target).mean()),
                "dynamic": float(np.asarray(res.cost.dynamic).mean()),
                "corridor": float(np.asarray(res.cost.corridor).mean()),
                "lane": float(np.asarray(res.cost.lane).mean()),
            })


def device_metrics(res: SolveResult):
    """On-device metric reduction (jit/psum-friendly): returns a dict of
    scalars computed with jnp so it can live inside a sharded step and be
    reduced with jax.lax.psum/pmean across a mesh axis."""
    status = res.status
    succ = ((status == SolverStatus.SUCCESS_GNORM) |
            (status == SolverStatus.SUCCESS_ABS_COST) |
            (status == SolverStatus.SUCCESS_REL_COST))
    return {
        "n": jnp.asarray(status.shape[0], jnp.float32),
        "converged": succ.sum().astype(jnp.float32),
        "iters_sum": res.iters.sum().astype(jnp.float32),
        "cost_sum": res.cost.total.sum().astype(jnp.float32),
    }
