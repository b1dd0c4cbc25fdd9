"""Multi-chip / multi-host execution: mesh, sharded solves, collectives.

The reference has no parallelism at all (SURVEY.md §2: single thread,
single process). This layer is new, TPU-first design: scenario batches are
sharded over a 1-D device mesh (``batch`` axis); each device solves its
shard independently (solves are embarrassingly parallel) and convergence /
benchmark statistics are reduced with ``psum`` over ICI — the only
cross-chip communication the workload needs (SURVEY.md §5).

Multi-host (BASELINE configs 4-5): call ``init_distributed()`` once per
process, then the same mesh code spans all hosts' devices; use
host_local_array_to_global_array for per-host inputs.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from . import solver as solver_mod
from .batch import device_metrics, solve_batch
from .config import PlannerConfig


def init_distributed(coordinator: str | None = None, num_processes: int | None = None,
                     process_id: int | None = None):
    """jax.distributed.initialize wrapper (no-op when single-process)."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)


def make_batch_mesh(devices: Sequence[jax.Device] | None = None) -> Mesh:
    """1-D mesh over all (local or global) devices; axis name 'batch'."""
    devs = np.asarray(devices if devices is not None else jax.devices())
    return Mesh(devs, ("batch",))


def shard_batch(mesh: Mesh, tree):
    """Place a host batch pytree onto the mesh, sharded on axis 0."""
    sharding = NamedSharding(mesh, P("batch"))
    return jax.tree.map(lambda a: jax.device_put(a, sharding), tree)


def global_batch(mesh: Mesh, tree):
    """Assemble global sharded arrays from PER-PROCESS local shards
    (multi-process path, BASELINE configs 4-5): each process passes its own
    slice of the batch; host_local_array_to_global_array stitches them into
    global jax.Arrays addressable through the global mesh without any
    gather. Single-process: equivalent to shard_batch."""
    from jax.experimental import multihost_utils

    return jax.tree.map(
        lambda a: multihost_utils.host_local_array_to_global_array(
            np.asarray(a), mesh, P("batch")), tree)


def sharded_solve_step(cfg: PlannerConfig, mesh: Mesh,
                       backend: str = "blast"):
    """Build the sharded batched-solve step (the 'training step' analog):
    per-device vmapped CILQR solves + psum-reduced convergence stats over
    the mesh via shard_map.

    Returns a jitted fn (goals [B,N,6], starts [B,6], cons pytree [B,...])
    -> (SolveResult sharded over batch, global stats dict of scalars).
    """
    ilqr = cfg.ilqr
    veh = cfg.vehicle
    dt = cfg.delta_t
    spec = P("batch")

    def _local(goals, starts, cons):
        res = solve_batch(goals, starts, cons, ilqr, veh, dt,
                          backend=backend)
        stats = device_metrics(res)
        # ICI collective: global sums across the mesh
        stats = {k: jax.lax.psum(v, "batch") for k, v in stats.items()}
        return res, stats

    fn = jax.shard_map(_local, mesh=mesh, in_specs=(spec, spec, spec),
                       out_specs=(spec, P()), check_vma=False)
    return jax.jit(fn)


def sharded_pipeline_step(cfg: PlannerConfig, mesh: Mesh, grid, lane,
                          backend: str = "blast", road_spec=None):
    """Full-pipeline sharded step: each device runs the batched pipeline
    (pipeline.plan_batch: vmapped DP -> vmapped corridors -> batch-last
    CILQR solve with compaction) on its scenario shard; psum stats over
    the mesh. grid/lane are replicated (same road for the whole fleet).

    Returns a jitted fn (scns pytree [B,...], starts [B,4]) ->
    (PlanOutput sharded over batch, global stats dict)."""
    from . import pipeline as pipeline_mod

    spec = P("batch")

    def _local(scns, starts):
        out = pipeline_mod.plan_batch(scns, starts, cfg, grid, lane,
                                      backend=backend, spec=road_spec)
        stats = device_metrics(out.solve)
        stats["dp_ok"] = out.dp_ok.sum().astype(jnp.float32)
        stats["ok"] = out.ok.sum().astype(jnp.float32)
        # executed-horizon safety: near_hit_lanes counts the PRE-repair
        # re-check (the characterized rel-cost-stop graze phenomenon —
        # comparable across rounds); repaired/still_dirty expose the
        # repair loop's action on it (pipeline._repair_batch)
        near = pipeline_mod.NEAR_TERM_KNOTS
        stats["near_hit_lanes"] = (
            out.pre_hits[..., :near].any(-1).sum().astype(jnp.float32))
        stats["repaired_lanes"] = out.repaired.sum().astype(jnp.float32)
        stats["still_dirty_lanes"] = (
            out.still_dirty.sum().astype(jnp.float32))
        stats = {k: jax.lax.psum(v, "batch") for k, v in stats.items()}
        return out, stats

    fn = jax.shard_map(_local, mesh=mesh, in_specs=(spec, spec),
                       out_specs=(spec, P()), check_vma=False)
    return jax.jit(fn)


def sharded_mpc_step(cfg: PlannerConfig, mesh: Mesh, lane, n_cycles: int,
                     backend: str = "blast", road_spec=None):
    """The DEPLOYMENT loop under shard_map (BASELINE config 4 at fleet
    width): each device runs ``n_cycles`` of the warm-start-carried
    batched MPC replan cycle (mpc.mpc_scan_batch — per-cycle corridor
    rebuild at the shifted absolute times, warm blast solve,
    executed-horizon re-check and the repair pass) on its scenario
    shard; the per-(cycle, lane) safety statistics psum over the mesh.
    Per-device warm-start carries are embarrassingly parallel, so the
    only collective is the stats reduction riding ICI.

    Returns a jitted fn (scns pytree [B, ...], carry mpc.MpcCarry with
    [B, ...] leaves) -> (final carry sharded over batch, global stats
    dict of scalars: total/converged/corridor-ok cycle counts, iteration
    sum, lane-clip count, and the pre-repair/repaired/still-dirty
    executed-horizon safety counters)."""
    from . import mpc as mpc_mod
    from .types import SolverStatus

    spec = P("batch")

    def _local(scns, carry):
        final, st = mpc_mod.mpc_scan_batch(scns, carry, cfg, lane,
                                           n_cycles, backend=backend,
                                           spec=road_spec)
        succ = ((st.status == SolverStatus.SUCCESS_GNORM) |
                (st.status == SolverStatus.SUCCESS_ABS_COST) |
                (st.status == SolverStatus.SUCCESS_REL_COST))
        f32 = jnp.float32
        stats = {
            "cycles": jnp.asarray(st.status.size, f32),
            "converged_cycles": succ.sum().astype(f32),
            # warm cycles whose shifted plan is already optimal can
            # full-reject every alpha until lambda overflows (~10
            # iterations) — the reference's kUnsolved exit, which it
            # emits the trajectory on anyway (ilqr_optimizer.cc:302-307).
            # Counted separately so deployments distinguish
            # at-optimum lambda exits from real non-convergence.
            "lambda_fail_cycles": (
                st.status == SolverStatus.FAIL_LAMBDA_MAX).sum()
            .astype(f32),
            "iters_sum": st.iters.sum().astype(f32),
            "corridor_ok_cycles": st.corridor_ok.sum().astype(f32),
            "lane_clipped": st.lane_clipped.sum().astype(f32),
            "near_hit_cycles": st.pre_near_hits.sum().astype(f32),
            "repaired_cycles": st.repaired.sum().astype(f32),
            "still_dirty_cycles": st.still_dirty.sum().astype(f32),
        }
        stats = {k: jax.lax.psum(v, "batch") for k, v in stats.items()}
        return final, stats

    fn = jax.shard_map(_local, mesh=mesh, in_specs=(spec, spec),
                       out_specs=(spec, P()), check_vma=False)
    return jax.jit(fn)
