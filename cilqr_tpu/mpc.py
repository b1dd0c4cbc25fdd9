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
    # lanes whose repair ladder already FAILED once: the deployment
    # policy is attempt-once-then-flag — a persistently-resistant lane
    # stays still_dirty every cycle (visible to the executor) but does
    # not re-run the cold round's full iteration budget per cycle
    # (measured -40% MPC throughput otherwise; pipeline._repair_batch
    # eligible). None = all lanes eligible (materialized to zeros by
    # the scan entry points).
    no_repair: jnp.ndarray = None


def _no_repair_of(carry: MpcCarry, shape):
    return (jnp.zeros(shape, bool) if carry.no_repair is None
            else carry.no_repair)


class MpcStepOut(NamedTuple):
    solve: SolveResult
    # all 81 per-knot corridors built successfully this cycle; a False
    # means the solve ran against a degenerate corridor (corridor.cc's
    # failure modes: <4 flip points / empty inputs) and the cycle's output
    # must not be trusted by the caller
    corridor_ok: jnp.ndarray
    # the solver's windowed lane-segment search clipped at a window edge
    # this cycle (SolveResult.lane_clipped): MPC is exactly the drift
    # scenario the guard exists for — the window is built from the shifted
    # GOALS, and a warm-started rollout can wander past it, silently
    # selecting a wrong nearest lane segment. False when the solver ran
    # with the full scan (no window). Surfaced per cycle so a clipped
    # window in cycle k is visible at the API instead of vanishing inside
    # the scan carry.
    lane_clipped: jnp.ndarray
    # executed-horizon safety re-check of THIS cycle's FINAL plan (after
    # the repair pass, when enabled): does any of the first
    # pipeline.NEAR_TERM_KNOTS knots' two-disc probes (at the cycle's
    # ABSOLUTE knot times — dynamic obstacles have advanced) hit an
    # obstacle or road barrier? This is the same gate
    # PlanOutput.solve_hits gives the one-shot pipeline, applied where it
    # matters most: the receding-horizon loop is the code path that
    # actually EXECUTES plans (the reference animates its output with no
    # re-check at all, planning_node.cc:82-112). The repo's f32 posture
    # (docs/PERF.md) is "callers gate the horizon they execute" — this
    # field is that gate, per cycle. All-False = safe to execute.
    near_hits: jnp.ndarray = None
    # the full per-knot re-check mask [.., N] behind near_hits (final
    # plan)
    solve_hits: jnp.ndarray = None
    # pre-repair near-term dirty flag — the characterized rel-cost-stop
    # graze phenomenon, BEFORE the repair pass acted on it (equals
    # near_hits when repair is disabled)
    pre_near_hits: jnp.ndarray = None
    # repair outcome per lane this cycle (see PlanOutput.repaired /
    # .still_dirty): the repaired plan also replaces the carry, so the
    # NEXT cycle warm-starts from the safe trajectory
    repaired: jnp.ndarray = None
    still_dirty: jnp.ndarray = None


def _lane_clipped_of(res: SolveResult):
    """SolveResult.lane_clipped, or all-False when the backend ran a full
    lane scan (lane_clipped is None there — nothing to clip)."""
    if res.lane_clipped is None:
        return jnp.zeros(res.iters.shape, bool)
    return res.lane_clipped


def _shift_plan(xs, us):
    """Shift one knot forward; hold the tail."""
    xs_n = jnp.concatenate([xs[1:], xs[-1:]], axis=0)
    us_n = jnp.concatenate([us[1:], us[-1:]], axis=0)
    return xs_n, us_n


def mpc_step(scn: Scenario, carry: MpcCarry, cfg: PlannerConfig,
             grid, lane, spec=None) -> tuple[MpcCarry, MpcStepOut]:
    """One replan cycle: shift, rebuild corridors at shifted absolute times,
    warm-started solve, then the executed-horizon collision re-check of the
    new plan at the cycle's absolute knot times. Surfaces per-cycle
    corridor validity (cors.ok) — the reference silently proceeds on
    corridor failure."""
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
    hits = pipeline_mod._recheck_solution(scn, res.xs, cfg, spec, t0=t_new)
    near = pipeline_mod.NEAR_TERM_KNOTS
    pre_near = hits[:near].any()
    no_rep = _no_repair_of(carry, ())
    if cfg.repair.enabled:
        res, hits, repaired = pipeline_mod._repair_single(
            scn, res, hits, goals, start_state, cons, cfg, spec,
            t0=t_new, eligible=~no_rep)
        no_rep = no_rep | hits[:near].any()
    else:
        repaired = jnp.zeros((), bool)
    out = MpcStepOut(solve=res, corridor_ok=cors.ok.all(),
                     lane_clipped=_lane_clipped_of(res),
                     near_hits=hits[:near].any(),
                     solve_hits=hits, pre_near_hits=pre_near,
                     repaired=repaired, still_dirty=hits[:near].any())
    return MpcCarry(xs=res.xs, us=res.us, cycle_time=t_new,
                    no_repair=no_rep), out


def mpc_step_batch(scns: Scenario, carry: MpcCarry, cfg: PlannerConfig,
                   lane, backend: str = "blast", spec=None
                   ) -> tuple[MpcCarry, MpcStepOut]:
    """Batched replan cycle (BASELINE config 4 throughput path): every
    carry leaf and scns leaf has a leading batch axis [B]; corridors are
    vmapped and the solve goes through the fast batch-last solver with
    per-lane warm starts instead of a vmapped single-problem solve."""
    from .batch import solve_batch

    goals, warm_us = jax.vmap(_shift_plan)(carry.xs, carry.us)
    t_new = carry.cycle_time + cfg.delta_t
    n = goals.shape[1]
    times = (t_new[:, None]
             + cfg.delta_t * jnp.arange(n, dtype=goals.dtype)[None])

    def one_cors(scn, g, t):
        pred = Traj.zeros(n, goals.dtype).replace(
            x=g[:, 0], y=g[:, 1], theta=g[:, 2], time=t)
        return corridor_mod.plan_corridors(scn, pred, cfg.corridor, lane)

    cors = jax.vmap(one_cors)(scns, goals, times)
    cons = costs_mod.shrink_and_normalize(
        cors.planes, cors.plane_mask,
        cors.left_planes, cors.left_segs, cors.left_mask,
        cors.right_planes, cors.right_segs, cors.right_mask,
        cfg.ilqr, cfg.vehicle)

    res = solve_batch(goals, goals[:, 0], cons, cfg.ilqr, cfg.vehicle,
                      cfg.delta_t, warm_start=(goals, warm_us),
                      backend=backend)
    hits = jax.vmap(
        lambda s, x, t0: pipeline_mod._recheck_solution(s, x, cfg, spec,
                                                        t0=t0)
    )(scns, res.xs, t_new)
    near = pipeline_mod.NEAR_TERM_KNOTS
    pre_near = hits[:, :near].any(axis=1)
    no_rep = _no_repair_of(carry, pre_near.shape)
    if cfg.repair.enabled:
        # per-cycle repair: the repaired plan replaces both the cycle's
        # output AND the carry, so the next cycle warm-starts from the
        # safe trajectory (pipeline._repair_batch; skipped by lax.cond on
        # clean cycles). Lanes that already failed a full ladder are not
        # re-attempted (MpcCarry.no_repair — attempt-once-then-flag).
        res, hits, repaired, still_dirty = pipeline_mod._repair_batch(
            scns, res, hits, goals, goals[:, 0], cons, cfg, spec,
            t0=t_new, backend=backend, eligible=~no_rep)
        no_rep = no_rep | still_dirty
    else:
        repaired = jnp.zeros(pre_near.shape, bool)
        still_dirty = pre_near
    out = MpcStepOut(solve=res, corridor_ok=cors.ok.all(axis=-1),
                     lane_clipped=_lane_clipped_of(res),
                     near_hits=hits[:, :near].any(axis=1),
                     solve_hits=hits, pre_near_hits=pre_near,
                     repaired=repaired, still_dirty=still_dirty)
    return MpcCarry(xs=res.xs, us=res.us, cycle_time=t_new,
                    no_repair=no_rep), out


def run_mpc(scn: Scenario, start, cfg: PlannerConfig, n_cycles: int,
            grid=None, lane=None, spec=None):
    """Initial full plan + n_cycles warm-started replans. Returns the list
    of MpcStepOut (host loop; each cycle jitted); entry 0 wraps the initial
    plan with its own corridor validity."""
    if grid is None and cfg.dp.collision_mode == "grid":
        import numpy as np

        from .world import build_barrier_grid

        grid = build_barrier_grid(np.asarray(scn.barrier_xy), cfg.dp.grid_cell,
                                  half=cfg.vehicle.radius)
    if lane is None:
        lane = pipeline_mod.make_lane_tuple(scn.left_barrier_xy,
                                            scn.right_barrier_xy, cfg)

    out0 = pipeline_mod.plan(scn, start, cfg, grid, lane, spec=spec)
    carry = MpcCarry(xs=out0.solve.xs, us=out0.solve.us,
                     cycle_time=jnp.zeros((), out0.solve.xs.dtype))
    step = jax.jit(lambda c: mpc_step(scn, c, cfg, grid, lane, spec=spec))
    near0 = out0.solve_hits[:pipeline_mod.NEAR_TERM_KNOTS].any()
    results = [MpcStepOut(solve=out0.solve,
                          corridor_ok=out0.corridors.ok.all(),
                          lane_clipped=_lane_clipped_of(out0.solve),
                          near_hits=near0, solve_hits=out0.solve_hits,
                          pre_near_hits=out0.pre_hits[
                              :pipeline_mod.NEAR_TERM_KNOTS].any(),
                          repaired=out0.repaired,
                          still_dirty=out0.still_dirty)]
    for _ in range(n_cycles):
        carry, out = step(carry)
        results.append(out)
    return results


class MpcScanStats(NamedTuple):
    """Per-cycle stacked stats from the jitted MPC rollouts."""

    status: jnp.ndarray
    iters: jnp.ndarray
    cost: jnp.ndarray
    corridor_ok: jnp.ndarray
    lane_clipped: jnp.ndarray
    near_hits: jnp.ndarray       # post-repair (the executed gate)
    pre_near_hits: jnp.ndarray   # before the repair pass
    repaired: jnp.ndarray
    still_dirty: jnp.ndarray


def _scan_stats(out: MpcStepOut) -> MpcScanStats:
    return MpcScanStats(status=out.solve.status, iters=out.solve.iters,
                        cost=out.solve.cost.total,
                        corridor_ok=out.corridor_ok,
                        lane_clipped=out.lane_clipped,
                        near_hits=out.near_hits,
                        pre_near_hits=out.pre_near_hits,
                        repaired=out.repaired,
                        still_dirty=out.still_dirty)


def mpc_scan(scn: Scenario, carry: MpcCarry, cfg: PlannerConfig, grid, lane,
             n_cycles: int, spec=None):
    """Fully-jitted MPC rollout via lax.scan (for benchmarking): returns
    (final carry, MpcScanStats stacked over cycles)."""
    def body(c, _):
        c2, out = mpc_step(scn, c, cfg, grid, lane, spec=spec)
        return c2, _scan_stats(out)

    carry = carry._replace(no_repair=_no_repair_of(carry, ()))
    return jax.lax.scan(body, carry, None, length=n_cycles)


def mpc_scan_batch(scns: Scenario, carry: MpcCarry, cfg: PlannerConfig,
                   lane, n_cycles: int, backend: str = "blast", spec=None):
    """Fully-jitted BATCHED MPC rollout: n_cycles of mpc_step_batch.
    Returns (final carry, MpcScanStats with [C, B] leaves) — the
    BENCH_MODE=mpc workload. near_hits is the per-cycle executed-horizon
    safety gate AFTER the repair pass; pre_near_hits/repaired/still_dirty
    expose the repair loop's action so the bench reports the full safety
    story per (cycle, lane), not just convergence."""
    def body(c, _):
        c2, out = mpc_step_batch(scns, c, cfg, lane, backend=backend,
                                 spec=spec)
        return c2, _scan_stats(out)

    carry = carry._replace(
        no_repair=_no_repair_of(carry, carry.cycle_time.shape))
    return jax.lax.scan(body, carry, None, length=n_cycles)
