"""Full planning pipeline: DP coarse search -> safe corridors -> CILQR.

Replaces TrajectoryPlanner (/root/reference/algorithm/planner/
trajectory_planner.{h,cpp}) with a thin functional driver around jitted
stages. The returned PlanOutput mirrors everything the reference exposes
(coarse trajectory, corridors + polygons, lane boundaries, init guess,
optimized trajectory + per-stage success flags).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from . import corridor as corridor_mod
from . import costs as costs_mod
from . import dp as dp_mod
from . import solver as solver_mod
from .config import PlannerConfig
from .geometry import normalize_angle
from .types import CorridorSet, Scenario, SolveResult, Traj
from .world import BarrierGrid, build_barrier_grid


# knots of the re-checked "executed" horizon (2.5 s at delta_t=0.1): the
# measured far-tail residual-violation phenomenon starts at knot >= ~30 in
# both precisions (tests/test_pipeline_f32_gate.py, docs/PERF.md), so a
# clean [0, 25) prefix is the safety gate for the part of the plan a
# receding-horizon deployment can actually execute before replanning.
NEAR_TERM_KNOTS = 25


class PlanOutput(NamedTuple):
    coarse: Traj
    dp_ok: jnp.ndarray
    corridors: CorridorSet
    # the FINAL emitted solve result — for lanes the repair path replaced
    # (see `repaired`) this is the repair re-solve's output
    solve: SolveResult
    ok: jnp.ndarray  # dp_ok & all corridor knots ok
    # collision re-check of the FINAL emitted trajectory: per-knot [.., N]
    # bool — does the knot's two-disc probe hit an obstacle / road
    # barrier (world.check_optimization_collision at the knots' absolute
    # times)? The reference never re-checks its output
    # (trajectory_planner.cpp:91-94 only tests non-emptiness). Measured
    # behavior (tests/test_pipeline_f32_gate.py, docs/PERF.md): hits are
    # confined to the FAR tail (knot >= ~30) in both precisions — the
    # rel-cost stop legitimately leaves residual barrier violations 3+ s
    # out, replanned away before execution — while the EXECUTED near-term
    # horizon stays clean. Callers gate the horizon they actually
    # execute, e.g. solve_hits[..., :25].any().
    solve_hits: jnp.ndarray = None
    # the re-check of the ORIGINAL solve, before the repair pass — the
    # characterized rel-cost-stop graze phenomenon gate F pins. Equal to
    # solve_hits when repair is disabled or nothing was dirty.
    pre_hits: jnp.ndarray = None
    # [..] bool: lane was near-term dirty, the repair re-solve (tightened
    # constraints, warm-started — RepairConfig) converged and its output
    # re-checks CLEAN; solve/solve_hits hold the repaired plan
    repaired: jnp.ndarray = None
    # [..] bool: lane's FINAL near-term horizon still re-checks dirty
    # (repair disabled, repair failed to clear it, or the dirty count
    # overflowed the static repair width) — the caller must not execute
    # this lane's plan without its own mitigation
    still_dirty: jnp.ndarray = None


def coarse_to_states(traj: Traj) -> jnp.ndarray:
    """Coarse trajectory -> [N, 6] goal states (TransformGoals input,
    ilqr_optimizer.cc:147-149)."""
    return jnp.stack([traj.x, traj.y, traj.theta, traj.velocity, traj.a,
                      traj.delta], axis=-1)


def traj_from_solution(xs, us, dt, wheel_base) -> Traj:
    """TransformToTrajectory + final resampling (ilqr_optimizer.cc:771-791,
    trajectory_planner.cpp:100-125): kappa = tan(delta)/L, accumulated s."""
    n = xs.shape[0]
    t = dt * jnp.arange(n, dtype=xs.dtype)
    seg = jnp.hypot(jnp.diff(xs[:, 0]), jnp.diff(xs[:, 1]))
    s = jnp.concatenate([jnp.zeros((1,), xs.dtype), jnp.cumsum(seg)])
    us_full = jnp.concatenate([us, jnp.zeros((1, 2), us.dtype)], axis=0)
    return Traj(
        time=t, s=s, x=xs[:, 0], y=xs[:, 1], theta=xs[:, 2],
        kappa=jnp.tan(xs[:, 5]) / wheel_base, velocity=xs[:, 3],
        left_bound=jnp.zeros_like(t), right_bound=jnp.zeros_like(t),
        a=xs[:, 4], jerk=us_full[:, 0], delta=xs[:, 5],
        delta_rate=us_full[:, 1])


def make_lane_tuple(scn_left_barrier, scn_right_barrier, cfg: PlannerConfig,
                    dtype=np.float64):
    """Host-side lane-constraint precompute (per road, shared across the
    batch)."""
    return corridor_mod.lane_constraints(
        np.asarray(scn_left_barrier), np.asarray(scn_right_barrier),
        cfg.corridor, dtype)


def _recheck_solution(scn: Scenario, xs, cfg: PlannerConfig, spec, t0=0.0):
    """Per-knot collision mask of one optimized trajectory (PlanOutput.
    solve_hits): two-disc probe at each knot's absolute time, finite
    road-spec barrier test when the spec is known, brute-force exact
    otherwise. ~81 probes — noise next to the solve. t0 is the absolute
    time of knot 0 (nonzero in the MPC loop, where dynamic obstacles have
    advanced by the cycle count)."""
    from . import world

    n = xs.shape[0]
    times = t0 + cfg.delta_t * jnp.arange(n, dtype=xs.dtype)
    # knot times are fixed: resolve the dynamic obstacles once per
    # scenario instead of per-(knot, obstacle) track gathers (the same
    # hoist the DP probe sweep uses — per-element gathers are the poison)
    dyn = world.dyn_polys_at(scn, times)
    return world.check_optimization_collision(
        scn, None, xs[:, 0], xs[:, 1], xs[:, 2], cfg.vehicle.radius,
        cfg.vehicle.r2x, cfg.vehicle.f2x, collision_buffer=0.0, grid=None,
        mode="frenet" if spec is not None else "exact", road_spec=spec,
        dyn_polys=dyn)


def _init_guess_warm_start(cfg: PlannerConfig, start_state, coarse: Traj):
    """IlqrConfig.init_guess wiring — the reference's source-edit switch
    between the backward-LQR iqr() init and the Tracker simulation
    (ilqr_optimizer.cc:107-139,168-169). Returns a solver warm_start
    (xs, us) for 'tracker', or None for 'iqr' (the solver then runs
    iqr_init itself). start_state may be batched [..., 6]."""
    if cfg.ilqr.init_guess == "iqr":
        return None
    if cfg.ilqr.init_guess != "tracker":
        raise ValueError(f"unknown init_guess {cfg.ilqr.init_guess!r}")
    from . import tracker as tracker_mod

    f = lambda st, tr: tracker_mod.plan(st, tr, cfg.tracker, cfg.vehicle)
    if start_state.ndim == 2:
        return jax.vmap(f)(start_state, coarse)
    return f(start_state, coarse)


def _success(status):
    from .types import SolverStatus

    return ((status == SolverStatus.SUCCESS_GNORM) |
            (status == SolverStatus.SUCCESS_ABS_COST) |
            (status == SolverStatus.SUCCESS_REL_COST))


def brake_goals(goals, gamma):
    """Re-time a goal trajectory to ``gamma`` of its speed along the SAME
    path (the repair brake round, RepairConfig.brake_factor): the new
    knot k sits at arc length gamma * s_k of the original xy polyline
    (same start point), with velocities scaled by gamma and
    accelerations by gamma^2 (kinematic re-timing). goals [N, 6] ->
    [N, 6]."""
    N = goals.shape[0]
    dtype = goals.dtype
    seg = jnp.hypot(jnp.diff(goals[:, 0]), jnp.diff(goals[:, 1]))
    s = jnp.concatenate([jnp.zeros((1,), dtype), jnp.cumsum(seg)])
    s2 = gamma * s
    idx = jnp.clip(jnp.searchsorted(s, s2, side="right") - 1, 0, N - 2)
    ds = jnp.maximum(s[idx + 1] - s[idx], 1e-9)
    t = jnp.clip((s2 - s[idx]) / ds, 0.0, 1.0)

    def lerp(col):
        return col[idx] * (1.0 - t) + col[idx + 1] * t

    x = lerp(goals[:, 0])
    y = lerp(goals[:, 1])
    th = goals[idx, 2] + t * normalize_angle(goals[idx + 1, 2]
                                             - goals[idx, 2])
    v = gamma * lerp(goals[:, 3])
    a = (gamma * gamma) * lerp(goals[:, 4])
    delta = lerp(goals[:, 5])
    return jnp.stack([x, y, th, v, a, delta], axis=-1)


def _repair_rounds(rep):
    """(margin, warm, gamma) per repair round: the escalating margin
    rounds, then the brake round when enabled."""
    rounds = [(m, rnd < rep.cold_restart_from, 1.0)
              for rnd, m in enumerate(rep.margins)]
    if rep.brake_factor and rep.brake_factor < 1.0 and rep.margins:
        rounds.append((rep.margins[0], False, float(rep.brake_factor)))
    return rounds


def _repair_ilqr_cfg(cfg: PlannerConfig, warm: bool):
    """Solver config for a repair round: cold rounds tighten the stop
    tolerances to RepairConfig.cold_tol — the tightened problem's total
    cost is barrier-dominated, so the production rel-cost stop fires
    while the iterate is still mid-descent (RepairConfig.cold_tol
    notes)."""
    import dataclasses

    if warm:
        return cfg.ilqr
    return dataclasses.replace(cfg.ilqr, rel_cost_tol=cfg.repair.cold_tol,
                               abs_cost_tol=cfg.repair.cold_tol,
                               max_iter_num=cfg.repair.cold_max_iter)


def repair_width(B: int, max_fraction: float) -> int:
    """Static width of the repair sub-batch (jit needs static shapes).
    Floors at one Pallas sweep block on block-aligned batches so the
    repair solve keeps the fused sweep kernel."""
    if B <= 16:
        return B
    w = max(8, int(B * max_fraction))
    if B % 128 == 0:
        w = max(128, -(-w // 128) * 128)
    return min(B, w)


def _repair_batch(scns: Scenario, res: SolveResult, hits, goals_b, starts6,
                  cons, cfg: PlannerConfig, spec, t0=None,
                  backend: str = "blast", eligible=None):
    """Close the safety loop on a batch: gather the near-term-dirty lanes,
    re-solve them warm-started against constraints tightened by
    RepairConfig.margins (escalating rounds), re-check, and replace each
    original lane
    only when its repaired plan re-checks CLEAN and the repair solve
    converged. Returns (final SolveResult, final hits, repaired mask,
    still_dirty mask).

    Reference contrast: the reference cannot act on (or even see) these
    residuals — ilqr_optimizer.cc:302-307 emits the trajectory on
    lambda-overflow and planning_node.cc:82-112 executes it unchecked.

    t0: per-lane absolute time of knot 0 for the re-check (MPC cycles);
    None = 0 (one-shot pipeline).

    eligible: optional [B] bool — lanes the ladder may attempt. The MPC
    loop passes ~carry.no_repair so a lane that already failed a full
    ladder is not re-attempted every cycle (it stays FLAGGED still_dirty
    each cycle, but the resistant ~0.9% would otherwise re-run the cold
    round's full iteration budget per cycle for nothing — measured -40%
    MPC throughput)."""
    from .batch import solve_batch
    from .costs import tighten_constraints

    rep = cfg.repair
    B = goals_b.shape[0]
    near = NEAR_TERM_KNOTS
    R = repair_width(B, rep.max_fraction)

    def recheck_rows(scns_g, xs_g, t0_g):
        if t0_g is None:
            return jax.vmap(
                lambda s, x: _recheck_solution(s, x, cfg, spec))(scns_g,
                                                                 xs_g)
        return jax.vmap(
            lambda s, x, t: _recheck_solution(s, x, cfg, spec, t0=t))(
                scns_g, xs_g, t0_g)

    el = (jnp.ones(goals_b.shape[0], bool) if eligible is None
          else eligible)

    def one_round(state, margin, warm, gamma=1.0):
        res, hits, repaired = state
        dirty = hits[..., :near].any(-1) & el
        # dirty lanes first (stable sort keeps index order) — the same
        # row-gather pattern the compaction cascade uses
        # (solver_blast.solve_batch_compact). The static width R is
        # padded with CYCLIC COPIES of the dirty lanes, not with clean
        # lanes: a clean padding lane would run the full repair solve
        # (the cold rounds re-solve from scratch at tight tolerance —
        # measured ~50-100 iterations each) for an output that is then
        # discarded, while a duplicated dirty lane solves the identical
        # problem to the identical result (scatter of equal values), so
        # the lockstep cost is set by the slowest DIRTY lane only.
        order = jnp.argsort(~dirty)
        n_dirty = jnp.maximum(dirty.sum(), 1)
        idx = order[jnp.arange(R) % n_dirty]
        sel_dirty = dirty[idx]                       # [R]
        g_cons = tighten_constraints(
            jax.tree.map(lambda a: a[idx], cons), margin)
        ws = (res.xs[idx], res.us[idx]) if warm else None
        g_goals = goals_b[idx]
        if gamma < 1.0:
            g_goals = jax.vmap(lambda g: brake_goals(g, gamma))(g_goals)
        res_r = solve_batch(g_goals, starts6[idx], g_cons,
                            _repair_ilqr_cfg(cfg, warm), cfg.vehicle,
                            cfg.delta_t, warm_start=ws, backend=backend)
        g_scns = jax.tree.map(lambda a: a[idx], scns)
        t0_g = None if t0 is None else t0[idx]
        hits_r = recheck_rows(g_scns, res_r.xs, t0_g)
        clean_r = ~hits_r[..., :near].any(-1)
        use = sel_dirty & clean_r & _success(res_r.status)   # [R]
        # re-evaluate the repaired trajectory's cost breakdown under the
        # PRODUCTION constraints: the repair solve's own cost is measured
        # against the tightened problem (barrier-dominated, a different
        # scale), which would make aggregate cost stats incomparable
        # across lanes
        from .costs import total_cost
        from .solver import transform_goals

        goals_t = jax.vmap(transform_goals)(goals_b[idx], starts6[idx])
        cost_orig = jax.vmap(
            lambda x, u, g, c: total_cost(x, u, g, c, cfg.ilqr,
                                          cfg.vehicle))(
            res_r.xs, res_r.us, goals_t,
            jax.tree.map(lambda a: a[idx], cons))
        res_r = res_r.replace(cost=cost_orig)

        def put(full, part):
            u = use.reshape((R,) + (1,) * (part.ndim - 1))
            return full.at[idx].set(jnp.where(u, part, full[idx]))

        return (jax.tree.map(put, res, res_r), put(hits, hits_r),
                repaired | jnp.zeros((B,), bool).at[idx].set(use))

    state = (res, hits, jnp.zeros((B,), bool))
    for margin, warm, gamma in _repair_rounds(rep):
        # escalation: round 0 warm-starts from the dirty iterate at the
        # small margin; later rounds COLD-restart (iqr init) at the
        # larger margins to escape bad basins, and the final brake round
        # re-times the goals to gamma of their speed (RepairConfig).
        # Each round is skipped entirely when no lane is dirty (lax.cond
        # executes one branch — clean batches / clean MPC cycles pay
        # nothing).
        state = jax.lax.cond(
            (state[1][..., :near].any(-1) & el).any(),
            lambda s, m=margin, w=warm, g=gamma: one_round(s, m, w, g),
            lambda s: s, state)
    res, hits, repaired = state
    still_dirty = hits[..., :near].any(-1)
    return res, hits, repaired, still_dirty


def _repair_single(scn: Scenario, res: SolveResult, hits, goals,
                   start_state, cons, cfg: PlannerConfig, spec, t0=0.0,
                   eligible=None):
    """Single-lane repair (the un-batched analog of _repair_batch): one
    lax.cond — the tightened warm-started re-solve only executes when the
    near-term re-check fired. Returns (res, hits, repaired)."""
    near = NEAR_TERM_KNOTS
    el = jnp.ones((), bool) if eligible is None else eligible
    state = (res, hits, jnp.zeros((), bool))
    for margin, warm, gamma in _repair_rounds(cfg.repair):
        cons_r = costs_mod.tighten_constraints(cons, margin)

        def do_repair(rh, cons_r=cons_r, warm=warm, gamma=gamma):
            res0, hits0, rep0 = rh
            ws = (res0.xs, res0.us) if warm else None
            g_goals = goals if gamma >= 1.0 else brake_goals(goals, gamma)
            res_r = solver_mod.solve(g_goals, start_state, cons_r,
                                     _repair_ilqr_cfg(cfg, warm),
                                     cfg.vehicle, cfg.delta_t,
                                     warm_start=ws)
            hits_r = _recheck_solution(scn, res_r.xs, cfg, spec, t0=t0)
            clean = (~hits_r[:near].any()) & _success(res_r.status)
            # production-scale cost of the repaired trajectory (see the
            # batched path's note)
            from .costs import total_cost
            from .solver import transform_goals as _tg

            res_r = res_r.replace(cost=total_cost(
                res_r.xs, res_r.us, _tg(goals, start_state), cons,
                cfg.ilqr, cfg.vehicle))
            res1 = jax.tree.map(lambda a, b: jnp.where(clean, a, b),
                                res_r, res0)
            return res1, jnp.where(clean, hits_r, hits0), rep0 | clean

        state = jax.lax.cond(state[1][:near].any() & el, do_repair,
                             lambda s: s, state)
    return state


def plan(scn: Scenario, start, cfg: PlannerConfig,
         grid: BarrierGrid | None = None, lane=None,
         spec=None) -> PlanOutput:
    """TrajectoryPlanner::Plan (trajectory_planner.cpp:28-162).

    start: (x, y, theta, v) — the reference's fixed StartState is
    (0, 0, 0, 10) (planning_node.cc:24-27). grid/lane are host-precomputed
    per road; built on the fly if omitted (not jit-compatible then).

    spec: optional scenario.RoadSpec — gather-free DP station evaluation
    plus the finite-extent frenet barrier test (see dp.plan). Pass it
    whenever the road recipe is known: the spec-less frenet fallback is
    qualified on the default road family only.
    """
    if grid is None and cfg.dp.collision_mode == "grid":
        grid = build_barrier_grid(np.asarray(scn.barrier_xy), cfg.dp.grid_cell,
                                  half=cfg.vehicle.radius)
    if lane is None:
        lane = make_lane_tuple(scn.left_barrier_xy, scn.right_barrier_xy, cfg)

    sx, sy, sth, sv = start
    dp_res = dp_mod.plan(scn, sx, sy, sth, cfg, grid, spec=spec)
    cors = corridor_mod.plan_corridors(scn, dp_res.traj, cfg.corridor, lane)

    cons = costs_mod.shrink_and_normalize(
        cors.planes, cors.plane_mask,
        cors.left_planes, cors.left_segs, cors.left_mask,
        cors.right_planes, cors.right_segs, cors.right_mask,
        cfg.ilqr, cfg.vehicle)

    goals = coarse_to_states(dp_res.traj)
    dtype = goals.dtype
    start_state = jnp.asarray([sx, sy, sth, sv, 0.0, 0.0], dtype)
    warm = _init_guess_warm_start(cfg, start_state, dp_res.traj)
    res = solver_mod.solve(goals, start_state, cons, cfg.ilqr, cfg.vehicle,
                           cfg.delta_t, warm_start=warm)
    ok = dp_res.ok & cors.ok.all()
    hits = _recheck_solution(scn, res.xs, cfg, spec)
    pre_hits = hits
    if cfg.repair.enabled:
        res, hits, repaired = _repair_single(scn, res, hits, goals,
                                             start_state, cons, cfg, spec)
    else:
        repaired = jnp.zeros((), bool)
    return PlanOutput(coarse=dp_res.traj, dp_ok=dp_res.ok, corridors=cors,
                      solve=res, ok=ok, solve_hits=hits, pre_hits=pre_hits,
                      repaired=repaired,
                      still_dirty=hits[:NEAR_TERM_KNOTS].any())


def plan_batch(scns: Scenario, starts, cfg: PlannerConfig, grid, lane,
               backend: str = "blast", spec=None) -> PlanOutput:
    """Batched full pipeline on device: vmapped DP -> vmapped corridors ->
    constraint prep -> batched CILQR solve.

    Unlike ``jax.vmap(plan)``, the solve stage goes through
    ``batch.solve_batch`` so the fast batch-last (blast) solver with
    converged-lane compaction carries the batch, not the vmapped
    single-problem solver. This is the replan step the full-pipeline
    benchmark times (the reference's per-cycle DP -> corridor -> iLQR
    sequence, trajectory_planner.cpp:28-94).

    scns:   Scenario pytree with leading batch axis [B] (shared road).
    starts: [B, 4] (x, y, theta, v) start states.
    grid/lane: host-precomputed per road (shared across the batch).
    spec:   optional scenario.RoadSpec (shared road) — gather-free DP
            station evaluation (see dp.plan).
    """
    from .batch import solve_batch

    def dp_one(scn, st):
        return dp_mod.plan(scn, st[0], st[1], st[2], cfg, grid, spec=spec)

    dp_res = jax.vmap(dp_one)(scns, starts)

    cors = jax.vmap(
        lambda scn, tr: corridor_mod.plan_corridors(scn, tr, cfg.corridor,
                                                    lane))(scns, dp_res.traj)

    cons = costs_mod.shrink_and_normalize(
        cors.planes, cors.plane_mask,
        cors.left_planes, cors.left_segs, cors.left_mask,
        cors.right_planes, cors.right_segs, cors.right_mask,
        cfg.ilqr, cfg.vehicle)

    goals = coarse_to_states(dp_res.traj)                     # [B, N, 6]
    dtype = goals.dtype
    zeros = jnp.zeros(starts.shape[:-1] + (2,), dtype)
    start_state = jnp.concatenate([starts.astype(dtype), zeros], axis=-1)
    warm = _init_guess_warm_start(cfg, start_state, dp_res.traj)
    res = solve_batch(goals, start_state, cons, cfg.ilqr, cfg.vehicle,
                      cfg.delta_t, backend=backend, warm_start=warm)
    ok = dp_res.ok & cors.ok.all(axis=-1)
    hits = jax.vmap(lambda s, x: _recheck_solution(s, x, cfg, spec))(
        scns, res.xs)
    pre_hits = hits
    B = goals.shape[0]
    if cfg.repair.enabled:
        res, hits, repaired, still_dirty = _repair_batch(
            scns, res, hits, goals, start_state, cons, cfg, spec,
            backend=backend)
    else:
        repaired = jnp.zeros((B,), bool)
        still_dirty = hits[..., :NEAR_TERM_KNOTS].any(-1)
    return PlanOutput(coarse=dp_res.traj, dp_ok=dp_res.ok, corridors=cors,
                      solve=res, ok=ok, solve_hits=hits, pre_hits=pre_hits,
                      repaired=repaired, still_dirty=still_dirty)


def plan_jit(cfg: PlannerConfig, spec=None):
    """A jit-compiled planner closure over static config. grid/lane must be
    passed explicitly (device arrays / pytrees)."""
    def _plan(scn, start, grid, lane):
        return plan(scn, start, cfg, grid, lane, spec=spec)

    return jax.jit(_plan)
