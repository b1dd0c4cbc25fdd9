"""Spatio-temporal DP coarse planner.

TPU-native re-design of DpPlanner (/root/reference/algorithm/planner/
dp_planner.{h,cpp}): the NT=5 x NS=7 x NL=10 grid search becomes, per layer
transition, one fully vectorized [70 parents x 70 children x 16
interpolation points] cost tensor (collision probes batched through
world.py), followed by an argmin reduce that keeps parent indices. The
per-0.1s interpolation to 81 Cartesian knots and the finite-difference
profile replicate dp_planner.cpp:214-276.

The DP is deliberately non-Markov exactly like the reference: a
transition's cost depends on the parent cell's accumulated continuous
station and on the *grandparent* through stored parent indices
(dp_planner.cpp:39-54,87-103), so each layer update gathers from the two
previous layers' winning cells.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import DpConfig, PlannerConfig
from .reference_line import (DP_FIELDS, compute_path_profile,
                             evaluate_station_fields,
                             evaluate_station_fields_analytic,
                             get_projection, pack_station_rows)
from .types import Scenario, Traj
from .world import (BarrierGrid, check_optimization_collision, dilate_polys,
                    dyn_polys_at)

K_EPS_LOCAL = 1e-3   # dp_planner.cpp:29 (file-local kMathEpsilon)


class DpResult(NamedTuple):
    traj: Traj            # 81-knot coarse trajectory
    ok: jnp.ndarray       # scalar bool: min_cost < w_obstacle
    min_cost: jnp.ndarray
    sel_s: jnp.ndarray    # [NT] winning station indices (traceback)
    sel_l: jnp.ndarray    # [NT] winning lateral indices


def _lateral_offset(cl: Traj, s, l_ind, safe_margin, nl, packed=None):
    """GetLateralOffset (dp_planner.h:84-92): l_ind == NL-1 -> centerline;
    else lb + (ub-lb) * linspace(0,1,NL-1)[l_ind]."""
    ref = evaluate_station_fields(cl, s, ("left_bound", "right_bound"),
                                  packed=packed)
    lb = -ref["right_bound"] + safe_margin
    ub = ref["left_bound"] - safe_margin
    frac = l_ind.astype(s.dtype) / (nl - 2)
    off = lb + (ub - lb) * frac
    return jnp.where(l_ind == nl - 1, jnp.zeros_like(off), off)


def _interp_sl(parent_s, parent_l, station, cur_l, nseg):
    """InterpolateLinearly (dp_planner.cpp:283-320): nseg points from the
    parent (exclusive of the child endpoint). Returns (s [nseg], l [nseg])."""
    i = jnp.arange(nseg, dtype=parent_s.dtype)
    s_step = station / nseg
    l_step = (cur_l - parent_l) / nseg
    s = parent_s[..., None] + i * s_step[..., None]
    l = parent_l[..., None] + i * l_step[..., None]
    return s, l


def _segment_cost(cl: Traj, scn: Scenario, grid, cfg: PlannerConfig,
                  s_pts, l_pts, last_s, last_l, dyn_polys, nseg,
                  safe_margin, ref=None, dilated=None, spec=None):
    """Collision/bounds sweep over one interpolated (s,l) segment
    (GetCollisionCost, dp_planner.cpp:39-85). All arguments batched over
    leading dims; s_pts/l_pts have a trailing [nseg] axis.

    ref: optional precomputed evaluate_station_fields(cl, s_pts) dict
    whose entries broadcast against s_pts — the layer sweep passes fields
    deduplicated over the NL child laterals (probe STATIONS depend only
    on (parent, station index m, interp index i), so evaluating per child
    lateral would redo every table lookup NL=10 times).

    dyn_polys: (polys [nseg, KD, 4, 2], active [nseg, KD]) — the dynamic
    obstacles pre-resolved at the layer's nseg probe times (they are
    FIXED per layer; see plan()). This keeps the per-probe work pure
    elementwise: one station searchsorted + 6 interpolated fields
    (evaluate_station_fields serves both the Cartesian conversion and the
    bounds/heading lookup — the reference calls GetCartesian and
    EvaluateStation separately on the same station, dp_planner.cpp:61-77),
    SAT against broadcast polygons, and the barrier-grid count.

    Returns the obstacle cost (0 or w_obstacle)."""
    dp = cfg.dp
    veh = cfg.vehicle

    prev_s = jnp.concatenate([last_s[..., None], s_pts[..., :-1]], axis=-1)
    prev_l = jnp.concatenate([last_l[..., None], l_pts[..., :-1]], axis=-1)
    dl = l_pts - prev_l
    ds = jnp.maximum(s_pts - prev_s, K_EPS_LOCAL)

    if ref is None:
        ref = evaluate_station_fields(cl, s_pts)
    cx = ref["x"] - l_pts * jnp.sin(ref["theta"])
    cy = ref["y"] + l_pts * jnp.cos(ref["theta"])
    lb = jnp.minimum(0.0, -ref["right_bound"] + safe_margin)
    ub = jnp.maximum(0.0, ref["left_bound"] - safe_margin)
    off_road = (l_pts < lb - K_EPS_LOCAL) | (l_pts > ub + K_EPS_LOCAL)

    heading = ref["theta"] + jnp.arctan(
        (dl / ds) / (1.0 - ref["kappa"] * l_pts))

    frenet = None
    if dp.collision_mode == "frenet" and spec is None:
        # zero-gather barrier membership from fields already evaluated at
        # the probe stations (see world.barrier_hit_frenet); entries
        # broadcast over the NL child laterals exactly like ref. With a
        # RoadSpec the finite-extent test is used instead (safe on
        # tight-arc roads; see world.barrier_hit_road_spec).
        frenet = (ref["x"], ref["y"], ref["theta"], ref["kappa"],
                  ref["left_bound"], ref["right_bound"])
    collide = check_optimization_collision(
        scn, None, cx, cy, heading, veh.radius, veh.r2x, veh.f2x,
        collision_buffer=0.0, grid=grid, mode=dp.collision_mode,
        dyn_polys=dyn_polys, dilated=dilated, frenet=frenet,
        road_spec=spec if dp.collision_mode == "frenet" else None)

    any_bad = (off_road | collide).any(axis=-1)
    return jnp.where(any_bad, dp.w_obstacle, 0.0)


def plan(scn: Scenario, start_x, start_y, start_theta,
         cfg: PlannerConfig, grid: BarrierGrid | None = None,
         spec=None) -> DpResult:
    """DpPlanner::Plan (dp_planner.cpp:135-281).

    spec: optional scenario.RoadSpec — when given, every station-field
    lookup inside the DECISION path (probe sweep, lateral offsets,
    transition costs) evaluates the centerline closed-form instead of
    gathering table rows (evaluate_station_fields_analytic; the packed-row
    gathers were the DP stage's dominant cost on TPU), and frenet-mode
    road-barrier probes use the finite-extent per-segment test
    (world.barrier_hit_road_spec — conservative-complete on every road
    family, unlike the spec-less station-field stand-in, which is unsafe
    on tight-arc roads). The traceback / 81-knot output interpolation
    stays on the table, so whenever the winning cells agree the output
    trajectory is bit-identical to exact mode's. Qualified over 16 seeds
    x {f64, f32} x two road families in tests/test_dp_qualification.py."""
    dp = cfg.dp
    NT, NS, NL = dp.nt, dp.ns, dp.nl
    cl = scn.centerline
    dtype = cl.s.dtype
    unit_time = cfg.tf / NT
    times = unit_time + (cfg.tf - unit_time) * jnp.arange(NT, dtype=dtype) / (NT - 1)
    station = (unit_time * cfg.vehicle.max_velocity) * jnp.arange(NS, dtype=dtype) / (NS - 1)
    safe_margin = cfg.vehicle.width / 2 * 1.5  # dp_planner.cpp:36

    s0, l0, _ = get_projection(cl, jnp.asarray(start_x, dtype),
                               jnp.asarray(start_y, dtype))

    # once-per-plan precomputes: packed station rows (2 row gathers per
    # probe station instead of 14 scalar gathers) and the static obstacles
    # dilated by the probe half-size (4 half-plane tests per probe instead
    # of a SAT tensor) — see pack_station_rows / DilatedPolys
    packed = pack_station_rows(cl)
    sd = dilate_polys(scn.static_obs, scn.static_mask[:, None],
                      cfg.vehicle.radius, rect=True)

    l_inds = jnp.arange(NL)

    if spec is not None:
        # the spec must describe THIS scenario's road: a mismatched spec
        # (different road / resolution) silently yields wrong DP decisions.
        # Static check always; value spot-check when inputs are concrete
        # (skipped under jit tracing, where the same arrays were validated
        # eagerly at least once by any non-jit caller or test).
        if int(spec.n) != int(cl.s.shape[0]):
            raise ValueError(
                f"RoadSpec.n={int(spec.n)} != centerline rows "
                f"{int(cl.s.shape[0])}: spec built for a different road")
        if not isinstance(cl.x, jax.core.Tracer):
            probe_s = jnp.asarray(
                np.linspace(0.0, float(cl.s[-1]), 7)[1:-1], dtype)
            ref_a = evaluate_station_fields_analytic(spec, probe_s, ("x", "y"))
            ref_t = evaluate_station_fields(cl, probe_s, ("x", "y"),
                                            packed=packed)
            err = max(float(jnp.abs(ref_a["x"] - ref_t["x"]).max()),
                      float(jnp.abs(ref_a["y"] - ref_t["y"]).max()))
            if err > 1e-3:
                raise ValueError(
                    f"RoadSpec disagrees with scenario centerline by "
                    f"{err:.3g} m at spot stations: spec/road mismatch")

        def eval_f(sv, fields=DP_FIELDS):
            return evaluate_station_fields_analytic(spec, sv, fields)
    else:
        def eval_f(sv, fields=DP_FIELDS):
            return evaluate_station_fields(cl, sv, fields, packed=packed)

    def lat_off(s, li):
        # _lateral_offset through eval_f (elementwise, no vmap needed)
        ref = eval_f(s, ("left_bound", "right_bound"))
        lb = -ref["right_bound"] + safe_margin
        ub = ref["left_bound"] - safe_margin
        frac = li.astype(s.dtype) / (NL - 2)
        off = lb + (ub - lb) * frac
        return jnp.where(li == NL - 1, jnp.zeros_like(off), off)

    def offsets(svals):
        """[...,] stations -> [..., NL] lateral offsets. One table lookup
        per station for ALL NL laterals (same ops as _lateral_offset
        broadcast over the lateral index)."""
        ref = eval_f(svals, ("left_bound", "right_bound"))
        lb = -ref["right_bound"] + safe_margin
        ub = ref["left_bound"] - safe_margin
        frac = l_inds.astype(svals.dtype) / (NL - 2)
        off = lb[..., None] + (ub - lb)[..., None] * frac
        return jnp.where(l_inds == NL - 1, jnp.zeros_like(off), off)

    # ---- first layer (dp_planner.cpp:153-159): parent = start pseudo-cell
    nseg0 = 17  # dp_planner.cpp:288-292 with t_ind 0
    cur_s_l0 = s0 + station                       # [NS]
    cur_l_l0 = offsets(cur_s_l0)                  # [NS, NL]
    ps = jnp.broadcast_to(s0, (NS, NL))
    pl = jnp.broadcast_to(l0, (NS, NL))
    s_pts, l_pts = _interp_sl(ps, pl, jnp.broadcast_to(station[:, None], (NS, NL)),
                              cur_l_l0, nseg0)    # [NS, NL, 17]
    # probe times are FIXED per layer (t0 + i*unit/nseg with a constant
    # t0), so the dynamic obstacles resolve once per layer instead of per
    # probe (world.dyn_polys_at) — same arithmetic, same lookups
    tv0 = jnp.arange(nseg0, dtype=dtype) * (unit_time / nseg0)
    s_dd0, _ = _interp_sl(ps[:, :1], pl[:, :1],
                          jnp.broadcast_to(station[:, None], (NS, 1)),
                          cur_l_l0[:, :1], nseg0)
    ref0 = eval_f(s_dd0)  # [NS, 1, 17]
    dyn0 = dyn_polys_at(scn, tv0)
    obst0 = _segment_cost(cl, scn, grid, cfg, s_pts, l_pts,
                          ps, pl, None, nseg0, safe_margin, ref=ref0,
                          dilated=(sd, dilate_polys(
                              dyn0[0], dyn0[1][..., None],
                              cfg.vehicle.radius, rect=True)), spec=spec)

    cur_l = cur_l_l0                               # [NS, NL]
    ds1 = jnp.broadcast_to(station[:, None], (NS, NL))
    dl1 = cur_l - l0
    cost_lat = jnp.abs(cur_l)
    cost_lat_chg = jnp.abs(l0 - cur_l) / (ds1 + K_EPS_LOCAL)
    cost_lat_chg_t = jnp.abs(dl1 - 0.0) / unit_time
    cost_v = jnp.abs(ds1 / unit_time - dp.nominal_velocity)
    cost_v_chg = jnp.abs(ds1 - 0.0) / unit_time
    delta0 = (dp.w_lateral * cost_lat + dp.w_lateral_change * cost_lat_chg +
              dp.w_lateral_velocity_change * cost_lat_chg_t +
              dp.w_longitudinal_velocity_bias * cost_v +
              dp.w_longitudinal_velocity_change * cost_v_chg)
    layer_cost = jnp.where(obst0 >= dp.w_obstacle, dp.w_obstacle, delta0)

    # state per layer
    costs = [layer_cost]                                  # [NS, NL]
    cur_ss = [jnp.broadcast_to(cur_s_l0[:, None], (NS, NL))]
    parent_s_inds = [jnp.full((NS, NL), -1, jnp.int32)]
    parent_l_inds = [jnp.full((NS, NL), -1, jnp.int32)]

    nseg = 16  # layers >= 1 (dp_planner.cpp:293-296)

    for t in range(NT - 1):
        # parents: layer t cells, flattened P = NS*NL
        p_cost = costs[t].reshape(-1)                     # [P]
        p_s = cur_ss[t].reshape(-1)                       # [P]
        p_sind = parent_s_inds[t].reshape(-1)
        p_lind = parent_l_inds[t].reshape(-1)
        p_l_ind_self = jnp.tile(jnp.arange(NL), NS)       # cell's own l index
        p_l = lat_off(p_s, p_l_ind_self)

        # grandparents (dp_planner.cpp:42-53,92-103)
        if t == 0:
            gp_s = jnp.broadcast_to(s0, p_s.shape)
            gp_l = jnp.broadcast_to(l0, p_s.shape)
            gp_lind = jnp.full(p_s.shape, -1, jnp.int32)
        else:
            # one-hot select instead of a per-cell 2-D gather: small
            # dynamic-index gathers under vmap dominated the layer update
            # on TPU (~48 ms/layer measured with ALL probe math stubbed);
            # a [P, P] compare + masked reduce is pure vector work
            prev_flat = cur_ss[t - 1].reshape(-1)         # [P]
            gflat = jnp.clip(p_sind, 0) * NL + jnp.clip(p_lind, 0)  # [P]
            goh = gflat[:, None] == jnp.arange(NS * NL)[None, :]
            gp_s = jnp.sum(jnp.where(goh, prev_flat[None, :], 0.0), axis=1)
            gp_l = lat_off(gp_s, p_lind)
            gp_lind = p_lind

        # prev segment's last point (GetCollisionCost:51-53): interpolate
        # grandparent -> parent and take the final sample. Layer-0 parents'
        # segments have 17 samples (dp_planner.cpp:288-296).
        p_own_sind = jnp.repeat(jnp.arange(NS), NL)
        st = station[p_own_sind]
        sp, lp = _interp_sl(gp_s, gp_l, st, p_l, 17 if t == 0 else nseg)
        last_s = sp[..., -1]
        last_l = lp[..., -1]

        # children: all (m, n), flattened C = NS*NL (m-major)
        P = NS * NL
        Cn = NS * NL
        c_station = jnp.repeat(station, NL)               # [C] station of child m
        cur_s_c = p_s[:, None] + c_station[None, :]       # [P, C]
        # child laterals deduplicated over n: child stations take only NS
        # distinct values per parent, and offsets() yields all NL laterals
        # per station — [P, NS, NL] reshaped m-major IS cur_l per child
        # (identical values to evaluating per child, 10x fewer lookups)
        cur_s_m = p_s[:, None] + station[None, :]         # [P, NS]
        cur_l_c = offsets(cur_s_m.reshape(-1)).reshape(P, Cn)

        # Collision sweep over [P, C, nseg] probes. Materializing all of it
        # at once costs GBs of padded HBM temps under a scenario batch
        # (each probe expands into per-obstacle SAT tensors), so process
        # parents in chunks via lax.map (dp.parent_chunk controls the
        # memory/parallelism trade-off).
        st_pc = jnp.broadcast_to(c_station[None, :], (P, Cn))
        tv = times[t] + jnp.arange(nseg, dtype=dtype) * (unit_time / nseg)
        dyn_l = dyn_polys_at(scn, tv)   # fixed per layer (see _segment_cost)
        dd_l = dilate_polys(dyn_l[0], dyn_l[1][..., None],
                            cfg.vehicle.radius, rect=True)
        chunk = max(1, min(dp.parent_chunk, P))
        n_chunks = -(-P // chunk)
        pad = n_chunks * chunk - P

        def pad_p(a):
            return jnp.concatenate([a, a[-1:].repeat(pad, 0)]) if pad else a

        def chunk_cost(args):
            # [chunk, NS, NL, nseg] layout: the station-dependent table
            # fields are evaluated once per (parent, m, i) and broadcast
            # over the NL child laterals (identical values, 10x fewer
            # lookups — see _segment_cost's ref parameter)
            cp_s, cp_l, clast_s, clast_l, ccur_l = args  # [chunk], [chunk,C]
            csp, clp = _interp_sl(
                jnp.broadcast_to(cp_s[:, None, None], (chunk, NS, NL)),
                jnp.broadcast_to(cp_l[:, None, None], (chunk, NS, NL)),
                jnp.broadcast_to(station[None, :, None], (chunk, NS, NL)),
                ccur_l.reshape(chunk, NS, NL), nseg)
            s_dd, _ = _interp_sl(
                jnp.broadcast_to(cp_s[:, None, None], (chunk, NS, 1)),
                jnp.broadcast_to(cp_l[:, None, None], (chunk, NS, 1)),
                jnp.broadcast_to(station[None, :, None], (chunk, NS, 1)),
                ccur_l.reshape(chunk, NS, NL)[:, :, :1], nseg)
            ref_dd = eval_f(s_dd)
            obst = _segment_cost(
                cl, scn, grid, cfg, csp, clp,
                jnp.broadcast_to(clast_s[:, None, None], (chunk, NS, NL)),
                jnp.broadcast_to(clast_l[:, None, None], (chunk, NS, NL)),
                None, nseg, safe_margin, ref=ref_dd, dilated=(sd, dd_l),
                spec=spec)
            return obst.reshape(chunk, Cn)

        if n_chunks == 1:
            # single chunk: call the body directly — a length-1 lax.map
            # still compiles to a while loop whose boundary blocks fusion
            # with the transition update and forces layout round-trips on
            # the stacked output
            obst = chunk_cost((p_s, p_l, last_s, last_l, cur_l_c))
        else:
            chunked = jax.lax.map(
                chunk_cost,
                tuple(pad_p(a).reshape((n_chunks, chunk) + a.shape[1:])
                      for a in (p_s, p_l, last_s, last_l, cur_l_c)))
            obst = chunked.reshape(n_chunks * chunk, Cn)[:P]

        ds1 = st_pc
        dl1 = cur_l_c - p_l[:, None]
        ds0 = p_s[:, None] - gp_s[:, None]
        dl0 = p_l[:, None] - gp_l[:, None]
        cost_lat = jnp.abs(cur_l_c)
        cost_lat_chg = jnp.abs(p_l[:, None] - cur_l_c) / (st_pc + K_EPS_LOCAL)
        cost_lat_chg_t = jnp.abs(dl1 - dl0) / unit_time
        cost_v = jnp.abs(ds1 / unit_time - dp.nominal_velocity)
        cost_v_chg = jnp.abs((ds1 - ds0) / unit_time)
        delta = (dp.w_lateral * cost_lat + dp.w_lateral_change * cost_lat_chg +
                 dp.w_lateral_velocity_change * cost_lat_chg_t +
                 dp.w_longitudinal_velocity_bias * cost_v +
                 dp.w_longitudinal_velocity_change * cost_v_chg)
        delta = jnp.where(obst >= dp.w_obstacle, dp.w_obstacle, delta)

        total = p_cost[:, None] + delta                   # [P, C]
        best_p = jnp.argmin(total, axis=0)                # [C]
        # min == total[argmin] exactly (incl. first-index tie semantics);
        # the winner's cur_s comes from a one-hot masked reduce — both
        # replace per-column dynamic gathers that dominated the layer
        # update on TPU (see the grandparent one-hot above)
        best_cost = jnp.min(total, axis=0)
        poh = jnp.arange(P)[:, None] == best_p[None, :]   # [P, C]
        new_cur_s = jnp.sum(jnp.where(poh, cur_s_c, 0.0), axis=0)
        costs.append(best_cost.reshape(NS, NL))
        cur_ss.append(new_cur_s.reshape(NS, NL))
        parent_s_inds.append((best_p // NL).astype(jnp.int32).reshape(NS, NL))
        parent_l_inds.append((best_p % NL).astype(jnp.int32).reshape(NS, NL))

    # ---- trace back (dp_planner.cpp:184-206)
    final = costs[NT - 1].reshape(-1)
    best = jnp.argmin(final)
    min_cost = final[best]

    sel_s = [jnp.zeros((), jnp.int32)] * NT
    sel_l = [jnp.zeros((), jnp.int32)] * NT
    si = (best // NL).astype(jnp.int32)
    li = (best % NL).astype(jnp.int32)
    for i in range(NT - 1, -1, -1):
        sel_s[i] = si
        sel_l[i] = li
        psi = parent_s_inds[i][si, li]
        pli = parent_l_inds[i][si, li]
        si, li = psi, pli

    # ---- interpolate winning path to 81 knots (dp_planner.cpp:214-245)
    all_s = []
    all_l = []
    for i in range(NT):
        if i == 0:
            p_s_i = s0
            p_l_ind = jnp.int32(-1)
            nseg_i = 17
        else:
            p_s_i = cur_ss[i - 1][sel_s[i - 1], sel_l[i - 1]]
            p_l_ind = sel_l[i - 1]
            nseg_i = 16
        p_l_i = jnp.where(p_l_ind < 0, l0,
                          _lateral_offset(cl, p_s_i, jnp.maximum(p_l_ind, 0),
                                          safe_margin, NL, packed))
        st_i = station[sel_s[i]]
        cur_s_i = p_s_i + st_i
        cur_l_i = _lateral_offset(cl, cur_s_i, sel_l[i], safe_margin, NL,
                                  packed)
        sseg, lseg = _interp_sl(p_s_i, p_l_i, st_i, cur_l_i, nseg_i)
        all_s.append(sseg)
        all_l.append(lseg)
    seg_s = jnp.concatenate(all_s)   # [81]
    seg_l = jnp.concatenate(all_l)

    prev_s = jnp.concatenate([jnp.asarray([s0.astype(dtype)]).reshape(1), seg_s[:-1]])
    prev_l = jnp.concatenate([jnp.asarray([l0.astype(dtype)]).reshape(1), seg_l[:-1]])
    dl = seg_l - prev_l
    ds = jnp.maximum(seg_s - prev_s, K_EPS_LOCAL)
    ref = evaluate_station_fields(cl, seg_s, packed=packed)
    cx = ref["x"] - seg_l * jnp.sin(ref["theta"])
    cy = ref["y"] + seg_l * jnp.cos(ref["theta"])
    theta = ref["theta"] + jnp.arctan(
        (dl / ds) / (1.0 - ref["kappa"] * seg_l))

    # ---- profile (dp_planner.cpp:246-276)
    _, _, speeds, accels, kappas = compute_path_profile(cfg.delta_t, cx, cy)
    n = seg_s.shape[0]
    t = cfg.delta_t * jnp.arange(n, dtype=dtype)
    traj = Traj(
        time=t, s=seg_s, x=cx, y=cy, theta=theta, kappa=kappas,
        velocity=speeds, left_bound=ref["left_bound"],
        right_bound=ref["right_bound"],
        a=accels, jerk=jnp.zeros_like(t),
        delta=jnp.arctan(kappas * cfg.vehicle.wheel_base),
        delta_rate=jnp.zeros_like(t))
    return DpResult(traj=traj, ok=min_cost < dp.w_obstacle, min_cost=min_cost,
                    sel_s=jnp.stack(sel_s), sel_l=jnp.stack(sel_l))
