"""Batch-last CILQR solver: the TPU-layout formulation of solver.solve.

``jax.vmap(solver.solve)`` puts the scenario batch on the LEADING axis, so
every per-knot tensor ends up shaped [B, N, 6]/[B, 6, 6]: XLA assigns the
minor-most dimension to the 128-wide vector lanes, which leaves the lanes
5/6- to 126/128-empty for this problem's tiny trailing dims, and lowers the
cost stack's gathers/scatter-adds per batch element. Measured on the v5e
this runs the solve at ~1% of VPU capability (docs/PERF.md).

This module re-states the same serial-line-search solver (identical
reference semantics, ilqr_optimizer.cc:154-320) with the batch axis LAST on
every array — [6, N, B], [T, 6, 6, B], [N, KC, B] — so that:

  * every elementwise op vectorizes over B on the vector lanes at full
    width;
  * the 6x6/2x2 Riccati algebra unrolls over the small dims as lane-wide
    FMAs (no tiny-matmul lowering);
  * the lane-boundary nearest-segment lookup becomes a masked argmin plus
    one-hot contraction (no gather);
  * cost Jacobians/Hessians assemble by stacking components (no
    scatter-adds).

Semantics match solver.solve(mode='serial') exactly (see
tests/test_solver_blast.py); this is also the reference implementation for
the Pallas kernel port.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .barriers import make_barrier
from .config import IlqrConfig, VehicleParam
from .costs import ConstraintSet
from .geometry import normalize_angle, point_segment_distance
from .solver import iqr_init, transform_goals
from .types import CostBreakdown, SolveResult, SolverStatus

# ---------------------------------------------------------------------------
# batch-last helpers
# ---------------------------------------------------------------------------


def mm(X, Y):
    """[m, k, B] @ [k, n, B] -> [m, n, B].

    Unrolled broadcast-FMA over the small contraction axis: einsum would
    lower to dot_general on the 128x128 MXU with 6/128 utilization (~2.6 us
    per tiny matmul, the dominant cost of the backward sweep); as k
    broadcast-multiplies this is pure lane-wide VPU work."""
    acc = X[:, 0, None, :] * Y[0, :, :]
    for k in range(1, X.shape[1]):
        acc = acc + X[:, k, None, :] * Y[k, :, :]
    return acc


def mv(X, y):
    """[m, k, B] @ [k, B] -> [m, B] (unrolled broadcast-FMA)."""
    acc = X[:, 0, :] * y[0]
    for k in range(1, X.shape[1]):
        acc = acc + X[:, k, :] * y[k]
    return acc


def _inv22_bl(M):
    """Closed-form 2x2 inverse, [2, 2, B]."""
    a, b = M[0, 0], M[0, 1]
    c, d = M[1, 0], M[1, 1]
    inv_det = 1.0 / (a * d - b * c)
    row0 = jnp.stack([d, -b])
    row1 = jnp.stack([-c, a])
    return jnp.stack([row0, row1]) * inv_det


def _rk2_bl(x, u, dt, L):
    """Midpoint step on component-rows: x [6, B], u [2, B]
    (vehicle_model.cc:107-121)."""

    def f(s):
        th = normalize_angle(s[2])
        dl = normalize_angle(s[5])
        return jnp.stack([
            s[3] * jnp.cos(th),
            s[3] * jnp.sin(th),
            s[3] * jnp.tan(dl) / L,
            s[4],
            u[0],
            u[1],
        ])

    mid = x + 0.5 * dt * f(x)
    nxt = x + dt * f(mid)
    nxt = nxt.at[2].set(normalize_angle(nxt[2]))
    nxt = nxt.at[5].set(normalize_angle(nxt[5]))
    return nxt


def _jacobians_bl(xs, us, dt, L):
    """Analytic midpoint Jacobians on [6, T, B]/[2, T, B] components
    (vehicle_model.cc:44-86 incl. the v-vs-v_mid quirk; see model.py).
    Returns (A [T, 6, 6, B], Bm [T, 6, 2, B])."""
    v = xs[3]
    theta = normalize_angle(xs[2])
    delta = normalize_angle(xs[5])
    a = xs[4]
    delta_rate = us[1]

    theta_mid = theta + 0.5 * dt * v * jnp.tan(delta) / L
    tan_delta = jnp.tan(delta)
    tan_delta_rate = jnp.tan(delta + 0.5 * dt * delta_rate)
    cos_tm = jnp.cos(theta_mid)
    sin_tm = jnp.sin(theta_mid)
    td2 = tan_delta * tan_delta
    tdr2 = tan_delta_rate * tan_delta_rate
    v_mid = 0.5 * a * dt + v

    z = jnp.zeros_like(v)
    o = jnp.ones_like(v)
    A = jnp.stack([
        jnp.stack([o, z, -dt * v_mid * sin_tm,
                   dt * cos_tm - 0.5 * dt * dt * v_mid * sin_tm * tan_delta / L,
                   0.5 * dt * dt * cos_tm,
                   -0.5 * dt * dt * v * v_mid * (td2 + 1.0) * sin_tm / L]),
        jnp.stack([z, o, dt * v_mid * cos_tm,
                   dt * sin_tm + 0.5 * dt * dt * v_mid * cos_tm * tan_delta / L,
                   0.5 * dt * dt * sin_tm,
                   0.5 * dt * dt * v * v_mid * (td2 + 1.0) * cos_tm / L]),
        jnp.stack([z, z, o, dt * tan_delta_rate / L,
                   0.5 * dt * dt * tan_delta_rate / L,
                   dt * v * (tdr2 + 1.0) / L]),
        jnp.stack([z, z, z, o, dt * o, z]),
        jnp.stack([z, z, z, z, o, z]),
        jnp.stack([z, z, z, z, z, o]),
    ])                                              # [6, 6, T, B]
    Bm = jnp.stack([
        jnp.stack([z, z]),
        jnp.stack([z, z]),
        jnp.stack([z, 0.5 * dt * dt * v * (tdr2 + 1.0) / L]),
        jnp.stack([0.5 * dt * dt * o, z]),
        jnp.stack([dt * o, z]),
        jnp.stack([z, dt * o]),
    ])                                              # [6, 2, T, B]
    return jnp.moveaxis(A, 2, 0), jnp.moveaxis(Bm, 2, 0)


# ---------------------------------------------------------------------------
# constraints in batch-last layout
# ---------------------------------------------------------------------------


class ConsBL(NamedTuple):
    """ConstraintSet transposed to batch-last component arrays."""

    ca: jnp.ndarray     # corridor a [N, KC, B]
    cb: jnp.ndarray
    cc: jnp.ndarray
    cm: jnp.ndarray     # corridor mask [N, KC, B] (bool)
    lanes: tuple        # per side: (a, b, c, x1, y1, x2, y2, m, lo, hi) —
                        # plane/segment components each [S, B] (shared
                        # full scan; lo=hi=None) or [N, W, B] (per-knot
                        # window; lo/hi [N, B] flag that the window was
                        # clipped at the low/high index end, i.e. segments
                        # exist beyond that edge)


def cons_to_bl(cons: ConstraintSet, goals_bl=None, lane_window: int = 0
               ) -> ConsBL:
    """[B, ...] ConstraintSet -> batch-last components (one transpose at
    solve entry; everything inside the loop then stays batch-last). With
    0 < lane_window < S and goals given (batch-last [6, N, B]), lane
    constraints become per-knot windows [N, W, B] of W segments centered
    on the segment nearest each knot's GOAL position.

    Selection-identical to the reference's full scan
    (ilqr_optimizer.cc:605-618) while the trajectory's runtime-nearest
    segment stays inside the window (IlqrConfig.lane_window documents the
    curvature caveat); the window center is always a valid (unmasked)
    segment, so a valid plane is always selectable.

    Window construction is gather-free: per-element gathers measured
    31-100 ms/solve of prep on TPU (batch-first gather + batch-to-minor
    transpose, or batch-last take_along_axis). Instead the window start
    is QUANTIZED to a small grid of static slice variants (stride W/4),
    and each knot one-hot-selects its variant — pure elementwise over
    [N, W, B]. Quantization costs at most W/8 segments of margin on each
    side: guaranteed margin >= W/2 - W/8 segments (W=32 -> 12 segments =
    60 m with the default 5 m lane_segment_length — equal to the exact
    W=24 centering validated against the full scan on every fixture
    problem)."""

    def side(planes, segs, mask):
        a = jnp.moveaxis(planes[..., 0], 0, -1)            # [S, B]
        b = jnp.moveaxis(planes[..., 1], 0, -1)
        c = jnp.moveaxis(planes[..., 2], 0, -1)
        x1 = jnp.moveaxis(segs[..., 0, 0], 0, -1)
        y1 = jnp.moveaxis(segs[..., 0, 1], 0, -1)
        x2 = jnp.moveaxis(segs[..., 1, 0], 0, -1)
        y2 = jnp.moveaxis(segs[..., 1, 1], 0, -1)
        m = jnp.moveaxis(mask, 0, -1)
        S = a.shape[0]
        W = lane_window
        if goals_bl is None or not (0 < W < S):
            return (a, b, c, x1, y1, x2, y2, m, None, None)
        gx = goals_bl[0][:, None, :]                       # [N, 1, B]
        gy = goals_bl[1][:, None, :]
        d = point_segment_distance(gx, gy, x1[None], y1[None],
                                   x2[None], y2[None])     # [N, S, B]
        d = jnp.where(m[None], d, jnp.inf)
        w0 = jnp.clip(jnp.argmin(d, axis=1) - W // 2, 0, S - W)  # [N, B]

        q = max(1, W // 4)
        ks = list(range(0, S - W + 1, q))
        if ks[-1] != S - W:
            ks.append(S - W)
        # nearest variant start per knot (strictly-less keeps the first)
        best = jnp.zeros_like(w0)
        bestd = jnp.abs(w0 - ks[0])
        for i, k in enumerate(ks[1:], 1):
            dk = jnp.abs(w0 - k)
            upd = dk < bestd
            bestd = jnp.where(upd, dk, bestd)
            best = jnp.where(upd, i, best)

        def win(v):
            out = jnp.broadcast_to(v[ks[0]:ks[0] + W][None],
                                   (w0.shape[0], W, v.shape[1]))
            for i, k in enumerate(ks[1:], 1):
                sel = (best == i)[:, None, :]              # [N, 1, B]
                out = jnp.where(sel, v[k:k + W][None], out)
            return out                                     # [N, W, B]

        # which window edges clip off real segments (for the runtime
        # argmin-on-edge safety flag in _nearest_lane_sel_discs): an argmin on
        # slot 0 / W-1 only signals a possibly-out-of-window nearest
        # segment when segments exist beyond that edge. The selected
        # start is ks[best]; valid (unmasked) segments span [0, n_valid).
        ksa = jnp.asarray(ks)
        start = ksa[best]                                  # [N, B]
        n_valid = m.sum(axis=0)                            # [B]
        lo = start > 0
        hi = start + W < n_valid[None, :]
        return tuple(win(v) for v in (a, b, c, x1, y1, x2, y2, m)
                     ) + (lo, hi)

    return ConsBL(
        ca=jnp.moveaxis(cons.corridor_planes[..., 0], 0, -1),
        cb=jnp.moveaxis(cons.corridor_planes[..., 1], 0, -1),
        cc=jnp.moveaxis(cons.corridor_planes[..., 2], 0, -1),
        cm=jnp.moveaxis(cons.corridor_mask, 0, -1),
        lanes=(side(cons.left_planes, cons.left_segs, cons.left_mask),
               side(cons.right_planes, cons.right_segs, cons.right_mask)),
    )


def _disc_offsets(cfg: IlqrConfig, veh: VehicleParam, dtype):
    D = cfg.num_of_disc
    L = veh.length / D
    return L * (jnp.arange(D, dtype=dtype) - 0.5) - veh.rear_hang_length


def _nearest_lane_sel_discs(cx, cy, lane, method: str = "reduce"):
    """Masked-argmin nearest lane segment + plane selection for ALL D
    disc centers at once (replaces the gather in
    costs._nearest_lane_plane; identical fp ops so argmin ties break the
    same way): cx, cy [D, N, B] -> (a, b, c [D, N, B],
    edge [D, N, B] | None). Lane arrays are [S, B] (shared across knots;
    edge=None) or [N, W, B] (per-knot windows; edge flags an argmin
    landing on a CLIPPED window edge — see IlqrConfig.lane_window).

    One distance tensor for ALL D disc centers instead of D separate
    kernel chains: profiling the solve showed the per-disc iota_reduce
    fusions (argmin + one-hot sums over the W axis) were ~47% of its
    device time (docs/PERF.md). Selection and the per-disc selected
    values are bitwise-identical to the per-disc calls — the W-axis
    reductions see exactly the same elements per (d, n, b).

    method='reduce' (IlqrConfig.lane_search): a single variadic
    lax.reduce carrying (d, idx, a, b, c) with the lexicographic (d, idx)
    key — a total order, so the combiner is associative+commutative and
    the result equals argmin-with-first-index-ties bitwise while the
    distance producer is fused into ONE pass over [D, N, S, B] instead
    of four (argmin + 3 one-hot select sums re-fuse it each time).
    method='onehot': the round-3 argmin + one-hot formulation."""
    a, b, c, x1, y1, x2, y2, m, lo, hi = lane
    if a.ndim == 2:   # shared [S, B]: broadcast to [1, 1, S, B]
        a, b, c, x1, y1, x2, y2, m = (
            v[None, None] for v in (a, b, c, x1, y1, x2, y2, m))
    else:             # windowed [N, W, B]: broadcast to [1, N, W, B]
        a, b, c, x1, y1, x2, y2, m = (
            v[None] for v in (a, b, c, x1, y1, x2, y2, m))
    d = point_segment_distance(cx[:, :, None, :], cy[:, :, None, :],
                               x1, y1, x2, y2)          # [D, N, S, B]
    d = jnp.where(m, d, jnp.inf)
    S = d.shape[2]

    if method == "reduce":
        shape = d.shape
        iota = jax.lax.broadcasted_iota(jnp.int32, shape, 2)
        ab, bb, cb = (jnp.broadcast_to(v, shape) for v in (a, b, c))

        def comb(l, r):
            dl, il, al, bl_, cl_ = l
            dr, ir, ar, br, cr = r
            pred = (dl < dr) | ((dl == dr) & (il < ir))
            pick = lambda u, v: jax.lax.select(pred, u, v)
            return (pick(dl, dr), pick(il, ir), pick(al, ar),
                    pick(bl_, br), pick(cl_, cr))

        zero = jnp.asarray(0.0, d.dtype)
        inits = (jnp.asarray(jnp.inf, d.dtype),
                 jnp.asarray(np.iinfo(np.int32).max, jnp.int32),
                 zero, zero, zero)
        _, idx, sa, sb, sc = jax.lax.reduce(
            (d, iota, ab, bb, cb), inits, comb, (2,))
        edge = None
        if lo is not None:
            edge = ((idx == 0) & lo[None]) | ((idx == S - 1) & hi[None])
        return sa, sb, sc, edge

    idx = jnp.argmin(d, axis=2)                         # [D, N, B]
    onehot = (jax.lax.broadcasted_iota(jnp.int32, (1, 1, S, 1), 2)
              == idx[:, :, None, :])
    sel = lambda p: jnp.sum(jnp.where(onehot, p, 0.0), axis=2)
    edge = None
    if lo is not None:
        edge = ((idx == 0) & lo[None]) | ((idx == S - 1) & hi[None])
    return sel(a), sel(b), sel(c), edge


def _cost_stack_bl(xs, us, goals, cbl: ConsBL, cfg, veh, want_derivs):
    """Cost components [B] plus PER-KNOT totals pk [N, B] and the lane
    window-clip flag clip [B] (+ optionally Jx [N,6,B], Ju [T,2,B],
    Hx [N,6,6,B], Hu [T,2,2,B]) — TotalCost / CostJacbian / CostHessian
    (ilqr_optimizer.cc:417-769) in batch-last form, no gathers/scatters.

    pk exists so the outer loop can compute dcost = sum_k(pk_old - pk_new)
    instead of the reference's total_old - total_new: subtracting two ~1e3
    sums that differ by ~1e-2 is catastrophic cancellation in f32 (the
    accept/stop thresholds sit exactly at the noise floor — measured 30%
    decision-flip rate vs f64 on the fixture), while summing per-knot
    differences keeps the error relative to dcost itself. In f64 the two
    forms agree to ~1e-13 and decisions are identical."""
    bar = make_barrier(cfg.barrier)
    w = cfg.weights
    dtype = xs.dtype
    N = xs.shape[1]
    T = us.shape[1]
    B = xs.shape[2]

    dx = xs[0] - goals[0]
    dy = xs[1] - goals[1]
    dth = xs[2] - goals[2]
    jk_x = (w.x_target * dx * dx + w.y_target * dy * dy
            + w.theta * dth * dth)                      # [N, B]
    jk_u = w.jerk * us[0] ** 2 + w.delta_rate * us[1] ** 2   # [T, B]
    j_cost = jnp.sum(jk_x, axis=0) + jnp.sum(jk_u, axis=0)

    # state/control limit constraint values g <= 0 (order as costs.py)
    gx = [(-xs[3], 3, -1.0), (xs[3] - veh.max_velocity, 3, 1.0),
          (xs[4] - veh.max_acceleration, 4, 1.0),
          (veh.min_acceleration - xs[4], 4, -1.0),
          (xs[5] - veh.delta_max, 5, 1.0), (veh.delta_min - xs[5], 5, -1.0)]
    gu = [(us[0] - veh.jerk_max, 0, 1.0), (veh.jerk_min - us[0], 0, -1.0),
          (us[1] - veh.delta_rate_max, 1, 1.0),
          (veh.delta_rate_min - us[1], 1, -1.0)]
    dynk_x = sum(bar.value(g) for g, _, _ in gx)        # [N, B]
    dynk_u = sum(bar.value(g) for g, _, _ in gu)        # [T, B]
    dyn_cost = jnp.sum(dynk_x, axis=0) + jnp.sum(dynk_u, axis=0)

    # disc geometry [D] offsets; per-disc centers [N, B]
    offs = _disc_offsets(cfg, veh, dtype)
    ct = jnp.cos(xs[2])
    st = jnp.sin(xs[2])

    corrk = jnp.zeros((N, B), dtype)
    lanek = jnp.zeros((N, B), dtype)
    clip = jnp.zeros((B,), bool)   # lane window argmin-on-clipped-edge

    if want_derivs:
        jx = [jnp.zeros((N, B), dtype) for _ in range(6)]
        hx = {}

        def hadd(i, j, v):
            hx[(i, j)] = hx.get((i, j), 0.0) + v

        jx[0] = 2.0 * w.x_target * dx
        jx[1] = 2.0 * w.y_target * dy
        jx[2] = 2.0 * w.theta * dth
        ju0 = 2.0 * w.jerk * us[0]
        ju1 = 2.0 * w.delta_rate * us[1]
        hadd(0, 0, jnp.full((N, B), 2.0 * w.x_target, dtype))
        hadd(1, 1, jnp.full((N, B), 2.0 * w.y_target, dtype))
        hadd(2, 2, jnp.full((N, B), 2.0 * w.theta, dtype))
        hadd(3, 3, jnp.full((N, B), 2.0 * w.v, dtype))
        hadd(4, 4, jnp.full((N, B), 2.0 * w.a, dtype))
        hadd(5, 5, jnp.full((N, B), 2.0 * w.delta, dtype))
        hu = {(0, 0): jnp.full((T, B), 2.0 * w.jerk, dtype),
              (1, 1): jnp.full((T, B), 2.0 * w.delta_rate, dtype)}

        for g, i, s in gx:
            jx[i] = jx[i] + bar.grad_factor(g) * s
            hadd(i, i, bar.hess_factors(g)[0])
        for g, i, s in gu:
            if i == 0:
                ju0 = ju0 + bar.grad_factor(g) * s
            else:
                ju1 = ju1 + bar.grad_factor(g) * s
            hu[(i, i)] = hu[(i, i)] + bar.hess_factors(g)[0]

    if _use_coststack_kernel(cfg, cbl, xs):
        # fused Pallas corridor+lane stack (pallas/coststack.py): one
        # kernel pass per (knot, 128-lane block) replaces the disc loop
        # below; same math, bitwise-equal to XLA up to fusion rounding
        from .pallas.coststack import corridor_lane_stack

        Dn = cfg.num_of_disc
        Lv = veh.length / Dn
        offs_py = tuple(Lv * (i - 0.5) - veh.rear_hang_length
                        for i in range(Dn))
        res = corridor_lane_stack(
            xs, (cbl.ca, cbl.cb, cbl.cc, cbl.cm), cbl.lanes, offs_py,
            cfg.barrier.t, cfg.barrier.epsilon, want_derivs=want_derivs,
            interpret=jax.default_backend() == "cpu")
        corrk = res[0]
        lanek = res[1]
        clip = (res[2] > 0.5).any(axis=0)
        if want_derivs:
            jx0k, jx1k, jx2k, h00, h01, h02, h11, h12, h22 = res[3:]
            jx[0] = jx[0] + jx0k
            jx[1] = jx[1] + jx1k
            jx[2] = jx[2] + jx2k
            hadd(0, 0, h00)
            hadd(0, 1, h01)
            hadd(0, 2, h02)
            hadd(1, 1, h11)
            hadd(1, 2, h12)
            hadd(2, 2, h22)
        return _combine_cost_stack(xs, us, goals, cfg, want_derivs,
                                   j_cost, dyn_cost, jk_x, jk_u, dynk_x,
                                   dynk_u, corrk, lanek, clip,
                                   jx if want_derivs else None,
                                   hx if want_derivs else None,
                                   (ju0, ju1) if want_derivs else None,
                                   hu if want_derivs else None)

    D = int(offs.shape[0])
    # all-disc centers [D, N, B]; the lane-segment searches run ONCE over
    # the stacked disc axis (see _nearest_lane_sel_discs), then the
    # accumulation below keeps the original per-disc order bit-for-bit
    lcs = offs[:, None, None] * ct[None]
    lss = offs[:, None, None] * st[None]
    cxds = xs[0][None] + lcs
    cyds = xs[1][None] + lss
    lane_sels = []
    for lane in cbl.lanes:
        sla, slb, slc, sedge = _nearest_lane_sel_discs(
            cxds, cyds, lane, method=cfg.lane_search)
        if sedge is not None:
            clip = clip | sedge.any(axis=(0, 1))
        lane_sels.append((sla, slb, slc))

    for d in range(D):
        lc = lcs[d]                                    # [N, B]
        ls = lss[d]
        cxd = cxds[d]
        cyd = cyds[d]

        # corridor barriers over [N, KC, B]
        g = (cbl.ca * cxd[:, None] + cbl.cb * cyd[:, None] - cbl.cc)
        val = jnp.where(cbl.cm, bar.value(g), 0.0)
        corrk = corrk + jnp.sum(val, axis=1)
        if want_derivs:
            dthk = -cbl.ca * ls[:, None] + cbl.cb * lc[:, None]
            gf = jnp.where(cbl.cm, bar.grad_factor(g), 0.0)
            hf, hddx = bar.hess_factors(g)
            hf = jnp.where(cbl.cm, hf, 0.0)
            hddx = jnp.where(cbl.cm, hddx, 0.0)
            ddx22 = -cbl.ca * lc[:, None] - cbl.cb * ls[:, None]
            jx[0] = jx[0] + jnp.sum(gf * cbl.ca, axis=1)
            jx[1] = jx[1] + jnp.sum(gf * cbl.cb, axis=1)
            jx[2] = jx[2] + jnp.sum(gf * dthk, axis=1)
            comps = (cbl.ca, cbl.cb, dthk)
            for i in range(3):
                for j in range(i, 3):
                    hadd(i, j, jnp.sum(hf * comps[i] * comps[j], axis=1))
            hadd(2, 2, jnp.sum(hddx * ddx22, axis=1))

        # lane barriers (nearest-segment one-hot, selected above)
        for sla, slb, slc in lane_sels:
            la, lb, lcc = sla[d], slb[d], slc[d]
            lg = la * cxd + lb * cyd - lcc
            lanek = lanek + bar.value(lg)
            if want_derivs:
                ldth = -la * ls + lb * lc
                lgf = bar.grad_factor(lg)
                lhf, lhd = bar.hess_factors(lg)
                lddx22 = -la * lc - lb * ls
                jx[0] = jx[0] + lgf * la
                jx[1] = jx[1] + lgf * lb
                jx[2] = jx[2] + lgf * ldth
                lcmp = (la, lb, ldth)
                for i in range(3):
                    for j in range(i, 3):
                        hadd(i, j, lhf * lcmp[i] * lcmp[j])
                hadd(2, 2, lhd * lddx22)

    return _combine_cost_stack(xs, us, goals, cfg, want_derivs,
                               j_cost, dyn_cost, jk_x, jk_u, dynk_x,
                               dynk_u, corrk, lanek, clip,
                               jx if want_derivs else None,
                               hx if want_derivs else None,
                               (ju0, ju1) if want_derivs else None,
                               hu if want_derivs else None)


def _use_coststack_kernel(cfg, cbl: ConsBL, xs) -> bool:
    """Eligibility for the fused Pallas corridor+lane stack
    (IlqrConfig.cost_stack_backend): windowed lanes, whole 128-lane
    blocks; 'auto' additionally requires the TPU backend + f32 (the
    kernel runs in interpret mode on CPU, which only tests use)."""
    mode = cfg.cost_stack_backend
    if mode == "xla" or cfg.barrier.kind != "relax":
        # the kernel hardcodes RelaxBarrier branches (pallas/coststack.py)
        return False
    from .pallas.coststack import NB as _CNB

    lane0 = cbl.lanes[0]
    eligible = (lane0[0].ndim == 3 and lane0[8] is not None
                and xs.shape[2] % _CNB == 0)
    if mode == "pallas":
        return eligible
    return (eligible and jax.default_backend() != "cpu"
            and xs.dtype == jnp.float32)


def _combine_cost_stack(xs, us, goals, cfg, want_derivs, j_cost, dyn_cost,
                        jk_x, jk_u, dynk_x, dynk_u, corrk, lanek, clip,
                        jx, hx, ju, hu):
    """Assemble _cost_stack_bl's outputs from the tracking/limit terms
    plus the corridor/lane accumulations (XLA or Pallas path)."""
    dtype = xs.dtype
    N = xs.shape[1]
    T = us.shape[1]
    B = xs.shape[2]
    corr_cost = jnp.sum(corrk, axis=0)
    lane_cost = jnp.sum(lanek, axis=0)
    cost = CostBreakdown(total=j_cost + dyn_cost + corr_cost + lane_cost,
                         target=j_cost, dynamic=dyn_cost,
                         corridor=corr_cost, lane=lane_cost)
    pk = jk_x + dynk_x + corrk + lanek
    pk = pk.at[:T].add(jk_u + dynk_u)
    if not want_derivs:
        return cost, pk, clip

    ju0, ju1 = ju
    zeros_nb = jnp.zeros((N, B), dtype)
    Jx = jnp.stack(jx, axis=1)                          # [N, 6, B]
    Hx = jnp.stack([
        jnp.stack([hx.get((min(i, j), max(i, j)), zeros_nb)
                   for j in range(6)], axis=1)
        for i in range(6)], axis=1)                     # [N, 6, 6, B]
    zeros_tb = jnp.zeros((T, B), dtype)
    Ju = jnp.stack([ju0, ju1], axis=1)                  # [T, 2, B]
    Hu = jnp.stack([
        jnp.stack([hu.get((min(i, j), max(i, j)), zeros_tb)
                   for j in range(2)], axis=1)
        for i in range(2)], axis=1)                     # [T, 2, 2, B]
    return cost, pk, clip, Jx, Ju, Hx, Hu


# ---------------------------------------------------------------------------
# Riccati backward / forward (batch-last)
# ---------------------------------------------------------------------------


def _backward_bl(lam, A, Bm, Jx, Ju, Hx, Hu, unroll=1):
    """Riccati sweep (ilqr_optimizer.cc:334-390). lam [B];
    A [T,6,6,B], Bm [T,6,2,B], Jx [N,6,B], Ju [T,2,B], Hx [N,6,6,B],
    Hu [T,2,2,B] -> (Ks [T,2,6,B], ks [T,2,B], dV0 [B], dV1 [B])."""
    dtype = A.dtype
    B_ = A.shape[-1]
    eye2 = jnp.eye(2, dtype=dtype)[..., None]

    def step(carry, inp):
        Vx, Vxx, dV0, dV1 = carry
        Ai, Bi, Jxi, Jui, Hxi, Hui = inp
        At = jnp.swapaxes(Ai, 0, 1)
        Bt = jnp.swapaxes(Bi, 0, 1)
        Qx = Jxi + mv(At, Vx)
        Qu = Jui + mv(Bt, Vx)
        AtV = mm(At, Vxx)
        Qxx = Hxi + mm(AtV, Ai)
        BtV = mm(Bt, Vxx)
        Quu = Hui + mm(BtV, Bi)
        Qux = mm(BtV, Ai)
        Quu_inv = _inv22_bl(Quu + lam * eye2)
        K = -mm(Quu_inv, Qux)
        k = -mv(Quu_inv, Qu)
        Kt = jnp.swapaxes(K, 0, 1)
        Quk = mv(Quu, k)
        Vx_n = Qx + mv(Kt, Quk) + mv(Kt, Qu) + mv(jnp.swapaxes(Qux, 0, 1), k)
        Vxx_n = Qxx + mm(Kt, mm(Quu, K)) + mm(Kt, Qux) \
            + mm(jnp.swapaxes(Qux, 0, 1), K)
        Vxx_n = 0.5 * (Vxx_n + jnp.swapaxes(Vxx_n, 0, 1))
        dV0 = dV0 + jnp.sum(k * Qu, axis=0)
        dV1 = dV1 + 0.5 * jnp.sum(k * Quk, axis=0)
        return (Vx_n, Vxx_n, dV0, dV1), (K, k)

    zero = jnp.zeros((B_,), dtype)
    (_, _, dV0, dV1), (Ks, ks) = jax.lax.scan(
        step, (Jx[-1], Hx[-1], zero, zero),
        (A, Bm, Jx[:-1], Ju, Hx[:-1], Hu), reverse=True, unroll=unroll)
    return Ks, ks, dV0, dV1


def _forward_bl(alpha, xs, us, Ks, ks, goals, dt, L, unroll=1):
    """Closed-loop rollout (ilqr_optimizer.cc:392-415) with per-LANE alpha
    [B] (serial mode: lanes sit at different alpha indices). xs [6,N,B]."""
    x0 = goals[:, 0]

    def step(x, inp):
        ui, Ki, ki, xi = inp
        u = ui + mv(Ki, x - xi) + alpha * ki
        u = u.at[1].set(normalize_angle(u[1]))
        nxt = _rk2_bl(x, u, dt, L)
        return nxt, (nxt, u)

    xs_t = jnp.moveaxis(xs, 1, 0)                      # [N, 6, B]
    us_t = jnp.moveaxis(us, 1, 0)                      # [T, 2, B]
    _, (xs_tail, new_us) = jax.lax.scan(
        step, x0, (us_t, Ks, ks, xs_t[:-1]), unroll=unroll)
    new_xs = jnp.concatenate([x0[None], xs_tail], axis=0)
    return jnp.moveaxis(new_xs, 0, 1), jnp.moveaxis(new_us, 0, 1)


# ---------------------------------------------------------------------------
# outer loop (serial line search, per-lane carries)
# ---------------------------------------------------------------------------


class _CarryBL(NamedTuple):
    xs: jnp.ndarray        # [6, N, B]
    us: jnp.ndarray        # [2, T, B]
    cost: CostBreakdown    # [B] leaves
    pc: jnp.ndarray        # [N, B] per-knot costs of the current iterate
    lam: jnp.ndarray       # [B]
    dlam: jnp.ndarray
    status: jnp.ndarray    # [B] int32
    it: jnp.ndarray        # [B] int32
    aidx: jnp.ndarray      # [B] int32
    clip: jnp.ndarray      # [B] bool: lane-window edge clip seen (monotone)


def _make_body(goals, cbl, cfg: IlqrConfig, veh: VehicleParam, dt, dtype, T_):
    """One while-loop trip (ilqr_optimizer.cc:201-309) as a closure over
    the (batch-last) problem tensors. Every operation is per-lane — no
    batch-axis reductions — so a lane's decision/fp trajectory is
    independent of which batch it sits in (the compaction driver relies
    on this for bitwise equivalence)."""
    reg = cfg.reg
    alphas = jnp.asarray(cfg.line_search.alphas, dtype)
    n_alpha = len(cfg.line_search.alphas)
    B = goals.shape[-1]
    unroll = cfg.scan_unroll or (T_ if jax.default_backend() != "cpu" else 1)
    unroll = min(unroll, T_)
    from .pallas.sweep import NB as _NB

    if cfg.sweep_backend == "auto":
        use_pallas = (jax.default_backend() != "cpu") and (B % _NB == 0)
    else:
        # explicit 'pallas' still needs a full block multiple (compaction
        # mop-up rounds can be narrower — fall back to the XLA sweep there)
        use_pallas = cfg.sweep_backend == "pallas" and B % _NB == 0

    k_alpha = max(1, cfg.line_search.alphas_per_trip)

    def body(c: _CarryBL) -> _CarryBL:
        A, Bm = _jacobians_bl(c.xs[:, :-1], c.us, dt, veh.wheel_base)
        cost_d = _cost_stack_bl(c.xs, c.us, goals, cbl, cfg, veh, True)
        _, _, clip1, Jx, Ju, Hx, Hu = cost_d
        # K consecutive alphas per trip, all rolled out from this trip's
        # frozen iterate (LineSearchConfig.alphas_per_trip). Candidate i's
        # values are bitwise what an alpha-advance trip would recompute —
        # the iterate, lam and hence gains are unchanged on advance — so
        # applying the serial accept rule to the candidates IN ORDER is
        # decision-identical to one-alpha-per-trip (ilqr_optimizer.cc:
        # 246-265 semantics either way).
        a_k = [alphas[jnp.minimum(c.aidx + i, n_alpha - 1)]
               for i in range(k_alpha)]                   # K x [B]
        if use_pallas:
            from .pallas.sweep import riccati_sweep

            a_arg = a_k[0] if k_alpha == 1 else jnp.stack(a_k)
            nxs_km, nus_tm, dV0, dV1, gnorm = riccati_sweep(
                c.lam, a_arg, A, Bm, Jx, Ju, Hx, Hu,
                jnp.moveaxis(c.xs, 0, 1), jnp.moveaxis(c.us, 0, 1),
                dt=dt, wheel_base=veh.wheel_base,
                interpret=jax.default_backend() == "cpu")
            if k_alpha == 1:
                nxs_k = [jnp.moveaxis(nxs_km, 0, 1)]
                nus_k = [jnp.moveaxis(nus_tm, 0, 1)]
            else:
                # per-alpha tuples straight from the kernel (no stacked
                # [KA, ...] intermediate; see riccati_sweep docstring)
                nxs_k = [jnp.moveaxis(x, 0, 1) for x in nxs_km]
                nus_k = [jnp.moveaxis(u, 0, 1) for u in nus_tm]
            gnorm_done = (gnorm < reg.gradient_norm_min) & (c.lam < 1e-5)
        else:
            Ks, ks, dV0, dV1 = _backward_bl(c.lam, A, Bm, Jx, Ju, Hx, Hu,
                                            unroll=unroll)
            gnorm = jnp.mean(jnp.max(jnp.abs(ks) / (jnp.abs(
                jnp.moveaxis(c.us, 1, 0)) + 1.0), axis=1), axis=0)
            gnorm_done = (gnorm < reg.gradient_norm_min) & (c.lam < 1e-5)
            nxs_k = []
            nus_k = []
            for i in range(k_alpha):
                nxs_i, nus_i = _forward_bl(a_k[i], c.xs, c.us, Ks, ks,
                                           goals, dt, veh.wheel_base,
                                           unroll=unroll)
                nxs_k.append(nxs_i)
                nus_k.append(nus_i)

        # Serial accept fold over the K candidates: candidate i is
        # CONSIDERED only if every previous one was rejected without
        # exhausting the schedule — exactly the lane states a 1-alpha
        # trip sequence would visit.
        cand = []
        for i in range(k_alpha):
            ncost_i, npc_i, clip_i = _cost_stack_bl(
                nxs_k[i], nus_k[i], goals, cbl, cfg, veh, False)
            # dcost as a sum of per-knot differences, NOT total_old -
            # total_new: in f32 the reference's form cancels two ~1e3 sums
            # at the decision thresholds' noise floor (see _cost_stack_bl
            # docstring); f64 agrees with the reference form to ~1e-13.
            dcost_i = jnp.sum(c.pc - npc_i, axis=0)
            expected_i = -a_k[i] * (dV0 + a_k[i] * dV1)
            z_i = dcost_i / expected_i
            acc_i = ((z_i > cfg.line_search.beta_min) &
                     (z_i < cfg.line_search.beta_max) & (dcost_i > 0.0))
            last_i = (c.aidx + i) == (n_alpha - 1)
            cand.append((nxs_k[i], nus_k[i], ncost_i, npc_i, clip_i,
                         dcost_i, acc_i, last_i))

        nxs, nus, ncost, npc, clip2, dcost, acc0, last0 = cand[0]
        accept = acc0
        full_reject = (~acc0) & last0
        considered = (~acc0) & (~last0)
        for i in range(1, k_alpha):
            nxs_i, nus_i, ncost_i, npc_i, clip_i, dcost_i, acc_i, \
                last_i = cand[i]
            sel_i = considered & acc_i
            nxs = jnp.where(sel_i, nxs_i, nxs)
            nus = jnp.where(sel_i, nus_i, nus)
            ncost = jax.tree.map(lambda n, o, s=sel_i: jnp.where(s, n, o),
                                 ncost_i, ncost)
            npc = jnp.where(sel_i, npc_i, npc)
            dcost = jnp.where(sel_i, dcost_i, dcost)
            # serial parity: candidate i's cost stack only runs on lanes
            # that reach it, so its clip flag only counts there
            clip2 = clip2 | (considered & clip_i)
            accept = accept | sel_i
            full_reject = full_reject | (considered & (~acc_i) & last_i)
            considered = considered & (~acc_i) & (~last_i)
        concluded = accept | full_reject

        dlam_acc = jnp.minimum(c.dlam / reg.ratio, 1.0 / reg.ratio)
        lam_acc = c.lam * dlam_acc * (c.lam > reg.lambda_min).astype(dtype)
        conv_abs = dcost < cfg.abs_cost_tol
        conv_rel = (dcost / c.cost.total) < cfg.rel_cost_tol
        status_acc = jnp.where(
            conv_abs, SolverStatus.SUCCESS_ABS_COST,
            jnp.where(conv_rel, SolverStatus.SUCCESS_REL_COST,
                      SolverStatus.RUNNING))
        dlam_rej = jnp.maximum(c.dlam * reg.ratio, reg.ratio)
        lam_rej = jnp.maximum(c.lam * dlam_rej, reg.lambda_min)
        status_rej = jnp.where(lam_rej > reg.lambda_max,
                               SolverStatus.FAIL_LAMBDA_MAX,
                               SolverStatus.RUNNING)

        def pick3(on_acc, on_rej, on_adv):
            return jnp.where(accept, on_acc,
                             jnp.where(full_reject, on_rej, on_adv))

        new = _CarryBL(
            xs=jnp.where(accept, nxs, c.xs),
            us=jnp.where(accept, nus, c.us),
            cost=jax.tree.map(lambda n, o: jnp.where(accept, n, o),
                              ncost, c.cost),
            pc=jnp.where(accept, npc, c.pc),
            lam=pick3(lam_acc, lam_rej, c.lam),
            dlam=pick3(dlam_acc, dlam_rej, c.dlam),
            status=pick3(status_acc, status_rej,
                         jnp.int32(SolverStatus.RUNNING)).astype(jnp.int32),
            it=c.it + concluded.astype(jnp.int32),
            aidx=jnp.where(concluded, 0,
                           c.aidx + k_alpha).astype(jnp.int32),
            clip=c.clip | clip1 | clip2,
        )

        def keep_gnorm(n, o):
            return jnp.where(gnorm_done, o, n)

        new = _CarryBL(
            xs=keep_gnorm(new.xs, c.xs),
            us=keep_gnorm(new.us, c.us),
            cost=jax.tree.map(keep_gnorm, new.cost, c.cost),
            pc=keep_gnorm(new.pc, c.pc),
            lam=keep_gnorm(new.lam, c.lam),
            dlam=keep_gnorm(new.dlam, c.dlam),
            status=jnp.where(gnorm_done,
                             jnp.int32(SolverStatus.SUCCESS_GNORM),
                             new.status),
            it=jnp.where(gnorm_done, c.it + 1, new.it),
            aidx=jnp.where(gnorm_done, 0, new.aidx).astype(jnp.int32),
            clip=new.clip,   # monotone flag: never reverted
        )

        # freeze non-RUNNING lanes
        running = c.status == SolverStatus.RUNNING

        def frz(n, o):
            return jnp.where(running, n, o)

        return jax.tree.map(frz, new, c)

    return body


def _run_carry(carry: _CarryBL, goals, cbl, cfg, veh, dt,
               iter_cap: int, trip_cap: int = 0) -> _CarryBL:
    """Run the outer loop until every lane concludes or reaches iter_cap
    ITERATIONS (statuses stay RUNNING at the cap so a later run resumes).

    trip_cap > 0 additionally bounds the number of while-loop TRIPS
    (line-search steps). One iteration can cost many trips — each alpha
    rejection burns a full-width trip — so an iteration-capped phase 1
    makes the whole batch wait on its most rejection-heavy lane at FULL
    width (profiled round 4: ~32 full-width trips to conclude 3
    iterations at B=1024). A trip cap hands stragglers to the compaction
    cascade instead. Purely a scheduling boundary: lanes resume
    mid-line-search via the aidx carry, so per-lane decision sequences
    are unchanged (the compaction bitwise-equivalence argument covers
    it)."""
    body = _make_body(goals, cbl, cfg, veh, dt, goals.dtype,
                      goals.shape[1] - 1)

    def cond(c: _CarryBL):
        return ((c.status == SolverStatus.RUNNING)
                & (c.it < iter_cap)).any()

    if not trip_cap:
        return jax.lax.while_loop(cond, body, carry)

    def cond_t(state):
        c, t = state
        return cond(c) & (t < trip_cap)

    def body_t(state):
        c, t = state
        return body(c), t + 1

    out, _ = jax.lax.while_loop(cond_t, body_t,
                                (carry, jnp.zeros((), jnp.int32)))
    return out


def _bl(a):
    """[B, N, k] -> [k, N, B]."""
    return jnp.moveaxis(jnp.moveaxis(a, 0, -1), 1, 0)


def _bf(a):
    """[k, N, B] -> [B, N, k]."""
    return jnp.moveaxis(jnp.moveaxis(a, 0, 1), -1, 0)


def _prep(goals_bf, starts, cons, cfg, veh, dt, warm_start):
    """transform_goals + init guess + batch-last layout + constraint prep
    + initial carry. Returns (goals_first, goals, cbl, init_carry,
    xs0_bf, us0_bf)."""
    dtype = goals_bf.dtype
    B = goals_bf.shape[0]
    goals_first = jax.vmap(transform_goals)(goals_bf, starts)
    if warm_start is None:
        xs0_bf, us0_bf = jax.vmap(
            lambda g: iqr_init(g, cfg, veh, dt))(goals_first)
    else:
        xs0_bf, us0_bf = warm_start
    goals = _bl(goals_first)                               # [6, N, B]
    xs0 = _bl(xs0_bf)
    us0 = _bl(us0_bf)
    cbl = cons_to_bl(cons, goals_bl=goals, lane_window=cfg.lane_window)
    cost0, pc0, clip0 = _cost_stack_bl(xs0, us0, goals, cbl, cfg, veh,
                                       False)
    init = _CarryBL(
        xs=xs0, us=us0, cost=cost0, pc=pc0,
        lam=jnp.full((B,), cfg.reg.lambda_init, dtype),
        dlam=jnp.ones((B,), dtype),
        status=jnp.full((B,), SolverStatus.RUNNING, jnp.int32),
        it=jnp.zeros((B,), jnp.int32),
        aidx=jnp.zeros((B,), jnp.int32),
        clip=clip0)
    return goals_first, goals, cbl, init, xs0_bf, us0_bf


def _finalize(final: _CarryBL, xs0_bf, us0_bf) -> SolveResult:
    status = jnp.where(final.status == SolverStatus.RUNNING,
                       jnp.int32(SolverStatus.MAX_ITER), final.status)
    return SolveResult(xs=_bf(final.xs), us=_bf(final.us), status=status,
                       iters=final.it, cost=final.cost, lam=final.lam,
                       init_xs=xs0_bf, init_us=us0_bf,
                       lane_clipped=final.clip)


def solve_batch_bl(goals_bf, starts, cons: ConstraintSet,
                   cfg: IlqrConfig, veh: VehicleParam, dt,
                   warm_start=None) -> SolveResult:
    """Batched solve, batch-last internals. goals_bf [B, N, 6],
    starts [B, 6], cons leaves [B, ...]. Returns batch-first SolveResult
    bitwise-equivalent in semantics to vmap(solver.solve) in serial mode.

    With cfg.compaction_phase1 > 0, delegates to solve_batch_compact
    (identical per-lane results; see there)."""
    if cfg.compaction_phase1 > 0 and goals_bf.shape[0] > 2:
        return solve_batch_compact(goals_bf, starts, cons, cfg, veh, dt,
                                   warm_start=warm_start)
    _, goals, cbl, init, xs0_bf, us0_bf = _prep(
        goals_bf, starts, cons, cfg, veh, dt, warm_start)
    final = _run_carry(init, goals, cbl, cfg, veh, dt, cfg.max_iter_num)
    return _finalize(final, xs0_bf, us0_bf)


class _StateBF(NamedTuple):
    """Full solver carry in batch-first layout (for row gathers)."""

    xs: jnp.ndarray        # [B, N, 6]
    us: jnp.ndarray        # [B, T, 2]
    cost: CostBreakdown    # [B] leaves
    pc: jnp.ndarray        # [B, N]
    lam: jnp.ndarray
    dlam: jnp.ndarray
    status: jnp.ndarray
    it: jnp.ndarray
    aidx: jnp.ndarray
    clip: jnp.ndarray


def _carry_to_bf(c: _CarryBL) -> _StateBF:
    return _StateBF(xs=_bf(c.xs), us=_bf(c.us), cost=c.cost,
                    pc=jnp.moveaxis(c.pc, 0, 1), lam=c.lam,
                    dlam=c.dlam, status=c.status, it=c.it, aidx=c.aidx,
                    clip=c.clip)


def _carry_from_bf(s: _StateBF) -> _CarryBL:
    return _CarryBL(xs=_bl(s.xs), us=_bl(s.us), cost=s.cost,
                    pc=jnp.moveaxis(s.pc, 0, 1), lam=s.lam,
                    dlam=s.dlam, status=s.status, it=s.it, aidx=s.aidx,
                    clip=s.clip)


def solve_batch_compact(goals_bf, starts, cons: ConstraintSet,
                        cfg: IlqrConfig, veh: VehicleParam, dt,
                        warm_start=None) -> SolveResult:
    """Two-phase solve with converged-lane compaction.

    The batch runs in lockstep until its SLOWEST lane concludes (mean ~10
    iterations, tail ~35 on the fixture; trips multiply further through
    serial line-search rejections) — most trips late in the solve update
    only a few live lanes at full batch width. Phase 1 runs the full
    batch to cfg.compaction_phase1 iterations; the still-running minority
    is then gathered (complete solver carry: trajectory, cost, lambda,
    d-lambda, alpha index, iteration count) into a batch of
    B/compaction_factor lanes and run to conclusion, repeating if the
    overflow exceeds the compact width.

    No body operation reduces over the batch axis, so a lane's decision
    sequence is independent of its batch position; results match the
    single-phase solve decision-for-decision with controls equal to XLA's
    width-dependent fusion reassociation (~1e-14 in f64 — XLA fuses the
    same per-lane graph slightly differently at different batch widths;
    tests/test_solver_blast.py pins this).
    """
    B = goals_bf.shape[0]
    goals_first, goals, cbl, init, xs0_bf, us0_bf = _prep(
        goals_bf, starts, cons, cfg, veh, dt, warm_start)
    c1 = _run_carry(init, goals, cbl, cfg, veh, dt, cfg.compaction_phase1,
                    trip_cap=cfg.compaction_phase1_trips)
    st = _carry_to_bf(c1)

    def one_round(s: _StateBF, width: int, cap: int) -> _StateBF:
        """Gather `width` lanes (running first), run to `cap` iterations,
        scatter back. Lanes still running at the cap resume later."""
        running = ((s.status == SolverStatus.RUNNING)
                   & (s.it < cfg.max_iter_num))
        idx = jnp.argsort(~running)[:width]    # running lanes first, stable
        sub = jax.tree.map(lambda a: a[idx], s)
        gsub = goals_first[idx]
        csub = jax.tree.map(lambda a: a[idx], cons)
        gl = _bl(gsub)
        cblk = cons_to_bl(csub, goals_bl=gl, lane_window=cfg.lane_window)
        out = _run_carry(_carry_from_bf(sub), gl, cblk, cfg, veh, dt, cap)
        outs = _carry_to_bf(out)
        return jax.tree.map(lambda full, part: full.at[idx].set(part),
                            s, outs)

    # cascade: halve the width each stage (doubling the iteration cap)
    # down to one Pallas sweep block, so large batches do not drag their
    # stragglers at full width. On TPU the width floors at one sweep
    # block (128) so compact rounds keep the fused Pallas sweep.
    floor_w = 1
    if cfg.sweep_backend != "xla" and jax.default_backend() != "cpu":
        from .pallas.sweep import NB as _NB

        if B % _NB == 0:
            floor_w = min(B, _NB)
    width = min(B, max(floor_w, B // max(1, cfg.compaction_factor)))
    cap = cfg.compaction_phase1
    while width > 128:
        cap *= 2
        st = one_round(st, width, cap)
        width //= 2

    # mop-up rounds at the final width until every lane concludes
    def round_cond(s: _StateBF):
        return ((s.status == SolverStatus.RUNNING)
                & (s.it < cfg.max_iter_num)).any()

    st = jax.lax.while_loop(
        round_cond,
        lambda s: one_round(s, width, cfg.max_iter_num), st)
    final = _carry_from_bf(st)
    return _finalize(final, xs0_bf, us0_bf)
