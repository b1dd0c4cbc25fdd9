"""CILQR cost stack: tracking quadratics + limit/corridor/lane barriers.

Replaces the TotalCost / CostJacbian / CostHessian family
(/root/reference/algorithm/ilqr/ilqr_optimizer.cc:417-769) with fully
vectorized jnp over the whole horizon at once: [N,6] states, [N-1,2]
controls, [N,KC,3] masked corridor half-planes, [S,3] masked lane planes.

Derivatives are hand-assembled (not autodiff) to replicate the reference's
exact Gauss-Newton-with-curvature structure, including the barrier
quadratic-branch Hessian quirk (see barriers.py). ``jax.grad`` of
``total_cost`` equals ``cost_jacobians`` (verified in tests); the Hessians
intentionally differ on the barrier's relaxed branch.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from .barriers import make_barrier
from .config import IlqrConfig, VehicleParam
from .geometry import point_segment_distance
from .types import CostBreakdown


class ConstraintSet(NamedTuple):
    """Shrunk + normalized constraints fed to the solver.

    corridor_planes: [N, KC, 3]; corridor_mask: [N, KC]
    left/right lane planes [S,3], segs [S,2,2], mask [S]
    """

    corridor_planes: jnp.ndarray
    corridor_mask: jnp.ndarray
    left_planes: jnp.ndarray
    left_segs: jnp.ndarray
    left_mask: jnp.ndarray
    right_planes: jnp.ndarray
    right_segs: jnp.ndarray
    right_mask: jnp.ndarray


def shrink_and_normalize(planes_corridor, corridor_mask,
                         left_planes, left_segs, left_mask,
                         right_planes, right_segs, right_mask,
                         cfg: IlqrConfig, veh: VehicleParam) -> ConstraintSet:
    """ShrinkConstraints + NormalizeHalfPlane (ilqr_optimizer.cc:438-495).

    Shrink: c -= r * hypot(a,b)  (the reference's (a^2+b^2)/hypot == hypot),
    with r = disc_radius + safe_margin for corridors, disc_radius for lanes
    — plus cfg.cover_margin on both, covering the reference's
    2-disc-output-model-vs-5-disc-shrink deficit (IlqrConfig.cover_margin;
    0 restores the reference's exact semantics).
    Normalize: divide (a,b,c) by ||(a,b,c)|| — the reference's non-standard
    3-vector norm, replicated exactly.
    """
    r_corr = (veh.disc_radius(cfg.num_of_disc) + cfg.safe_margin
              + cfg.cover_margin)
    r_lane = veh.disc_radius(cfg.num_of_disc) + cfg.cover_margin

    def shrink(planes, r):
        ab = jnp.hypot(planes[..., 0], planes[..., 1])
        return planes.at[..., 2].add(-r * ab)

    def normalize(planes):
        n = jnp.sqrt(planes[..., 0] ** 2 + planes[..., 1] ** 2 + planes[..., 2] ** 2)
        n = jnp.where(n > 0, n, 1.0)
        return planes / n[..., None]

    return ConstraintSet(
        corridor_planes=normalize(shrink(planes_corridor, r_corr)),
        corridor_mask=corridor_mask,
        left_planes=normalize(shrink(left_planes, r_lane)),
        left_segs=left_segs,
        left_mask=left_mask,
        right_planes=normalize(shrink(right_planes, r_lane)),
        right_segs=right_segs,
        right_mask=right_mask,
    )


def tighten_constraints(cons: ConstraintSet, margin) -> ConstraintSet:
    """Shift every corridor and lane half-plane boundary inward by
    ``margin`` metres (the repair solve's corrective configuration,
    RepairConfig.margins).

    For a plane (a, b, c) with constraint a x + b y <= c, the boundary's
    geometric offset is c / hypot(a, b), so c -= margin * hypot(a, b)
    moves it exactly ``margin`` metres inward — the same arithmetic
    shrink_and_normalize applies for the disc radius
    (ilqr_optimizer.cc:438-473), valid on already-normalized planes (the
    reference's 3-vector normalization scales a, b, c together)."""

    def shift(planes):
        ab = jnp.hypot(planes[..., 0], planes[..., 1])
        return planes.at[..., 2].add(-margin * ab)

    return cons._replace(corridor_planes=shift(cons.corridor_planes),
                         left_planes=shift(cons.left_planes),
                         right_planes=shift(cons.right_planes))


def trim_constraints(cons: ConstraintSet, multiple: int = 8) -> ConstraintSet:
    """Trim unused padded constraint slots (host-side, outside jit).

    The corridor/lane builders pad to static maxima (CorridorConfig
    max_constraints/max_lane_segments); real problems use far fewer slots
    (fixture: max 12 of 24 corridor planes). Slicing to the highest valid
    slot (rounded up to `multiple` for kernel chunk alignment) is exact
    for ANY mask pattern — everything dropped is masked out — and cuts
    the barrier stack's per-trip tensor work proportionally."""
    import numpy as np

    def hi(mask):
        m = np.asarray(mask)
        idx = np.where(m.any(axis=tuple(range(m.ndim - 1))))[0]
        n = int(idx[-1]) + 1 if idx.size else 1
        return min(m.shape[-1], -(-n // multiple) * multiple)

    kc = hi(cons.corridor_mask)
    sl = hi(cons.left_mask)
    sr = hi(cons.right_mask)
    s = max(sl, sr)
    return ConstraintSet(
        corridor_planes=cons.corridor_planes[..., :kc, :],
        corridor_mask=cons.corridor_mask[..., :kc],
        left_planes=cons.left_planes[..., :s, :],
        left_segs=cons.left_segs[..., :s, :, :],
        left_mask=cons.left_mask[..., :s],
        right_planes=cons.right_planes[..., :s, :],
        right_segs=cons.right_segs[..., :s, :, :],
        right_mask=cons.right_mask[..., :s],
    )


def disc_geometry(xs, cfg: IlqrConfig, veh: VehicleParam):
    """Disc-center offsets along heading (ilqr_optimizer.cc:556-565).

    Returns (cx [N,D], cy [N,D], length_cos [N,D], length_sin [N,D]).
    """
    D = cfg.num_of_disc
    L = veh.length / D
    rf = veh.rear_hang_length
    offs = L * (jnp.arange(D, dtype=xs.dtype) - 0.5) - rf  # [D]
    ct = jnp.cos(xs[:, 2])[:, None]
    st = jnp.sin(xs[:, 2])[:, None]
    length_cos = offs[None, :] * ct
    length_sin = offs[None, :] * st
    cx = xs[:, 0:1] + length_cos
    cy = xs[:, 1:2] + length_sin
    return cx, cy, length_cos, length_sin


def _limit_terms_state(xs, veh: VehicleParam):
    """Stacked state-limit constraint values g<=0 with their d/dstate rows.

    Order matches DynamicsCost (ilqr_optimizer.cc:522-536):
    -v, v-vmax, a-amax, amin-a, delta-dmax, dmin-delta.
    Returns (g [N,6], grad_idx [6], grad_sign [6]).
    """
    v = xs[:, 3]
    a = xs[:, 4]
    d = xs[:, 5]
    g = jnp.stack([
        -v,
        v - veh.max_velocity,
        a - veh.max_acceleration,
        veh.min_acceleration - a,
        d - veh.delta_max,
        veh.delta_min - d,
    ], axis=-1)
    grad_idx = jnp.array([3, 3, 4, 4, 5, 5])
    grad_sign = jnp.array([-1.0, 1.0, 1.0, -1.0, 1.0, -1.0])
    return g, grad_idx, grad_sign


def _limit_terms_control(us, veh: VehicleParam):
    """Control-limit constraints (ilqr_optimizer.cc:542-547):
    jerk-jmax, jmin-jerk, drate-drmax, drmin-drate."""
    j = us[:, 0]
    dr = us[:, 1]
    g = jnp.stack([
        j - veh.jerk_max,
        veh.jerk_min - j,
        dr - veh.delta_rate_max,
        veh.delta_rate_min - dr,
    ], axis=-1)
    grad_idx = jnp.array([0, 0, 1, 1])
    grad_sign = jnp.array([1.0, -1.0, 1.0, -1.0])
    return g, grad_idx, grad_sign


def _nearest_lane_plane(cx, cy, planes, segs, mask):
    """FindNeastLaneSegment (ilqr_optimizer.cc:605-618) vectorized:
    cx, cy [N,D]; planes [S,3]; segs [S,2,2]; mask [S].
    Returns gathered planes [N,D,3]."""
    d = point_segment_distance(
        cx[..., None], cy[..., None],
        segs[None, None, :, 0, 0], segs[None, None, :, 0, 1],
        segs[None, None, :, 1, 0], segs[None, None, :, 1, 1])
    d = jnp.where(mask[None, None, :], d, jnp.inf)
    idx = jnp.argmin(d, axis=-1)  # [N,D]
    return planes[idx]


def total_cost(xs, us, goals, cons: ConstraintSet,
               cfg: IlqrConfig, veh: VehicleParam) -> CostBreakdown:
    """TotalCost (ilqr_optimizer.cc:417-436) with component breakdown."""
    bar = make_barrier(cfg.barrier)
    w = cfg.weights

    # --- JCost (ilqr_optimizer.cc:497-516)
    dx = xs[:, 0] - goals[:, 0]
    dy = xs[:, 1] - goals[:, 1]
    dth = xs[:, 2] - goals[:, 2]
    j_cost = jnp.sum(w.x_target * dx * dx + w.y_target * dy * dy + w.theta * dth * dth)
    j_cost = j_cost + jnp.sum(w.jerk * us[:, 0] ** 2 + w.delta_rate * us[:, 1] ** 2)

    # --- limit barriers (DynamicsCost, ilqr_optimizer.cc:518-551)
    gx, _, _ = _limit_terms_state(xs, veh)
    gu, _, _ = _limit_terms_control(us, veh)
    dyn_cost = jnp.sum(bar.value(gx)) + jnp.sum(bar.value(gu))

    # --- corridor barriers (CorridorCost, ilqr_optimizer.cc:553-581)
    cx, cy, _, _ = disc_geometry(xs, cfg, veh)
    p = cons.corridor_planes  # [N,KC,3]
    g = (p[:, None, :, 0] * cx[:, :, None] +
         p[:, None, :, 1] * cy[:, :, None] - p[:, None, :, 2])  # [N,D,KC]
    corr_cost = jnp.sum(jnp.where(cons.corridor_mask[:, None, :], bar.value(g), 0.0))

    # --- lane barriers (LaneBoundaryCost, ilqr_optimizer.cc:583-603)
    lane_cost = jnp.zeros((), xs.dtype)
    for planes, segs, mask in ((cons.left_planes, cons.left_segs, cons.left_mask),
                               (cons.right_planes, cons.right_segs, cons.right_mask)):
        pl = _nearest_lane_plane(cx, cy, planes, segs, mask)  # [N,D,3]
        gl = pl[..., 0] * cx + pl[..., 1] * cy - pl[..., 2]
        lane_cost = lane_cost + jnp.sum(bar.value(gl))

    total = j_cost + dyn_cost + corr_cost + lane_cost
    return CostBreakdown(total=total, target=j_cost, dynamic=dyn_cost,
                         corridor=corr_cost, lane=lane_cost)


def cost_derivatives(xs, us, goals, cons: ConstraintSet,
                     cfg: IlqrConfig, veh: VehicleParam):
    """Analytic per-knot cost Jacobians and Hessians, whole horizon at once
    (CostJacbian/CostHessian + the 6 Cons* helpers,
    ilqr_optimizer.cc:620-769).

    Returns (Jx [N,6], Ju [T,2], Hx [N,6,6], Hu [T,2,2]); the terminal knot
    uses control (0,0) and contributes no Ju/Hu, matching
    ilqr_optimizer.cc:209-212.
    """
    bar = make_barrier(cfg.barrier)
    w = cfg.weights
    N = xs.shape[0]
    T = us.shape[0]
    dtype = xs.dtype

    # --- tracking quadratics
    Jx = jnp.zeros((N, 6), dtype)
    Jx = Jx.at[:, 0].set(2.0 * w.x_target * (xs[:, 0] - goals[:, 0]))
    Jx = Jx.at[:, 1].set(2.0 * w.y_target * (xs[:, 1] - goals[:, 1]))
    Jx = Jx.at[:, 2].set(2.0 * w.theta * (xs[:, 2] - goals[:, 2]))
    Ju = 2.0 * jnp.stack([w.jerk * us[:, 0], w.delta_rate * us[:, 1]], axis=-1)

    Hx = jnp.zeros((N, 6, 6), dtype)
    diag = jnp.array([2 * w.x_target, 2 * w.y_target, 2 * w.theta,
                      2 * w.v, 2 * w.a, 2 * w.delta], dtype)
    Hx = Hx + jnp.diag(diag)[None]
    Hu = jnp.zeros((T, 2, 2), dtype) + jnp.diag(
        jnp.array([2 * w.jerk, 2 * w.delta_rate], dtype))[None]

    # --- state limit barriers
    gxv, gxi, gxs = _limit_terms_state(xs, veh)       # [N,6]
    gf = bar.grad_factor(gxv) * gxs[None, :]           # [N,6]
    hf, _ = bar.hess_factors(gxv)                      # ddx = 0 (linear g)
    for k in range(6):
        Jx = Jx.at[:, gxi[k]].add(gf[:, k])
        Hx = Hx.at[:, gxi[k], gxi[k]].add(hf[:, k])    # sign^2 == 1

    # --- control limit barriers
    guv, gui, gus = _limit_terms_control(us, veh)
    guf = bar.grad_factor(guv) * gus[None, :]
    huf, _ = bar.hess_factors(guv)
    for k in range(4):
        Ju = Ju.at[:, gui[k]].add(guf[:, k])
        Hu = Hu.at[:, gui[k], gui[k]].add(huf[:, k])

    # --- corridor barriers (CorridorConsJacbian/Hessian, :690-727)
    cx, cy, lc, ls = disc_geometry(xs, cfg, veh)       # [N,D]
    p = cons.corridor_planes                           # [N,KC,3]
    a = p[..., 0][:, None, :]                          # [N,1,KC]
    b = p[..., 1][:, None, :]
    c = p[..., 2][:, None, :]
    g = a * cx[:, :, None] + b * cy[:, :, None] - c    # [N,D,KC]
    m = cons.corridor_mask[:, None, :]
    dth = -a * ls[:, :, None] + b * lc[:, :, None]     # dg/dtheta [N,D,KC]
    gfac = jnp.where(m, bar.grad_factor(g), 0.0)
    hfac, hddx = bar.hess_factors(g)
    hfac = jnp.where(m, hfac, 0.0)
    hddx = jnp.where(m, hddx, 0.0)
    ddx22 = -a * lc[:, :, None] - b * ls[:, :, None]   # d2g/dtheta2

    def accum_plane_terms(Jx, Hx, a, b, dth, gfac, hfac, hddx, ddx22):
        """Accumulate barrier-of-half-plane derivative contributions over
        the trailing (disc, plane) axes. dvec = (a, b, dth, 0, 0, 0)."""
        red = tuple(range(1, a.ndim))
        Jx = Jx.at[:, 0].add(jnp.sum(gfac * a, axis=red))
        Jx = Jx.at[:, 1].add(jnp.sum(gfac * b, axis=red))
        Jx = Jx.at[:, 2].add(jnp.sum(gfac * dth, axis=red))
        comps = (a, b, dth)
        for i in range(3):
            for j in range(3):
                Hx = Hx.at[:, i, j].add(jnp.sum(hfac * comps[i] * comps[j], axis=red))
        Hx = Hx.at[:, 2, 2].add(jnp.sum(hddx * ddx22, axis=red))
        return Jx, Hx

    Jx, Hx = accum_plane_terms(Jx, Hx, jnp.broadcast_to(a, g.shape),
                               jnp.broadcast_to(b, g.shape), dth,
                               gfac, hfac, hddx, ddx22)

    # --- lane barriers (LaneBoundaryConsJacbian/Hessian, :729-769)
    for planes, segs, mask in ((cons.left_planes, cons.left_segs, cons.left_mask),
                               (cons.right_planes, cons.right_segs, cons.right_mask)):
        pl = _nearest_lane_plane(cx, cy, planes, segs, mask)  # [N,D,3]
        la = pl[..., 0]
        lb = pl[..., 1]
        lg = la * cx + lb * cy - pl[..., 2]                   # [N,D]
        ldth = -la * ls + lb * lc
        lgf = bar.grad_factor(lg)
        lhf, lhd = bar.hess_factors(lg)
        lddx22 = -la * lc - lb * ls
        Jx, Hx = accum_plane_terms(Jx, Hx, la, lb, ldth, lgf, lhf, lhd, lddx22)

    return Jx, Ju, Hx, Hu
