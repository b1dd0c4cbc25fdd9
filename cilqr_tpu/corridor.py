"""Convex safe-corridor construction (sphere-flip + double convex hull).

TPU-native re-design of Corridor (/root/reference/algorithm/ilqr/
corridor.{h,cc}): per-knot seed points are gathered into fixed-K masked
buffers, the sphere flip is elementwise, and the reference's three
cv::convexHull calls become masked monotone-chain hulls (geometry.py) that
vmap across all 81 knots (and scenario batches) at once.

Pipeline per knot (BuildCorridor, corridor.cc:122-263):
  seeds -> filter (|dx|,|dy| <= 25, norm > 0) -> flip p' = p(2R/|p| - 1)
  -> hull1 of {flipped points, origin} -> map hull vertices back to
  original coords (origin-vertex interior-point fix) -> hull2 ->
  per-seed half-planes with hull2 edge normals -> dual points -> dual hull
  -> polygon vertices -> final half-planes a x + b y <= c.

Deviations from the reference (documented, not copied):
  * the reference's safe_radius keeps the norm of the *last* point below
    R (corridor.cc:166-169), not the min — replicated;
  * the reference's (OriginIndex - 1) % size underflows for OriginIndex=0
    (C++ negative modulo, corridor.cc:203) — we use positive modulo;
  * cv::convexHull outputs extreme vertices only; ours likewise drops
    collinear boundary points.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .config import CorridorConfig
from .geometry import convex_hull_masked
from .types import CorridorSet, Scenario, Traj
from .world import query_dynamic_points


def _box_sample_points(x, y, theta, cfg: CorridorConfig, dtype):
    """AddCorridorPoints (corridor.cc:89-120): 4 corners of a +-max_axis box
    around the pose; each edge sampled at ratios {0, 1} (8 points, corners
    twice), or at step 1/5 when is_multiple_sample (24 points)."""
    from .geometry import sample_polygon_edges

    ch = jnp.cos(theta)
    sh = jnp.sin(theta)
    dx1 = ch * cfg.max_axis_x
    dy1 = sh * cfg.max_axis_x
    dx2 = sh * cfg.max_axis_y
    dy2 = -ch * cfg.max_axis_y
    cx = jnp.stack([x + dx1 + dx2, x + dx1 - dx2, x - dx1 - dx2, x - dx1 + dx2])
    cy = jnp.stack([y + dy1 + dy2, y + dy1 - dy2, y - dy1 - dy2, y - dy1 + dy2])
    cur = jnp.stack([cx, cy], axis=-1)
    mult = 5 if cfg.is_multiple_sample else 1
    return sample_polygon_edges(cur, mult)


def corridor_seed_points(scn: Scenario, x, y, theta, time,
                         cfg: CorridorConfig, max_points: int, dyn=None):
    """Seed set per knot: static corners + dynamic corners at knot time +
    box samples (BuildCorridorConstraints, corridor.cc:56-87). With
    is_multiple_sample, obstacle polygon boundaries are sampled 5x
    (environment.cpp:160-161,177-178). ``dyn`` optionally supplies this
    knot's precomputed (dyn_pts, dyn_mask) from
    world.query_dynamic_points_grid (the gather-free all-knots query)."""
    from .geometry import sample_polygon_edges

    dtype = scn.static_obs.dtype
    dyn_pts, dyn_mask = (query_dynamic_points(scn, time) if dyn is None
                         else dyn)
    if cfg.is_multiple_sample:
        st_pts = sample_polygon_edges(scn.static_obs, 5).reshape(-1, 2)
        st_mask = jnp.repeat(scn.static_mask, 24)
        dyn_pts = sample_polygon_edges(dyn_pts.reshape(-1, 4, 2), 5
                                       ).reshape(-1, 2)
        dyn_mask = jnp.repeat(dyn_mask.reshape(-1, 4)[:, 0], 24)
    else:
        st_pts = scn.static_obs.reshape(-1, 2)
        st_mask = jnp.repeat(scn.static_mask, 4)
    box_pts = _box_sample_points(x, y, theta, cfg, dtype)
    nb = box_pts.shape[0]
    pts = jnp.concatenate([st_pts, dyn_pts, box_pts], axis=0)
    mask = jnp.concatenate([st_mask, dyn_mask,
                            jnp.ones((nb,), bool)], axis=0)
    K = pts.shape[0]
    if K > max_points:
        raise ValueError(f"corridor max_points={max_points} < seeds {K}")
    pad = max_points - K
    pts = jnp.concatenate([pts, jnp.zeros((pad, 2), dtype)], axis=0)
    mask = jnp.concatenate([mask, jnp.zeros((pad,), bool)], axis=0)
    return pts, mask


def build_corridor(origin_x, origin_y, pts, mask, cfg: CorridorConfig,
                   max_constraints: int):
    """One knot's corridor (BuildCorridor, corridor.cc:122-263).

    Returns (planes [KC,3], plane_mask [KC], polygon [KC,2], poly_mask [KC],
    ok)."""
    dtype = pts.dtype
    K = pts.shape[0]
    R = cfg.radius

    dx = pts[:, 0] - origin_x
    dy = pts[:, 1] - origin_y
    norm = jnp.hypot(dx, dy)
    valid = (mask & (jnp.abs(dx) <= cfg.max_diff_x) &
             (jnp.abs(dy) <= cfg.max_diff_y) & (norm >= 1e-10))

    # safe_radius: norm of the LAST valid point with norm < R (corridor.cc:166-169)
    below = valid & (norm < R)
    rev_pos = jnp.where(below, jnp.arange(K), -1)
    last = jnp.argmax(rev_pos)
    safe_radius = jnp.where(below.any(), norm[last], R)

    # sphere flip (corridor.cc:173-174); origin appended at index K
    scale = jnp.where(valid, 2.0 * R / jnp.where(norm > 0, norm, 1.0) - 1.0, 0.0)
    fx = dx * scale
    fy = dy * scale
    flip = jnp.stack([jnp.concatenate([fx, jnp.zeros((1,), dtype)]),
                      jnp.concatenate([fy, jnp.zeros((1,), dtype)])], axis=-1)
    flip_mask = jnp.concatenate([valid, jnp.ones((1,), bool)])
    n_valid = valid.sum()
    ok = n_valid >= 4  # corridor.cc:178-181

    # hull 1 (flipped space). The ORIGINAL coordinates ride through the
    # hull's sorts as payload (origin slot carries the origin pose), so no
    # map-back gather from the [K] seed table is needed; hull vertices come
    # back compacted into the leading slots, so everything downstream
    # (hull 2, the dual hull) runs at the narrow hull_max width instead of
    # K+1 — exact whenever hull 1 has <= hull_max vertices, flagged via ok
    # otherwise. All index arithmetic below is one-hot select-reduces /
    # static shifts: per-lane dynamic-index gathers under vmap were the
    # corridor stage's dominant cost on TPU.
    o1 = jnp.ones((1,), dtype)
    pay = (jnp.concatenate([jnp.where(valid, pts[:, 0], 0.0), origin_x * o1]),
           jnp.concatenate([jnp.where(valid, pts[:, 1], 0.0), origin_y * o1]),
           jnp.concatenate([jnp.zeros((K,), dtype), o1]))
    _, h1_mask, h1_count, (vx, vy, org) = convex_hull_masked(
        flip, flip_mask, payload=pay)
    H = min(cfg.hull_max, K + 1)
    ok = ok & (h1_count <= H)
    h1_mask = h1_mask[:H]
    vx = vx[:H]
    vy = vy[:H]
    is_origin = (org[:H] > 0.5) & h1_mask

    # interior point (corridor.cc:200-215); vx[prev]/vx[nxt] as one-hot
    # select-reduces over the narrow hull width
    origin_on_hull = is_origin.any()
    opos = jnp.argmax(is_origin)
    prev = jnp.mod(opos - 1, h1_count)
    nxt = jnp.mod(opos + 1, h1_count)
    kpos = jnp.arange(H)
    vx_p = jnp.sum(jnp.where(kpos == prev, vx, 0.0))
    vy_p = jnp.sum(jnp.where(kpos == prev, vy, 0.0))
    vx_n = jnp.sum(jnp.where(kpos == nxt, vx, 0.0))
    vy_n = jnp.sum(jnp.where(kpos == nxt, vy, 0.0))
    ix = (vx_p + origin_x + vx_n) / 3.0 - origin_x
    iy = (vy_p + origin_y + vy_n) / 3.0 - origin_y
    d = jnp.sqrt(ix * ix + iy * iy)
    d = jnp.where(d > 0, d, 1.0)
    interior_x = jnp.where(origin_on_hull,
                           0.99 * safe_radius * ix / d + origin_x, origin_x)
    interior_y = jnp.where(origin_on_hull,
                           0.99 * safe_radius * iy / d + origin_y, origin_y)

    # hull 2 over the mapped-back vertices (corridor.cc:217-218); payload =
    # hull-1 position so the walk order needs no index gather
    vpts = jnp.stack([vx, vy], axis=-1)
    h2pts, h2_mask, h2_count, (h2_pos,) = convex_hull_masked(
        vpts, h1_mask, payload=(kpos.astype(jnp.int32),))
    # h2_pos are positions in hull-1 order; sort ascending = the reference's
    # incrementing walk order (corridor.cc:221-233), coordinates carried
    h2_pos = jnp.where(h2_mask, h2_pos, jnp.int32(H + 1))
    q, ax, ay = jax.lax.sort((h2_pos, h2pts[:, 0], h2pts[:, 1]), num_keys=1)

    # edge normals between consecutive hull-2 vertices (in walk order):
    # next vertex = static shift with wrap at h2_count-1 -> 0
    wrap = kpos == h2_count - 1
    bx = jnp.where(wrap, ax[0], jnp.concatenate([ax[1:], ax[:1]]))
    by = jnp.where(wrap, ay[0], jnp.concatenate([ay[1:], ay[:1]]))
    rayx = bx - ax
    rayy = by - ay
    nlen = jnp.hypot(rayy, rayx)
    nlen = jnp.where(nlen > 0, nlen, 1.0)
    nx_e = rayy / nlen   # outward normal for CCW hull (corridor.cc:224-225)
    ny_e = -rayx / nlen

    # assign each hull-1 vertex position k to the covering hull-2 edge:
    # j = last q <= k (cyclic; k < q[0] wraps to the last edge);
    # searchsorted(right) == count of q <= k since q is ascending
    j = jnp.sum((q[None, :] <= kpos[:, None]).astype(jnp.int32), axis=1) - 1
    j = jnp.where(j < 0, h2_count - 1, jnp.minimum(j, h2_count - 1))
    sel = j[:, None] == kpos[None, :]
    na = jnp.sum(jnp.where(sel, nx_e[None, :], 0.0), axis=1)
    nb = jnp.sum(jnp.where(sel, ny_e[None, :], 0.0), axis=1)
    cc = (vx - interior_x) * na + (vy - interior_y) * nb  # offsets (interior-rel)
    cons_mask = h1_mask

    # dual points (corridor.cc:235-239)
    cc_safe = jnp.where(jnp.abs(cc) > 1e-12, cc, 1e-12)
    dpx = jnp.where(cons_mask, na / cc_safe, 0.0)
    dpy = jnp.where(cons_mask, nb / cc_safe, 0.0)
    dual = jnp.stack([dpx, dpy], axis=-1)

    # dual hull, clockwise (corridor.cc:241-242): CCW hull reversed —
    # reverse the valid prefix by one-hot select over the narrow width
    dh, dh_mask, dh_count = convex_hull_masked(dual, cons_mask)
    ridx = jnp.mod(dh_count - 1 - kpos, jnp.maximum(dh_count, 1))
    rsel = ridx[:, None] == kpos[None, :]
    dhx = jnp.where(dh_mask, jnp.sum(jnp.where(rsel, dh[None, :, 0], 0.0), 1),
                    0.0)
    dhy = jnp.where(dh_mask, jnp.sum(jnp.where(rsel, dh[None, :, 1], 0.0), 1),
                    0.0)

    # polygon vertices (corridor.cc:244-249); next = static shift + wrap
    dwrap = kpos == dh_count - 1
    rx2 = jnp.where(dwrap, dhx[0], jnp.concatenate([dhx[1:], dhx[:1]])) - dhx
    ry2 = jnp.where(dwrap, dhy[0], jnp.concatenate([dhy[1:], dhy[:1]])) - dhy
    cpoly = ry2 * dhx - rx2 * dhy
    cpoly_safe = jnp.where(jnp.abs(cpoly) > 1e-12, cpoly, 1e-12)
    px = interior_x + ry2 / cpoly_safe
    py = interior_y - rx2 / cpoly_safe

    # final constraints from polygon edges (corridor.cc:251-261)
    rpx = jnp.where(dwrap, px[0], jnp.concatenate([px[1:], px[:1]])) - px
    rpy = jnp.where(dwrap, py[0], jnp.concatenate([py[1:], py[:1]])) - py
    a_f = -rpy
    b_f = rpx
    c_f = a_f * px + b_f * py
    planes = jnp.stack([a_f, b_f, c_f], axis=-1)

    KC = max_constraints
    # a final polygon with more than KC edges would be silently truncated
    # below — dropping half-planes makes the "safe" corridor LESS
    # constrained than computed (unsafe direction), so flag it like the
    # hull_max overflow (the reference's dynamic vectors have no cap,
    # corridor.cc:251-261; tests/test_corridor.py pins the flag)
    ok = ok & (dh_count <= KC)
    take = jnp.arange(KC)
    keep = (take < dh_count)[:, None]
    if KC <= H:
        planes_out = jnp.where(keep, planes[:KC], 0.0)
        poly_out = jnp.where(keep, jnp.stack([px, py], -1)[:KC], 0.0)
    else:
        pad = ((0, KC - H), (0, 0))
        planes_out = jnp.where(keep, jnp.pad(planes, pad), 0.0)
        poly_out = jnp.where(keep, jnp.pad(jnp.stack([px, py], -1), pad), 0.0)
    pmask_out = take < dh_count
    return planes_out, pmask_out, poly_out, pmask_out, ok


def lane_boundary_sample(points: np.ndarray, segment_length: float):
    """LaneBoundarySample (corridor.cc:307-320): host-side greedy resampling
    of the barrier polyline every ~segment_length meters."""
    pts = np.asarray(points)
    kept = [pts[0]]
    last = pts[0]
    for p in pts:
        if np.hypot(p[0] - last[0], p[1] - last[1]) >= segment_length - 1e-10:
            kept.append(p)
            last = p
    return np.asarray(kept)


def lane_constraints(left_barrier: np.ndarray, right_barrier: np.ndarray,
                     cfg: CorridorConfig, dtype=np.float64):
    """CalLeft/RightLaneConstraints (corridor.cc:265-305): half-planes +
    generating segments, padded to cfg.max_lane_segments.

    Left segments run reversed (corridor.cc:279-280) so the inward side
    satisfies a x + b y <= c; right segments run forward (:300-301)."""
    S = cfg.max_lane_segments

    def build(boundary, reverse):
        sampled = lane_boundary_sample(boundary, cfg.lane_segment_length)
        n = len(sampled) - 1
        if n > S:
            raise ValueError(f"max_lane_segments={S} < needed {n}")
        planes = np.zeros((S, 3), dtype)
        segs = np.zeros((S, 2, 2), dtype)
        mask = np.zeros((S,), bool)
        for i in range(1, len(sampled)):
            if reverse:
                s_pt, e_pt = sampled[i], sampled[i - 1]
            else:
                s_pt, e_pt = sampled[i - 1], sampled[i]
            nvec = e_pt - s_pt
            a, b = nvec[1], -nvec[0]
            c = a * s_pt[0] + b * s_pt[1]
            planes[i - 1] = (a, b, c)
            segs[i - 1] = (s_pt, e_pt)
            mask[i - 1] = True
        return planes, segs, mask

    lp, lsg, lm = build(left_barrier, True)
    rp, rsg, rm = build(right_barrier, False)
    return lp, lsg, lm, rp, rsg, rm


def plan_corridors(scn: Scenario, traj: Traj, cfg: CorridorConfig,
                   lane: tuple) -> CorridorSet:
    """Corridor::Plan (corridor.cc:17-54): per-knot corridors (vmapped over
    the horizon) + lane constraints (host-precomputed per road, passed in as
    the ``lane`` tuple from lane_constraints())."""
    lp, lsg, lm, rp, rsg, rm = lane
    from .world import query_dynamic_points_grid

    dyn_all = query_dynamic_points_grid(scn, traj.time)

    def one(x, y, theta, time, dyn_p, dyn_m):
        pts, mask = corridor_seed_points(scn, x, y, theta, time, cfg,
                                         cfg.max_points, dyn=(dyn_p, dyn_m))
        return build_corridor(x, y, pts, mask, cfg, cfg.max_constraints)

    planes, pmask, polys, polymask, ok = jax.vmap(one)(
        traj.x, traj.y, traj.theta, traj.time, dyn_all[0], dyn_all[1])
    return CorridorSet(
        planes=planes, plane_mask=pmask, polygons=polys, poly_mask=polymask,
        left_planes=jnp.asarray(lp), left_segs=jnp.asarray(lsg),
        left_mask=jnp.asarray(lm),
        right_planes=jnp.asarray(rp), right_segs=jnp.asarray(rsg),
        right_mask=jnp.asarray(rm), ok=ok)
