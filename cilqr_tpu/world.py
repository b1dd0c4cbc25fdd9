"""World-model collision and obstacle queries.

TPU-native replacement for the Environment class
(/root/reference/algorithm/utils/environment.cpp): all queries are pure
functions over Scenario tensors, vectorized over arbitrary query batches.

Road-barrier membership has three modes:
  * ``exact`` — brute-force point-in-box over all barrier points, the exact
    semantics of CheckStaticCollision's sorted-x window scan
    (environment.cpp:46-81). Used by parity tests.
  * ``grid``  — a 2-D prefix-sum (integral image) over a 0.1 m occupancy
    grid of the barrier points: each box query is 4 gathers (or 1 with the
    dilated table). Counting is conservative (boundary cells round
    outward), which can only flag extra collisions within one cell of the
    boundary.
  * ``frenet`` — zero-gather arithmetic test against the road-boundary
    OFFSET CURVES the barrier points are sampled from (environment.cpp:
    18-44 samples them at laterals +left_bound/-right_bound every 0.1 m).
    Per-probe table gathers are the TPU's poison (~16 ns/index however
    formulated — docs/PERF.md); this mode instead locally linearizes each
    boundary at the probe's station and intersects the axis-aligned query
    box with that line in closed form, using only station fields the DP
    probe sweep already evaluated. Approximations: first-order Frenet
    offset for the disc centers, boundary curvature ignored across the
    box span, and spatially-adjacent road sections at far-away stations
    (hairpins) are invisible — on the reference road the legs are >= 5 m
    apart so no intrusion is possible. Qualified against ``exact`` in
    tests/test_dp.py::test_dp_frenet_vs_exact.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .geometry import (box_corners, convex_overlap, convex_overlap_aabb,
                       point_in_oriented_box)
from .types import Scenario

K_MATH_EPS = 1e-10


class BarrierGrid(NamedTuple):
    """Integral image of barrier-point counts. integral[i, j] = number of
    points with cell_y < i and cell_x < j.

    dilated/half/span: optional precomputed box-occupancy tables for a
    FIXED query half-size (build_barrier_grid(half=...)): dilated[a, b,
    i+OFF, j+OFF] = any barrier point with cell_y in [i, i+span+a] and
    cell_x in [j, j+span+b] (clamped to the grid). A box [c-half, c+half]
    covers exactly the cells [floor(u), floor(v)] with u=(c-half-lo)/cell,
    v=u+2*half/cell, whose length is span+1 or span+2 (span =
    floor(2*half/cell)) depending on frac(u) — so membership is ONE
    int8 gather (vs 4 integral gathers), bit-exact to the integral path.
    OFF = span+2 shifts negative anchors into range."""

    integral: jnp.ndarray  # [H+1, W+1] int32
    origin: jnp.ndarray    # [2]
    cell: float
    dilated: jnp.ndarray | None = None   # [2, 2, H+2*OFF, W+2*OFF] int8
    half: float | None = None
    span: int | None = None


def build_barrier_grid(barrier_xy: np.ndarray, cell: float = 0.1,
                       pad: float = 2.0, half: float | None = None
                       ) -> BarrierGrid:
    """Host-side grid build (once per road; the road is shared across a
    scenario batch). With ``half``, also builds the dilated occupancy
    tables for one-gather box queries of that half-size (the DP probe's
    veh.radius)."""
    pts = np.asarray(barrier_xy)
    lo = pts.min(axis=0) - pad
    hi = pts.max(axis=0) + pad
    W = int(np.ceil((hi[0] - lo[0]) / cell)) + 1
    H = int(np.ceil((hi[1] - lo[1]) / cell)) + 1
    ij = np.floor((pts - lo) / cell).astype(np.int64)
    grid = np.zeros((H, W), np.int32)
    np.add.at(grid, (ij[:, 1], ij[:, 0]), 1)
    integral = np.zeros((H + 1, W + 1), np.int32)
    integral[1:, 1:] = grid.cumsum(0).cumsum(1)

    dilated = None
    span = None
    if half is not None:
        span = int(np.floor(2.0 * half / cell))
        off = span + 2
        Hp = H + 2 * off
        Wp = W + 2 * off
        dilated = np.zeros((2, 2, Hp, Wp), np.int8)
        anchors_i = np.arange(-off, H + off)
        anchors_j = np.arange(-off, W + off)
        for a in (0, 1):
            i0 = np.clip(anchors_i, 0, H)
            i1 = np.clip(anchors_i + span + a + 1, 0, H)
            for b in (0, 1):
                j0 = np.clip(anchors_j, 0, W)
                j1 = np.clip(anchors_j + span + b + 1, 0, W)
                cnt = (integral[i1][:, j1] - integral[i0][:, j1]
                       - integral[i1][:, j0] + integral[i0][:, j0])
                dilated[a, b] = (cnt > 0).astype(np.int8)
    return BarrierGrid(integral=jnp.asarray(integral),
                       origin=jnp.asarray(lo), cell=cell,
                       dilated=None if dilated is None
                       else jnp.asarray(dilated),
                       half=half, span=span)


def barrier_points_in_box_grid(grid: BarrierGrid, minx, miny, maxx, maxy):
    """Conservative count of barrier points in the closed box via the
    integral image."""
    H = grid.integral.shape[0] - 1
    W = grid.integral.shape[1] - 1
    i0 = jnp.clip(jnp.floor((miny - grid.origin[1]) / grid.cell).astype(jnp.int32), 0, H)
    i1 = jnp.clip(jnp.floor((maxy - grid.origin[1]) / grid.cell).astype(jnp.int32) + 1, 0, H)
    j0 = jnp.clip(jnp.floor((minx - grid.origin[0]) / grid.cell).astype(jnp.int32), 0, W)
    j1 = jnp.clip(jnp.floor((maxx - grid.origin[0]) / grid.cell).astype(jnp.int32) + 1, 0, W)
    I = grid.integral
    return (I[i1, j1] - I[i0, j1] - I[i1, j0] + I[i0, j0])


def barrier_box_hit_dilated(grid: BarrierGrid, minx, miny, maxx, maxy):
    """ONE int8 gather per box instead of 4 integral-image gathers —
    bit-exact to (barrier_points_in_box_grid(...) > 0) for boxes of the
    grid's fixed half-size (see BarrierGrid.dilated). Anchors clipped
    into the padded index range read host-precomputed EMPTY windows, so
    out-of-grid boxes report no hit exactly like the clamped integral
    path."""
    H = grid.integral.shape[0] - 1
    W = grid.integral.shape[1] - 1
    span = grid.span
    off = span + 2
    Hp = H + 2 * off
    Wp = W + 2 * off
    c = grid.cell
    iy = jnp.floor((miny - grid.origin[1]) / c).astype(jnp.int32)
    jx = jnp.floor((minx - grid.origin[0]) / c).astype(jnp.int32)
    a = jnp.clip(jnp.floor((maxy - grid.origin[1]) / c).astype(jnp.int32)
                 - iy - span, 0, 1)
    b = jnp.clip(jnp.floor((maxx - grid.origin[0]) / c).astype(jnp.int32)
                 - jx - span, 0, 1)
    iyc = jnp.clip(iy + off, 0, Hp - 1)
    jxc = jnp.clip(jx + off, 0, Wp - 1)
    flat = ((a * 2 + b) * Hp + iyc) * Wp + jxc
    return grid.dilated.reshape(-1)[flat] > 0


def barrier_points_in_box_exact(barrier_xy, barrier_mask, minx, miny, maxx, maxy):
    """Exact point-in-closed-box count (environment.cpp:74-78 semantics)."""
    px = barrier_xy[..., 0]
    py = barrier_xy[..., 1]
    inside = ((px >= minx[..., None]) & (px <= maxx[..., None]) &
              (py >= miny[..., None]) & (py <= maxy[..., None]) & barrier_mask)
    return inside.sum(axis=-1)


def static_obstacle_overlap(scn: Scenario, minx, miny, maxx, maxy):
    """Any static obstacle polygon overlapping the axis-aligned box
    (environment.cpp:46-52). Query coords may be any batch shape [...]."""
    def one(poly, valid):
        hit = convex_overlap_aabb(poly, jnp.ones((poly.shape[0],), bool),
                                  minx, miny, maxx, maxy)
        return hit & valid

    hits = jax.vmap(one, in_axes=(0, 0), out_axes=-1)(
        scn.static_obs, scn.static_mask)
    return hits.any(axis=-1)


def _uniform_time_index(times, q):
    """upper_bound index #{i: times[i] <= q} for a NEAR-UNIFORM sorted
    table, un-clipped: arithmetic guess from the leading spacing plus an
    exact +-1 fix-up against the stored values (2 scalar gathers), instead
    of searchsorted's log2(T)-step gather chain — per-element gathers are
    the TPU poison (docs/PERF.md). EXACT (not approximate) whenever the
    true index is within 1 of the guess, which holds for any table with
    |times[i] - (t0 + i*h)| < h/2 — the scenario generator builds every
    track as t0 + arange(n)*dt (scenario.py sample_*), and the constant
    padded tail only ever sits past the final clip."""
    T = times.shape[0]
    t0 = times[0]
    h = times[1] - t0
    h = jnp.where(h > 0, h, 1.0)
    guess = (jnp.floor((q - t0) / h) + 1).astype(jnp.int32)
    r = jnp.clip(guess, 0, T)
    r = r + (times[jnp.clip(r, 0, T - 1)] <= q) * (r < T)
    r = r - (times[jnp.clip(r - 1, 0, T - 1)] > q) * (r > 0)
    return r


def _dyn_polygon_at(scn: Scenario, k, time, eps=0.0):
    """Polygon of dynamic obstacle k at query time: the first sample with
    timestamp > time - eps (upper_bound semantics; eps=0 matches
    CheckDynamicCollision env.cpp:114-131, eps=kMathEpsilon matches
    QueryDynamicObstacles :133-151). Returns (corners [4,2], active)."""
    times = scn.dyn_times[k]
    L = scn.dyn_len[k]
    idx = _uniform_time_index(times, time - eps)
    idx = jnp.clip(idx, 0, L - 1)
    active = (scn.dyn_mask[k] & (times[0] <= time + eps) &
              (times[jnp.maximum(L - 1, 0)] >= time - eps))
    return scn.dyn_obs[k, idx], active


def dynamic_obstacle_overlap(scn: Scenario, time, minx, miny, maxx, maxy):
    """CheckDynamicCollision (environment.cpp:114-131) over all dynamic
    obstacles. time/box coords: any matching batch shape."""
    KD = scn.dyn_obs.shape[0]

    def one(k):
        poly, active = _dyn_polygon_at(scn, k, time, eps=0.0)
        hit = convex_overlap_aabb(poly, jnp.ones((4,), bool),
                                  minx, miny, maxx, maxy)
        return hit & active

    hits = jax.vmap(one, out_axes=-1)(jnp.arange(KD))
    return hits.any(axis=-1)


def dyn_polys_at(scn: Scenario, times):
    """Polygon + active flag of every dynamic obstacle at each query time
    (vectorized _dyn_polygon_at, eps=0). times: [T'] ->
    (polys [T', KD, 4, 2], active [T', KD]).

    The DP probe sweep queries only a handful of FIXED times per layer
    (dp_planner.cpp:283-320's interpolation grid), so the per-probe
    searchsorted + track-table gather inside dynamic_obstacle_overlap —
    measured as ~95% of the DP collision cost on TPU (per-element gathers
    are poison there) — hoists to this one tiny [T', KD] precompute."""
    KD = scn.dyn_obs.shape[0]

    def at_t(t):
        def one(k):
            return _dyn_polygon_at(scn, k, t, eps=0.0)

        return jax.vmap(one)(jnp.arange(KD))

    return jax.vmap(at_t)(jnp.asarray(times))


class DilatedPolys(NamedTuple):
    """Half-plane form of convex polygons dilated by an axis-aligned box
    of half-size ``half`` (Minkowski sum P (+) [-half, half]^2).

    AABB-vs-convex SAT overlap(box(c, half), P) is EQUIVALENT to the point
    membership c in P (+) box: the only candidate separating axes are the
    box axes and P's edge normals (convex_overlap_aabb tests exactly
    these), and on each axis the interval test "poly proj range, expanded
    by the box's support half*(|nx|+|ny|), contains c.n" is the same
    predicate as "proj ranges overlap". Precomputing the expanded ranges
    once per polygon turns each probe into 4 dot products + interval
    compares instead of a full SAT tensor — the DP sweep evaluates ~300k
    probes per replan against the same handful of polygons
    (dp_planner.cpp:39-85).

    Fields broadcast over any leading poly-batch shape; E = vertex count
    (degenerate padded edges get (-inf, +inf) ranges so they never
    separate, matching _sat_separates' deg handling)."""

    nx: jnp.ndarray    # [..., E] edge-normal x
    ny: jnp.ndarray    # [..., E] edge-normal y
    lo: jnp.ndarray    # [..., E] expanded projection lower bound
    hi: jnp.ndarray    # [..., E] expanded projection upper bound
    minx: jnp.ndarray  # [...] poly AABB (+/- half)
    miny: jnp.ndarray
    maxx: jnp.ndarray
    maxy: jnp.ndarray
    valid: jnp.ndarray  # [...] bool


def dilate_polys(polys, mask, half, rect: bool = False) -> DilatedPolys:
    """Precompute DilatedPolys for padded polygons [..., K, 2] + mask.

    mask is per-VERTEX ([..., K] or broadcastable to it) — pass a
    per-polygon flag as ``flag[..., None]``, never bare (a bare [P] flag
    with P == K broadcasts along the wrong axis silently).

    rect=True: the polygons are RECTANGLES (every obstacle footprint in
    this workload is one) — opposite edges are antiparallel, so only the
    first two edge directions are kept; each lo/hi slab (min/max over ALL
    corners) covers its opposite edge exactly. Halves the dominant
    per-probe cost of point_hits_dilated (the DP collision sweep issues
    ~1e8 probes x 16 polys x 2 discs of it per bench dispatch; measured
    ~80 of 204 ms at B=512)."""
    from .geometry import _first_valid_fill

    pts, m = _first_valid_fill(polys, mask)
    px = pts[..., 0]
    py = pts[..., 1]
    nxt = jnp.roll(pts, -1, axis=-2)
    ex = nxt[..., 0] - px
    ey = nxt[..., 1] - py
    deg = (jnp.abs(ex) + jnp.abs(ey)) <= 0
    # normal n = (ey, -ex); project all vertices on every normal
    pn = (px[..., None, :] * ey[..., :, None] -
          py[..., None, :] * ex[..., :, None])
    hn = half * (jnp.abs(ey) + jnp.abs(ex))
    big = jnp.asarray(jnp.inf, polys.dtype)
    keep = slice(None, 2) if rect else slice(None)
    return DilatedPolys(
        nx=ey[..., keep], ny=-ex[..., keep],
        lo=jnp.where(deg, -big, pn.min(axis=-1) - hn)[..., keep],
        hi=jnp.where(deg, big, pn.max(axis=-1) + hn)[..., keep],
        minx=px.min(axis=-1) - half, maxx=px.max(axis=-1) + half,
        miny=py.min(axis=-1) - half, maxy=py.max(axis=-1) + half,
        valid=m.any(axis=-1))


def point_hits_dilated(d: DilatedPolys, cx, cy):
    """Membership of point(s) (cx, cy) in each dilated polygon — i.e. the
    box(point, half)-overlaps-poly predicate. cx/cy broadcast against the
    poly batch dims (add trailing singleton axes to rank-align); returns
    one bool per (point, poly)."""
    t = cx[..., None] * d.nx + cy[..., None] * d.ny
    in_edges = ((t >= d.lo) & (t <= d.hi)).all(axis=-1)
    in_box = ((cx >= d.minx) & (cx <= d.maxx) &
              (cy >= d.miny) & (cy <= d.maxy))
    return d.valid & in_edges & in_box


def _box_hits_line(h, cx, cy, px, py, cs, sn):
    """Axis-aligned box [c-h, c+h]^2 vs the infinite line through (px, py)
    with direction (cs, sn): 1-D interval intersection in the line
    parameter t, |px + t cs - cx| <= h and |py + t sn - cy| <= h."""
    dx = px - cx
    dy = py - cy
    big = jnp.asarray(1e9, dx.dtype)

    def axis_interval(dv, a):
        small = jnp.abs(a) < 1e-6
        asafe = jnp.where(small, 1.0, a)
        p = (-h - dv) / asafe
        q = (h - dv) / asafe
        ok0 = jnp.abs(dv) <= h
        lo = jnp.where(small, jnp.where(ok0, -big, big), jnp.minimum(p, q))
        hi = jnp.where(small, jnp.where(ok0, big, -big), jnp.maximum(p, q))
        return lo, hi

    lo1, hi1 = axis_interval(dx, cs)
    lo2, hi2 = axis_interval(dy, sn)
    return jnp.maximum(lo1, lo2) <= jnp.minimum(hi1, hi2)


def barrier_hit_frenet(h, cx, cy, rx, ry, theta_ref, kappa,
                       left_bound, right_bound):
    """Gather-free road-barrier membership for a disc box (frenet mode).

    (cx, cy) is the exact Cartesian disc center; (rx, ry, theta_ref,
    kappa, left_bound, right_bound) are the centerline point and station
    fields at the probe's station. The centerline is piecewise
    arcs/straights (reference_publisher.py's road recipe), so the local
    boundary through lateral u is EXACTLY a circle of radius |1/kappa - u|
    around the curvature center C + n/kappa (or the offset line C + u n
    for straights); the box test is closed-form against that circle/line.
    Residual approximations: the segment in effect at the probe's station
    is extended across the whole box span (boxes straddling an arc joint
    see the wrong tail), the full circle / infinite line stands in for the
    finite arc/segment (conservative over-report only), and the curve
    stands in for its 0.1 m point sampling. All inputs broadcast; no
    table access."""
    sn = jnp.sin(theta_ref)
    cs = jnp.cos(theta_ref)
    curved = jnp.abs(kappa) > 1e-6
    ksafe = jnp.where(curved, kappa, 1.0)
    inv = 1.0 / ksafe
    ctrx = rx - inv * sn
    ctry = ry + inv * cs

    def one_side(u):
        # straight: boundary line through C + u n, direction (cs, sn)
        hit_line = _box_hits_line(h, cx, cy, rx - u * sn, ry + u * cs,
                                  cs, sn)
        # arc: boundary circle radius |1/kappa - u|; box-ring overlap via
        # min/max distance from the box to the circle center
        rb = jnp.abs(inv - u)
        ddx = jnp.abs(cx - ctrx)
        ddy = jnp.abs(cy - ctry)
        dmin = jnp.hypot(jnp.maximum(ddx - h, 0.0), jnp.maximum(ddy - h, 0.0))
        dmax = jnp.hypot(ddx + h, ddy + h)
        hit_arc = (dmin <= rb) & (rb <= dmax)
        return jnp.where(curved, hit_arc, hit_line)

    return one_side(left_bound) | one_side(-right_bound)


def barrier_hit_road_spec(h, cx, cy, spec, pad=0.05):
    """Finite-extent road-barrier membership from the closed-form road
    recipe (frenet mode + scenario.RoadSpec) — fixes the infinite-extent
    test's blind spots.

    barrier_hit_frenet extends the segment in effect at the probe's
    STATION across the whole box span, so a box near an arc joint is
    tested against the wrong tail (an infinite line where the actual
    boundary curves away) and can MISS real barrier points — measured
    unsafe on the 5 m S-curve road (tests/test_dp_qualification.py).
    Here the box is tested against every road segment's boundary as a
    FINITE curve instead:

    - straights: box-vs-finite-segment via conservative SAT (box axes +
      segment normal; mult/add/abs only);
    - arcs: box-vs-ring squared (exact) AND'ed with a conservative
      angular HALF-PLANE test — any boundary point within the arc span
      satisfies (q-C).u_mid >= rb*cos(hw), slackened by the box
      half-diagonal projection; no per-probe sqrt/div/trig. When the
      lateral offset crosses the arc center (dir*u > R, the hairpin
      inside boundary) the boundary points sit at the REFLECTED angle
      phi+pi; the span is rotated accordingly.

    Extents are extended by one row step at each end and padded by
    ``pad`` (default 5 cm), which covers the sampled barrier points'
    deviation from the ideal curves (row-0 start sample, joint chords,
    lerped-theta offsets — measured max 0.1 m at the start row, p99.9
    under 6 mm): the test is conservative-COMPLETE with respect to the
    0.1 m-sampled barrier points (pinned per road family by
    test_dp_qualification.py::test_road_spec_test_covers_all_barrier_points)
    and over-reports only within the pad + curve-vs-sampling slack.
    NSEG (~5-7) segments x 2 sides of pure elementwise work per probe;
    zero table access."""
    dtype = cx.dtype
    hp = h + pad
    # spec leaves are host-built concrete arrays (dp.plan's validation
    # already requires this); partition arcs/straights STATICALLY and
    # precompute every per-(segment, side) constant in numpy — the traced
    # per-probe work is then mult/add/abs/compare only (no divisions, no
    # sqrt, no trig), which matters: at bench batches the DP stage issues
    # ~1e8 probes x NSEG x 2 sides of this test per dispatch.
    import numpy as np

    res = float(spec.h)
    is_arc = np.asarray(spec.is_arc)
    cnt = np.asarray(spec.count, np.float64)
    kap = np.asarray(spec.kappa, np.float64)
    ang0 = np.asarray(spec.ang0, np.float64)
    dang = np.asarray(spec.dang, np.float64)
    xc = np.asarray(spec.xc, np.float64)
    yc = np.asarray(spec.yc, np.float64)
    x0 = np.asarray(spec.x0, np.float64)
    y0 = np.asarray(spec.y0, np.float64)
    stepx = np.asarray(spec.stepx, np.float64)
    stepy = np.asarray(spec.stepy, np.float64)
    sides = (float(spec.lb), -float(spec.rb))

    hit = jnp.zeros(jnp.shape(cx), bool)

    for g in range(len(is_arc)):
        if not is_arc[g]:
            # straight boundary segments for both sides: endpoints =
            # first/last sampled row +- one row step, offset by u along
            # the normal. Conservative SAT (box axes + segment normal;
            # the direction axis is covered by the bbox bounds up to a
            # diagonal-segment over-report).
            dx_, dy_ = stepx[g] / res, stepy[g] / res  # unit direction
            L = (cnt[g] - 1.0) * res
            for u in sides:
                p0x = x0[g] + stepx[g] - u * dy_ - res * dx_
                p0y = y0[g] + stepy[g] + u * dx_ - res * dy_
                p1x = p0x + (L + 2 * res) * dx_
                p1y = p0y + (L + 2 * res) * dy_
                lox, hix = min(p0x, p1x) - hp, max(p0x, p1x) + hp
                loy, hiy = min(p0y, p1y) - hp, max(p0y, p1y) + hp
                # normal (unnormalized unit): (-dy_, dx_)
                nslack = hp * (abs(dy_) + abs(dx_))
                ncx = -dy_ * p0x + dx_ * p0y
                s = (-dy_) * cx + dx_ * cy - ncx
                hit = hit | ((cx >= lox) & (cx <= hix) &
                             (cy >= loy) & (cy <= hiy) &
                             (jnp.abs(s) <= nslack))
        else:
            # arc boundary: ring test squared (exact) AND a conservative
            # angular half-plane: any hit point q on the boundary circle
            # within the (extended) span satisfies (q-C).u_mid >=
            # rb*cos(hw); q is within hp*(|cmid|+|smid|) of the box
            # center's projection. When the offset crosses the arc
            # center (dir*u > R, hairpin inside boundary) the boundary
            # sits at the REFLECTED angle phi+pi. hw >= pi drops the
            # angular test statically.
            inv = 1.0 / kap[g]
            span = (cnt[g] - 1.0) * dang[g]
            hw = min(abs(span) / 2 + abs(dang[g]), np.pi)
            adx = cx - xc[g]
            ady = cy - yc[g]
            addx = jnp.abs(adx)
            addy = jnp.abs(ady)
            pdx = jnp.maximum(addx - hp, 0.0)
            pdy = jnp.maximum(addy - hp, 0.0)
            dmin2 = pdx * pdx + pdy * pdy
            sdx = addx + hp
            sdy = addy + hp
            dmax2 = sdx * sdx + sdy * sdy
            for u in sides:
                rb = abs(inv - u)
                ring = (dmin2 <= rb * rb) & (rb * rb <= dmax2)
                if hw >= np.pi:
                    hit = hit | ring
                    continue
                refl = np.pi if np.sign(kap[g]) * (inv - u) < 0 else 0.0
                mid = ang0[g] + refl + span / 2
                cmid, smid = np.cos(mid), np.sin(mid)
                thresh = rb * np.cos(hw) - hp * (abs(cmid) + abs(smid))
                ang = (adx * cmid + ady * smid) >= thresh
                hit = hit | (ring & ang)

    return hit


def check_optimization_collision(scn: Scenario, time, x, y, theta,
                                 veh_radius, r2x, f2x,
                                 collision_buffer=0.0,
                                 grid: BarrierGrid | None = None,
                                 mode: str = "grid",
                                 dyn_polys=None,
                                 dilated=None,
                                 frenet=None,
                                 road_spec=None):
    """Two-disc collision probe (Environment::CheckOptimizationCollision,
    environment.cpp:92-112): axis-aligned boxes of half-size radius+buffer
    at the front/rear disc centers, tested against static polygons, road
    barrier points, and dynamic obstacles.

    dyn_polys: optional (polys [T', KD, 4, 2], active [T', KD]) from
    dyn_polys_at — the dynamic obstacles pre-resolved at the probe times.
    REQUIRES the queries' TRAILING axis to be the time axis of length T'
    (each probe [..., i] was taken at times[i]); the ``time`` argument is
    then ignored. Identical results to the per-probe path (same
    _dyn_polygon_at lookups, same SAT) without per-probe gathers.

    dilated: optional (static DilatedPolys [KS,...], dynamic DilatedPolys
    [T', KD, ...]) precomputed with dilate_polys(..., half) for THIS
    call's half — replaces both SAT passes with point-in-dilated-polygon
    tests (same separating-axes predicate; see DilatedPolys). The dynamic
    entry requires the trailing-time-axis convention like dyn_polys.

    frenet: required when mode == "frenet" and road_spec is None — a
    tuple (rx, ry, theta_ref, kappa, left_bound, right_bound) of the
    centerline point and station fields at each probe's station (entries
    broadcast against x/y/theta); the road-barrier part of each disc test
    then uses barrier_hit_frenet instead of any table gather.

    road_spec: optional scenario.RoadSpec — when given with
    mode == "frenet", the road-barrier part uses the finite-extent
    barrier_hit_road_spec test instead (conservative-complete on every
    road family; the station-field stand-in is unsafe on tight-arc
    roads — see barrier_hit_road_spec)."""
    half = veh_radius + collision_buffer
    ct = jnp.cos(theta)
    st = jnp.sin(theta)
    xr = x + r2x * ct
    yr = y + r2x * st
    xf = x + f2x * ct
    yf = y + f2x * st

    def box_hit(cx, cy):
        minx, maxx = cx - half, cx + half
        miny, maxy = cy - half, cy + half
        if dilated is not None:
            sd, dd = dilated
            hit = point_hits_dilated(sd, cx[..., None],
                                     cy[..., None]).any(axis=-1)
        else:
            hit = static_obstacle_overlap(scn, minx, miny, maxx, maxy)
        if mode == "grid":
            assert grid is not None
            if grid.dilated is not None and grid.half == half:
                hit = hit | barrier_box_hit_dilated(grid, minx, miny,
                                                    maxx, maxy)
            else:
                cnt = barrier_points_in_box_grid(grid, minx, miny,
                                                 maxx, maxy)
                hit = hit | (cnt > 0)
        elif mode == "skiproad":
            pass  # obstacle-only probe (ablation/diagnostics)
        elif mode == "frenet":
            if road_spec is not None:
                hit = hit | barrier_hit_road_spec(half, cx, cy, road_spec)
            else:
                assert frenet is not None
                frx, fry, fth, fkap, flb, frb = frenet
                hit = hit | barrier_hit_frenet(half, cx, cy, frx, fry,
                                               fth, fkap, flb, frb)
        else:
            cnt = barrier_points_in_box_exact(scn.barrier_xy, scn.barrier_mask,
                                              minx, miny, maxx, maxy)
            hit = hit | (cnt > 0)
        if dilated is not None:
            hd = point_hits_dilated(dd, cx[..., None], cy[..., None])
            hit = hit | hd.any(axis=-1)       # [..., T', KD] -> [..., T']
        elif dyn_polys is None:
            hit = hit | dynamic_obstacle_overlap(scn, time, minx, miny,
                                                 maxx, maxy)
        else:
            polys, active = dyn_polys
            h = convex_overlap_aabb(
                polys, jnp.ones(polys.shape[:-1], bool),
                minx[..., None], miny[..., None],
                maxx[..., None], maxy[..., None])   # [..., T', KD]
            hit = hit | (h & active).any(axis=-1)
        return hit

    return box_hit(xf, yf) | box_hit(xr, yr)


def check_collision(scn: Scenario, time, cx, cy, theta, length, width):
    """Oriented ego-box collision probe — Environment::CheckCollision
    (environment.cpp:83-90): dynamic obstacles at ``time`` (SAT overlap,
    :114-131), static polygons, and road-barrier point membership in the
    oriented rectangle (CheckStaticCollision :46-81 with Box2d::IsPointIn).
    All of cx/cy/theta may carry a common batch shape."""
    ego = box_corners(jnp.asarray(cx), jnp.asarray(cy), jnp.asarray(theta),
                      length, width)
    ego_mask = jnp.ones(ego.shape[:-1], bool)

    def one_static(poly, valid):
        return convex_overlap(poly, jnp.ones((poly.shape[0],), bool),
                              ego, ego_mask) & valid

    hit = jax.vmap(one_static, in_axes=(0, 0), out_axes=-1)(
        scn.static_obs, scn.static_mask).any(axis=-1)

    barrier_in = point_in_oriented_box(
        scn.barrier_xy[..., 0], scn.barrier_xy[..., 1],
        jnp.asarray(cx)[..., None], jnp.asarray(cy)[..., None],
        jnp.asarray(theta)[..., None], length, width) & scn.barrier_mask
    hit = hit | barrier_in.any(axis=-1)

    KD = scn.dyn_obs.shape[0]

    def one_dyn(k):
        poly, active = _dyn_polygon_at(scn, k, time, eps=0.0)
        return convex_overlap(poly, jnp.ones((4,), bool),
                              ego, ego_mask) & active

    hit = hit | jax.vmap(one_dyn, out_axes=-1)(jnp.arange(KD)).any(axis=-1)
    return hit


def query_dynamic_points(scn: Scenario, time):
    """Corner points of dynamic obstacles active at ``time`` — the corridor
    seed query (Environment::QueryDynamicObstaclesPoints,
    environment.cpp:167-182 via QueryDynamicObstacles :133-151).
    Returns (points [KD*4, 2], mask [KD*4])."""
    KD = scn.dyn_obs.shape[0]

    def one(k):
        poly, active = _dyn_polygon_at(scn, k, time, eps=K_MATH_EPS)
        return poly, jnp.repeat(active, 4)

    polys, masks = jax.vmap(one)(jnp.arange(KD))
    return polys.reshape(KD * 4, 2), masks.reshape(KD * 4)


def query_dynamic_points_grid(scn: Scenario, times):
    """query_dynamic_points for ALL knot times at once, gather-free.

    The per-knot path does one track-table gather per (knot, obstacle) —
    per-element gathers under vmap were the corridor seed stage's
    dominant cost on TPU. Here the upper_bound index is its literal
    definition #{i: track_time[i] <= q} as a [N,KD,T] compare-reduce
    (exact for ANY sorted table — no uniformity assumption), and the
    corner lookup is a one-hot contraction over the track axis (an MXU
    matmul). Semantics identical to _dyn_polygon_at(eps=K_MATH_EPS),
    with the padded tail excluded via dyn_len exactly like the clipped
    guess never reaching it.

    times: [N] -> (points [N, KD*4, 2], mask [N, KD*4])."""
    KD, T = scn.dyn_times.shape
    N = times.shape[0]
    eps = K_MATH_EPS
    tt = scn.dyn_times[None, :, :]                         # [1,KD,T]
    q = times[:, None, None]                               # [N,1,1]
    tvalid = jnp.arange(T)[None, None, :] < scn.dyn_len[None, :, None]
    cnt = jnp.sum((tt <= q - eps) & tvalid, axis=2)        # [N,KD]
    L = scn.dyn_len[None, :]
    idx = jnp.clip(cnt, 0, jnp.maximum(L - 1, 0))
    onehot = idx[:, :, None] == jnp.arange(T)[None, None, :]  # [N,KD,T]
    # one-hot select as a masked sum, NOT a dot_general: on TPU an f32
    # einsum routes through the MXU, which rounds operands to bfloat16 and
    # would quantize ~100-200 m corner coordinates by up to ~0.4 m. The
    # where+sum lowers to exact f32 VPU select/reduce.
    corners = jnp.sum(
        jnp.where(onehot[:, :, :, None],
                  scn.dyn_obs.reshape(1, KD, T, 8), 0.0),
        axis=2).reshape(N, KD, 4, 2)
    t0 = scn.dyn_times[:, 0][None, :]
    t_last = jnp.max(jnp.where(tvalid[0], scn.dyn_times,
                               -jnp.inf), axis=1)[None, :]
    active = (scn.dyn_mask[None, :] & (t0 <= times[:, None] + eps) &
              (t_last >= times[:, None] - eps))            # [N,KD]
    mask = jnp.repeat(active, 4, axis=1)
    return corners.reshape(N, KD * 4, 2), mask
