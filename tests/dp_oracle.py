"""Golden DP oracle: literal numpy transcription of the reference coarse
planner and everything it touches.

Transcribed sources (all under /root/reference/algorithm/):
  * planner/dp_planner.cpp:39-320        — GetCollisionCost / GetCost /
    Plan (DP sweep, traceback, 81-knot interpolation) / InterpolateLinearly
  * utils/discretized_trajectory.cpp:34-196 — EvaluateStation /
    GetProjection / GetCartesian / LinearInterpolateTrajectory
  * utils/environment.cpp:18-131         — set_reference road-barrier
    sampling, CheckStaticCollision, CheckDynamicCollision,
    CheckOptimizationCollision
  * math/polygon2d.cpp IsPointIn (crossing test) and HasOverlap(Box2d)
    (NOTE: the reference's polygon-vs-box overlap checks only MUTUAL
    CORNER CONTAINMENT, no edge-crossing/SAT — a polygon crossing the box
    like a plus sign is reported as non-overlapping. Kept verbatim; the
    device implementation uses full SAT, which is strictly more
    conservative, so any parity mismatch from this quirk means the device
    flagged a real overlap the reference missed.)
  * math/box2d.cpp:123-129 Box2d::IsPointIn (eps-inclusive)
  * math/math_utils.h slerp/NormalizeAngle
  * utils/discrete_points_math.cc:27-176 ComputePathProfile

The control flow mirrors the C++ loop nest cell by cell; for speed, each
parent's 70-child transition sweep is evaluated in one vectorized shot
(every (parent, child) cost is independent in the reference too — the
inner m/n loops only read parent-layer state — and the strict-less
first-parent-wins update loop is kept verbatim), and per-point collision
sweeps reduce with any() (equals the reference's early return). Everything
is float64 numpy.
"""

from __future__ import annotations

import numpy as np

K_EPS = 1e-3        # dp_planner.cpp:29 (file-local kMathEpsilon)
MATH_EPS = 1e-10    # math/vec2d.h:33 (math::kMathEpsilon)

NT, NS, NL = 5, 7, 10   # dp_planner.h:27-29


def normalize_angle(a):
    """math_utils.cpp NormalizeAngle: wrap to (-pi, pi]."""
    a = np.asarray(a, float)
    two_pi = 2.0 * np.pi
    a = np.mod(a + np.pi, two_pi)
    a = np.where(a < 0, a + two_pi, a)
    return a - np.pi


def slerp(a0, t0, a1, t1, t):
    """math_utils.h:208-225."""
    a0 = np.asarray(a0, float)
    a1 = np.asarray(a1, float)
    t0 = np.asarray(t0, float)
    t1 = np.asarray(t1, float)
    t = np.asarray(t, float)
    a0n = normalize_angle(a0)
    a1n = normalize_angle(a1)
    d = a1n - a0n
    d = np.where(d > np.pi, d - 2 * np.pi, d)
    d = np.where(d < -np.pi, d + 2 * np.pi, d)
    denom = t1 - t0
    degenerate = np.abs(denom) <= MATH_EPS
    r = (t - t0) / np.where(degenerate, 1.0, denom)
    return np.where(degenerate, a0n, normalize_angle(a0n + d * r))


_FIELDS = ("time", "s", "x", "y", "theta", "kappa", "velocity",
           "left_bound", "right_bound")


class RefLine:
    """DiscretizedTrajectory query engine over centerline arrays."""

    def __init__(self, **fields):
        for f in _FIELDS:
            setattr(self, f, np.asarray(fields[f], float))
        self.n = len(self.s)

    @classmethod
    def from_traj(cls, traj):
        """Build from a cilqr_tpu Traj pytree (e.g. scn.centerline)."""
        return cls(**{f: np.asarray(getattr(traj, f), float)
                      for f in _FIELDS})

    def _interp(self, i0, i1, station):
        """LinearInterpolateTrajectory (discretized_trajectory.cpp:66-88),
        vectorized over query stations with knot indices i0/i1."""
        s0 = self.s[i0]
        s1 = self.s[i1]
        degenerate = np.abs(s1 - s0) < MATH_EPS
        w = (station - s0) / np.where(degenerate, 1.0, s1 - s0)
        w = np.where(degenerate, 0.0, w)
        out = {}
        for f in _FIELDS:
            v = getattr(self, f)
            out[f] = (1 - w) * v[i0] + w * v[i1]
        out["s"] = np.where(degenerate, s0, station)
        theta = slerp(self.theta[i0], s0, self.theta[i1], s1, station)
        # the degenerate branch returns p0 verbatim (theta un-normalized)
        out["theta"] = np.where(degenerate, self.theta[i0], theta)
        return out

    def evaluate_station(self, station):
        """EvaluateStation (discretized_trajectory.cpp:112-123):
        lower_bound clamped to [1, n-1], then linear/slerp interpolation
        (extrapolates past the ends exactly like the reference)."""
        station = np.asarray(station, float)
        idx = np.searchsorted(self.s, station, side="left")
        idx = np.clip(idx, 1, self.n - 1)
        return self._interp(idx - 1, idx, station)

    def get_cartesian(self, station, lateral):
        """GetCartesian (discretized_trajectory.cpp:192-196)."""
        ref = self.evaluate_station(station)
        return (ref["x"] - lateral * np.sin(ref["theta"]),
                ref["y"] + lateral * np.cos(ref["theta"]))

    def get_projection(self, px, py):
        """GetProjection (discretized_trajectory.cpp:159-190), scalar."""
        d2 = (self.x - px) ** 2 + (self.y - py) ** 2
        i = int(np.argmin(d2))          # first minimum, like the C++ scan
        i0 = max(0, i - 1)
        i1 = min(self.n - 1, i + 1)
        if i0 < i1:
            v0 = np.array([px - self.x[i0], py - self.y[i0]])
            v1 = np.array([self.x[i1] - self.x[i0],
                           self.y[i1] - self.y[i0]])
            v1n = np.hypot(*v1)
            delta_s = (v0 @ v1) / v1n
            proj = self._interp(np.asarray(i0), np.asarray(i1),
                                np.asarray(self.s[i0] + delta_s))
        else:
            proj = {f: np.asarray(getattr(self, f)[i]) for f in _FIELDS}
        nrx = px - proj["x"]
        nry = py - proj["y"]
        lateral = np.copysign(
            np.hypot(nrx, nry),
            nry * np.cos(proj["theta"]) - nrx * np.sin(proj["theta"]))
        return float(proj["s"]), float(lateral)


def _poly_contains(poly, px, py):
    """Polygon2d::IsPointIn crossing test (polygon2d.cpp), vectorized over
    query points. poly: [K, 2]."""
    px = np.asarray(px, float)
    py = np.asarray(py, float)
    in_bbox = ((px >= poly[:, 0].min()) & (px <= poly[:, 0].max()) &
               (py >= poly[:, 1].min()) & (py <= poly[:, 1].max()))
    c = np.zeros(px.shape, int)
    K = len(poly)
    j = K - 1
    for i in range(K):
        xi, yi = poly[i]
        xj, yj = poly[j]
        cond = (yi > py) != (yj > py)
        # CrossProd(point, p_i, p_j) = (p_i - point) x (p_j - point)
        side = (xi - px) * (yj - py) - (yi - py) * (xj - px)
        inc = np.where(yi < yj, side > 0.0, side < 0.0)
        c += (cond & inc).astype(int)
        j = i
    return in_bbox & (c % 2 == 1)


def _poly_overlap_aabox(poly, cx, cy, half):
    """Polygon2d::HasOverlap(Box2d) for an axis-aligned square box of
    half-size ``half`` centered at (cx, cy), vectorized over boxes.
    Mutual corner containment only (see module docstring)."""
    cx = np.asarray(cx, float)
    cy = np.asarray(cy, float)
    # strict AABB reject (polygon2d.cpp HasOverlap first lines)
    reject = ((cx + half < poly[:, 0].min()) | (cx - half > poly[:, 0].max()) |
              (cy + half < poly[:, 1].min()) | (cy - half > poly[:, 1].max()))
    # any polygon vertex in the box (Box2d::IsPointIn, eps-inclusive)
    vert_in = np.zeros(cx.shape, bool)
    for vx, vy in poly:
        vert_in |= ((np.abs(vx - cx) <= half + MATH_EPS) &
                    (np.abs(vy - cy) <= half + MATH_EPS))
    # any box corner in the polygon
    corner_in = np.zeros(cx.shape, bool)
    for sx in (-1.0, 1.0):
        for sy in (-1.0, 1.0):
            corner_in |= _poly_contains(poly, cx + sx * half, cy + sy * half)
    return ~reject & (vert_in | corner_in)


class RefEnv:
    """Environment transcription: road barriers + obstacle collision."""

    def __init__(self, refline: RefLine, static_polys, dyn_obstacles):
        """static_polys: list of [4,2]; dyn_obstacles: list of
        (times [L], polys [L,4,2])."""
        self.ref = refline
        self.static_polys = [np.asarray(p, float) for p in static_polys]
        self.dyn = [(np.asarray(t, float), np.asarray(p, float))
                    for t, p in dyn_obstacles]
        # set_reference road-barrier sampling (environment.cpp:18-44)
        step = 0.1
        start_s = refline.s[0]
        back_s = refline.s[-1]
        n = int((back_s - start_s) / step)
        ss = start_s + step * np.arange(n + 1)
        ref = refline.evaluate_station(ss)
        lx, ly = refline.get_cartesian(ss, ref["left_bound"])
        rx, ry = refline.get_cartesian(ss, -ref["right_bound"])
        pts = np.empty((2 * (n + 1), 2))
        pts[0::2, 0], pts[0::2, 1] = lx, ly
        pts[1::2, 0], pts[1::2, 1] = rx, ry
        # std::sort by x (environment.cpp:41-43)
        self.barrier = pts[np.argsort(pts[:, 0], kind="stable")]

    def _barrier_hit(self, cx, cy, half):
        """CheckStaticCollision barrier window scan (environment.cpp:57-79):
        x-window upper_bound pair, then Box2d::IsPointIn on each windowed
        point. The window pre-filter only excludes points IsPointIn rejects
        anyway, EXCEPT points within kMathEpsilon=1e-10 past max_x (the
        window's upper_bound is eps-exclusive while IsPointIn is
        eps-inclusive) — a measure-zero fp coincidence not replicated here;
        this scan applies IsPointIn over an x-prefiltered dense window."""
        bx = self.barrier[:, 0]
        by = self.barrier[:, 1]
        cx = np.asarray(cx, float)
        cy = np.asarray(cy, float)
        outside = (cx + half < bx[0]) | (cx - half > bx[-1])
        lo = int(np.searchsorted(bx, cx.min() - half - MATH_EPS, "left"))
        hi = int(np.searchsorted(bx, cx.max() + half + MATH_EPS, "right"))
        wx = bx[lo:hi]
        wy = by[lo:hi]
        hit = (((np.abs(wx - cx[..., None]) <= half + MATH_EPS) &
                (np.abs(wy - cy[..., None]) <= half + MATH_EPS))
               .any(axis=-1))
        return hit & ~outside

    def check_static(self, cx, cy, half):
        """CheckStaticCollision (environment.cpp:46-81) for axis-aligned
        square boxes."""
        hit = np.zeros(np.asarray(cx).shape, bool)
        for poly in self.static_polys:
            hit |= _poly_overlap_aabox(poly, cx, cy, half)
        if len(self.barrier):
            hit |= self._barrier_hit(cx, cy, half)
        return hit

    def check_dynamic(self, time, cx, cy, half):
        """CheckDynamicCollision (environment.cpp:114-131): upper_bound on
        sample time, then polygon-vs-box overlap. time vectorized."""
        time = np.asarray(time, float)
        hit = np.zeros(time.shape, bool)
        for times, polys in self.dyn:
            active = (times[0] <= time) & (times[-1] >= time)
            if not np.any(active):
                continue
            idx = np.searchsorted(times, time, side="right")
            # time == times[-1] dereferences end() in the C++ (UB); clamp
            # like the device implementation does
            idx = np.minimum(idx, len(times) - 1)
            for k in np.unique(idx[active]):
                sel = active & (idx == k)
                hit[sel] |= _poly_overlap_aabox(
                    polys[k], cx[sel], cy[sel], half)
        return hit

    def check_optimization_collision(self, time, x, y, theta, veh):
        """CheckOptimizationCollision (environment.cpp:92-112): front/rear
        disc boxes, zero collision buffer."""
        half = veh.radius
        ct = np.cos(theta)
        st = np.sin(theta)
        hit = np.zeros(np.asarray(x).shape, bool)
        for d in (veh.f2x, veh.r2x):
            bx = x + d * ct
            by = y + d * st
            hit |= self.check_static(bx, by, half)
            hit |= self.check_dynamic(time, bx, by, half)
        return hit


def compute_path_profile(dt, xs, ys):
    """DiscretePointsMath::ComputePathProfile (discrete_points_math.cc:
    27-176), verbatim (including its 0/0 on stalled paths — callers assert
    the fixture paths don't stall)."""
    xs = np.asarray(xs, float)
    ys = np.asarray(ys, float)
    n = len(xs)
    dxs = np.empty(n)
    dys = np.empty(n)
    dxs[0] = xs[1] - xs[0]
    dys[0] = ys[1] - ys[0]
    dxs[-1] = xs[-1] - xs[-2]
    dys[-1] = ys[-1] - ys[-2]
    dxs[1:-1] = 0.5 * (xs[2:] - xs[:-2])
    dys[1:-1] = 0.5 * (ys[2:] - ys[:-2])
    headings = np.arctan2(dys, dxs)

    seg = np.hypot(np.diff(xs), np.diff(ys))
    s = np.concatenate([[0.0], np.cumsum(seg)])

    speeds = np.concatenate([np.diff(s) / dt, [seg[-1] / dt]])
    accels = np.concatenate([np.diff(speeds) / dt, [0.0]])
    accels[-1] = accels[-2]

    def diff_over(v):
        out = np.empty(n)
        out[0] = (v[1] - v[0]) / (s[1] - s[0])
        out[-1] = (v[-1] - v[-2]) / (s[-1] - s[-2])
        out[1:-1] = (v[2:] - v[:-2]) / (s[2:] - s[:-2])
        return out

    xds = diff_over(xs)
    yds = diff_over(ys)
    xdds = diff_over(xds)
    ydds = diff_over(yds)
    kappas = (xds * ydds - yds * xdds) / (
        np.sqrt(xds * xds + yds * yds) * (xds * xds + yds * yds) + 1e-6)
    return headings, s, speeds, accels, kappas


class DpOracle:
    """DpPlanner (dp_planner.cpp) cell-by-cell."""

    def __init__(self, env: RefEnv, cfg):
        """cfg: cilqr_tpu PlannerConfig (same knob values as the
        reference's PlannerConfig defaults)."""
        self.env = env
        self.cfg = cfg
        self.dp = cfg.dp
        self.veh = cfg.vehicle
        self.unit_time = cfg.tf / NT
        self.time = np.linspace(self.unit_time, cfg.tf, NT)
        self.station = np.linspace(
            0.0, self.unit_time * self.veh.max_velocity, NS)
        self.lateral = np.linspace(0.0, 1.0, NL - 1)
        self.safe_margin = self.veh.width / 2 * 1.5

    def _lateral_offset(self, s, l_ind):
        if l_ind == NL - 1:
            return 0.0
        ref = self.env.ref.evaluate_station(np.asarray(s))
        lb = -ref["right_bound"] + self.safe_margin
        ub = ref["left_bound"] - self.safe_margin
        return float(lb + (ub - lb) * self.lateral[l_ind])

    def _interp_linearly(self, parent_s, parent_l_ind, cur_t_ind,
                         cur_s_ind, cur_l_ind):
        """InterpolateLinearly (dp_planner.cpp:283-320). nseg is 17 for the
        first layer's segments and 16 after (the C++ counts 0.1s ticks in
        (t_prev, t_cur]; with tf=8, delta_t=0.1, NT=5 that is always 17/16)."""
        nseg = 17 if cur_t_ind == 0 else 16
        if parent_l_ind >= 0:
            p_s = parent_s
            p_l = self._lateral_offset(p_s, parent_l_ind)
        else:
            p_s = self.start_s
            p_l = self.start_l
        cur_s = p_s + self.station[cur_s_ind]
        cur_l = self._lateral_offset(cur_s, cur_l_ind)
        i = np.arange(nseg)
        return (p_s + i * (self.station[cur_s_ind] / nseg),
                p_l + i * ((cur_l - p_l) / nseg))

    def _lateral_offset_vec(self, s, l_ind):
        """GetLateralOffset vectorized over (s, l_ind) arrays."""
        s = np.asarray(s, float)
        l_ind = np.asarray(l_ind)
        ref = self.env.ref.evaluate_station(s)
        lb = -ref["right_bound"] + self.safe_margin
        ub = ref["left_bound"] - self.safe_margin
        off = lb + (ub - lb) * self.lateral[np.minimum(l_ind, NL - 2)]
        return np.where(l_ind == NL - 1, 0.0, off)

    def _sweep(self, parent_ind):
        """GetCost (dp_planner.cpp:87-133) + GetCollisionCost (:39-85) for
        ONE parent against ALL NS*NL children of the next layer (or the
        start pseudo-cell against layer 0 when parent t == -1), vectorized
        over the children (each (parent, child) evaluation is independent
        in the reference). Returns (cur_s [C], delta_cost [C]), children
        ordered s-major/l-minor exactly like the C++ m/n loop nest."""
        pt, psi, pli = parent_ind
        if pt >= 0:
            cell = self.cells[pt][psi][pli]
            parent_s = cell["current_s"]
            parent_l = self._lateral_offset(parent_s, pli)
            if pt >= 1:
                gp = self.cells[pt - 1][cell["parent_s_ind"]][
                    cell["parent_l_ind"]]
                grandparent_s = gp["current_s"]
                grandparent_l = self._lateral_offset(
                    grandparent_s, cell["parent_l_ind"])
            else:
                grandparent_s = self.start_s
                grandparent_l = self.start_l
            # prev segment's last point (GetCollisionCost:51-53)
            prev_s_pts, prev_l_pts = self._interp_linearly(
                grandparent_s, cell["parent_l_ind"], pt, psi, pli)
            last_s, last_l = prev_s_pts[-1], prev_l_pts[-1]
            cur_t = pt + 1
            parent_time = self.time[pt]
        else:
            parent_s = grandparent_s = self.start_s
            parent_l = grandparent_l = self.start_l
            last_s, last_l = self.start_s, self.start_l
            cur_t = 0
            parent_time = 0.0

        s_ind = np.repeat(np.arange(NS), NL)          # child m (s) index
        l_ind = np.tile(np.arange(NL), NS)            # child n (l) index
        st = self.station[s_ind]                      # [C]
        cur_s = parent_s + st
        cur_l = self._lateral_offset_vec(cur_s, l_ind)

        # ---- GetCollisionCost over [C, nseg] interpolation points
        nseg = 17 if cur_t == 0 else 16
        i = np.arange(nseg)
        s_pts = parent_s + i * (st[:, None] / nseg)
        l_pts = parent_l + i * ((cur_l - parent_l)[:, None] / nseg)
        prev_s = np.concatenate(
            [np.full((len(st), 1), last_s), s_pts[:, :-1]], axis=1)
        prev_l = np.concatenate(
            [np.full((len(st), 1), last_l), l_pts[:, :-1]], axis=1)
        dl = l_pts - prev_l
        ds = np.maximum(s_pts - prev_s, K_EPS)

        cx, cy = self.env.ref.get_cartesian(s_pts, l_pts)
        ref = self.env.ref.evaluate_station(s_pts)
        lb = np.minimum(0.0, -ref["right_bound"] + self.safe_margin)
        ub = np.maximum(0.0, ref["left_bound"] - self.safe_margin)
        off_road = (l_pts < lb - K_EPS) | (l_pts > ub + K_EPS)

        heading = ref["theta"] + np.arctan(
            (dl / ds) / (1.0 - ref["kappa"] * l_pts))
        t = parent_time + i * (self.unit_time / nseg)
        collide = self.env.check_optimization_collision(
            np.broadcast_to(t, s_pts.shape), cx, cy, heading, self.veh)
        bad = np.any(off_road | collide, axis=1)

        # ---- GetCost weights
        ds1 = cur_s - parent_s
        dl1 = cur_l - parent_l
        ds0 = parent_s - grandparent_s
        dl0 = parent_l - grandparent_l
        dp = self.dp
        delta = (
            dp.w_lateral * np.abs(cur_l) +
            dp.w_lateral_change * np.abs(parent_l - cur_l) / (st + K_EPS) +
            dp.w_lateral_velocity_change * np.abs(dl1 - dl0)
            / self.unit_time +
            dp.w_longitudinal_velocity_bias
            * np.abs(ds1 / self.unit_time - dp.nominal_velocity) +
            dp.w_longitudinal_velocity_change
            * np.abs((ds1 - ds0) / self.unit_time))
        return cur_s, np.where(bad, dp.w_obstacle, delta)

    def plan(self, start_x, start_y, start_theta):
        """DpPlanner::Plan (dp_planner.cpp:135-281). Returns a dict with
        the winning cell indices, per-layer winning current_s, min_cost,
        ok, and the 81-knot coarse trajectory arrays."""
        self.start_s, self.start_l = self.env.ref.get_projection(
            start_x, start_y)

        big = np.finfo(float).max
        self.cells = [[[{"cost": big, "current_s": -big,
                         "parent_s_ind": -1, "parent_l_ind": -1}
                        for _ in range(NL)] for _ in range(NS)]
                      for _ in range(NT)]

        s_ind = np.repeat(np.arange(NS), NL)
        l_ind = np.tile(np.arange(NL), NS)

        cur_s0, cost0 = self._sweep((-1, -1, -1))
        for c in range(NS * NL):
            cell = self.cells[0][s_ind[c]][l_ind[c]]
            cell["current_s"] = cur_s0[c]
            cell["cost"] = cost0[c]

        for i in range(NT - 1):
            for j in range(NS):
                for k in range(NL):
                    p_cost = self.cells[i][j][k]["cost"]
                    cur_s, delta = self._sweep((i, j, k))
                    for c in range(NS * NL):
                        m, n = s_ind[c], l_ind[c]
                        cur_cost = p_cost + delta[c]
                        if cur_cost < self.cells[i + 1][m][n]["cost"]:
                            self.cells[i + 1][m][n] = {
                                "cost": cur_cost, "current_s": cur_s[c],
                                "parent_s_ind": j, "parent_l_ind": k}

        min_cost = big
        min_s = min_l = 0
        for i in range(NS):
            for j in range(NL):
                if self.cells[NT - 1][i][j]["cost"] < min_cost:
                    min_cost = self.cells[NT - 1][i][j]["cost"]
                    min_s, min_l = i, j

        waypoints = [None] * NT
        for i in range(NT - 1, -1, -1):
            cell = self.cells[i][min_s][min_l]
            waypoints[i] = ((i, min_s, min_l), cell)
            min_s = cell["parent_s_ind"]
            min_l = cell["parent_l_ind"]

        # interpolation to 81 knots (dp_planner.cpp:214-245)
        last_s, last_l = self.start_s, self.start_l
        xs, ys, thetas, stations = [], [], [], []
        for i in range(NT):
            (ti, si, li), cell = waypoints[i]
            parent_s = (waypoints[i - 1][1]["current_s"] if i > 0
                        else self.start_s)
            seg_s, seg_l = self._interp_linearly(
                parent_s, cell["parent_l_ind"], i, si, li)
            for j in range(len(seg_s)):
                dl = seg_l[j] - last_l
                ds = max(seg_s[j] - last_s, K_EPS)
                last_s, last_l = seg_s[j], seg_l[j]
                x, y = self.env.ref.get_cartesian(
                    np.asarray(seg_s[j]), np.asarray(seg_l[j]))
                tp = self.env.ref.evaluate_station(np.asarray(seg_s[j]))
                stations.append(seg_s[j])
                xs.append(float(x))
                ys.append(float(y))
                thetas.append(float(tp["theta"]) + np.arctan(
                    (dl / ds) / (1.0 - float(tp["kappa"]) * seg_l[j])))

        _, _, speeds, accels, kappas = compute_path_profile(
            self.cfg.delta_t, xs, ys)

        return {
            "sel_cells": [wp[0][1:] for wp in waypoints],     # [(s, l)] * NT
            "cell_s": [wp[1]["current_s"] for wp in waypoints],
            "min_cost": waypoints[-1][1]["cost"],
            "ok": waypoints[-1][1]["cost"] < self.dp.w_obstacle,
            "s": np.asarray(stations), "x": np.asarray(xs),
            "y": np.asarray(ys), "theta": np.asarray(thetas),
            "velocity": speeds, "a": accels, "kappa": kappas,
            "delta": np.arctan(kappas * self.veh.wheel_base),
        }


def env_from_scenario(scn) -> RefEnv:
    """Build the oracle environment from a cilqr_tpu Scenario pytree
    (unpadding the obstacle tensors)."""
    refline = RefLine.from_traj(scn.centerline)
    smask = np.asarray(scn.static_mask)
    statics = [np.asarray(scn.static_obs)[k] for k in np.nonzero(smask)[0]]
    dyn = []
    dlen = np.asarray(scn.dyn_len)
    for k in np.nonzero(np.asarray(scn.dyn_mask))[0]:
        L = int(dlen[k])
        dyn.append((np.asarray(scn.dyn_times)[k, :L],
                    np.asarray(scn.dyn_obs)[k, :L]))
    return RefEnv(refline, statics, dyn)
