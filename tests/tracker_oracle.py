"""Golden tracker oracle: literal numpy transcription of the reference's
LQR path/speed tracker and everything it touches.

Transcribed sources (all under /root/reference/algorithm/):
  * ilqr/tracker.cc:19-215             — CalcaulateInitState /
    LateralControl / LongitudinalControl / VehicleDynamic (RK4 + clamps) /
    InitMatrix / the lqr() simulation loop with its exact substep/time
    bookkeeping (the state integrated at loop time t is labeled time t,
    :198; knots are pushed on the label reaching the next knot time,
    :199-202; the last knot's controls are overwritten every substep,
    :194-195)
  * math/linear_quadratic_regulator.cc:30-79 — Apollo DARE fixed-point
    (including the diff = fabs(maxCoeff) quirk at :54: |max coefficient|,
    not max |coefficient|)
  * utils/discretized_trajectory.cpp:50-64,89-110,125-190 —
    QueryLowerBoundTimePoint / LinearInterpolateTrajectoryWithTime /
    EvaluateTime / QueryNearestPoint / GetProjection
  * math/math_utils.h slerp / NormalizeAngle (via dp_oracle)

The loop is kept scalar and step-by-step, exactly as the C++ runs it
(801 iterations of control + RK4 at 0.01 s), in float64 numpy.
"""

from __future__ import annotations

import numpy as np

from dp_oracle import MATH_EPS, normalize_angle, slerp


def solve_lqr_ref(A, B, Q, R, tolerance, max_num_iteration):
    """math::SolveLQRProblem (linear_quadratic_regulator.cc:30-79), M=0."""
    A = np.asarray(A, float)
    B = np.asarray(B, float)
    Q = np.asarray(Q, float)
    R = np.asarray(R, float)
    M = np.zeros((Q.shape[0], R.shape[1]))
    AT, BT, MT = A.T, B.T, M.T
    P = Q.copy()
    num_iteration = 0
    diff = np.inf
    while num_iteration < max_num_iteration and diff > tolerance:
        num_iteration += 1
        P_next = (AT @ P @ A
                  - (AT @ P @ B + M) @ np.linalg.inv(R + BT @ P @ B)
                  @ (BT @ P @ A + MT) + Q)
        # reference quirk (:54): fabs of the MAX coefficient of the change
        diff = abs(np.max(P_next - P))
        P = P_next
    return np.linalg.inv(R + BT @ P @ B) @ (BT @ P @ A + MT)


_FIELDS = ("time", "s", "x", "y", "theta", "kappa", "velocity")


class TrajOracle:
    """DiscretizedTrajectory queries over a coarse trajectory, scalar."""

    def __init__(self, traj):
        for f in _FIELDS:
            setattr(self, f, np.asarray(getattr(traj, f), float))
        self.n = len(self.x)

    def _interp_with_time(self, i0, i1, time):
        """LinearInterpolateTrajectoryWithTime
        (discretized_trajectory.cpp:89-110)."""
        t0 = self.time[i0]
        t1 = self.time[i1]
        if abs(t1 - t0) < MATH_EPS:
            return {f: getattr(self, f)[i0] for f in _FIELDS}
        w = (time - t0) / (t1 - t0)
        out = {f: (1 - w) * getattr(self, f)[i0] + w * getattr(self, f)[i1]
               for f in _FIELDS}
        out["time"] = time
        out["theta"] = slerp(self.theta[i0], t0, self.theta[i1], t1, time)
        return out

    def _interp_with_s(self, i0, i1, s):
        """LinearInterpolateTrajectory (discretized_trajectory.cpp:66-87)."""
        s0 = self.s[i0]
        s1 = self.s[i1]
        if abs(s1 - s0) < MATH_EPS:
            return {f: getattr(self, f)[i0] for f in _FIELDS}
        w = (s - s0) / (s1 - s0)
        out = {f: (1 - w) * getattr(self, f)[i0] + w * getattr(self, f)[i1]
               for f in _FIELDS}
        out["s"] = s
        out["theta"] = slerp(self.theta[i0], s0, self.theta[i1], s1, s)
        return out

    def evaluate_time(self, time):
        """EvaluateTime (:125-136) incl. QueryLowerBoundTimePoint's end
        clamps (:50-64) and the begin -> next(begin) fix-up (:129-131)."""
        if time >= self.time[-1]:
            idx = self.n - 1
        elif time < self.time[0]:
            idx = 0
        else:
            idx = int(np.searchsorted(self.time, time, side="left"))
        if idx == 0:
            idx = 1
        return self._interp_with_time(idx - 1, idx, time)

    def get_projection(self, px, py):
        """GetProjection (:159-190): first-nearest knot scan, chord
        projection over [i-1, i+1]. Returns the project point dict."""
        d2 = (self.x - px) ** 2 + (self.y - py) ** 2
        i = int(np.argmin(d2))        # first minimum, like the C++ scan
        i0 = max(0, i - 1)
        i1 = min(self.n - 1, i + 1)
        if i0 < i1:
            v0x = px - self.x[i0]
            v0y = py - self.y[i0]
            v1x = self.x[i1] - self.x[i0]
            v1y = self.y[i1] - self.y[i0]
            v1n = np.sqrt(v1x * v1x + v1y * v1y)
            delta_s = (v0x * v1x + v0y * v1y) / v1n
            return self._interp_with_s(i0, i1, self.s[i0] + delta_s)
        return {f: getattr(self, f)[i] for f in _FIELDS}


class TrackerOracle:
    """Tracker (tracker.cc) — config/vehicle values read from the repo's
    typed config (identical to the reference's defaults)."""

    def __init__(self, cfg, veh):
        self.cfg = cfg
        self.veh = veh
        # InitMatrix (tracker.cc:138-167)
        dt = cfg.dt
        self.lat_A = np.eye(3)
        self.lat_B = np.zeros((3, 1))
        self.lat_B[2, 0] = dt
        self.lat_Q = np.diag([cfg.lat_weight_l, cfg.lat_weight_theta,
                              cfg.lat_weight_delta])
        self.lat_R = np.array([[cfg.lat_weight_delta_rate]])
        self.lon_A = np.eye(3)
        self.lon_A[0, 1] = dt
        self.lon_A[1, 2] = -dt
        self.lon_B = np.zeros((3, 1))
        self.lon_B[2, 0] = dt
        self.lon_Q = np.diag([cfg.lon_weight_s, cfg.lon_weight_v,
                              cfg.lon_weight_a])
        self.lon_R = np.array([[cfg.lon_weight_j]])

    def _lateral_control(self, state, v):
        """LateralControl (tracker.cc:55-70); note dt=0.1 hardcoded at :58."""
        v_amend = max(2.0, v)
        dt = 0.1
        A = self.lat_A.copy()
        A[0, 1] = v_amend * dt
        A[1, 2] = -v_amend / self.veh.wheel_base * dt
        K = solve_lqr_ref(A, self.lat_B, self.lat_Q, self.lat_R,
                          self.cfg.tolerance, self.cfg.max_num_iteration)
        return -(K @ state)[0]

    def _longitudinal_control(self, state):
        """LongitudinalControl (tracker.cc:72-81)."""
        K = solve_lqr_ref(self.lon_A, self.lon_B, self.lon_Q, self.lon_R,
                          self.cfg.tolerance, self.cfg.max_num_iteration)
        return -(K @ state)[0]

    def _init_state(self, follow: TrajOracle, x, y, theta, v, a, delta,
                    time):
        """CalcaulateInitState (tracker.cc:19-53)."""
        pv_x = x + np.cos(theta) * v * self.cfg.lat_preview_time
        pv_y = y + np.sin(theta) * v * self.cfg.lat_preview_time
        proj = follow.get_projection(pv_x, pv_y)
        dx = x - proj["x"]
        dy = y - proj["y"]
        l = np.sin(proj["theta"]) * dx - np.cos(proj["theta"]) * dy
        theta_error = normalize_angle(proj["theta"] - theta)
        lateral = np.array([l, theta_error, delta])
        match = follow.evaluate_time(time + 0.0)
        longitudinal = np.array([match["s"] - proj["s"],
                                 match["velocity"] - v, a])
        return lateral, longitudinal

    def _dynamic(self, st, delta_rate, jerk):
        """VehicleDynamic (tracker.cc:83-136): RK4 at sumulation_dt with
        the reference's clamps. st = (x, y, theta, v, a, delta)."""
        veh = self.veh
        dt = self.cfg.simulation_dt
        dt_2 = dt / 2.0
        x, y, theta, v, a, delta = st

        def f(th, vv, dl, aa):
            # returns (x., y., theta., v., delta., a.) as the C++
            # VehicleState consumption implies: theta./v./delta./a. feed
            # the midpoint expansions of (theta, v, delta, a)
            return (vv * np.cos(th), vv * np.sin(th),
                    vv * np.tan(dl) / veh.wheel_base, aa, delta_rate, jerk)

        k1 = f(theta, v, delta, a)
        k2 = f(theta + k1[2] * dt_2, v + k1[3] * dt_2,
               delta + k1[4] * dt_2, a + k1[5] * dt_2)
        k3 = f(theta + k2[2] * dt_2, v + k2[3] * dt_2,
               delta + k2[4] * dt_2, a + k2[5] * dt_2)
        k4 = f(theta + k3[2] * dt, v + k3[3] * dt,
               delta + k3[4] * dt, a + k3[5] * dt)

        def comb(i):
            return (k1[i] + 2.0 * k2[i] + 2.0 * k3[i] + k4[i]) / 6.0 * dt

        nx = x + comb(0)
        ny = y + comb(1)
        ntheta = normalize_angle(theta + comb(2))
        nv = max(0.0, v + comb(3))
        ndelta = normalize_angle(
            min(veh.delta_max, max(veh.delta_min, delta + comb(4))))
        na = min(veh.max_acceleration,
                 max(veh.min_acceleration, a + comb(5)))
        return np.array([nx, ny, ntheta, nv, na, ndelta])

    def plan(self, start_state, coarse):
        """Tracker::lqr (tracker.cc:169-215). start_state: [6]
        (x, y, theta, v, a, delta). Returns (xs [N,6], us [N-1,2]) exactly
        as IlqrOptimizer::InitGuess consumes the pushed knots
        (ilqr_optimizer.cc:107-139)."""
        follow = TrajOracle(coarse)
        st = np.asarray(start_state, float).copy()
        knots = [st.copy()]
        knot_controls = [np.zeros(2)]   # trajectory.back() control writes
        start_time = follow.time[0]
        end_time = follow.time[-1]
        cur_time = start_time           # cur_state.time after the reset
        i = 1
        t = start_time
        veh = self.veh
        while t < end_time + MATH_EPS:
            lat, lon = self._init_state(follow, st[0], st[1], st[2], st[3],
                                        st[4], st[5], cur_time)
            delta_rate = self._lateral_control(lat, st[3])
            jerk = self._longitudinal_control(lon)
            delta_rate = max(veh.delta_rate_min,
                             min(veh.delta_rate_max, delta_rate))
            jerk = max(veh.jerk_min, min(veh.jerk_max, jerk))
            knot_controls[-1] = np.array([jerk, delta_rate])
            st = self._dynamic(st, delta_rate, jerk)
            cur_time = t                # tracker.cc:198 — label lags
            if i < follow.n and cur_time > follow.time[i] - MATH_EPS:
                knots.append(st.copy())
                knot_controls.append(np.zeros(2))
                i += 1
            t += self.cfg.simulation_dt
        xs = np.stack(knots)
        us = np.stack(knot_controls[:-1])
        return xs, us
