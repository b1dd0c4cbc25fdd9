"""LQR path/speed tracker — the reference's alternative init-guess path.

Replaces Tracker (/root/reference/algorithm/ilqr/tracker.{h,cc}): a
decoupled lateral/longitudinal LQR tracking simulation at 0.01 s producing
a dynamically feasible trajectory along a coarse plan. The reference wires
this behind a source edit (InitGuess vs iqr, ilqr_optimizer.cc:168-169) and
defaults to iqr; here it is ``tracker.plan`` for API parity.

Replicates the reference's quirky substep bookkeeping exactly (see
``plan``): the loop at tracker.cc:185-203 labels the state integrated at
loop time t with time t itself (:198), so the lon controller's
EvaluateTime match point lags one substep, and knot k is pushed at the
END of iteration j=10k — i.e. knot k is the state after 10k+1
integrations. One deviation, bitwise-equivalent: the reference re-solves
the longitudinal DARE — an identical, constant fixed-point iteration from
the same P0=Q — every 0.01 s substep up to 150 iterations
(tracker.cc:72-81); we solve it once (same iteration, same result).
Parity: tests/test_tracker.py vs the numpy transcription oracle
(tests/tracker_oracle.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .config import TrackerConfig, VehicleParam
from .geometry import normalize_angle
from .lqr import solve_lqr
from .reference_line import evaluate_time, get_projection
from .types import Traj


def _lat_lqr_gain(v, cfg: TrackerConfig, veh: VehicleParam, dtype):
    """Lateral gain for speed v (Tracker::LateralControl, tracker.cc:55-70):
    state (l, theta_err, delta), control delta_rate."""
    v_amend = jnp.maximum(2.0, v)
    dt = cfg.dt
    A = jnp.eye(3, dtype=dtype)
    A = A.at[0, 1].set(v_amend * dt)
    A = A.at[1, 2].set(-v_amend / veh.wheel_base * dt)
    B = jnp.zeros((3, 1), dtype).at[2, 0].set(dt)
    Q = jnp.diag(jnp.asarray([cfg.lat_weight_l, cfg.lat_weight_theta,
                              cfg.lat_weight_delta], dtype))
    R = jnp.asarray([[cfg.lat_weight_delta_rate]], dtype)
    return solve_lqr(A, B, Q, R, cfg.tolerance, cfg.max_num_iteration)


def _lon_lqr_gain(cfg: TrackerConfig, dtype):
    """Longitudinal gain (Tracker::LongitudinalControl + InitMatrix,
    tracker.cc:72-81,138-167): state (s_err, v_err, a), control jerk."""
    dt = cfg.dt
    A = jnp.eye(3, dtype=dtype)
    A = A.at[0, 1].set(dt)
    A = A.at[1, 2].set(-dt)
    B = jnp.zeros((3, 1), dtype).at[2, 0].set(dt)
    Q = jnp.diag(jnp.asarray([cfg.lon_weight_s, cfg.lon_weight_v,
                              cfg.lon_weight_a], dtype))
    R = jnp.asarray([[cfg.lon_weight_j]], dtype)
    return solve_lqr(A, B, Q, R, cfg.tolerance, cfg.max_num_iteration)


def plan(start_state, coarse: Traj, cfg: TrackerConfig, veh: VehicleParam):
    """Tracker::Plan / lqr (tracker.cc:12-17,169-215). start_state: [6]
    (x, y, theta, v, a, delta). Returns (xs [N,6], us [N-1,2]) sampled on
    the coarse trajectory's 0.1 s knots.

    Exact reference bookkeeping (tracker.cc:184-203): the loop runs t from
    start_time to end_time INCLUSIVE (801 iterations); the state produced
    at loop time t is labeled time t (:198, one substep behind its true
    time), so the lon match point lags one substep; knot k is pushed when
    the label reaches 0.1k (end of iteration j=10k — the state after
    10k+1 integrations) and its stored controls are the last write before
    knot k+1's push, i.e. the controls computed at iteration j=10(k+1)
    (:194-195). The push pattern is deterministic static strides: the fp
    accumulation error of t (~1e-13 over 800 adds of 0.01) is far below
    the kMathEpsilon=1e-10 comparison slack (vec2d.h:33)."""
    dtype = coarse.x.dtype
    n_knots = coarse.x.shape[0]
    sub = int(round(cfg.dt / cfg.simulation_dt))       # 10
    n_steps = (n_knots - 1) * sub + 1                  # 801: t in [0, 8.0]
    sdt = cfg.simulation_dt
    K_lon = _lon_lqr_gain(cfg, dtype)

    def deriv(x, jerk, delta_rate):
        """vehicle_mode (tracker.h:72-87): state (x,y,theta,v,a,delta)."""
        return jnp.stack([
            x[3] * jnp.cos(x[2]),
            x[3] * jnp.sin(x[2]),
            x[3] * jnp.tan(x[5]) / veh.wheel_base,
            x[4],
            jerk,
            delta_rate,
        ])

    def rk4(x, jerk, delta_rate):
        """VehicleDynamic (tracker.cc:83-136) incl. its clamps."""
        k1 = deriv(x, jerk, delta_rate)
        k2 = deriv(x + 0.5 * sdt * k1, jerk, delta_rate)
        k3 = deriv(x + 0.5 * sdt * k2, jerk, delta_rate)
        k4 = deriv(x + sdt * k3, jerk, delta_rate)
        nxt = x + sdt * (k1 + 2 * k2 + 2 * k3 + k4) / 6.0
        nxt = nxt.at[2].set(normalize_angle(nxt[2]))
        nxt = nxt.at[3].set(jnp.maximum(0.0, nxt[3]))
        nxt = nxt.at[4].set(jnp.clip(nxt[4], veh.min_acceleration,
                                     veh.max_acceleration))
        nxt = nxt.at[5].set(normalize_angle(
            jnp.clip(nxt[5], veh.delta_min, veh.delta_max)))
        return nxt

    def control(x, t):
        """CalcaulateInitState + both LQR controls (tracker.cc:19-81)."""
        pv_x = x[0] + jnp.cos(x[2]) * x[3] * cfg.lat_preview_time
        pv_y = x[1] + jnp.sin(x[2]) * x[3] * cfg.lat_preview_time
        _, _, proj = get_projection(coarse, pv_x, pv_y)
        dx = x[0] - proj.x
        dy = x[1] - proj.y
        l = jnp.sin(proj.theta) * dx - jnp.cos(proj.theta) * dy
        theta_err = normalize_angle(proj.theta - x[2])
        lat_state = jnp.stack([l, theta_err, x[5]])

        match = evaluate_time(coarse, t)
        lon_state = jnp.stack([match.s - proj.s,
                               match.velocity - x[3], x[4]])

        K_lat = _lat_lqr_gain(x[3], cfg, veh, dtype)
        delta_rate = -(K_lat @ lat_state)[0]
        jerk = -(K_lon @ lon_state)[0]
        delta_rate = jnp.clip(delta_rate, veh.delta_rate_min,
                              veh.delta_rate_max)
        jerk = jnp.clip(jerk, veh.jerk_min, veh.jerk_max)
        return jerk, delta_rate

    def step(carry, _):
        # t_label = the reference's cur_state.time (set to the PREVIOUS
        # loop t after integrating, tracker.cc:198); t_loop = the loop
        # variable, accumulated t += sdt exactly as the C++ does.
        x, t_label, t_loop = carry
        jerk, drate = control(x, t_label)
        nxt = rk4(x, jerk, drate)
        return (nxt, t_loop, t_loop + sdt), (nxt, jerk, drate)

    x0 = jnp.asarray(start_state, dtype)
    t0 = coarse.time[0]
    _, (traj, jerks, drates) = jax.lax.scan(
        step, (x0, t0, t0), None, length=n_steps)
    # knot k (k>=1) = state at end of iteration j=10k; us[k] = controls
    # computed at iteration j=10(k+1) (see docstring)
    knot_states = jnp.concatenate(
        [x0[None], traj[sub::sub]], axis=0)            # [N,6]
    us = jnp.stack([jerks[sub::sub], drates[sub::sub]],
                   axis=-1)                            # [N-1,2]
    return knot_states, us
