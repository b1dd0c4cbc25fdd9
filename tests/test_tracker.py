"""Tracker (LQR path/speed init-guess path) tests: DARE gains vs scipy,
closed-loop tracking of a straight coarse trajectory, golden parity vs the
numpy transcription oracle (tests/tracker_oracle.py, tracker.cc:19-215),
and the IlqrConfig.init_guess='tracker' wiring through the pipeline."""

import dataclasses
import math

import jax.numpy as jnp
import numpy as np

from cilqr_tpu import tracker as TK
from cilqr_tpu.config import TrackerConfig, VehicleParam
from cilqr_tpu.lqr import solve_lqr
from cilqr_tpu.types import Traj

import tracker_oracle

CFG = TrackerConfig()
VEH = VehicleParam()


def test_lqr_gain_matches_scipy_dare():
    """solve_lqr's fixed-point iteration (linear_quadratic_regulator.cc:30-70)
    against scipy's direct DARE solution."""
    from scipy.linalg import solve_discrete_are

    dt = CFG.dt
    A = np.eye(3)
    A[0, 1] = dt
    A[1, 2] = -dt
    B = np.zeros((3, 1))
    B[2, 0] = dt
    Q = np.diag([CFG.lon_weight_s, CFG.lon_weight_v, CFG.lon_weight_a])
    R = np.array([[CFG.lon_weight_j]])
    K = np.asarray(solve_lqr(jnp.asarray(A), jnp.asarray(B), jnp.asarray(Q),
                             jnp.asarray(R), 1e-10, 5000))
    P = solve_discrete_are(A, B, Q, R)
    K_ref = np.linalg.solve(R + B.T @ P @ B, B.T @ P @ A)
    np.testing.assert_allclose(K, K_ref, rtol=1e-6, atol=1e-8)


def straight_coarse(n=81, v=10.0, dt=0.1):
    t = np.arange(n) * dt
    x = v * t
    return Traj.zeros(n, jnp.float64).replace(
        x=jnp.asarray(x), s=jnp.asarray(x), time=jnp.asarray(t),
        velocity=jnp.asarray(np.full(n, v)))


def test_tracker_follows_straight_road():
    coarse = straight_coarse()
    start = jnp.asarray([0.0, 0.4, 0.05, 10.0, 0.0, 0.0])
    xs, us = TK.plan(start, coarse, CFG, VEH)
    assert xs.shape == (81, 6)
    assert us.shape == (80, 2)
    xs_np = np.asarray(xs)
    # lateral error decays toward the path and never diverges
    assert abs(xs_np[-1, 1]) < abs(float(start[1]))
    assert np.max(np.abs(xs_np[:, 1])) < 1.0
    # speed stays near nominal
    assert np.max(np.abs(xs_np[:, 3] - 10.0)) < 1.5
    # controls respect the clamps (tracker.cc:190-193)
    us_np = np.asarray(us)
    assert np.all(us_np[:, 0] >= VEH.jerk_min - 1e-9)
    assert np.all(us_np[:, 0] <= VEH.jerk_max + 1e-9)
    assert np.all(us_np[:, 1] >= VEH.delta_rate_min - 1e-9)
    assert np.all(us_np[:, 1] <= VEH.delta_rate_max + 1e-9)
    # dynamically consistent: replaying controls through the same RK4
    # (already what plan does) -> start state preserved at knot 0
    np.testing.assert_allclose(xs_np[0], np.asarray(start), atol=1e-12)


def curved_coarse(n=81, v=8.0, dt=0.1, radius=40.0):
    """Constant-speed arc (theta_max = 1.6 rad, no wrap): a coarse
    trajectory with real curvature so the preview projection, slerp
    interpolation, and lateral LQR all do non-trivial work."""
    t = np.arange(n) * dt
    s = v * t
    th = s / radius
    delta = math.atan(VEH.wheel_base / radius)
    return Traj.zeros(n, jnp.float64).replace(
        time=jnp.asarray(t), s=jnp.asarray(s),
        x=jnp.asarray(radius * np.sin(th)),
        y=jnp.asarray(radius * (1.0 - np.cos(th))),
        theta=jnp.asarray(th),
        kappa=jnp.full((n,), 1.0 / radius, jnp.float64),
        velocity=jnp.full((n,), v, jnp.float64),
        delta=jnp.full((n,), delta, jnp.float64))


def test_tracker_matches_reference_oracle():
    """Golden parity: tracker.plan vs the literal numpy transcription of
    tracker.cc's 801-substep loop (incl. the label-lag + push-pattern
    bookkeeping and the DARE maxCoeff stopping quirk), on a curved coarse
    trajectory from an offset start."""
    coarse = curved_coarse()
    start = np.array([0.3, -0.4, 0.1, 7.0, 0.2, 0.02])
    want_xs, want_us = tracker_oracle.TrackerOracle(CFG, VEH).plan(
        start, coarse)
    got_xs, got_us = TK.plan(jnp.asarray(start), coarse, CFG, VEH)
    assert got_xs.shape == want_xs.shape and got_us.shape == want_us.shape
    # identical op sequences up to jnp-vs-numpy 3x3 linalg rounding;
    # differences stay at fp-noise level through all 801 steps
    np.testing.assert_allclose(np.asarray(got_xs), want_xs, atol=1e-8)
    np.testing.assert_allclose(np.asarray(got_us), want_us, atol=1e-7)


def test_tracker_selectable_as_init_guess():
    """IlqrConfig.init_guess='tracker' routes the tracker rollout through
    the pipeline as the solver's initial trajectory (the reference's
    source-edit switch, ilqr_optimizer.cc:107-139,168-169)."""
    from cilqr_tpu import pipeline as P
    from cilqr_tpu import scenario as SC
    from cilqr_tpu.config import PlannerConfig
    from cilqr_tpu.types import SolverStatus

    cfg = PlannerConfig()
    cfg = cfg.replace(ilqr=dataclasses.replace(cfg.ilqr,
                                               init_guess="tracker"))
    scn = SC.make_scenario(seed=7, dtype=jnp.float64)
    out = P.plan(scn, (0.0, 0.0, 0.0, 10.0), cfg)
    # the solve's recorded init trajectory IS the tracker rollout
    start6 = jnp.asarray([0.0, 0.0, 0.0, 10.0, 0.0, 0.0], jnp.float64)
    want_xs, want_us = TK.plan(start6, out.coarse, cfg.tracker, cfg.vehicle)
    np.testing.assert_allclose(np.asarray(out.solve.init_xs),
                               np.asarray(want_xs), atol=1e-12)
    np.testing.assert_allclose(np.asarray(out.solve.init_us),
                               np.asarray(want_us), atol=1e-12)
    # and the solve still concludes with a terminal status + finite result
    assert int(out.solve.status) != SolverStatus.RUNNING
    assert np.isfinite(np.asarray(out.solve.xs)).all()
