"""Tracker (LQR path/speed init-guess path) tests: DARE gains vs scipy,
closed-loop tracking of a straight coarse trajectory (tracker.cc:169-215
semantics)."""

import jax.numpy as jnp
import numpy as np

from cilqr_tpu import tracker as TK
from cilqr_tpu.config import TrackerConfig, VehicleParam
from cilqr_tpu.lqr import solve_lqr
from cilqr_tpu.types import Traj

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
