import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cilqr_tpu import model as M
from cilqr_tpu.config import VehicleParam

VEH = VehicleParam()
DT = 0.1


def _rand_state(rng, n=1):
    s = rng.normal(size=(n, 6))
    s[:, 3] = np.abs(s[:, 3]) * 5  # v
    s[:, 5] *= 0.3  # delta
    return s


def test_rk2_step_matches_manual_midpoint(rng):
    x = jnp.asarray([1.0, 2.0, 0.3, 5.0, 0.5, 0.1])
    u = jnp.asarray([0.2, 0.05])
    nxt = M.dynamics_rk2(x, u, DT, VEH.wheel_base)
    # manual midpoint
    def f(s):
        return np.array([
            s[3] * np.cos(s[2]), s[3] * np.sin(s[2]),
            s[3] * np.tan(s[5]) / VEH.wheel_base, s[4], 0.2, 0.05])
    xn = np.asarray(x)
    k1 = f(xn)
    mid = xn + 0.05 * k1
    k2 = f(mid)
    want = xn + DT * k2
    np.testing.assert_allclose(np.asarray(nxt), want, atol=1e-12)


def test_autodiff_jacobian_matches_finite_difference(rng):
    x = jnp.asarray(_rand_state(rng, 3))
    u = jnp.asarray(rng.normal(size=(3, 2)) * 0.1)
    A, B = M.dynamics_jacobian_autodiff(x, u, DT, VEH.wheel_base)
    eps = 1e-6
    for k in range(3):
        for j in range(6):
            dx = np.zeros(6)
            dx[j] = eps
            f1 = np.asarray(M.dynamics_rk2(x[k] + dx, u[k], DT, VEH.wheel_base))
            f0 = np.asarray(M.dynamics_rk2(x[k] - dx, u[k], DT, VEH.wheel_base))
            np.testing.assert_allclose(np.asarray(A[k][:, j]),
                                       (f1 - f0) / (2 * eps), atol=1e-5)


def test_analytic_jacobian_close_to_autodiff(rng):
    """The analytic (reference-parity) Jacobian equals the exact one except
    entries A[2,5]/B[2,1], which use v instead of v_mid
    (vehicle_model.cc:59,82)."""
    x = jnp.asarray(_rand_state(rng, 5))
    u = jnp.asarray(rng.normal(size=(5, 2)) * 0.1)
    Aa, Ba = M.dynamics_jacobian_analytic(x, u, DT, VEH.wheel_base)
    Ae, Be = M.dynamics_jacobian_autodiff(x, u, DT, VEH.wheel_base)
    mask = np.ones((6, 6), bool)
    mask[2, 5] = False
    np.testing.assert_allclose(np.asarray(Aa)[:, mask].ravel(),
                               np.asarray(Ae)[:, mask].ravel(), atol=1e-9)
    maskB = np.ones((6, 2), bool)
    maskB[2, 1] = False
    np.testing.assert_allclose(np.asarray(Ba)[:, maskB].ravel(),
                               np.asarray(Be)[:, maskB].ravel(), atol=1e-9)
    # the quirk entries match the documented v-vs-v_mid substitution
    v = np.asarray(x)[:, 3]
    a = np.asarray(x)[:, 4]
    v_mid = v + 0.5 * DT * a
    ratio = np.asarray(Aa)[:, 2, 5] / np.asarray(Ae)[:, 2, 5]
    np.testing.assert_allclose(ratio, v / v_mid, rtol=1e-6)


def test_analytic_jacobian_against_reference_formula(rng):
    """Spot-check the analytic A against the literal reference expressions
    (vehicle_model.cc:44-86)."""
    x = np.array([0.0, 0.0, 0.4, 8.0, 1.0, 0.2])
    u = np.array([0.5, 0.1])
    A, B = M.dynamics_jacobian_analytic(jnp.asarray(x), jnp.asarray(u), DT,
                                        VEH.wheel_base)
    A = np.asarray(A)
    L = VEH.wheel_base
    v, theta, a, delta = x[3], x[2], x[4], x[5]
    jerk, delta_rate = u
    theta_mid = theta + 0.5 * DT * v * np.tan(delta) / L
    tan_delta = np.tan(delta)
    tan_delta_rate = np.tan(delta + 0.5 * DT * delta_rate)
    assert A[0, 2] == pytest.approx(-DT * (0.5 * a * DT + v) * np.sin(theta_mid))
    assert A[1, 3] == pytest.approx(
        DT * np.sin(theta_mid) + 0.5 * DT * DT * (0.5 * a * DT + v) *
        np.cos(theta_mid) * tan_delta / L)
    assert A[2, 5] == pytest.approx(DT * v * (tan_delta_rate ** 2 + 1) / L)
    assert np.asarray(B)[2, 1] == pytest.approx(
        0.5 * DT * DT * v * (tan_delta_rate ** 2 + 1) / L)


def test_rollout_shapes():
    x0 = jnp.zeros(6)
    us = jnp.zeros((80, 2))
    xs = M.rollout(x0, us, DT, VEH.wheel_base)
    assert xs.shape == (81, 6)
