"""JAX solver vs native C++ oracle parity (the BASELINE gate: max control
deviation < 1e-3 at equal horizon and iteration budget)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cilqr_tpu import costs as C
from cilqr_tpu import solver as S
from cilqr_tpu.config import IlqrConfig, VehicleParam
from cilqr_tpu.native import bindings as NB

VEH = VehicleParam()
CFG = IlqrConfig()
DT = 0.1
N = 81


def test_step_parity(rng):
    for _ in range(20):
        x = rng.normal(size=6)
        x[3] = abs(x[3]) * 5
        u = rng.normal(size=2) * 0.3
        ref = NB.ref_step(x, u, CFG, VEH, DT)
        from cilqr_tpu.model import dynamics_rk2

        got = np.asarray(dynamics_rk2(jnp.asarray(x), jnp.asarray(u), DT,
                                      VEH.wheel_base))
        np.testing.assert_allclose(got, ref, atol=1e-14)


def test_jacobian_parity(rng):
    from cilqr_tpu.model import dynamics_jacobian_analytic

    for _ in range(20):
        x = rng.normal(size=6)
        x[3] = abs(x[3]) * 5
        u = rng.normal(size=2) * 0.3
        Ar, Br = NB.ref_jacobian(x, u, CFG, VEH, DT)
        A, B = dynamics_jacobian_analytic(jnp.asarray(x), jnp.asarray(u), DT,
                                          VEH.wheel_base)
        np.testing.assert_allclose(np.asarray(A), Ar, atol=1e-14)
        np.testing.assert_allclose(np.asarray(B), Br, atol=1e-14)


def _problem(seed=0, curved=True):
    rng = np.random.default_rng(seed)
    t = np.arange(N) * DT
    v = 8.0 + rng.uniform(-2, 2)
    s = v * t
    x = s
    y = 1.2 * np.sin(0.12 * s) if curved else np.zeros_like(s)
    th = np.arctan(1.2 * 0.12 * np.cos(0.12 * s)) if curved else np.zeros_like(s)
    goals = np.zeros((N, 6))
    goals[:, 0] = x
    goals[:, 1] = y
    goals[:, 2] = th
    goals[:, 3] = v

    KC = 8
    planes = np.zeros((N, KC, 3))
    mask = np.zeros((N, KC), bool)
    half = 5.0 + rng.uniform(0, 2)
    for i in range(N):
        planes[i, 0] = [1, 0, x[i] + 25]
        planes[i, 1] = [-1, 0, -(x[i] - 25)]
        planes[i, 2] = [0, 1, y[i] + half]
        planes[i, 3] = [0, -1, -(y[i] - half)]
        mask[i, :4] = True
    S_ = 12
    seg_x = np.linspace(-10, x[-1] + 20, S_ + 1)
    lp = np.tile([0, 1, 7.0], (S_, 1))
    rp = np.tile([0, -1, 7.0], (S_, 1))
    ls = np.stack([np.stack([seg_x[:-1], np.full(S_, 7.0)], -1),
                   np.stack([seg_x[1:], np.full(S_, 7.0)], -1)], 1)
    rs = np.stack([np.stack([seg_x[:-1], np.full(S_, -7.0)], -1),
                   np.stack([seg_x[1:], np.full(S_, -7.0)], -1)], 1)
    m = np.ones(S_, bool)

    start = np.array([0.0, rng.uniform(-0.5, 0.5), rng.uniform(-0.1, 0.1),
                      v, 0.0, 0.0])
    return goals, planes, mask, lp, ls, rp, rs, m, start


@pytest.mark.parametrize("seed", range(4))
def test_solver_control_parity(seed):
    goals, planes, mask, lp, ls, rp, rs, m, start = _problem(seed)

    cons = C.shrink_and_normalize(
        jnp.asarray(planes), jnp.asarray(mask), jnp.asarray(lp),
        jnp.asarray(ls), jnp.asarray(m), jnp.asarray(rp), jnp.asarray(rs),
        jnp.asarray(m), CFG, VEH)
    res = S.solve(jnp.asarray(goals), jnp.asarray(start), cons, CFG, VEH, DT)

    # oracle takes the same prepped planes + transformed goals
    goals_t = np.asarray(S.transform_goals(jnp.asarray(goals),
                                           jnp.asarray(start)))
    ref = NB.ref_solve(
        goals_t, np.asarray(cons.corridor_planes),
        np.asarray(cons.corridor_mask), np.asarray(cons.left_planes),
        np.asarray(cons.left_segs), np.asarray(cons.left_mask),
        np.asarray(cons.right_planes), np.asarray(cons.right_segs),
        np.asarray(cons.right_mask), CFG, VEH, DT)

    # init guesses must agree to double precision
    np.testing.assert_allclose(np.asarray(res.init_us), ref.init_us,
                               atol=1e-10)
    assert int(res.status) == ref.status
    max_dev = np.max(np.abs(np.asarray(res.us) - ref.us))
    assert max_dev < 1e-3, f"control deviation {max_dev}"
    # states follow
    assert np.max(np.abs(np.asarray(res.xs) - ref.xs)) < 1e-2
