import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cilqr_tpu.barriers import (ExponentialBarrier, QuadraticBarrier,
                                RelaxBarrier, make_barrier)
from cilqr_tpu.config import BarrierConfig


def _ref_value(x, t=5.0, eps=0.01):
    """Literal transcription of barrier_function.h:104-113."""
    rt = 1.0 / t
    if x < -eps:
        return -rt * np.log(-x)
    return 0.5 * rt * (((-x - 2 * eps) / eps) ** 2 - 1) - rt * np.log(eps)


def _ref_grad(x, t=5.0, eps=0.01):
    rt = 1.0 / t
    if x < -eps:
        return -rt / x
    return rt * (x + 2 * eps) / eps / eps


def test_value_matches_reference():
    b = RelaxBarrier()
    for x in [-5.0, -1.0, -0.02, -0.011, -0.01, -0.005, 0.0, 0.5]:
        assert float(b.value(jnp.asarray(x))) == pytest.approx(_ref_value(x), rel=1e-12)


def test_grad_factor_matches_reference_and_autodiff():
    b = RelaxBarrier()
    g = jax.grad(lambda x: b.value(x))
    for x in [-5.0, -1.0, -0.02, -0.005, 0.3]:
        assert float(b.grad_factor(jnp.asarray(x))) == pytest.approx(_ref_grad(x), rel=1e-12)
        # autodiff of the branchless value equals the analytic factor
        assert float(g(jnp.asarray(x))) == pytest.approx(_ref_grad(x), rel=1e-9)


def test_hess_factors_reference_quirk():
    """Log branch: true second derivative. Quadratic branch: the reference
    uses B'(x) as the dxdx coefficient and drops ddx
    (barrier_function.h:135-139)."""
    b = RelaxBarrier()
    x = -1.0
    dxdx, ddx = b.hess_factors(jnp.asarray(x))
    assert float(dxdx) == pytest.approx(0.2 / x / x)
    assert float(ddx) == pytest.approx(-0.2 / x)
    x = 0.1
    dxdx, ddx = b.hess_factors(jnp.asarray(x))
    assert float(dxdx) == pytest.approx(_ref_grad(x))
    assert float(ddx) == 0.0


def test_value_continuous_at_branch():
    b = RelaxBarrier()
    eps = 0.01
    lo = float(b.value(jnp.asarray(-eps - 1e-9)))
    hi = float(b.value(jnp.asarray(-eps + 1e-9)))
    assert lo == pytest.approx(hi, abs=1e-6)


def test_exponential_matches_reference():
    """barrier_function.h:37-79: value = q1*e^{q2 x} clipped to 0 below
    q1; Jacbian factor q1*q2*e^{q2 x}; Hessian dxdx = q1*q2^2*e^{q2 x},
    ddx coeff = q1*q2*e^{q2 x} (both zero on the clipped branch)."""
    q1, q2 = 0.5, 2.5
    b = ExponentialBarrier(q1, q2)
    for x in [-3.0, -1.0, -0.2, 0.0, 0.4, 1.0]:
        c = q1 * np.exp(q2 * x)
        want = 0.0 if c < q1 else c
        assert float(b.value(jnp.asarray(x))) == pytest.approx(want,
                                                               rel=1e-12)
        active = want >= 1e-10
        gf = float(b.grad_factor(jnp.asarray(x)))
        assert gf == pytest.approx(q1 * q2 * np.exp(q2 * x) if active
                                   else 0.0, rel=1e-12)
        dxdx, ddx = b.hess_factors(jnp.asarray(x))
        assert float(dxdx) == pytest.approx(
            q1 * q2 * q2 * np.exp(q2 * x) if active else 0.0, rel=1e-12)
        assert float(ddx) == pytest.approx(
            q1 * q2 * np.exp(q2 * x) if active else 0.0, rel=1e-12)
        if active:
            # active branch is smooth: autodiff of value == grad factor
            g = float(jax.grad(lambda z: b.value(z))(jnp.asarray(x)))
            assert g == pytest.approx(gf, rel=1e-9)


def test_quadratic_matches_reference_quirk():
    """barrier_function.h:149-189: 1000 x^2 for x > 0; the reference's
    Jacbian drops the x factor (returns 2*param*dx, :170) — replicated."""
    p = 1000.0
    b = QuadraticBarrier(p)
    for x in [-1.0, 0.0, 1e-12]:
        assert float(b.value(jnp.asarray(x))) == 0.0
        assert float(b.grad_factor(jnp.asarray(x))) == 0.0
    for x in [0.01, 0.5, 2.0]:
        assert float(b.value(jnp.asarray(x))) == pytest.approx(p * x * x)
        assert float(b.grad_factor(jnp.asarray(x))) == pytest.approx(2 * p)
        dxdx, ddx = b.hess_factors(jnp.asarray(x))
        assert float(dxdx) == pytest.approx(2 * p)
        assert float(ddx) == 0.0


def test_make_barrier_factory():
    assert isinstance(make_barrier(BarrierConfig()), RelaxBarrier)
    b = make_barrier(BarrierConfig(kind="exponential", exp_q1=0.7,
                                   exp_q2=3.0))
    assert isinstance(b, ExponentialBarrier) and b.q1 == 0.7 and b.q2 == 3.0
    b = make_barrier(BarrierConfig(kind="quadratic", quad_param=500.0))
    assert isinstance(b, QuadraticBarrier) and b.param == 500.0
    with pytest.raises(ValueError):
        make_barrier(BarrierConfig(kind="nope"))
