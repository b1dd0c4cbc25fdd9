import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cilqr_tpu.barriers import RelaxBarrier


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
