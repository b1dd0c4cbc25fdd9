"""Barrier functions for constraint costs.

Replaces /root/reference/algorithm/ilqr/barrier_function.h with branchless
jnp scalar functions (safe ``jnp.where`` on both branches). The solver uses
the relaxed-log barrier with t=5.0, eps=0.01 (barrier_function.h:143-145),
applied to half-plane / limit violations g(z) <= 0.

Chain-rule structure mirrors the reference API: for a constraint g with
gradient dx and Hessian ddx,
    jac  = grad_factor(g) * dx
    hess = dxdx_factor(g) * dx dx^T + ddx_factor(g) * ddx
The quadratic branch of the reference's Hessian uses B'(x) (not B''(x)) as
the dx dx^T coefficient and drops the ddx term (barrier_function.h:135-139)
— replicated exactly for parity.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class RelaxBarrier:
    t: float = 5.0
    epsilon: float = 0.01

    def value(self, x):
        """barrier_function.h:104-113."""
        rt = 1.0 / self.t
        eps = self.epsilon
        # guard the log against non-negative arguments on the unused branch
        safe_x = jnp.minimum(x, -eps)
        log_branch = -rt * jnp.log(-safe_x)
        quad_branch = 0.5 * rt * (((-x - 2.0 * eps) / eps) ** 2 - 1.0) - rt * jnp.log(eps)
        return jnp.where(x < -eps, log_branch, quad_branch)

    def grad_factor(self, x):
        """Scalar multiplying dx in the Jacobian (barrier_function.h:115-125)."""
        rt = 1.0 / self.t
        eps = self.epsilon
        safe_x = jnp.minimum(x, -eps)
        log_branch = -rt / safe_x
        quad_branch = rt * (x + 2.0 * eps) / (eps * eps)
        return jnp.where(x < -eps, log_branch, quad_branch)

    def hess_factors(self, x):
        """(dxdx_factor, ddx_factor) (barrier_function.h:127-140)."""
        rt = 1.0 / self.t
        eps = self.epsilon
        safe_x = jnp.minimum(x, -eps)
        log_dxdx = rt / (safe_x * safe_x)
        log_ddx = -rt / safe_x
        quad_dxdx = rt * (x + 2.0 * eps) / (eps * eps)
        in_log = x < -eps
        dxdx = jnp.where(in_log, log_dxdx, quad_dxdx)
        ddx = jnp.where(in_log, log_ddx, jnp.zeros_like(x))
        return dxdx, ddx


@dataclasses.dataclass(frozen=True)
class ExponentialBarrier:
    """q1*exp(q2*x), clipped to 0 below q1 (barrier_function.h:37-79).
    Present for API completeness; unused by the default solver
    (ilqr_optimizer.h:181-188 selects RelaxBarrier)."""

    q1: float = 0.5
    q2: float = 2.5

    def value(self, x):
        c = self.q1 * jnp.exp(self.q2 * x)
        return jnp.where(c < self.q1, 0.0, c)

    def grad_factor(self, x):
        active = self.value(x) >= 1e-10
        return jnp.where(active, self.q1 * self.q2 * jnp.exp(self.q2 * x), 0.0)

    def hess_factors(self, x):
        active = self.value(x) >= 1e-10
        e = jnp.exp(self.q2 * x)
        dxdx = jnp.where(active, self.q1 * self.q2 * self.q2 * e, 0.0)
        ddx = jnp.where(active, self.q1 * self.q2 * e, 0.0)
        return dxdx, ddx


@dataclasses.dataclass(frozen=True)
class QuadraticBarrier:
    """1000*x^2 penalty for x>0 (barrier_function.h:149-189), including the
    reference's constant-gradient quirk (its Jacbian returns 2*param*dx,
    dropping the x factor — barrier_function.h:170)."""

    param: float = 1000.0

    def value(self, x):
        return jnp.where(x < 1e-10, 0.0, self.param * x * x)

    def grad_factor(self, x):
        return jnp.where(x < 1e-10, 0.0, 2.0 * self.param)

    def hess_factors(self, x):
        f = jnp.where(x < 1e-10, 0.0, 2.0 * self.param)
        return f, jnp.zeros_like(x)


def make_barrier(cfg):
    """Barrier selected by BarrierConfig.kind — the reference's
    commented-out source-edit switch (ilqr_optimizer.h:181-188 chooses
    RelaxBarrierFunction; the Exponential/Quadratic lines are the
    alternatives) made a config axis. The cost stack (costs.py,
    solver_blast._cost_stack_bl) calls this; the Pallas kernels hardcode
    relax semantics, so non-relax kinds run the XLA cost stack
    (solver_blast._use_coststack_kernel gates on kind)."""
    kind = cfg.kind
    if kind == "relax":
        return RelaxBarrier(cfg.t, cfg.epsilon)
    if kind == "exponential":
        return ExponentialBarrier(cfg.exp_q1, cfg.exp_q2)
    if kind == "quadratic":
        return QuadraticBarrier(cfg.quad_param)
    raise ValueError(f"unknown barrier kind {kind!r} "
                     "(expected relax | exponential | quadratic)")
