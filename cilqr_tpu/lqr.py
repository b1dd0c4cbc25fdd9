"""Discrete-time LQR / DARE solver.

Replaces math::SolveLQRProblem (/root/reference/algorithm/math/
linear_quadratic_regulator.cc:30-79, Apollo-derived): fixed-point Riccati
iteration with optional cross term M, as a ``lax.while_loop`` — jittable and
vmappable over batches of (A, B) (e.g. per velocity bin for the tracker).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def solve_lqr(A, B, Q, R, tolerance=0.01, max_iter=150, M=None):
    """Returns the gain K minimizing sum x'Qx + u'Ru (+ 2 x'Mu) for
    x_{k+1} = A x_k + B u_k; u = -K x."""
    n = A.shape[-1]
    m = B.shape[-1]
    if M is None:
        M = jnp.zeros(A.shape[:-2] + (n, m), A.dtype)
    AT = jnp.swapaxes(A, -1, -2)
    BT = jnp.swapaxes(B, -1, -2)
    MT = jnp.swapaxes(M, -1, -2)

    def cond(carry):
        P, it, diff = carry
        return (it < max_iter) & (diff > tolerance)

    def body(carry):
        P, it, _ = carry
        APB = AT @ P @ B + M
        inv = jnp.linalg.inv(R + BT @ P @ B)
        P_next = AT @ P @ A - APB @ inv @ (BT @ P @ A + MT) + Q
        # reference quirk: |max coefficient| of the difference, NOT the
        # max |coefficient| (linear_quadratic_regulator.cc:54,
        # fabs((P_next - P).maxCoeff())) — at the loose tolerances the
        # tracker uses (0.01) this changes the stopping iteration, so it
        # must match for parity.
        diff = jnp.abs(jnp.max(P_next - P))
        return P_next, it + 1, diff

    P0 = Q
    big = jnp.asarray(jnp.finfo(A.dtype).max, A.dtype)
    P, _, _ = jax.lax.while_loop(cond, body, (P0, jnp.int32(0), big))
    K = jnp.linalg.inv(R + BT @ P @ B) @ (BT @ P @ A + MT)
    return K
