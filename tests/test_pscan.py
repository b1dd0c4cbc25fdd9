"""Horizon-parallel Riccati backward pass (cilqr_tpu/pscan.py).

Validates, in order of strength:
1. the associative combine rule against direct two-map composition;
2. backward_pass_pscan == the sequential Woodbury-placement sweep at ANY
   lambda (same formulation, different evaluation order);
3. backward_pass_pscan == the reference sequential sweep at lambda=0
   (the two regularization placements coincide there);
4. end-to-end: the full CILQR solve with backward_backend='pscan'
   converges on a real problem to the same trajectory.
"""

import jax
import jax.numpy as jnp
import numpy as np

from cilqr_tpu import pscan
from cilqr_tpu.config import PlannerConfig
from cilqr_tpu.solver import backward_pass

from test_solver_blast import _batch_from_problems


def _random_problem(rng, T=40, n=6, m=2, dtype=jnp.float64):
    """Random well-conditioned LQR data shaped like the solver's."""
    A = jnp.asarray(np.eye(n) + 0.05 * rng.standard_normal((T, n, n)), dtype)
    B = jnp.asarray(0.1 * rng.standard_normal((T, n, m)), dtype)
    Jx = jnp.asarray(rng.standard_normal((T + 1, n)), dtype)
    Ju = jnp.asarray(rng.standard_normal((T, m)), dtype)
    Hs = rng.standard_normal((T + 1, n, n))
    Hx = jnp.asarray(Hs @ np.swapaxes(Hs, 1, 2) * 0.1
                     + np.eye(n) * 0.5, dtype)
    Hu = jnp.asarray(np.broadcast_to(np.diag([0.4, 0.1]), (T, m, m)).copy(),
                     dtype)
    return A, B, Jx, Ju, Hx, Hu


def _apply(elem, v, M):
    """Apply one element map (the definition the combine must preserve)."""
    P, b, C, eta, J = elem
    n = P.shape[0]
    eye = jnp.eye(n, dtype=P.dtype)
    M_out = J + P.T @ M @ jnp.linalg.solve(eye + C @ M, P)
    v_out = eta + P.T @ jnp.linalg.solve(eye + M @ C, v + M @ b)
    return v_out, M_out


def test_combine_matches_direct_composition(rng):
    n = 6
    for _ in range(5):
        mk = lambda: (
            jnp.asarray(np.eye(n) + 0.1 * rng.standard_normal((n, n))),
            jnp.asarray(rng.standard_normal(n)),
            jnp.asarray((lambda s: s @ s.T * 0.1)(
                rng.standard_normal((n, n)))),
            jnp.asarray(rng.standard_normal(n)),
            jnp.asarray((lambda s: s @ s.T * 0.1 + np.eye(n))(
                rng.standard_normal((n, n)))),
        )
        e_early, e_late = mk(), mk()
        v = jnp.asarray(rng.standard_normal(n))
        M0 = rng.standard_normal((n, n))
        M = jnp.asarray(M0 @ M0.T * 0.1 + np.eye(n) * 0.3)

        v_mid, M_mid = _apply(e_late, v, M)
        v_ref, M_ref = _apply(e_early, v_mid, M_mid)
        comb = pscan._combine(e_late, e_early)
        v_c, M_c = _apply(comb, v, M)
        np.testing.assert_allclose(np.asarray(M_c), np.asarray(M_ref),
                                   rtol=1e-9, atol=1e-9)
        np.testing.assert_allclose(np.asarray(v_c), np.asarray(v_ref),
                                   rtol=1e-9, atol=1e-9)


def test_pscan_matches_sequential_woodbury_any_lambda(rng):
    prob = _random_problem(rng)
    for lam in [0.0, 1e-3, 1.0, 100.0]:
        lam = jnp.float64(lam)
        Ks_p, ks_p, dV0_p, dV1_p = pscan.backward_pass_pscan(lam, *prob)
        Ks_s, ks_s, dV0_s, dV1_s = pscan.backward_pass_woodbury_seq(
            lam, *prob)
        np.testing.assert_allclose(np.asarray(Ks_p), np.asarray(Ks_s),
                                   rtol=1e-8, atol=1e-8)
        np.testing.assert_allclose(np.asarray(ks_p), np.asarray(ks_s),
                                   rtol=1e-8, atol=1e-8)
        np.testing.assert_allclose(float(dV0_p), float(dV0_s), rtol=1e-8)
        np.testing.assert_allclose(float(dV1_p), float(dV1_s), rtol=1e-8)


def test_pscan_matches_reference_backward_at_lambda_zero(rng):
    prob = _random_problem(rng)
    lam = jnp.float64(0.0)
    Ks_p, ks_p, dV0_p, dV1_p = pscan.backward_pass_pscan(lam, *prob)
    Ks_r, ks_r, dV0_r, dV1_r = backward_pass(lam, *prob)
    np.testing.assert_allclose(np.asarray(Ks_p), np.asarray(Ks_r),
                               rtol=1e-7, atol=1e-8)
    np.testing.assert_allclose(np.asarray(ks_p), np.asarray(ks_r),
                               rtol=1e-7, atol=1e-8)
    np.testing.assert_allclose(float(dV0_p), float(dV0_r), rtol=1e-7)
    np.testing.assert_allclose(float(dV1_p), float(dV1_r), rtol=1e-7)


def test_solve_with_pscan_backend_converges():
    """Full batched solve (vmap backend) with the pscan backward: same
    converged trajectories as the sequential backend on real fixture
    problems (different λ-placement can alter the iterate PATH, but these
    problems converge to the same optimum)."""
    import dataclasses

    from cilqr_tpu.batch import solve_batch
    from cilqr_tpu.types import SolverStatus

    base = PlannerConfig().ilqr
    goals, starts, cons = _batch_from_problems(range(3))
    cfg_seq = dataclasses.replace(base, backward_backend="scan")
    cfg_par = dataclasses.replace(base, backward_backend="pscan")
    dt = PlannerConfig().delta_t
    veh = PlannerConfig().vehicle
    r_seq = solve_batch(goals, starts, cons, cfg_seq, veh, dt,
                        backend="vmap")
    r_par = solve_batch(goals, starts, cons, cfg_par, veh, dt,
                        backend="vmap")
    assert (np.asarray(r_par.status) != SolverStatus.FAIL_LAMBDA_MAX).all()
    # Different λ-placement ⇒ different iterate paths; both stop when
    # dcost < 1e-2 (abs/rel), so trajectories agree only to the solver's
    # own convergence tolerance, not tighter.
    np.testing.assert_allclose(np.asarray(r_par.us), np.asarray(r_seq.us),
                               atol=1.5e-2)
    # rel_cost_tol=1e-2 on |cost|~1e2 permits ~1 unit of slack at the stop
    np.testing.assert_allclose(np.asarray(r_par.cost.total),
                               np.asarray(r_seq.cost.total), atol=1.0)

    # Tight gate: with negligible regularization throughout (lambda_init =
    # lambda_min) the two λ-placements coincide (test 3 above), so the
    # backends must agree to fp noise — a real backward-pass regression
    # cannot hide behind λ-path divergence here. Lanes where a rejection
    # grew λ are excluded (placements legitimately diverge there); at
    # least one lane must stay λ-free for the gate to mean anything.
    reg0 = dataclasses.replace(base.reg, lambda_init=base.reg.lambda_min)
    cfg_seq0 = dataclasses.replace(cfg_seq, reg=reg0)
    cfg_par0 = dataclasses.replace(cfg_par, reg=reg0)
    r_seq0 = solve_batch(goals, starts, cons, cfg_seq0, veh, dt,
                         backend="vmap")
    r_par0 = solve_batch(goals, starts, cons, cfg_par0, veh, dt,
                         backend="vmap")
    quiet = ((np.asarray(r_seq0.lam) <= 1e-6) &
             (np.asarray(r_par0.lam) <= 1e-6))
    assert quiet.any(), (np.asarray(r_seq0.lam), np.asarray(r_par0.lam))
    np.testing.assert_allclose(np.asarray(r_par0.us)[quiet],
                               np.asarray(r_seq0.us)[quiet],
                               rtol=1e-6, atol=1e-6)
