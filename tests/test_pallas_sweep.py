"""Pallas fused Riccati sweep vs the XLA lax.scan reference
(solver_blast._backward_bl/_forward_bl), interpret mode on CPU."""

import jax
import jax.numpy as jnp
import numpy as np

from cilqr_tpu import solver_blast as SB
from cilqr_tpu.pallas.sweep import NB, riccati_sweep

T = 20
N = T + 1
B = NB


def _random_problem(seed=0):
    rng = np.random.default_rng(seed)
    A = jnp.asarray(np.eye(6)[None, :, :, None]
                    + rng.normal(size=(T, 6, 6, B)) * 0.02)
    Bm = jnp.asarray(rng.normal(size=(T, 6, 2, B)) * 0.05)
    Jx = jnp.asarray(rng.normal(size=(N, 6, B)) * 0.1)
    Ju = jnp.asarray(rng.normal(size=(T, 2, B)) * 0.1)
    Hq = rng.normal(size=(N, 6, 6, B)) * 0.01
    Hx = jnp.asarray(Hq + np.swapaxes(Hq, 1, 2) + 2.0 * np.eye(6)[None, :, :, None])
    Hu = jnp.asarray(np.broadcast_to(0.5 * np.eye(2)[None, :, :, None],
                                     (T, 2, 2, B)).copy())
    lam = jnp.asarray(np.abs(rng.normal(size=B)) + 0.5)
    alpha = jnp.asarray(rng.uniform(0.2, 1.0, B))
    xs_cm = jnp.asarray(rng.normal(size=(6, N, B)) * 0.3)
    xs_cm = xs_cm.at[3].add(8.0)  # sensible velocities
    us_cm = jnp.asarray(rng.normal(size=(2, T, B)) * 0.1)
    return lam, alpha, A, Bm, Jx, Ju, Hx, Hu, xs_cm, us_cm


def test_sweep_matches_xla_reference():
    lam, alpha, A, Bm, Jx, Ju, Hx, Hu, xs_cm, us_cm = _random_problem()
    dt, L = 0.1, 1.0

    Ks, ks, dV0_r, dV1_r = SB._backward_bl(lam, A, Bm, Jx, Ju, Hx, Hu)
    gnorm_r = jnp.mean(jnp.max(jnp.abs(ks) / (jnp.abs(
        jnp.moveaxis(us_cm, 1, 0)) + 1.0), axis=1), axis=0)
    # reference forward starts from goals[0]; the kernel starts from xs[0]
    # (the invariant xs[0] == goals[0] holds inside the solver) — build
    # goals with goals[:,0] = xs[:,0]
    goals = xs_cm
    nxs_r, nus_r = SB._forward_bl(alpha, xs_cm, us_cm, Ks, ks, goals, dt, L)

    nxs, nus, dV0, dV1, gnorm = riccati_sweep(
        lam, alpha, A, Bm, Jx, Ju, Hx, Hu,
        jnp.moveaxis(xs_cm, 0, 1), jnp.moveaxis(us_cm, 0, 1),
        dt=dt, wheel_base=L, interpret=True)

    np.testing.assert_allclose(np.asarray(dV0), np.asarray(dV0_r),
                               rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(np.asarray(dV1), np.asarray(dV1_r),
                               rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(np.asarray(gnorm), np.asarray(gnorm_r),
                               rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(np.asarray(jnp.moveaxis(nxs, 0, 1)),
                               np.asarray(nxs_r), rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(jnp.moveaxis(nus, 0, 1)),
                               np.asarray(nus_r), rtol=1e-5, atol=1e-7)


def test_sweep_stacked_alphas_match_single(seed=3):
    """alpha [KA, B] (the paired line search's one-backward/KA-rollouts
    path) returns per-alpha tuples whose entries equal KA independent
    single-alpha sweeps."""
    lam, alpha, A, Bm, Jx, Ju, Hx, Hu, xs_cm, us_cm = _random_problem(seed)
    dt, L = 0.1, 1.0
    KA = 3
    rng = np.random.default_rng(seed + 1)
    alphas = jnp.asarray(rng.uniform(0.1, 1.0, (KA, B)))
    xs_km = jnp.moveaxis(xs_cm, 0, 1)
    us_tm = jnp.moveaxis(us_cm, 0, 1)

    nxs_t, nus_t, dV0, dV1, gnorm = riccati_sweep(
        lam, alphas, A, Bm, Jx, Ju, Hx, Hu, xs_km, us_tm,
        dt=dt, wheel_base=L, interpret=True)
    assert isinstance(nxs_t, tuple) and len(nxs_t) == KA
    assert isinstance(nus_t, tuple) and len(nus_t) == KA
    for a in range(KA):
        nxs_a, nus_a, dV0_a, dV1_a, gnorm_a = riccati_sweep(
            lam, alphas[a], A, Bm, Jx, Ju, Hx, Hu, xs_km, us_tm,
            dt=dt, wheel_base=L, interpret=True)
        np.testing.assert_array_equal(np.asarray(nxs_t[a]),
                                      np.asarray(nxs_a))
        np.testing.assert_array_equal(np.asarray(nus_t[a]),
                                      np.asarray(nus_a))
        np.testing.assert_array_equal(np.asarray(dV0), np.asarray(dV0_a))
        np.testing.assert_array_equal(np.asarray(gnorm), np.asarray(gnorm_a))


def test_solver_with_pallas_sweep_matches_xla_sweep():
    """Full solve with sweep_backend='pallas' (interpret) vs 'xla' on a
    NB-lane batch."""
    import dataclasses

    from cilqr_tpu.config import IlqrConfig, VehicleParam
    from cilqr_tpu.solver_blast import solve_batch_bl
    from test_native_parity import _problem
    from cilqr_tpu import costs as C

    VEH = VehicleParam()
    CFG_X = dataclasses.replace(IlqrConfig(), sweep_backend="xla")
    CFG_P = dataclasses.replace(IlqrConfig(), sweep_backend="pallas")

    goals, planes, mask, lp, ls, rp, rs, m, start = _problem(1)
    cons = C.shrink_and_normalize(
        jnp.asarray(planes), jnp.asarray(mask), jnp.asarray(lp),
        jnp.asarray(ls), jnp.asarray(m), jnp.asarray(rp), jnp.asarray(rs),
        jnp.asarray(m), CFG_X, VEH)
    tile = lambda a: jnp.broadcast_to(a, (B,) + a.shape)
    goals_b = tile(jnp.asarray(goals))
    starts_b = tile(jnp.asarray(start))
    cons_b = jax.tree.map(tile, cons)

    res_x = solve_batch_bl(goals_b, starts_b, cons_b, CFG_X, VEH, 0.1)
    res_p = solve_batch_bl(goals_b, starts_b, cons_b, CFG_P, VEH, 0.1)
    np.testing.assert_array_equal(np.asarray(res_x.iters),
                                  np.asarray(res_p.iters))
    np.testing.assert_array_equal(np.asarray(res_x.status),
                                  np.asarray(res_p.status))
    np.testing.assert_allclose(np.asarray(res_p.us), np.asarray(res_x.us),
                               atol=1e-6)
