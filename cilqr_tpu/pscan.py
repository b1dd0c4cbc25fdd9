"""Horizon-parallel Riccati backward pass via ``jax.lax.associative_scan``.

The reference's backward sweep is strictly sequential over the 81 knots
(ilqr_optimizer.cc:334-390 walks k = N-2..0 one step at a time). For this
problem size the sequential ``lax.scan`` (or the VMEM-resident Pallas sweep)
is already at speed of light, because scaling comes from the scenario batch
axis (SURVEY.md §5 "long-context"). For LONG horizons, however, the Riccati
recursion admits a parallel-prefix formulation ("The Parallelization of
Riccati Recursion", arXiv 1809.06360; "Temporal Parallelization of Dynamic
Programming and LQT", arXiv 2104.03186): value functions at ALL knots are
computed in O(log T) depth by composing "conditional value function"
elements with an associative operator. This module implements that backend;
select it with ``IlqrConfig.backward_backend = 'pscan'``.

Derivation (self-contained — re-derived here, the combine rule is checked
against direct composition in tests/test_pscan.py):

With per-step quadratic cost  ½xᵀHx x + Jxᵀx + ½uᵀHu u + Juᵀu  (no x-u
cross terms in this problem's cost stack) and deviation dynamics
x' = A x + B u, the Levenberg-regularized value recursion in Woodbury form
is, writing R = Hu + λI and M = Vxx[k+1], v = Vx[k+1]:

    Vxx[k] = Hx + Aᵀ M (I + C M)⁻¹ A          C = B R⁻¹ Bᵀ
    Vx[k]  = Jx + Aᵀ (I + M C)⁻¹ (v + M b)    b = -B R⁻¹ Ju

i.e. each step is an element e = (Φ, b, C, η, J) acting on (v, M):

    M_out = J + Φᵀ M (I + C M)⁻¹ Φ
    v_out = η + Φᵀ (I + M C)⁻¹ (v + M b)

The family is closed under composition. For a = the EARLIER element and
b = the LATER one (input flows through b first), with D = (I + C_a J_b)⁻¹:

    Φ_c = Φ_b D Φ_a
    C_c = C_b + Φ_b D C_a Φ_bᵀ
    J_c = J_a + Φ_aᵀ J_b D Φ_a
    b_c = b_b + Φ_b D (b_a - C_a η_b)
    η_c = η_a + Φ_aᵀ Dᵀ (η_b + J_b b_a)

Composing every suffix e_k ∘ … ∘ e_{T-1} ∘ e_T (e_T = the terminal cost as
a constant element Φ=C=b=0, η=Jx[T], J=Hx[T]) under ``associative_scan``
yields V[k] for every k; gains are then pointwise:

    K_k = -(Quu+λI)⁻¹ Qux,  k_k = -(Quu+λI)⁻¹ Qu        (as sequential)

REGULARIZATION PLACEMENT CAVEAT: the sequential reference propagates the
value function with the UNregularized Quu inside K'QuuK etc.
(ilqr_optimizer.cc:379-381 via the regularized gains), which expands to
Vxx[k] = Qxx - Quxᵀ(R⁻¹ - λR⁻²)Qux — an extra O(λ) term that is NOT an
associative-family map. The Woodbury form above drops that term (it is the
textbook placement: value propagated consistently with the regularized
gains). Both coincide at λ→0 — the steady state of the λ schedule on
accepted iterations — and both drive the same line-search/trust-region
loop; the two backends may pick different iterates at large λ but converge
to the same optima (tests/test_pscan.py pins exact gain equality at λ=0
and end-to-end convergence with the backend enabled).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _inv22(M):
    a, b = M[..., 0, 0], M[..., 0, 1]
    c, d = M[..., 1, 0], M[..., 1, 1]
    inv_det = 1.0 / (a * d - b * c)
    row0 = jnp.stack([d, -b], -1)
    row1 = jnp.stack([-c, a], -1)
    return jnp.stack([row0, row1], -2) * inv_det[..., None, None]


def _elements(lam, A, B, Jx, Ju, Hx, Hu):
    """Per-step elements (Φ, b, C, η, J), stacked [T+1, ...] with the
    terminal element LAST (time order k = 0..T)."""
    T = A.shape[0]
    n = A.shape[1]
    dtype = A.dtype
    R = Hu + lam * jnp.eye(2, dtype=dtype)
    Rinv = _inv22(R)                                  # [T, 2, 2]
    BRinv = jnp.einsum("tij,tjk->tik", B, Rinv)       # [T, 6, 2]
    C = jnp.einsum("tik,tjk->tij", BRinv, B)          # B R⁻¹ Bᵀ
    b = -jnp.einsum("tik,tk->ti", BRinv, Ju)
    zero_m = jnp.zeros((1, n, n), dtype)
    zero_v = jnp.zeros((1, n), dtype)
    return (
        jnp.concatenate([A, zero_m]),                 # Φ
        jnp.concatenate([b, zero_v]),
        jnp.concatenate([C, zero_m]),
        jnp.concatenate([Jx[:T], Jx[T][None]]),       # η
        jnp.concatenate([Hx[:T], Hx[T][None]]),       # J
    )


def _combine(later, earlier):
    """Associative combine, e_c = e_earlier ∘ e_later (batched over the
    leading scan axis). `later` is the operand closer to the terminal."""
    Pl, bl, Cl, el, Jl = later
    Pa, ba, Ca, ea, Ja = earlier
    n = Pl.shape[-1]
    eye = jnp.eye(n, dtype=Pl.dtype)
    G = eye + jnp.einsum("...ij,...jk->...ik", Ca, Jl)      # I + C_a J_b
    # one factorization, three right-hand sides: D Φ_a, D C_a, D(b_a-C_aη_b)
    rhs = jnp.concatenate(
        [Pa, Ca, (ba - jnp.einsum("...ij,...j->...i", Ca, el))[..., None]],
        axis=-1)
    sol = jnp.linalg.solve(G, rhs)
    DPa = sol[..., :n]
    DCa = sol[..., n:2 * n]
    Dba = sol[..., 2 * n]
    # Dᵀ (η_b + J_b b_a) via the transposed system
    etJb = jnp.linalg.solve(
        jnp.swapaxes(G, -1, -2),
        (el + jnp.einsum("...ij,...j->...i", Jl, ba))[..., None])[..., 0]
    Pc = jnp.einsum("...ij,...jk->...ik", Pl, DPa)
    Cc = Cl + jnp.einsum("...ij,...jk,...lk->...il", Pl, DCa, Pl)
    Jc = Ja + jnp.einsum("...ji,...jk,...kl->...il", Pa, Jl, DPa)
    bc = bl + jnp.einsum("...ij,...j->...i", Pl, Dba)
    ec = ea + jnp.einsum("...ji,...j->...i", Pa, etJb)
    return Pc, bc, Cc, ec, Jc


def value_functions(lam, A, B, Jx, Ju, Hx, Hu):
    """All value functions in O(log T) depth. Returns (Vx [T+1, 6],
    Vxx [T+1, 6, 6]) for knots k = 0..T."""
    elems = _elements(lam, A, B, Jx, Ju, Hx, Hu)
    # reverse to scan from the terminal; scan's left operand is the
    # LATER-in-time element
    rev = jax.tree.map(lambda a: jnp.flip(a, 0), elems)
    out = jax.lax.associative_scan(_combine, rev)
    _, _, _, eta, J = out
    # out[i] composes e_T .. e_{T-i}; with e_T constant the composed map
    # ignores its input, so V_{T-i} = (η_i, J_i). Un-reverse.
    return jnp.flip(eta, 0), jnp.flip(J, 0)


def backward_pass_pscan(lam, A, B, Jx, Ju, Hx, Hu):
    """Drop-in for solver.backward_pass with O(log T) sequential depth.
    Same (Ks [T,2,6], ks [T,2], dV0, dV1) outputs; gains computed
    pointwise from the scanned value functions with formulas identical to
    the sequential sweep (see module docstring for the one O(λ)
    value-propagation difference)."""
    Vx, Vxx = value_functions(lam, A, B, Jx, Ju, Hx, Hu)
    Vx_n = Vx[1:]                                     # V_{k+1}, [T, 6]
    Vxx_n = Vxx[1:]
    Qu = Ju + jnp.einsum("tji,tj->ti", B, Vx_n)
    BtV = jnp.einsum("tji,tjk->tik", B, Vxx_n)
    Quu = Hu + jnp.einsum("tik,tkj->tij", BtV, B)
    Qux = jnp.einsum("tik,tkj->tij", BtV, A)
    Rinv = _inv22(Quu + lam * jnp.eye(2, dtype=A.dtype))
    Ks = -jnp.einsum("tij,tjk->tik", Rinv, Qux)
    ks = -jnp.einsum("tij,tj->ti", Rinv, Qu)
    dV0 = jnp.sum(ks * Qu)
    dV1 = 0.5 * jnp.sum(ks * jnp.einsum("tij,tj->ti", Quu, ks))
    return Ks, ks, dV0, dV1


def backward_pass_woodbury_seq(lam, A, B, Jx, Ju, Hx, Hu):
    """Sequential sweep with the SAME value-propagation placement as the
    pscan backend (Woodbury / fully-regularized). Reference oracle for
    tests: backward_pass_pscan must match this exactly (up to fp
    reassociation) at ANY λ."""
    dtype = A.dtype
    eye2 = jnp.eye(2, dtype=dtype)

    def step(carry, inp):
        Vx, Vxx, dV0, dV1 = carry
        Ai, Bi, Jxi, Jui, Hxi, Hui = inp
        Qx = Jxi + Ai.T @ Vx
        Qu = Jui + Bi.T @ Vx
        Qxx = Hxi + Ai.T @ Vxx @ Ai
        Quu = Hui + Bi.T @ Vxx @ Bi
        Qux = Bi.T @ Vxx @ Ai
        Rinv = _inv22(Quu + lam * eye2)
        K = -Rinv @ Qux
        k = -Rinv @ Qu
        Vx_n = Qx + Qux.T @ k                     # Qx - QuxᵀR⁻¹Qu
        Vxx_n = Qxx + Qux.T @ K                   # Qxx - QuxᵀR⁻¹Qux
        Vxx_n = 0.5 * (Vxx_n + Vxx_n.T)
        dV0 = dV0 + k @ Qu
        dV1 = dV1 + 0.5 * k @ (Quu @ k)
        return (Vx_n, Vxx_n, dV0, dV1), (K, k)

    zero = jnp.zeros((), dtype)
    (_, _, dV0, dV1), (Ks, ks) = jax.lax.scan(
        step, (Jx[-1], Hx[-1], zero, zero), (A, B, Jx[:-1], Ju, Hx[:-1], Hu),
        reverse=True)
    return Ks, ks, dV0, dV1
