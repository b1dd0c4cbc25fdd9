"""Pallas TPU kernel: fused Riccati backward + line-search forward sweep.

Why a kernel: the two 80-step horizon sweeps are inherently sequential; in
XLA each step's carry round-trips HBM, and the measured floor is ~9 us per
step (~1.5 ms per solver trip at B=256) regardless of lax.scan unroll
(docs/PERF.md). Here the whole sweep — all [T, 6, 6, NB] stacks, the gain
buffers and the value-function carry — lives in VMEM for a block of
NB=128 batch lanes, so the sequential chain runs at on-chip latency.

Layout: batch lanes on the 128-wide minor axis everywhere ([6, NB] rows,
[6, 6, NB] matrices); the 6x6/2x2 algebra is Python-unrolled broadcast-FMA
on the VPU, identical math to solver_blast (mm/mv), so results match the
XLA path bitwise up to fusion rounding.

Semantics (identical to solver_blast._backward_bl + _forward_bl, i.e.
ilqr_optimizer.cc:334-415):
  backward: Levenberg-regularized Riccati sweep, 2x2 closed-form gain
  solve, symmetrized Vxx, dV accumulators, gnorm of k against current us;
  forward: closed-loop rollout from goals[0] with per-lane alpha and the
  reference's delta_rate angle normalization.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NB = 128  # batch lanes per grid block (minor-axis tile width)


def _mm(X, Y):
    """[m, k, NB] @ [k, n, NB] -> [m, n, NB], unrolled broadcast-FMA.

    Uses basic slicing + reshape only: mixed basic/newaxis indexing
    (X[:, k, None, :]) lowers to a >2D gather, which Mosaic rejects."""
    m = X.shape[0]
    n = Y.shape[1]
    acc = None
    for k in range(X.shape[1]):
        term = (jnp.reshape(X[:, k, :], (m, 1, NB))
                * jnp.reshape(Y[k], (1, n, NB)))
        acc = term if acc is None else acc + term
    return acc


def _mv(X, y):
    """[m, k, NB] @ [k, NB] -> [m, NB]."""
    acc = X[:, 0, :] * y[0]
    for k in range(1, X.shape[1]):
        acc = acc + X[:, k, :] * y[k]
    return acc


def _t(X):
    return jnp.swapaxes(X, 0, 1)


def _inv22(M):
    a, b = M[0, 0], M[0, 1]
    c, d = M[1, 0], M[1, 1]
    inv_det = 1.0 / (a * d - b * c)
    return jnp.stack([jnp.stack([d, -b]), jnp.stack([-c, a])]) * inv_det


def _normalize_angle(x):
    """mod(x + pi, 2 pi) - pi (math_utils.cpp:53 semantics)."""
    two_pi = 2.0 * jnp.pi
    return x - two_pi * jnp.floor((x + jnp.pi) / two_pi)


def _sweep_kernel(dt, wheel_base, T, KA,
                  lam_ref, alpha_ref, A_ref, B_ref, Jx_ref, Ju_ref,
                  Hx_ref, Hu_ref, xs_ref, us_ref,
                  *out_and_scratch):
    # outputs: KA (nxs, nus) pairs, then dv, gnorm; scratch: Ks, ks
    nxs_refs = out_and_scratch[0:2 * KA:2]
    nus_refs = out_and_scratch[1:2 * KA:2]
    dv_ref, gnorm_ref, Ks_ref, ks_ref = out_and_scratch[2 * KA:]
    dtype = A_ref.dtype
    lam = lam_ref[0]                                   # [NB]
    eye2 = jnp.eye(2, dtype=dtype)[..., None]

    # ---- backward Riccati (ilqr_optimizer.cc:334-390)
    def bwd(i, carry):
        Vx, Vxx, dV0, dV1, gacc = carry
        t = T - 1 - i
        Ai = A_ref[t]
        Bi = B_ref[t]
        At = _t(Ai)
        Bt = _t(Bi)
        Qx = Jx_ref[t] + _mv(At, Vx)
        Qu = Ju_ref[t] + _mv(Bt, Vx)
        AtV = _mm(At, Vxx)
        BtV = _mm(Bt, Vxx)
        Qxx = Hx_ref[t] + _mm(AtV, Ai)
        Quu = Hu_ref[t] + _mm(BtV, Bi)
        Qux = _mm(BtV, Ai)
        Quu_inv = _inv22(Quu + lam * eye2)
        K = -_mm(Quu_inv, Qux)
        k = -_mv(Quu_inv, Qu)
        Ks_ref[t] = K
        ks_ref[t] = k
        Kt = _t(K)
        Quk = _mv(Quu, k)
        Vx_n = Qx + _mv(Kt, Quk) + _mv(Kt, Qu) + _mv(_t(Qux), k)
        Vxx_n = Qxx + _mm(Kt, _mm(Quu, K)) + _mm(Kt, Qux) + _mm(_t(Qux), K)
        Vxx_n = 0.5 * (Vxx_n + _t(Vxx_n))
        dV0 = dV0 + jnp.sum(k * Qu, axis=0)
        dV1 = dV1 + 0.5 * jnp.sum(k * Quk, axis=0)
        # gnorm accumulator: max over control dim of |k|/(|u|+1)
        gacc = gacc + jnp.max(jnp.abs(k) / (jnp.abs(us_ref[t]) + 1.0),
                              axis=0)
        return Vx_n, Vxx_n, dV0, dV1, gacc

    zero = jnp.zeros((NB,), dtype)
    init = (Jx_ref[T], Hx_ref[T], zero, zero, zero)
    _, _, dV0, dV1, gacc = jax.lax.fori_loop(0, T, bwd, init)
    dv_ref[0] = dV0
    dv_ref[1] = dV1
    gnorm_ref[0] = gacc / T

    # ---- forward rollouts (ilqr_optimizer.cc:392-415), one per alpha —
    # all KA candidates reuse the backward pass's VMEM-resident gains
    # (the serial line search would recompute an identical backward from
    # the same frozen iterate on each alpha-advance trip; see
    # LineSearchConfig.alphas_per_trip)
    L = wheel_base

    def f_cont(s, u):
        th = _normalize_angle(s[2])
        dl = _normalize_angle(s[5])
        return jnp.stack([
            s[3] * jnp.cos(th),
            s[3] * jnp.sin(th),
            s[3] * jnp.tan(dl) / L,
            s[4],
            u[0],
            u[1],
        ])

    for a in range(KA):
        alpha = alpha_ref[a]                           # [NB]
        nxs_ref = nxs_refs[a]
        nus_ref = nus_refs[a]
        nxs_ref[0] = xs_ref[0]  # rollout starts at goals[0] == xs[0]

        def fwd(t, x, alpha=alpha, nxs_ref=nxs_ref, nus_ref=nus_ref):
            u = (us_ref[t] + _mv(Ks_ref[t], x - xs_ref[t])
                 + alpha * ks_ref[t])
            # rebuild rows via stack: value.at[i].set lowers to scatter,
            # which Mosaic does not implement
            u = jnp.stack([u[0], _normalize_angle(u[1])])
            mid = x + 0.5 * dt * f_cont(x, u)
            nxt = x + dt * f_cont(mid, u)
            nxt = jnp.stack([nxt[0], nxt[1], _normalize_angle(nxt[2]),
                             nxt[3], nxt[4], _normalize_angle(nxt[5])])
            nus_ref[t] = u
            nxs_ref[t + 1] = nxt
            return nxt

        jax.lax.fori_loop(0, T, fwd, xs_ref[0])


@functools.partial(jax.jit, static_argnames=("dt", "wheel_base", "interpret"))
def riccati_sweep(lam, alpha, A, Bm, Jx, Ju, Hx, Hu, xs, us,
                  dt: float, wheel_base: float, interpret: bool = False):
    """Fused backward+forward sweep over a batch.

    lam: [B]; alpha: [B] or [KA, B]; A [T,6,6,B]; Bm [T,6,2,B];
    Jx [N,6,B]; Ju [T,2,B]; Hx [N,6,6,B]; Hu [T,2,2,B]; xs [N,6,B]
    (knot-major!); us [T,2,B].

    alpha [B] returns (nxs [N,6,B], nus [T,2,B], dV0, dV1, gnorm).
    alpha [KA, B] runs ONE backward pass and KA forward rollouts (each
    alpha row reuses the VMEM-resident gains) and returns
    (nxs: KA-tuple of [N,6,B], nus: KA-tuple of [T,2,B], dV0, dV1,
    gnorm) — per-alpha outputs are handed back as-is instead of being
    stacked into one [KA,...] array the caller would immediately
    re-index, which materialized an avoidable full-size HBM copy of
    every rollout on the hot per-trip path.

    B must be a multiple of NB (pad lanes with copies if needed).
    """
    T = us.shape[0]
    N = T + 1
    B = lam.shape[0]
    assert B % NB == 0, f"batch {B} not a multiple of {NB}"
    grid = (B // NB,)
    dtype = A.dtype
    stacked = alpha.ndim == 2
    alpha2 = alpha if stacked else alpha[None]
    KA = alpha2.shape[0]

    def bspec(*lead):
        nlead = len(lead)
        return pl.BlockSpec(lead + (NB,),
                            lambda i, _n=nlead: (0,) * _n + (i,),
                            memory_space=pltpu.VMEM)

    kernel = functools.partial(_sweep_kernel, dt, wheel_base, T, KA)
    out_shape = tuple(
        s for _ in range(KA)
        for s in (jax.ShapeDtypeStruct((N, 6, B), dtype),     # nxs_a
                  jax.ShapeDtypeStruct((T, 2, B), dtype))     # nus_a
    ) + (
        jax.ShapeDtypeStruct((2, B), dtype),    # dV0, dV1
        jax.ShapeDtypeStruct((1, B), dtype),    # gnorm
    )
    out_specs = tuple(
        s for _ in range(KA) for s in (bspec(N, 6), bspec(T, 2))
    ) + (bspec(2), bspec(1))
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[bspec(1), bspec(KA), bspec(T, 6, 6), bspec(T, 6, 2),
                  bspec(N, 6), bspec(T, 2), bspec(N, 6, 6), bspec(T, 2, 2),
                  bspec(N, 6), bspec(T, 2)],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((T, 2, 6, NB), dtype),      # Ks
            pltpu.VMEM((T, 2, NB), dtype),         # ks
        ],
        interpret=interpret,
    )(lam[None], alpha2, A, Bm, Jx, Ju, Hx, Hu, xs, us)
    dv, gnorm = outs[2 * KA], outs[2 * KA + 1]
    if not stacked:
        return outs[0], outs[1], dv[0], dv[1], gnorm[0]
    return (tuple(outs[0:2 * KA:2]), tuple(outs[1:2 * KA:2]),
            dv[0], dv[1], gnorm[0])
