"""Pallas TPU kernel: fused corridor + lane cost stack (value and
state-derivative passes) for the batch-last solver.

Why a kernel (docs/PERF.md round-3 lever 3, round-4 profile): per solver
trip the corridor/lane stack is the largest non-Riccati family — the
lane-segment searches (point-segment distances over [D=5, N, W, B] per
side + min-by-key selection) plus the barrier evaluations and their
chain-rule accumulations spread over many medium XLA fusions with
[N, KC, B]/[D, N, B] intermediates between them. Here one grid step
computes EVERYTHING the corridor+lane stack contributes for one knot and
one 128-lane block — distances, selection, barriers, Jacobian rows and
the 6 upper-triangle (x, y, theta) Hessian entries — reading each input
row from HBM exactly once and writing only [1, NB] result rows.

Semantics are identical to solver_blast._cost_stack_bl's corridor/lane
terms (ilqr_optimizer.cc:553-618 CorridorCost/LaneBoundaryCost + their
Jacbian/Hessian chain rules): same RelaxBarrier branches, same
first-index argmin tie semantics (ties on the kernel's own distance
values), same all-masked fallback (slot 0's planes). Like
pallas/sweep.py, results match the XLA path bitwise up to fusion
rounding — the decision-parity tests bound the effect.

Tracking quadratics and actuator-limit barriers are NOT in the kernel:
they are cheap [N, B] elementwise work XLA already fuses well, and
keeping them outside keeps this kernel free of the megakernel's failure
modes (no while-loop carry, no dynamic slices; the only reduction is a
static-width min over W).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NB = 128  # batch lanes per block (must divide B)


def _relax_value(g, t, eps):
    rt = 1.0 / t
    safe = jnp.minimum(g, -eps)
    logb = -rt * jnp.log(-safe)
    quadb = 0.5 * rt * (((-g - 2.0 * eps) / eps) ** 2 - 1.0) \
        - rt * jnp.log(eps)
    return jnp.where(g < -eps, logb, quadb)


def _relax_grad(g, t, eps):
    rt = 1.0 / t
    safe = jnp.minimum(g, -eps)
    logb = -rt / safe
    quadb = rt * (g + 2.0 * eps) / (eps * eps)
    return jnp.where(g < -eps, logb, quadb)


def _relax_hess(g, t, eps):
    rt = 1.0 / t
    safe = jnp.minimum(g, -eps)
    log_dxdx = rt / (safe * safe)
    log_ddx = -rt / safe
    quad_dxdx = rt * (g + 2.0 * eps) / (eps * eps)
    in_log = g < -eps
    return (jnp.where(in_log, log_dxdx, quad_dxdx),
            jnp.where(in_log, log_ddx, jnp.zeros_like(g)))


def _kernel(offs, bt, beps, W, want_derivs,
            xs_ref, ca_ref, cb_ref, cc_ref, cm_ref,
            la_ref, lb_ref, lc_ref, lx1_ref, ly1_ref, lx2_ref, ly2_ref,
            lm_ref, llo_ref, lhi_ref,
            ra_ref, rb_ref, rc_ref, rx1_ref, ry1_ref, rx2_ref, ry2_ref,
            rm_ref, rlo_ref, rhi_ref,
            corr_ref, lane_ref, clip_ref,
            *deriv_refs):
    dtype = xs_ref.dtype
    x = xs_ref[0, 0, :]                                  # [NB]
    y = xs_ref[0, 1, :]
    th = xs_ref[0, 2, :]
    ct = jnp.cos(th)
    st = jnp.sin(th)

    ca = ca_ref[0]                                       # [KC, NB]
    cb = cb_ref[0]
    cc = cc_ref[0]
    cm = cm_ref[0]

    sides = (
        (la_ref[0], lb_ref[0], lc_ref[0], lx1_ref[0], ly1_ref[0],
         lx2_ref[0], ly2_ref[0], lm_ref[0], llo_ref[0, 0], lhi_ref[0, 0]),
        (ra_ref[0], rb_ref[0], rc_ref[0], rx1_ref[0], ry1_ref[0],
         rx2_ref[0], ry2_ref[0], rm_ref[0], rlo_ref[0, 0], rhi_ref[0, 0]),
    )

    zero = jnp.zeros((NB,), dtype)
    corr = zero
    lane = zero
    clip = jnp.zeros((NB,), dtype)
    if want_derivs:
        jx0 = zero
        jx1 = zero
        jx2 = zero
        h00 = zero
        h01 = zero
        h02 = zero
        h11 = zero
        h12 = zero
        h22 = zero

    big = jnp.asarray(jnp.inf, dtype)
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (W, NB), 0)

    for off in offs:
        lcd = off * ct                                   # [NB]
        lsd = off * st
        cxd = x + lcd
        cyd = y + lsd

        # corridor barriers over the knot's KC half-planes
        g = ca * cxd[None, :] + cb * cyd[None, :] - cc   # [KC, NB]
        cmb = cm > 0.5
        val = jnp.where(cmb, _relax_value(g, bt, beps), 0.0)
        corr = corr + jnp.sum(val, axis=0)
        if want_derivs:
            dthk = -ca * lsd[None, :] + cb * lcd[None, :]
            gf = jnp.where(cmb, _relax_grad(g, bt, beps), 0.0)
            hf, hddx = _relax_hess(g, bt, beps)
            hf = jnp.where(cmb, hf, 0.0)
            hddx = jnp.where(cmb, hddx, 0.0)
            ddx22 = -ca * lcd[None, :] - cb * lsd[None, :]
            jx0 = jx0 + jnp.sum(gf * ca, axis=0)
            jx1 = jx1 + jnp.sum(gf * cb, axis=0)
            jx2 = jx2 + jnp.sum(gf * dthk, axis=0)
            h00 = h00 + jnp.sum(hf * ca * ca, axis=0)
            h01 = h01 + jnp.sum(hf * ca * cb, axis=0)
            h02 = h02 + jnp.sum(hf * ca * dthk, axis=0)
            h11 = h11 + jnp.sum(hf * cb * cb, axis=0)
            h12 = h12 + jnp.sum(hf * cb * dthk, axis=0)
            h22 = h22 + jnp.sum(hf * dthk * dthk + hddx * ddx22, axis=0)

        # lane barriers: per side, nearest segment by first-index argmin
        for (a, b, c, x1, y1, x2, y2, m, lo, hi) in sides:
            abx = x2 - x1                                # [W, NB]
            aby = y2 - y1
            apx = cxd[None, :] - x1
            apy = cyd[None, :] - y1
            ab2 = abx * abx + aby * aby
            tpar = jnp.where(ab2 > 0,
                             (apx * abx + apy * aby)
                             / jnp.where(ab2 == 0, 1.0, ab2), 0.0)
            tpar = jnp.clip(tpar, 0.0, 1.0)
            dx = cxd[None, :] - (x1 + tpar * abx)
            dy = cyd[None, :] - (y1 + tpar * aby)
            dist = jnp.sqrt(dx * dx + dy * dy)
            dist = jnp.where(m > 0.5, dist, big)
            dmin = jnp.min(dist, axis=0)                 # [NB]
            hit = dist == dmin[None, :]
            idx = jnp.min(jnp.where(hit, iota_w, W), axis=0)   # [NB]
            onehot = iota_w == idx[None, :]
            la = jnp.sum(jnp.where(onehot, a, 0.0), axis=0)
            lb = jnp.sum(jnp.where(onehot, b, 0.0), axis=0)
            lcc = jnp.sum(jnp.where(onehot, c, 0.0), axis=0)
            edge = (((idx == 0) & (lo > 0.5))
                    | ((idx == W - 1) & (hi > 0.5)))
            clip = jnp.maximum(clip, edge.astype(dtype))

            lg = la * cxd + lb * cyd - lcc
            lane = lane + _relax_value(lg, bt, beps)
            if want_derivs:
                ldth = -la * lsd + lb * lcd
                lgf = _relax_grad(lg, bt, beps)
                lhf, lhd = _relax_hess(lg, bt, beps)
                lddx22 = -la * lcd - lb * lsd
                jx0 = jx0 + lgf * la
                jx1 = jx1 + lgf * lb
                jx2 = jx2 + lgf * ldth
                h00 = h00 + lhf * la * la
                h01 = h01 + lhf * la * lb
                h02 = h02 + lhf * la * ldth
                h11 = h11 + lhf * lb * lb
                h12 = h12 + lhf * lb * ldth
                h22 = h22 + lhf * ldth * ldth + lhd * lddx22

    corr_ref[0, 0] = corr
    lane_ref[0, 0] = lane
    clip_ref[0, 0] = clip
    if want_derivs:
        (jx0_ref, jx1_ref, jx2_ref,
         h00_ref, h01_ref, h02_ref, h11_ref, h12_ref, h22_ref) = deriv_refs
        jx0_ref[0, 0] = jx0
        jx1_ref[0, 0] = jx1
        jx2_ref[0, 0] = jx2
        h00_ref[0, 0] = h00
        h01_ref[0, 0] = h01
        h02_ref[0, 0] = h02
        h11_ref[0, 0] = h11
        h12_ref[0, 0] = h12
        h22_ref[0, 0] = h22


@functools.partial(jax.jit, static_argnames=("offs", "bt", "beps",
                                             "want_derivs", "interpret"))
def corridor_lane_stack(xs, cbl_c, lanes, offs, bt, beps,
                        want_derivs=False, interpret=False):
    """Fused corridor+lane stack rows for every (knot, lane-block).

    xs:     [6, N, B] batch-last states.
    cbl_c:  (ca, cb, cc [N, KC, B], cm [N, KC, B] bool).
    lanes:  per side (a, b, c, x1, y1, x2, y2 [N, W, B], m [N, W, B] bool,
            lo, hi [N, B] bool) — the WINDOWED form from cons_to_bl (the
            production configuration; the full-scan [S, B] form is not
            supported here, callers fall back to XLA).
    offs:   tuple of D static disc offsets.

    Returns (corr [N, B], lane [N, B], clip [N, B] 0/1 floats) and, with
    want_derivs, (jx0, jx1, jx2 [N, B], h00, h01, h02, h11, h12, h22
    [N, B]) — the corridor+lane contributions the caller adds to the
    tracking/limit terms.
    """
    ca, cb, cc, cm = cbl_c
    cm = cm.astype(xs.dtype)
    N = xs.shape[1]
    B = xs.shape[2]
    W = lanes[0][0].shape[1]
    KC = ca.shape[1]
    assert B % NB == 0, f"batch {B} not a multiple of {NB}"
    grid = (N, B // NB)
    dtype = xs.dtype

    # Mosaic block rule: the last two block dims must be (divisible by
    # 8, divisible by 128) OR equal the full array dims. Every operand is
    # therefore laid out [N, FULL, B] and blocked (1, FULL, NB) — the
    # knot axis leads, the small middle dim is taken whole.
    def row(mid):
        return pl.BlockSpec((1, mid, NB), lambda n, b: (n, 0, b))

    in_specs = [row(6), row(KC), row(KC), row(KC), row(KC)]
    for _ in range(2):
        in_specs += [row(W)] * 8 + [row(1), row(1)]

    out_shape = [jax.ShapeDtypeStruct((N, 1, B), dtype)] * 3
    out_specs = [row(1), row(1), row(1)]
    if want_derivs:
        out_shape += [jax.ShapeDtypeStruct((N, 1, B), dtype)] * 9
        out_specs += [row(1)] * 9

    operands = [jnp.moveaxis(xs, 0, 1), ca, cb, cc, cm]
    for side in lanes:
        a, b, c, x1, y1, x2, y2, m, lo, hi = side
        operands += [a, b, c, x1, y1, x2, y2, m.astype(xs.dtype),
                     lo.astype(xs.dtype)[:, None, :],
                     hi.astype(xs.dtype)[:, None, :]]

    out = pl.pallas_call(
        functools.partial(_kernel, tuple(float(o) for o in offs),
                          float(bt), float(beps), W, want_derivs),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(*operands)
    return tuple(o[:, 0, :] for o in out)
