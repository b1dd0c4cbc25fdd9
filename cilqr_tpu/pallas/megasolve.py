"""Pallas TPU megakernel: the ENTIRE CILQR solve loop in one kernel.

The batch-last solver (solver_blast) already keeps every array lane-wide,
but each while-loop trip is still an XLA program: the Jacobian stack, the
barrier-derivative stack, the Riccati sweep and the line-search cost eval
each round-trip their operands through HBM, and the whole batch runs until
its slowest lane concludes. This kernel moves the full outer loop
(ilqr_optimizer.cc:154-320) on-chip for a block of NB batch lanes:

  * all per-horizon tensors ([N,6,NB] states, [T,6,6,NB] Jacobians,
    [N,KC,NB] corridor planes, gains) are VMEM-resident for the life of
    the solve — zero HBM traffic between pipeline stages;
  * the outer `lax.while_loop` terminates per BLOCK: a block whose 128
    problems all converge stops iterating instead of dragging to the
    global-batch max trip count;
  * the relinearization pass computes barrier Jacobians/Hessians with
    reciprocals only (no `log`); transcendentals are spent solely on the
    line-search candidate's cost value.

Semantics replicate solver_blast.solve_batch_bl (serial line search —
identical decision sequence to the reference's sequential early-exit,
ilqr_optimizer.cc:197,246-265) decision-for-decision; see
tests/test_megasolve.py.

Masking convention: invalid corridor planes are folded OUTSIDE the kernel
to (a=0, b=0, c=1), so g = -1 exactly and the relaxed-log barrier
contributes value -log(1)/t = 0 with zero gradient/Hessian — no mask
tensor or `where` in the hot loop. Invalid lane segments get coordinates
pushed 1e7 m away so the nearest-segment running-min never selects them.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..types import CostBreakdown, SolveResult, SolverStatus

NB = 128          # batch lanes per block (minor-axis tile width)
KC_CHUNK = 8      # corridor planes evaluated per vector op (VMEM transient cap)


def _mm(X, Y):
    """[m, k, nb] @ [k, n, nb] -> [m, n, nb], unrolled broadcast-FMA (VPU).

    Basic slicing + reshape only: mixed basic/newaxis indexing lowers to a
    >2D gather, which Mosaic rejects."""
    m, n, nb = X.shape[0], Y.shape[1], X.shape[2]
    acc = None
    for k in range(X.shape[1]):
        term = (jnp.reshape(X[:, k, :], (m, 1, nb))
                * jnp.reshape(Y[k], (1, n, nb)))
        acc = term if acc is None else acc + term
    return acc


def _mv(X, y):
    """[m, k, nb] @ [k, nb] -> [m, nb]."""
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
    """mod(x + pi, 2 pi) - pi (math_utils.cpp:53)."""
    two_pi = 2.0 * jnp.pi
    return x - two_pi * jnp.floor((x + jnp.pi) / two_pi)


# ---------------------------------------------------------------------------
# barrier scalar factors (barriers.RelaxBarrier, branchless)
# ---------------------------------------------------------------------------


def _bar_value(g, t, eps):
    rt = 1.0 / t
    safe = jnp.minimum(g, -eps)
    log_b = -rt * jnp.log(-safe)
    quad_b = 0.5 * rt * (((-g - 2.0 * eps) / eps) ** 2 - 1.0) \
        - rt * jnp.log(eps)
    return jnp.where(g < -eps, log_b, quad_b)


def _bar_grad(g, t, eps):
    rt = 1.0 / t
    safe = jnp.minimum(g, -eps)
    return jnp.where(g < -eps, -rt / safe, rt * (g + 2.0 * eps) / (eps * eps))


def _bar_hess(g, t, eps):
    """(dxdx_factor, ddx_factor) — quadratic branch uses B'(x) as the dxdx
    coefficient and drops ddx (barrier_function.h:135-139)."""
    rt = 1.0 / t
    safe = jnp.minimum(g, -eps)
    in_log = g < -eps
    dxdx = jnp.where(in_log, rt / (safe * safe),
                     rt * (g + 2.0 * eps) / (eps * eps))
    ddx = jnp.where(in_log, -rt / safe, 0.0)
    return dxdx, ddx


# ---------------------------------------------------------------------------
# the kernel
# ---------------------------------------------------------------------------


def _mega_kernel(cfg, veh, dt, T, KC, S, nb,
                 goals_ref, xs0_ref, us0_ref, ca_ref, cb_ref, cc_ref,
                 laneL_ref, laneR_ref,
                 xs_ref, us_ref, fs_ref, is_ref,
                 cxs_ref, cus_ref, A_ref, Bm_ref, Jx_ref, Hxc_ref,
                 Ju_ref, Hud_ref, Ks_ref, ks_ref, relay_ref):
    """One grid step = one NB-lane block, full solve.

    Layouts (everything batch-last, nb minor):
      goals/xs0/xs: [N, 6, nb]; us0/us: [T, 2, nb]
      ca/cb/cc: [N, KC, nb] corridor half-planes (mask pre-folded)
      laneL/laneR: [7, S, nb] rows (a, b, c, x1, y1, x2, y2)
      fs (out): [8, nb] f32: cost total/target/dyn/corr/lane, lam, dV-unused
      is (out): [2, nb] int32: status, iters
    Scratch: candidate traj, Jacobian stacks, cost-derivative stacks
      (Hx compact: rows h00,h01,h02,h11,h12,h22,h33,h44,h55), gains.
    """
    dtype = goals_ref.dtype
    N = T + 1
    w = cfg.weights
    bt, beps = cfg.barrier.t, cfg.barrier.epsilon
    reg = cfg.reg
    alphas = cfg.line_search.alphas
    n_alpha = len(alphas)
    L = veh.wheel_base
    D = cfg.num_of_disc
    seg_len = veh.length / D
    # disc offsets along heading (ilqr_optimizer.cc:556-565)
    offs = [seg_len * (d - 0.5) - veh.rear_hang_length for d in range(D)]

    RUNNING = SolverStatus.RUNNING
    zero_nb = jnp.zeros((nb,), dtype)
    def _crow(ref, i, length=T + 1):
        """Component row ref[:, i, :] with canonical (zero-offset) layout.

        A middle-index sliced read inherits a sublane offset of i mod 8;
        Mosaic refuses ADD-reductions over offset dimensions, so every row
        that feeds a reduction round-trips through scratch (the store
        relayouts to offset zero). ~41 KB VMEM copy — noise."""
        relay_ref[0:length] = ref[0:length, i, :]
        return relay_ref[0:length]

    def _clean(v):
        """Force a [*, nb] VALUE to zero-offset layout via a store/load
        roundtrip (values built from sublane-sliced operands inherit their
        offsets, which ADD-reductions reject)."""
        n = v.shape[0]
        relay_ref[0:n] = v
        return relay_ref[0:n]

    # ---- init: current traj <- init guess; state rows
    xs_ref[:] = xs0_ref[:]
    us_ref[:] = us0_ref[:]

    # ------------------------------------------------------------------
    # cost stacks
    # ------------------------------------------------------------------

    def _nearest_lane(cx, cy, lane_ref):
        """Running-min nearest segment over S (strictly-less keeps the first
        minimum — argmin tie semantics, ilqr_optimizer.cc:605-618).
        cx, cy [N, nb]; returns selected (a, b, c) each [N, nb]."""
        la = lane_ref[0]
        lb = lane_ref[1]
        lc = lane_ref[2]
        x1 = lane_ref[3]
        y1 = lane_ref[4]
        x2 = lane_ref[5]
        y2 = lane_ref[6]
        cx3 = jnp.reshape(cx, (N, 1, nb))
        cy3 = jnp.reshape(cy, (N, 1, nb))

        dmin = None
        sa = sb = sc = None
        for s0 in range(0, S, KC_CHUNK):
            s1 = min(s0 + KC_CHUNK, S)
            ax = jnp.reshape(x1[s0:s1], (1, s1 - s0, nb))
            ay = jnp.reshape(y1[s0:s1], (1, s1 - s0, nb))
            bx = jnp.reshape(x2[s0:s1], (1, s1 - s0, nb))
            by = jnp.reshape(y2[s0:s1], (1, s1 - s0, nb))
            abx = bx - ax
            aby = by - ay
            apx = cx3 - ax
            apy = cy3 - ay
            ab2 = abx * abx + aby * aby
            tt = jnp.where(ab2 > 0,
                           (apx * abx + apy * aby)
                           / jnp.where(ab2 == 0, 1.0, ab2), 0.0)
            tt = jnp.clip(tt, 0.0, 1.0)
            dx = cx3 - (ax + tt * abx)
            dy = cy3 - (ay + tt * aby)
            d = jnp.sqrt(dx * dx + dy * dy)          # [N, chunk, nb]
            for j in range(s1 - s0):
                ds = d[:, j, :]
                pa = jnp.reshape(la[s0 + j], (1, nb)) + jnp.zeros((N, nb), dtype)
                pb = jnp.reshape(lb[s0 + j], (1, nb)) + jnp.zeros((N, nb), dtype)
                pc = jnp.reshape(lc[s0 + j], (1, nb)) + jnp.zeros((N, nb), dtype)
                if dmin is None:
                    dmin, sa, sb, sc = ds, pa, pb, pc
                else:
                    upd = ds < dmin
                    dmin = jnp.where(upd, ds, dmin)
                    sa = jnp.where(upd, pa, sa)
                    sb = jnp.where(upd, pb, sb)
                    sc = jnp.where(upd, pc, sc)
        return sa, sb, sc

    def cost_value(xs, us):
        """TotalCost (ilqr_optimizer.cc:417-436): 5 components, each [nb].
        xs [N, 6, nb] REF, us [T, 2, nb] REF. Component rows go through
        _crow (zero-offset relayout) so downstream reductions compile."""
        gx0 = _crow(goals_ref, 0)
        gy0 = _crow(goals_ref, 1)
        gth = _crow(goals_ref, 2)
        x0 = _crow(xs, 0)
        y0 = _crow(xs, 1)
        th = _crow(xs, 2)
        dx = x0 - gx0
        dy = y0 - gy0
        dth = th - gth
        j_cost = jnp.sum(w.x_target * dx * dx + w.y_target * dy * dy
                         + w.theta * dth * dth, axis=0)
        jk = _crow(us, 0, T)
        dr = _crow(us, 1, T)
        j_cost = j_cost + jnp.sum(w.jerk * jk ** 2
                                  + w.delta_rate * dr ** 2, axis=0)

        v = _crow(xs, 3)
        a = _crow(xs, 4)
        de = _crow(xs, 5)
        dyn = zero_nb
        for g in (-v, v - veh.max_velocity, a - veh.max_acceleration,
                  veh.min_acceleration - a, de - veh.delta_max,
                  veh.delta_min - de, jk - veh.jerk_max,
                  veh.jerk_min - jk, dr - veh.delta_rate_max,
                  veh.delta_rate_min - dr):
            dyn = dyn + jnp.sum(_bar_value(g, bt, beps), axis=0)

        ct = jnp.cos(th)
        st = jnp.sin(th)
        corr = zero_nb
        lane = zero_nb
        for off in offs:
            cxd = x0 + off * ct                           # [N, nb]
            cyd = y0 + off * st
            cx3 = jnp.reshape(cxd, (N, 1, nb))
            cy3 = jnp.reshape(cyd, (N, 1, nb))
            for k0 in range(0, KC, KC_CHUNK):
                k1 = min(k0 + KC_CHUNK, KC)
                g = (ca_ref[:, k0:k1, :] * cx3 + cb_ref[:, k0:k1, :] * cy3
                     - cc_ref[:, k0:k1, :])
                corr = corr + jnp.sum(_bar_value(g, bt, beps), axis=(0, 1))
            for lane_ref in (laneL_ref, laneR_ref):
                sa, sb, sc = _nearest_lane(cxd, cyd, lane_ref)
                lg = _clean(sa * cxd + sb * cyd - sc)
                lane = lane + jnp.sum(_bar_value(lg, bt, beps), axis=0)
        total = j_cost + dyn + corr + lane
        return total, j_cost, dyn, corr, lane

    def cost_derivs(xs, us):
        """CostJacbian/CostHessian (ilqr_optimizer.cc:620-769) into the
        Jx/Hxc/Ju/Hud scratch refs. Reciprocal-only (no log)."""
        gx0 = _crow(goals_ref, 0)
        gy0 = _crow(goals_ref, 1)
        gth = _crow(goals_ref, 2)
        x0 = _crow(xs, 0)
        y0 = _crow(xs, 1)
        th = _crow(xs, 2)
        dx = x0 - gx0
        dy = y0 - gy0
        dth = th - gth
        v = _crow(xs, 3)
        a = _crow(xs, 4)
        de = _crow(xs, 5)
        jk = _crow(us, 0, T)
        dr = _crow(us, 1, T)

        jx0 = 2.0 * w.x_target * dx
        jx1 = 2.0 * w.y_target * dy
        jx2 = 2.0 * w.theta * dth
        zN = jnp.zeros((N, nb), dtype)
        jx3 = zN
        jx4 = zN
        jx5 = zN
        h00 = 2.0 * w.x_target + zN
        h01 = zN
        h02 = zN
        h11 = 2.0 * w.y_target + zN
        h12 = zN
        h22 = 2.0 * w.theta + zN
        h33 = 2.0 * w.v + zN
        h44 = 2.0 * w.a + zN
        h55 = 2.0 * w.delta + zN

        # state limit barriers: (-v), (v-vmax) -> row 3; a rows 4; delta 5
        for g, sign, which in ((-v, -1.0, 3), (v - veh.max_velocity, 1.0, 3),
                               (a - veh.max_acceleration, 1.0, 4),
                               (veh.min_acceleration - a, -1.0, 4),
                               (de - veh.delta_max, 1.0, 5),
                               (veh.delta_min - de, -1.0, 5)):
            gf = _bar_grad(g, bt, beps) * sign
            hf, _ = _bar_hess(g, bt, beps)
            if which == 3:
                jx3 = jx3 + gf
                h33 = h33 + hf
            elif which == 4:
                jx4 = jx4 + gf
                h44 = h44 + hf
            else:
                jx5 = jx5 + gf
                h55 = h55 + hf

        ju0 = 2.0 * w.jerk * jk
        ju1 = 2.0 * w.delta_rate * dr
        hu0 = 2.0 * w.jerk + jnp.zeros((T, nb), dtype)
        hu1 = 2.0 * w.delta_rate + jnp.zeros((T, nb), dtype)
        for g, sign, which in ((jk - veh.jerk_max, 1.0, 0),
                               (veh.jerk_min - jk, -1.0, 0),
                               (dr - veh.delta_rate_max, 1.0, 1),
                               (veh.delta_rate_min - dr, -1.0, 1)):
            gf = _bar_grad(g, bt, beps) * sign
            hf, _ = _bar_hess(g, bt, beps)
            if which == 0:
                ju0 = ju0 + gf
                hu0 = hu0 + hf
            else:
                ju1 = ju1 + gf
                hu1 = hu1 + hf

        ct = jnp.cos(th)
        st = jnp.sin(th)
        for off in offs:
            lc = off * ct
            ls = off * st
            cxd = x0 + lc
            cyd = y0 + ls
            cx3 = jnp.reshape(cxd, (N, 1, nb))
            cy3 = jnp.reshape(cyd, (N, 1, nb))
            lc3 = jnp.reshape(lc, (N, 1, nb))
            ls3 = jnp.reshape(ls, (N, 1, nb))
            for k0 in range(0, KC, KC_CHUNK):
                k1 = min(k0 + KC_CHUNK, KC)
                pa = ca_ref[:, k0:k1, :]
                pb = cb_ref[:, k0:k1, :]
                g = pa * cx3 + pb * cy3 - cc_ref[:, k0:k1, :]
                dthk = -pa * ls3 + pb * lc3
                gf = _bar_grad(g, bt, beps)
                hf, hddx = _bar_hess(g, bt, beps)
                ddx22 = -pa * lc3 - pb * ls3
                jx0 = jx0 + jnp.sum(gf * pa, axis=1)
                jx1 = jx1 + jnp.sum(gf * pb, axis=1)
                jx2 = jx2 + jnp.sum(gf * dthk, axis=1)
                h00 = h00 + jnp.sum(hf * pa * pa, axis=1)
                h01 = h01 + jnp.sum(hf * pa * pb, axis=1)
                h02 = h02 + jnp.sum(hf * pa * dthk, axis=1)
                h11 = h11 + jnp.sum(hf * pb * pb, axis=1)
                h12 = h12 + jnp.sum(hf * pb * dthk, axis=1)
                h22 = h22 + jnp.sum(hf * dthk * dthk + hddx * ddx22, axis=1)
            for lane_ref in (laneL_ref, laneR_ref):
                sa, sb, sc = _nearest_lane(cxd, cyd, lane_ref)
                lg = sa * cxd + sb * cyd - sc
                ldth = -sa * ls + sb * lc
                lgf = _bar_grad(lg, bt, beps)
                lhf, lhd = _bar_hess(lg, bt, beps)
                lddx22 = -sa * lc - sb * ls
                jx0 = jx0 + lgf * sa
                jx1 = jx1 + lgf * sb
                jx2 = jx2 + lgf * ldth
                h00 = h00 + lhf * sa * sa
                h01 = h01 + lhf * sa * sb
                h02 = h02 + lhf * sa * ldth
                h11 = h11 + lhf * sb * sb
                h12 = h12 + lhf * sb * ldth
                h22 = h22 + lhf * ldth * ldth + lhd * lddx22

        Jx_ref[:] = jnp.stack([jx0, jx1, jx2, jx3, jx4, jx5], axis=1)
        Hxc_ref[:] = jnp.stack(
            [h00, h01, h02, h11, h12, h22, h33, h44, h55], axis=1)
        Ju_ref[:] = jnp.stack([ju0, ju1], axis=1)
        Hud_ref[:] = jnp.stack([hu0, hu1], axis=1)

    # ------------------------------------------------------------------
    # dynamics Jacobians (vehicle_model.cc:44-86, analytic midpoint)
    # ------------------------------------------------------------------

    def jacobians():
        v = xs_ref[0:T, 3, :]
        theta = _normalize_angle(xs_ref[0:T, 2, :])
        delta = _normalize_angle(xs_ref[0:T, 5, :])
        a = xs_ref[0:T, 4, :]
        delta_rate = us_ref[:, 1, :]

        tan_delta = jnp.tan(delta)
        theta_mid = theta + 0.5 * dt * v * tan_delta / L
        tan_delta_rate = jnp.tan(delta + 0.5 * dt * delta_rate)
        cos_tm = jnp.cos(theta_mid)
        sin_tm = jnp.sin(theta_mid)
        td2 = tan_delta * tan_delta
        tdr2 = tan_delta_rate * tan_delta_rate
        v_mid = 0.5 * a * dt + v

        z = jnp.zeros((T, nb), dtype)
        o = jnp.ones((T, nb), dtype)
        rows = [
            [o, z, -dt * v_mid * sin_tm,
             dt * cos_tm - 0.5 * dt * dt * v_mid * sin_tm * tan_delta / L,
             0.5 * dt * dt * cos_tm,
             -0.5 * dt * dt * v * v_mid * (td2 + 1.0) * sin_tm / L],
            [z, o, dt * v_mid * cos_tm,
             dt * sin_tm + 0.5 * dt * dt * v_mid * cos_tm * tan_delta / L,
             0.5 * dt * dt * sin_tm,
             0.5 * dt * dt * v * v_mid * (td2 + 1.0) * cos_tm / L],
            [z, z, o, dt * tan_delta_rate / L,
             0.5 * dt * dt * tan_delta_rate / L,
             dt * v * (tdr2 + 1.0) / L],
            [z, z, z, o, dt * o, z],
            [z, z, z, z, o, z],
            [z, z, z, z, z, o],
        ]
        # store row-by-row: one jnp.stack of all 36 entries keeps ~1.5 MB of
        # row values live at once (VMEM stack pressure)
        for i, r in enumerate(rows):
            A_ref[:, i] = jnp.stack(r, axis=1)              # [T, 6, nb]
        brows = [
            [z, z],
            [z, z],
            [z, 0.5 * dt * dt * v * (tdr2 + 1.0) / L],
            [0.5 * dt * dt * o, z],
            [dt * o, z],
            [z, dt * o],
        ]
        for i, r in enumerate(brows):
            Bm_ref[:, i] = jnp.stack(r, axis=1)             # [T, 2, nb]

    # ------------------------------------------------------------------
    # Riccati backward + forward (ilqr_optimizer.cc:334-415)
    # ------------------------------------------------------------------

    def _expand_hx(hc):
        """Compact 9 rows -> full 6x6 [6, 6, nb]."""
        h00, h01, h02, h11, h12, h22, h33, h44, h55 = (hc[i] for i in range(9))
        z = jnp.zeros_like(h00)
        return jnp.stack([
            jnp.stack([h00, h01, h02, z, z, z]),
            jnp.stack([h01, h11, h12, z, z, z]),
            jnp.stack([h02, h12, h22, z, z, z]),
            jnp.stack([z, z, z, h33, z, z]),
            jnp.stack([z, z, z, z, h44, z]),
            jnp.stack([z, z, z, z, z, h55]),
        ])

    def backward(lam):
        eye2 = jnp.eye(2, dtype=dtype)[..., None]

        def bwd(i, carry):
            Vx, Vxx, dV0, dV1, gacc = carry
            t = T - 1 - i
            Ai = A_ref[t]
            Bi = Bm_ref[t]
            At = _t(Ai)
            Bt = _t(Bi)
            Qx = Jx_ref[t] + _mv(At, Vx)
            Qu = Ju_ref[t] + _mv(Bt, Vx)
            AtV = _mm(At, Vxx)
            BtV = _mm(Bt, Vxx)
            Qxx = _expand_hx(Hxc_ref[t]) + _mm(AtV, Ai)
            Hu = Hud_ref[t]
            zu = jnp.zeros_like(Hu[0])
            Huf = jnp.stack([jnp.stack([Hu[0], zu]), jnp.stack([zu, Hu[1]])])
            Quu = Huf + _mm(BtV, Bi)
            Qux = _mm(BtV, Ai)
            Quu_inv = _inv22(Quu + lam * eye2)
            K = -_mm(Quu_inv, Qux)
            k = -_mv(Quu_inv, Qu)
            Ks_ref[t] = K
            ks_ref[t] = k
            Kt = _t(K)
            Quk = _mv(Quu, k)
            Vx_n = Qx + _mv(Kt, Quk) + _mv(Kt, Qu) + _mv(_t(Qux), k)
            Vxx_n = Qxx + _mm(Kt, _mm(Quu, K)) + _mm(Kt, Qux) \
                + _mm(_t(Qux), K)
            Vxx_n = 0.5 * (Vxx_n + _t(Vxx_n))
            dV0 = dV0 + jnp.sum(k * Qu, axis=0)
            dV1 = dV1 + 0.5 * jnp.sum(k * Quk, axis=0)
            gacc = gacc + jnp.max(jnp.abs(k) / (jnp.abs(us_ref[t]) + 1.0),
                                  axis=0)
            return Vx_n, Vxx_n, dV0, dV1, gacc

        init = (Jx_ref[T], _expand_hx(Hxc_ref[T]), zero_nb, zero_nb, zero_nb)
        _, _, dV0, dV1, gacc = jax.lax.fori_loop(0, T, bwd, init)
        return dV0, dV1, gacc / T

    def forward(alpha):
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

        cxs_ref[0] = xs_ref[0]          # rollout starts at goals[0] == xs[0]

        def fwd(t, x):
            u = us_ref[t] + _mv(Ks_ref[t], x - xs_ref[t]) + alpha * ks_ref[t]
            u = jnp.stack([u[0], _normalize_angle(u[1])])
            mid = x + 0.5 * dt * f_cont(x, u)
            nxt = x + dt * f_cont(mid, u)
            nxt = jnp.stack([nxt[0], nxt[1], _normalize_angle(nxt[2]),
                             nxt[3], nxt[4], _normalize_angle(nxt[5])])
            cus_ref[t] = u
            cxs_ref[t + 1] = nxt
            return nxt

        jax.lax.fori_loop(0, T, fwd, xs_ref[0])

    # ------------------------------------------------------------------
    # initial cost + state
    # ------------------------------------------------------------------

    tot0, tgt0, dyn0, cor0, lan0 = cost_value(xs_ref, us_ref)
    fs_ref[0] = tot0
    fs_ref[1] = tgt0
    fs_ref[2] = dyn0
    fs_ref[3] = cor0
    fs_ref[4] = lan0
    fs_ref[5] = jnp.full((nb,), reg.lambda_init, dtype)     # lam
    fs_ref[6] = jnp.ones((nb,), dtype)                      # dlam
    is_ref[0] = jnp.zeros((nb,), jnp.int32)                 # status RUNNING
    is_ref[1] = jnp.zeros((nb,), jnp.int32)                 # it
    is_ref[2] = jnp.zeros((nb,), jnp.int32)                 # aidx

    # ------------------------------------------------------------------
    # outer loop (ilqr_optimizer.cc:201-309, per-lane carries in refs)
    # ------------------------------------------------------------------

    def trip(_carry):
        lam = fs_ref[5]
        dlam = fs_ref[6]
        status = is_ref[0]
        it = is_ref[1]
        aidx = is_ref[2]
        running = status == RUNNING

        jacobians()
        cost_derivs(xs_ref, us_ref)
        dV0, dV1, gnorm = backward(lam)
        gnorm_done = (gnorm < reg.gradient_norm_min) & (lam < 1e-5)

        # per-lane alpha from the carried index (serial line search)
        alpha = jnp.full((nb,), alphas[0], dtype)
        for i in range(1, n_alpha):
            alpha = jnp.where(aidx == i, alphas[i], alpha)
        forward(alpha)

        ntot, ntgt, ndyn, ncor, nlan = cost_value(cxs_ref, cus_ref)
        cost_old = fs_ref[0]
        dcost = cost_old - ntot
        expected = -alpha * (dV0 + alpha * dV1)
        z = dcost / expected
        accept = ((z > cfg.line_search.beta_min)
                  & (z < cfg.line_search.beta_max) & (dcost > 0.0))
        last_alpha = aidx == (n_alpha - 1)
        full_reject = (~accept) & last_alpha
        concluded = accept | full_reject

        dlam_acc = jnp.minimum(dlam / reg.ratio, 1.0 / reg.ratio)
        lam_acc = lam * dlam_acc * (lam > reg.lambda_min).astype(dtype)
        conv_abs = dcost < cfg.abs_cost_tol
        conv_rel = (dcost / cost_old) < cfg.rel_cost_tol
        status_acc = jnp.where(
            conv_abs, SolverStatus.SUCCESS_ABS_COST,
            jnp.where(conv_rel, SolverStatus.SUCCESS_REL_COST, RUNNING))
        dlam_rej = jnp.maximum(dlam * reg.ratio, reg.ratio)
        lam_rej = jnp.maximum(lam * dlam_rej, reg.lambda_min)
        status_rej = jnp.where(lam_rej > reg.lambda_max,
                               SolverStatus.FAIL_LAMBDA_MAX, RUNNING)

        # effective update mask for the trajectory/cost: accepted, not
        # gnorm-terminated, still running
        upd = running & (~gnorm_done) & accept
        upd3 = jnp.reshape(upd, (1, 1, nb))
        xs_ref[:] = jnp.where(upd3, cxs_ref[:], xs_ref[:])
        us_ref[:] = jnp.where(upd3, cus_ref[:], us_ref[:])
        for row, nval in ((0, ntot), (1, ntgt), (2, ndyn), (3, ncor),
                          (4, nlan)):
            fs_ref[row] = jnp.where(upd, nval, fs_ref[row])

        def pick3(on_acc, on_rej, on_adv):
            return jnp.where(accept, on_acc,
                             jnp.where(full_reject, on_rej, on_adv))

        eff = running & (~gnorm_done)
        fs_ref[5] = jnp.where(eff, pick3(lam_acc, lam_rej, lam), lam)
        fs_ref[6] = jnp.where(eff, pick3(dlam_acc, dlam_rej, dlam), dlam)

        s_new = pick3(status_acc.astype(jnp.int32),
                      status_rej.astype(jnp.int32), jnp.int32(RUNNING))
        s_new = jnp.where(gnorm_done,
                          jnp.int32(SolverStatus.SUCCESS_GNORM), s_new)
        is_ref[0] = jnp.where(running, s_new, status)
        stepped = concluded | gnorm_done
        is_ref[1] = jnp.where(running, it + stepped.astype(jnp.int32), it)
        is_ref[2] = jnp.where(
            running,
            jnp.where(stepped, 0, aidx + 1).astype(jnp.int32), aidx)

        still = (is_ref[0] == RUNNING) & (is_ref[1] < cfg.max_iter_num)
        return jnp.any(still)

    jax.lax.while_loop(lambda c: c, trip, jnp.bool_(True))

    # RUNNING at exit -> MAX_ITER (ilqr_optimizer.cc:312-315)
    st = is_ref[0]
    is_ref[0] = jnp.where(st == RUNNING,
                          jnp.int32(SolverStatus.MAX_ITER), st)


# ---------------------------------------------------------------------------
# host wrapper
# ---------------------------------------------------------------------------


def _fold_constraints(cons, dtype):
    """Fold masks into plane/segment values (see module docstring) and
    transpose to kernel layouts. cons leaves are batch-first.

    Returns (ca, cb, cc [B?, N, KC, B->moved], laneL, laneR [B, 7, S])
    in BATCH-FIRST layout; the caller moves batch last."""
    cm = cons.corridor_mask
    ca = jnp.where(cm, cons.corridor_planes[..., 0], 0.0).astype(dtype)
    cb = jnp.where(cm, cons.corridor_planes[..., 1], 0.0).astype(dtype)
    # invalid plane: a=b=0, c=1 -> g = -c = -1 -> barrier value/derivs == 0
    cc = jnp.where(cm, cons.corridor_planes[..., 2], 1.0).astype(dtype)

    FAR = 1.0e7

    def lane(planes, segs, mask):
        m = mask
        a = jnp.where(m, planes[..., 0], 0.0)
        b = jnp.where(m, planes[..., 1], 0.0)
        c = jnp.where(m, planes[..., 2], 1.0)
        x1 = jnp.where(m, segs[..., 0, 0], FAR)
        y1 = jnp.where(m, segs[..., 0, 1], FAR)
        x2 = jnp.where(m, segs[..., 1, 0], FAR)
        y2 = jnp.where(m, segs[..., 1, 1], FAR)
        return jnp.stack([a, b, c, x1, y1, x2, y2], axis=-2).astype(dtype)

    laneL = lane(cons.left_planes, cons.left_segs, cons.left_mask)
    laneR = lane(cons.right_planes, cons.right_segs, cons.right_mask)
    return ca, cb, cc, laneL, laneR


def solve_batch_mega(goals_bf, starts, cons, cfg, veh, dt,
                     warm_start=None, interpret: bool = False,
                     block_nb: int = NB) -> SolveResult:
    """Full-solve megakernel over a batch (batch-first inputs, like
    solver_blast.solve_batch_bl). Pads the batch up to a multiple of
    block_nb with copies of lane 0 (padding lanes solve and are dropped)."""
    from ..solver import iqr_init, transform_goals

    if cfg.barrier.kind != "relax":
        raise ValueError("the megakernel hardcodes RelaxBarrier semantics; "
                         f"barrier kind {cfg.barrier.kind!r} needs the "
                         "'blast' or 'vmap' backend")

    dtype = goals_bf.dtype
    B0 = goals_bf.shape[0]
    N = goals_bf.shape[1]
    T = N - 1

    goals_first = jax.vmap(transform_goals)(goals_bf, starts)
    if warm_start is None:
        xs0_bf, us0_bf = jax.vmap(
            lambda g: iqr_init(g, cfg, veh, dt))(goals_first)
    else:
        xs0_bf, us0_bf = warm_start

    pad = (-B0) % block_nb
    if pad:
        def padded(a):
            return jnp.concatenate(
                [a, jnp.broadcast_to(a[:1], (pad,) + a.shape[1:])], axis=0)

        goals_first = padded(goals_first)
        xs0_bf = padded(xs0_bf)
        us0_bf = padded(us0_bf)
        cons = jax.tree.map(padded, cons)
    B = B0 + pad

    ca, cb, cc, laneL, laneR = _fold_constraints(cons, dtype)
    KC = ca.shape[-1]
    S = laneL.shape[-1]

    bl = lambda a: jnp.moveaxis(a, 0, -1)       # batch-first -> batch-last
    goals_km = bl(goals_first)                  # [N, 6, B]
    xs0 = bl(xs0_bf)
    us0 = bl(us0_bf)

    grid = (B // block_nb,)
    nb = block_nb

    def bspec(*lead):
        nlead = len(lead)
        return pl.BlockSpec(lead + (nb,),
                            lambda i, _n=nlead: (0,) * _n + (i,),
                            memory_space=pltpu.VMEM)

    kernel = functools.partial(_mega_kernel, cfg, veh, dt, T, KC, S, nb)
    out_shape = (
        jax.ShapeDtypeStruct((N, 6, B), dtype),     # xs
        jax.ShapeDtypeStruct((T, 2, B), dtype),     # us
        jax.ShapeDtypeStruct((8, B), dtype),        # fstate
        jax.ShapeDtypeStruct((3, B), jnp.int32),    # istate
    )
    xs, us, fs, istate = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[bspec(N, 6), bspec(N, 6), bspec(T, 2),
                  bspec(N, KC), bspec(N, KC), bspec(N, KC),
                  bspec(7, S), bspec(7, S)],
        out_specs=(bspec(N, 6), bspec(T, 2), bspec(8), bspec(3)),
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((N, 6, nb), dtype),          # candidate xs
            pltpu.VMEM((T, 2, nb), dtype),          # candidate us
            pltpu.VMEM((T, 6, 6, nb), dtype),       # A
            pltpu.VMEM((T, 6, 2, nb), dtype),       # Bm
            pltpu.VMEM((N, 6, nb), dtype),          # Jx
            pltpu.VMEM((N, 9, nb), dtype),          # Hx compact
            pltpu.VMEM((T, 2, nb), dtype),          # Ju
            pltpu.VMEM((T, 2, nb), dtype),          # Hu diag
            pltpu.VMEM((T, 2, 6, nb), dtype),       # Ks
            pltpu.VMEM((T, 2, nb), dtype),          # ks
            pltpu.VMEM((N, nb), dtype),             # relayout staging
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024),
        interpret=interpret,
    )(goals_km, xs0, us0, bl(ca), bl(cb), bl(cc), bl(laneL), bl(laneR))

    unb = lambda a: jnp.moveaxis(a, -1, 0)[:B0]
    cost = CostBreakdown(total=fs[0, :B0], target=fs[1, :B0],
                         dynamic=fs[2, :B0], corridor=fs[3, :B0],
                         lane=fs[4, :B0])
    return SolveResult(
        xs=unb(xs), us=unb(us), status=istate[0, :B0], iters=istate[1, :B0],
        cost=cost, lam=fs[5, :B0],
        init_xs=xs0_bf[:B0], init_us=us0_bf[:B0],
        # the kernel's cost stack runs the FULL lane-segment scan
        lane_clipped=jnp.zeros((B0,), bool))
