"""The CILQR core: LQR init guess, Riccati backward scan, line-searched
forward rollouts, regularized outer loop.

TPU-native re-design of IlqrOptimizer
(/root/reference/algorithm/ilqr/ilqr_optimizer.cc):

* backward/forward passes are ``lax.scan``s over the horizon; Quu is 2x2 so
  the gain solve is a closed-form inverse (vs Quu.inverse() at :361-363);
* the 11-alpha line search (:197,:246-265) evaluates ALL candidate rollouts
  in parallel (vmap over alpha) and selects the first acceptable one — the
  same choice the reference's sequential early-exit makes;
* the outer iteration (:201-309) is a ``lax.while_loop`` carrying
  (xs, us, cost, lambda, dlambda, status, iter); under ``vmap`` converged
  lanes freeze their carry so thousands of scenarios solve per chip;
* statuses follow types.SolverStatus.

Replicated reference quirks (required for <1e-3 control parity):
  - Backward never reports divergence (LLT check commented out, :368-377);
  - lambda *= dlambda * (lambda > lambda_min) can zero lambda (:275);
  - delta_rate is angle-normalized in the forward pass (:408);
  - goals[0] is the start state and every rollout starts there (:404,:151).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .config import IlqrConfig, VehicleParam
from .costs import ConstraintSet, cost_derivatives, total_cost
from .geometry import normalize_angle
from .model import dynamics_jacobian, dynamics_rk2
from .types import CostBreakdown, SolveResult, SolverStatus


def transform_goals(coarse_xs, start_state):
    """TransformGoals (ilqr_optimizer.cc:141-152): goals are the coarse
    states, with goal[0] overwritten by the actual start state
    (x, y, theta, v, 0, 0)."""
    g0 = jnp.stack([start_state[0], start_state[1], start_state[2],
                    start_state[3], jnp.zeros_like(start_state[0]),
                    jnp.zeros_like(start_state[0])])
    return coarse_xs.at[0].set(g0)


def _inv22(M):
    """Closed-form 2x2 inverse."""
    a, b = M[..., 0, 0], M[..., 0, 1]
    c, d = M[..., 1, 0], M[..., 1, 1]
    det = a * d - b * c
    inv_det = 1.0 / det
    return jnp.stack([
        jnp.stack([d, -b], axis=-1),
        jnp.stack([-c, a], axis=-1),
    ], axis=-2) * inv_det[..., None, None]


def iqr_init(goals, cfg: IlqrConfig, veh: VehicleParam, dt):
    """Time-varying LQR initial guess around the goal trajectory
    (IlqrOptimizer::iqr, ilqr_optimizer.cc:793-842): backward Riccati with
    fixed Q/R, then a clamped closed-loop rollout through the real
    dynamics."""
    dtype = goals.dtype
    N = goals.shape[0]
    Q = jnp.diag(jnp.array([0.001, 0.001, 0.001, 0.001, 0.01, 0.005], dtype))
    R = jnp.diag(jnp.array([0.2, 0.05], dtype))

    zero_u = jnp.zeros((N - 1, 2), dtype)
    A, B = dynamics_jacobian(goals[:-1], zero_u, dt, veh.wheel_base,
                             cfg.jacobian_mode)

    def riccati(P, ab):
        Ai, Bi = ab
        BtP = Bi.T @ P
        K = _inv22(R + BtP @ Bi) @ (BtP @ Ai)
        P_new = Q + Ai.T @ P @ (Ai - Bi @ K)
        return P_new, K

    _, Ks = jax.lax.scan(riccati, Q, (A, B), reverse=True)

    jlo = jnp.array([veh.jerk_min, veh.delta_rate_min], dtype)
    jhi = jnp.array([veh.jerk_max, veh.delta_rate_max], dtype)

    def roll(x, gk):
        gi, Ki = gk
        u = -Ki @ (x - gi)
        u = jnp.clip(u, jlo, jhi)
        nxt = dynamics_rk2(x, u, dt, veh.wheel_base)
        return nxt, (nxt, u)

    x0 = goals[0]
    _, (xs_tail, us) = jax.lax.scan(roll, x0, (goals[:-1], Ks))
    xs = jnp.concatenate([x0[None], xs_tail], axis=0)
    return xs, us


def backward_pass(lam, A, B, Jx, Ju, Hx, Hu):
    """Riccati sweep (ilqr_optimizer.cc:334-390). A,B: [T,6,6]/[T,6,2];
    Jx,Hx: [N,...]; Ju,Hu: [T,...]. Returns (Ks [T,2,6], ks [T,2],
    dV0, dV1)."""
    Vx0 = Jx[-1]
    Vxx0 = Hx[-1]

    def step(carry, inp):
        Vx, Vxx, dV0, dV1 = carry
        Ai, Bi, Jxi, Jui, Hxi, Hui = inp
        At = Ai.T
        Bt = Bi.T
        Qx = Jxi + At @ Vx
        Qu = Jui + Bt @ Vx
        Qxx = Hxi + At @ Vxx @ Ai
        Quu = Hui + Bt @ Vxx @ Bi
        Qux = Bt @ Vxx @ Ai
        Quu_inv = _inv22(Quu + lam * jnp.eye(2, dtype=Quu.dtype))
        K = -Quu_inv @ Qux
        k = -Quu_inv @ Qu
        Vx_n = Qx + K.T @ Quu @ k + K.T @ Qu + Qux.T @ k
        Vxx_n = Qxx + K.T @ Quu @ K + K.T @ Qux + Qux.T @ K
        Vxx_n = 0.5 * (Vxx_n + Vxx_n.T)
        dV0 = dV0 + k @ Qu
        dV1 = dV1 + 0.5 * k @ (Quu @ k)
        return (Vx_n, Vxx_n, dV0, dV1), (K, k)

    zero = jnp.zeros((), A.dtype)
    (_, _, dV0, dV1), (Ks, ks) = jax.lax.scan(
        step, (Vx0, Vxx0, zero, zero), (A, B, Jx[:-1], Ju, Hx[:-1], Hu),
        reverse=True)
    return Ks, ks, dV0, dV1


def forward_pass(alpha, xs, us, Ks, ks, goals, dt, wheel_base):
    """Closed-loop rollout u' = u + K(x'-x) + alpha*k starting at goals[0]
    (ilqr_optimizer.cc:392-415), with the reference's delta_rate angle
    normalization (:408)."""
    x0 = goals[0]

    def step(x, inp):
        ui, Ki, ki, xi = inp
        u = ui + Ki @ (x - xi) + alpha * ki
        u = u.at[1].set(normalize_angle(u[1]))
        nxt = dynamics_rk2(x, u, dt, wheel_base)
        return nxt, (nxt, u)

    _, (xs_tail, new_us) = jax.lax.scan(step, x0, (us, Ks, ks, xs[:-1]))
    new_xs = jnp.concatenate([x0[None], xs_tail], axis=0)
    return new_xs, new_us


def gradient_norm(ks, us):
    """CalGradientNorm (ilqr_optimizer.cc:322-332)."""
    v = jnp.abs(ks) / (jnp.abs(us) + 1.0)
    return jnp.mean(jnp.max(v, axis=-1))


class _Carry(NamedTuple):
    xs: jnp.ndarray
    us: jnp.ndarray
    cost: CostBreakdown
    lam: jnp.ndarray
    dlam: jnp.ndarray
    status: jnp.ndarray
    it: jnp.ndarray
    aidx: jnp.ndarray  # line-search alpha index (serial mode; 0 otherwise)


def solve(coarse_xs, start_state, cons: ConstraintSet,
          cfg: IlqrConfig, veh: VehicleParam, dt,
          warm_start=None) -> SolveResult:
    """One full CILQR solve (IlqrOptimizer::Optimize,
    ilqr_optimizer.cc:154-320). All inputs are arrays; cfg/veh/dt static.

    coarse_xs: [N,6] coarse trajectory states (goals);
    start_state: [6] (x, y, theta, v, *, *);
    cons: pre-shrunk+normalized constraints (costs.shrink_and_normalize);
    warm_start: optional (xs [N,6], us [T,2]) initial trajectory (MPC
    re-solves) replacing the LQR init guess.
    """
    dtype = coarse_xs.dtype
    goals = transform_goals(coarse_xs, start_state)

    if warm_start is None:
        xs0, us0 = iqr_init(goals, cfg, veh, dt)
    else:
        xs0, us0 = warm_start
    cost0 = total_cost(xs0, us0, goals, cons, cfg, veh)

    reg = cfg.reg
    if cfg.line_search.mode == "serial":
        raw_body = _make_body_serial(goals, cons, cfg, veh, dt)
    else:
        raw_body = _make_body(goals, cons, cfg, veh, dt)

    def body(c: _Carry) -> _Carry:
        new = raw_body(c)
        # frozen lanes (vmap): only update while RUNNING
        running = c.status == SolverStatus.RUNNING

        def frz(n, o):
            return jnp.where(running, n, o)

        return jax.tree.map(frz, new, c)

    def cond(c: _Carry):
        return (c.status == SolverStatus.RUNNING) & (c.it < cfg.max_iter_num)

    init = _Carry(xs=xs0, us=us0, cost=cost0,
                  lam=jnp.asarray(reg.lambda_init, dtype),
                  dlam=jnp.asarray(1.0, dtype),
                  status=jnp.int32(SolverStatus.RUNNING),
                  it=jnp.int32(0),
                  aidx=jnp.int32(0))

    final = jax.lax.while_loop(cond, body, init)

    status = jnp.where(final.status == SolverStatus.RUNNING,
                       jnp.int32(SolverStatus.MAX_ITER), final.status)
    return SolveResult(xs=final.xs, us=final.us, status=status,
                       iters=final.it, cost=final.cost, lam=final.lam,
                       init_xs=xs0, init_us=us0,
                       # this path always runs the FULL lane-segment scan
                       lane_clipped=jnp.zeros((), bool))


def solve_with_history(coarse_xs, start_state, cons: ConstraintSet,
                       cfg: IlqrConfig, veh: VehicleParam, dt, num_iters=None,
                       record_trajs=False, warm_start=None):
    """Fixed-length variant (lax.scan over iterations) that records the
    per-iteration cost breakdown — the analog of IlqrOptimizer::cost()
    (ilqr_optimizer.h:50-52) feeding the reference's cost-vs-iteration
    figure (figure_plot.h:455-485). Converged iterations repeat the frozen
    carry, mirroring how the reference stops appending.

    warm_start: optional (xs [N,6], us [T,2]) initial trajectory,
    replacing the LQR init — pass exactly what the production call got
    (pipeline._init_guess_warm_start for init_guess='tracker', or the MPC
    shifted plan) so the recorded history replays the solve that actually
    ran; tests/test_solver.py pins the decision-sequence match.

    Follows cfg.line_search.mode so the recorded history reflects the
    production path: in 'serial' mode (the default backend's semantics)
    each scan step runs the serial body's alpha trials to the iteration's
    conclusion via an inner while_loop — the decision sequence is
    identical to solve()'s, just chunked per outer iteration; in
    'parallel' mode each scan step is one parallel-line-search iteration.

    Returns (SolveResult, CostBreakdown history [num_iters+1]); with
    record_trajs=True, returns (SolveResult, cost history, xs history
    [num_iters+1, N, 6]) — the reference's per-iteration trajectory
    overlays (figure_plot.h:267-453, iter_trajectory).
    """
    n_it = cfg.max_iter_num if num_iters is None else num_iters
    goals = transform_goals(coarse_xs, start_state)
    if warm_start is None:
        xs0, us0 = iqr_init(goals, cfg, veh, dt)
    else:
        xs0, us0 = warm_start
    cost0 = total_cost(xs0, us0, goals, cons, cfg, veh)

    # reuse the outer-iteration body, running it n_it times via scan
    dtype = coarse_xs.dtype
    init = _Carry(xs=xs0, us=us0, cost=cost0,
                  lam=jnp.asarray(cfg.reg.lambda_init, dtype),
                  dlam=jnp.asarray(1.0, dtype),
                  status=jnp.int32(SolverStatus.RUNNING),
                  it=jnp.int32(0),
                  aidx=jnp.int32(0))

    serial = cfg.line_search.mode == "serial"
    body = (_make_body_serial if serial else _make_body)(
        goals, cons, cfg, veh, dt)

    def one_iteration(c):
        if not serial:
            return body(c)
        # run the serial body's alpha trials until this iteration
        # concludes (accept / full reject / gnorm stop all advance c.it)
        return jax.lax.while_loop(
            lambda cc: (cc.status == SolverStatus.RUNNING)
            & (cc.it == c.it), body, c)

    def scan_step(c, _):
        new = jax.lax.cond(
            (c.status == SolverStatus.RUNNING) & (c.it < cfg.max_iter_num),
            one_iteration, lambda x: x, c)
        out = (new.cost, new.xs) if record_trajs else new.cost
        return new, out

    final, hist = jax.lax.scan(scan_step, init, None, length=n_it)
    status = jnp.where(final.status == SolverStatus.RUNNING,
                       jnp.int32(SolverStatus.MAX_ITER), final.status)
    if record_trajs:
        hist, xs_hist = hist
        xs_hist = jnp.concatenate([xs0[None], xs_hist], axis=0)
    hist = jax.tree.map(
        lambda h0, h: jnp.concatenate([h0[None], h], axis=0), cost0, hist)
    res = SolveResult(xs=final.xs, us=final.us, status=status,
                      iters=final.it, cost=final.cost, lam=final.lam,
                      init_xs=xs0, init_us=us0,
                      lane_clipped=jnp.zeros((), bool))
    if record_trajs:
        return res, hist, xs_hist
    return res, hist


def _select_backward(cfg):
    """'scan' = the reference's sequential recursion; 'pscan' = the
    horizon-parallel associative-scan formulation (pscan.py)."""
    if cfg.backward_backend == "pscan":
        from .pscan import backward_pass_pscan

        return backward_pass_pscan
    return backward_pass


def _make_body(goals, cons, cfg, veh, dt):
    """Shared outer-iteration body used by solve_with_history."""
    dtype = goals.dtype
    reg = cfg.reg
    alphas = jnp.asarray(cfg.line_search.alphas, dtype)
    bp = _select_backward(cfg)

    def body(c: _Carry) -> _Carry:
        A, B = dynamics_jacobian(c.xs[:-1], c.us, dt, veh.wheel_base,
                                 cfg.jacobian_mode)
        Jx, Ju, Hx, Hu = cost_derivatives(c.xs, c.us, goals, cons, cfg, veh)
        Ks, ks, dV0, dV1 = bp(c.lam, A, B, Jx, Ju, Hx, Hu)
        gnorm = gradient_norm(ks, c.us)
        gnorm_done = (gnorm < reg.gradient_norm_min) & (c.lam < 1e-5)

        def try_alpha(a):
            nxs, nus = forward_pass(a, c.xs, c.us, Ks, ks, goals, dt,
                                    veh.wheel_base)
            nc = total_cost(nxs, nus, goals, cons, cfg, veh)
            return nxs, nus, nc

        nxs_all, nus_all, nc_all = jax.vmap(try_alpha)(alphas)
        dcost_all = c.cost.total - nc_all.total
        expected_all = -alphas * (dV0 + alphas * dV1)
        z_all = dcost_all / expected_all
        ok_all = ((z_all > cfg.line_search.beta_min) &
                  (z_all < cfg.line_search.beta_max) & (dcost_all > 0.0))
        any_ok = ok_all.any()
        pick = jnp.argmax(ok_all)
        nxs = nxs_all[pick]
        nus = nus_all[pick]
        ncost = jax.tree.map(lambda t: t[pick], nc_all)
        dcost = dcost_all[pick]

        dlam_acc = jnp.minimum(c.dlam / reg.ratio, 1.0 / reg.ratio)
        lam_acc = c.lam * dlam_acc * (c.lam > reg.lambda_min).astype(dtype)
        conv_abs = dcost < cfg.abs_cost_tol
        conv_rel = (dcost / c.cost.total) < cfg.rel_cost_tol
        status_acc = jnp.where(
            conv_abs, SolverStatus.SUCCESS_ABS_COST,
            jnp.where(conv_rel, SolverStatus.SUCCESS_REL_COST,
                      SolverStatus.RUNNING))
        dlam_rej = jnp.maximum(c.dlam * reg.ratio, reg.ratio)
        lam_rej = jnp.maximum(c.lam * dlam_rej, reg.lambda_min)
        status_rej = jnp.where(lam_rej > reg.lambda_max,
                               SolverStatus.FAIL_LAMBDA_MAX,
                               SolverStatus.RUNNING)
        accept = any_ok

        def sel(a, b):
            return jnp.where(accept, a, b)

        new = _Carry(
            xs=jnp.where(accept, nxs, c.xs),
            us=jnp.where(accept, nus, c.us),
            cost=jax.tree.map(sel, ncost, c.cost),
            lam=sel(lam_acc, lam_rej),
            dlam=sel(dlam_acc, dlam_rej),
            status=sel(status_acc, status_rej).astype(jnp.int32),
            it=c.it + 1,
            aidx=c.aidx,
        )

        def keep_gnorm(n, o):
            return jnp.where(gnorm_done, o, n)

        return _Carry(
            xs=keep_gnorm(new.xs, c.xs),
            us=keep_gnorm(new.us, c.us),
            cost=jax.tree.map(keep_gnorm, new.cost, c.cost),
            lam=keep_gnorm(new.lam, c.lam),
            dlam=keep_gnorm(new.dlam, c.dlam),
            status=jnp.where(gnorm_done,
                             jnp.int32(SolverStatus.SUCCESS_GNORM),
                             new.status),
            it=jnp.where(gnorm_done, c.it + 1, new.it),
            aidx=c.aidx,
        )

    return body


def _make_body_serial(goals, cons, cfg, veh, dt):
    """Serial line-search outer-iteration body (docs/PERF.md lever 2).

    One while_loop trip evaluates ONE alpha (carried index ``aidx``) instead
    of fanning out all 11 rollouts. This reproduces the reference's
    sequential early-exit (ilqr_optimizer.cc:246-265) exactly: on a reject
    that is not the last alpha, (xs, us, lam) are unchanged, so the
    relinearization + backward pass recomputed next trip are *identical*
    (idempotent at an unchanged point) and the next alpha sees the same
    gains — only the iteration counter semantics are preserved by counting
    an iteration when the search concludes (accept, or last alpha rejected).
    With acceptance typically at the first alpha, a trip costs
    relinearize + backward + ONE rollout + ONE cost eval, ~4x fewer flops
    than the parallel fan-out.
    """
    dtype = goals.dtype
    reg = cfg.reg
    alphas = jnp.asarray(cfg.line_search.alphas, dtype)
    n_alpha = len(cfg.line_search.alphas)
    bp = _select_backward(cfg)

    def body(c: _Carry) -> _Carry:
        A, B = dynamics_jacobian(c.xs[:-1], c.us, dt, veh.wheel_base,
                                 cfg.jacobian_mode)
        Jx, Ju, Hx, Hu = cost_derivatives(c.xs, c.us, goals, cons, cfg, veh)
        Ks, ks, dV0, dV1 = bp(c.lam, A, B, Jx, Ju, Hx, Hu)
        gnorm = gradient_norm(ks, c.us)
        gnorm_done = (gnorm < reg.gradient_norm_min) & (c.lam < 1e-5)

        a = alphas[c.aidx]
        nxs, nus = forward_pass(a, c.xs, c.us, Ks, ks, goals, dt,
                                veh.wheel_base)
        ncost = total_cost(nxs, nus, goals, cons, cfg, veh)
        dcost = c.cost.total - ncost.total
        expected = -a * (dV0 + a * dV1)
        z = dcost / expected
        accept = ((z > cfg.line_search.beta_min) &
                  (z < cfg.line_search.beta_max) & (dcost > 0.0))
        last_alpha = c.aidx == (n_alpha - 1)
        full_reject = (~accept) & last_alpha
        concluded = accept | full_reject

        # accept branch (ilqr_optimizer.cc:272-293)
        dlam_acc = jnp.minimum(c.dlam / reg.ratio, 1.0 / reg.ratio)
        lam_acc = c.lam * dlam_acc * (c.lam > reg.lambda_min).astype(dtype)
        conv_abs = dcost < cfg.abs_cost_tol
        conv_rel = (dcost / c.cost.total) < cfg.rel_cost_tol
        status_acc = jnp.where(
            conv_abs, SolverStatus.SUCCESS_ABS_COST,
            jnp.where(conv_rel, SolverStatus.SUCCESS_REL_COST,
                      SolverStatus.RUNNING))
        # full-reject branch (:297-307)
        dlam_rej = jnp.maximum(c.dlam * reg.ratio, reg.ratio)
        lam_rej = jnp.maximum(c.lam * dlam_rej, reg.lambda_min)
        status_rej = jnp.where(lam_rej > reg.lambda_max,
                               SolverStatus.FAIL_LAMBDA_MAX,
                               SolverStatus.RUNNING)

        def pick3(on_acc, on_rej, on_adv):
            return jnp.where(accept, on_acc,
                             jnp.where(full_reject, on_rej, on_adv))

        new = _Carry(
            xs=jnp.where(accept, nxs, c.xs),
            us=jnp.where(accept, nus, c.us),
            cost=jax.tree.map(lambda n, o: jnp.where(accept, n, o),
                              ncost, c.cost),
            lam=pick3(lam_acc, lam_rej, c.lam),
            dlam=pick3(dlam_acc, dlam_rej, c.dlam),
            status=pick3(status_acc, status_rej,
                         jnp.int32(SolverStatus.RUNNING)).astype(jnp.int32),
            it=c.it + concluded.astype(jnp.int32),
            aidx=jnp.where(concluded, 0, c.aidx + 1).astype(jnp.int32),
        )

        def keep_gnorm(n, o):
            return jnp.where(gnorm_done, o, n)

        return _Carry(
            xs=keep_gnorm(new.xs, c.xs),
            us=keep_gnorm(new.us, c.us),
            cost=jax.tree.map(keep_gnorm, new.cost, c.cost),
            lam=keep_gnorm(new.lam, c.lam),
            dlam=keep_gnorm(new.dlam, c.dlam),
            status=jnp.where(gnorm_done,
                             jnp.int32(SolverStatus.SUCCESS_GNORM),
                             new.status),
            it=jnp.where(gnorm_done, c.it + 1, new.it),
            aidx=jnp.where(gnorm_done, 0, new.aidx).astype(jnp.int32),
        )

    return body
