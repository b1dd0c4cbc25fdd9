"""End-to-end solver tests on a synthetic straight-road scenario
(BASELINE config 2 analog: no DP/corridor pipeline, wide constraints)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cilqr_tpu import costs as C
from cilqr_tpu import solver as S
from cilqr_tpu.config import IlqrConfig, VehicleParam
from cilqr_tpu.types import SolverStatus

import dataclasses

VEH = VehicleParam()
CFG = IlqrConfig()
CFG_PAR = dataclasses.replace(
    CFG, line_search=dataclasses.replace(CFG.line_search, mode="parallel"))
DT = 0.1
N = 81


def straight_goals(v=10.0):
    t = np.arange(N) * DT
    xs = np.zeros((N, 6))
    xs[:, 0] = v * t
    xs[:, 3] = v
    return jnp.asarray(xs)


def wide_constraints(goals, half_width=8.0, box=30.0):
    """Box corridor around each goal + lane lines at y = +-half_width."""
    gx = np.asarray(goals)[:, 0]
    gy = np.asarray(goals)[:, 1]
    KC = 8
    planes = np.zeros((N, KC, 3))
    mask = np.zeros((N, KC), bool)
    for i in range(N):
        planes[i, 0] = [1, 0, gx[i] + box]
        planes[i, 1] = [-1, 0, -(gx[i] - box)]
        planes[i, 2] = [0, 1, half_width]
        planes[i, 3] = [0, -1, half_width]
        mask[i, :4] = True

    S_ = 8
    xs_seg = np.linspace(gx[0] - 20, gx[-1] + 20, S_ + 1)
    left_planes = np.zeros((S_, 3))
    right_planes = np.zeros((S_, 3))
    left_segs = np.zeros((S_, 2, 2))
    right_segs = np.zeros((S_, 2, 2))
    for i in range(S_):
        # left boundary at y=+half_width: constraint y <= half_width
        left_planes[i] = [0, 1, half_width]
        left_segs[i] = [[xs_seg[i], half_width], [xs_seg[i + 1], half_width]]
        right_planes[i] = [0, -1, half_width]
        right_segs[i] = [[xs_seg[i], -half_width], [xs_seg[i + 1], -half_width]]
    m = np.ones(S_, bool)
    return C.shrink_and_normalize(
        jnp.asarray(planes), jnp.asarray(mask),
        jnp.asarray(left_planes), jnp.asarray(left_segs), jnp.asarray(m),
        jnp.asarray(right_planes), jnp.asarray(right_segs), jnp.asarray(m),
        CFG, VEH)


@pytest.fixture(scope="module")
def setup():
    goals = straight_goals()
    cons = wide_constraints(goals)
    start = jnp.asarray([0.0, 0.5, 0.05, 10.0, 0.0, 0.0])
    return goals, cons, start


def test_cost_jacobian_matches_autodiff(setup):
    goals, cons, start = setup
    rng = np.random.default_rng(1)
    xs = np.asarray(goals) + rng.normal(size=(N, 6)) * 0.05
    us = rng.normal(size=(N - 1, 2)) * 0.05
    xs_j = jnp.asarray(xs)
    us_j = jnp.asarray(us)

    Jx, Ju, Hx, Hu = C.cost_derivatives(xs_j, us_j, goals, cons, CFG, VEH)

    def tot(xs_, us_):
        return C.total_cost(xs_, us_, goals, cons, CFG, VEH).total

    gx, gu = jax.grad(tot, argnums=(0, 1))(xs_j, us_j)
    np.testing.assert_allclose(np.asarray(Jx), np.asarray(gx), rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(np.asarray(Ju), np.asarray(gu), rtol=1e-7, atol=1e-9)


def test_iqr_init_feasible(setup):
    goals, cons, start = setup
    xs, us = S.iqr_init(goals, CFG, VEH, DT)
    assert xs.shape == (N, 6)
    assert us.shape == (N - 1, 2)
    # controls clamped to limits (ilqr_optimizer.cc:835-836)
    assert np.all(np.asarray(us)[:, 0] >= VEH.jerk_min - 1e-12)
    assert np.all(np.asarray(us)[:, 0] <= VEH.jerk_max + 1e-12)
    # rollout stays near the straight goals
    assert np.max(np.abs(np.asarray(xs)[:, 1])) < 1.0


def test_solve_converges(setup):
    goals, cons, start = setup
    res = S.solve(goals, start, cons, CFG, VEH, DT)
    assert int(res.status) in (SolverStatus.SUCCESS_GNORM,
                               SolverStatus.SUCCESS_ABS_COST,
                               SolverStatus.SUCCESS_REL_COST)
    assert int(res.iters) < CFG.max_iter_num
    # final cost not above the init cost
    c0 = C.total_cost(res.init_xs, res.init_us, S.transform_goals(goals, start),
                      cons, CFG, VEH)
    assert float(res.cost.total) <= float(c0.total) + 1e-9
    # trajectory starts at the start state
    np.testing.assert_allclose(np.asarray(res.xs)[0, :4],
                               np.asarray(start)[:4], atol=1e-12)
    # actuator limits respected (barrier keeps interior)
    us = np.asarray(res.us)
    assert np.all(us[:, 0] >= VEH.jerk_min - 1e-6)
    assert np.all(us[:, 0] <= VEH.jerk_max + 1e-6)
    assert np.all(us[:, 1] >= VEH.delta_rate_min - 1e-6)
    assert np.all(us[:, 1] <= VEH.delta_rate_max + 1e-6)
    # velocity within limits
    v = np.asarray(res.xs)[:, 3]
    assert np.all(v >= -1e-6) and np.all(v <= VEH.max_velocity + 1e-6)


def test_serial_matches_parallel_linesearch(setup):
    """The serial one-alpha-per-trip mode must reproduce the parallel
    fan-out's picks: same alpha accepted each iteration -> same trajectory
    (up to re-association noise), same iteration count and status."""
    goals, cons, start = setup
    res_s = S.solve(goals, start, cons, CFG, VEH, DT)
    res_p = S.solve(goals, start, cons, CFG_PAR, VEH, DT)
    assert int(res_s.iters) == int(res_p.iters)
    assert int(res_s.status) == int(res_p.status)
    np.testing.assert_allclose(np.asarray(res_s.us), np.asarray(res_p.us),
                               atol=1e-9)


def test_solve_with_history_matches_solve(setup):
    goals, cons, start = setup
    res = S.solve(goals, start, cons, CFG_PAR, VEH, DT)
    res_h, hist = S.solve_with_history(goals, start, cons, CFG_PAR, VEH, DT,
                                       num_iters=int(res.iters) + 2)
    np.testing.assert_allclose(np.asarray(res_h.us), np.asarray(res.us),
                               atol=1e-12)
    assert int(res_h.status) == int(res.status)
    # history monotone non-increasing over accepted iterations
    tot = np.asarray(hist.total)[: int(res.iters) + 1]
    assert np.all(np.diff(tot) <= 1e-9)


def test_solve_with_history_honors_warm_start(setup):
    """The history path must replay the solve that actually ran: with a
    warm start (MPC shift / tracker init) its decision sequence and
    controls must match solve() given the same warm start — the
    reference's figure_plot records the production solve, not a parallel
    one (figure_plot.h:267-487)."""
    goals, cons, start = setup
    # a feasible-but-imperfect warm start: the iqr init perturbed
    xs0, us0 = S.iqr_init(S.transform_goals(goals, start), CFG_PAR, VEH, DT)
    warm = (xs0, us0 * 0.9)
    res = S.solve(goals, start, cons, CFG_PAR, VEH, DT, warm_start=warm)
    res_h, hist = S.solve_with_history(goals, start, cons, CFG_PAR, VEH, DT,
                                       num_iters=int(res.iters) + 2,
                                       warm_start=warm)
    assert int(res_h.status) == int(res.status)
    assert int(res_h.iters) == int(res.iters)
    np.testing.assert_allclose(np.asarray(res_h.us), np.asarray(res.us),
                               atol=1e-12)
    assert float(hist.total[0]) == pytest.approx(
        float(S.total_cost(warm[0], warm[1],
                           S.transform_goals(goals, start),
                           cons, CFG_PAR, VEH).total))


def test_solve_with_history_matches_tracker_init_production(setup):
    """init_guess='tracker' production parity: feeding the same tracker
    warm start to solve() and solve_with_history() yields the identical
    decision sequence (pipeline._init_guess_warm_start wiring)."""
    from cilqr_tpu import tracker as tracker_mod
    from cilqr_tpu.config import PlannerConfig
    from cilqr_tpu.pipeline import traj_from_solution

    goals, cons, start = setup
    pcfg = PlannerConfig()
    coarse = traj_from_solution(goals, jnp.zeros((N - 1, 2), goals.dtype),
                                DT, VEH.wheel_base)
    warm = tracker_mod.plan(start, coarse, pcfg.tracker, VEH)
    res = S.solve(goals, start, cons, CFG_PAR, VEH, DT, warm_start=warm)
    res_h, _ = S.solve_with_history(goals, start, cons, CFG_PAR, VEH, DT,
                                    num_iters=int(res.iters) + 2,
                                    warm_start=warm)
    assert int(res_h.status) == int(res.status)
    assert int(res_h.iters) == int(res.iters)
    np.testing.assert_allclose(np.asarray(res_h.us), np.asarray(res.us),
                               atol=1e-12)


def test_solve_barrier_variants(setup):
    """The Exponential/Quadratic barrier kinds (the reference's
    commented-out switch, ilqr_optimizer.h:181-186) are selectable via
    BarrierConfig.kind and solve the synthetic problem: converged status,
    actuator limits respected, trajectory near the goals."""
    goals, cons, start = setup
    for kind in ("exponential", "quadratic"):
        cfg = dataclasses.replace(
            CFG, barrier=dataclasses.replace(CFG.barrier, kind=kind))
        res = S.solve(goals, start, cons, cfg, VEH, DT)
        st = int(res.status)
        assert st in (int(SolverStatus.SUCCESS_GNORM),
                      int(SolverStatus.SUCCESS_ABS_COST),
                      int(SolverStatus.SUCCESS_REL_COST)), (kind, st)
        xs = np.asarray(res.xs)
        # stays near the straight-road goals (the barrier variants change
        # the constraint shaping, not the tracking objective)
        assert np.max(np.abs(xs[:, 1])) < 2.0, kind
        us = np.asarray(res.us)
        assert np.all(np.abs(us[:, 0]) <= VEH.jerk_max + 1e-6), kind


def test_solve_vmappable(setup):
    goals, cons, start = setup
    starts = jnp.stack([start, start.at[1].set(-0.5), start.at[3].set(8.0)])
    goals_b = jnp.stack([goals] * 3)
    cons_b = jax.tree.map(lambda t: jnp.stack([t] * 3), cons)
    res = jax.vmap(lambda g, s, c: S.solve(g, s, c, CFG, VEH, DT))(
        goals_b, starts, cons_b)
    assert res.xs.shape == (3, N, 6)
    assert np.all(np.asarray(res.status) != SolverStatus.RUNNING)
    # lane 0 must equal the single solve bitwise
    res0 = S.solve(goals, start, cons, CFG, VEH, DT)
    np.testing.assert_allclose(np.asarray(res.us[0]), np.asarray(res0.us),
                               atol=1e-12)
