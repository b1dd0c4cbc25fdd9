"""Batch-last solver (solver_blast) parity: must reproduce the vmapped
serial solver decision-for-decision (same iteration counts and statuses;
controls to fp-reassociation tolerance) and independently pass the native
oracle gate."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cilqr_tpu import costs as C
from cilqr_tpu import solver as S
from cilqr_tpu.batch import solve_batch
from cilqr_tpu.config import IlqrConfig, VehicleParam
from cilqr_tpu.solver_blast import solve_batch_bl

from test_native_parity import _problem

VEH = VehicleParam()
CFG = IlqrConfig()
DT = 0.1


def _batch_from_problems(seeds):
    gs, cs, ss = [], [], []
    for seed in seeds:
        goals, planes, mask, lp, ls, rp, rs, m, start = _problem(seed)
        cons = C.shrink_and_normalize(
            jnp.asarray(planes), jnp.asarray(mask), jnp.asarray(lp),
            jnp.asarray(ls), jnp.asarray(m), jnp.asarray(rp),
            jnp.asarray(rs), jnp.asarray(m), CFG, VEH)
        gs.append(jnp.asarray(goals))
        cs.append(cons)
        ss.append(jnp.asarray(start))
    goals_b = jnp.stack(gs)
    starts_b = jnp.stack(ss)
    cons_b = jax.tree.map(lambda *a: jnp.stack(a), *cs)
    return goals_b, starts_b, cons_b


def test_blast_matches_vmap_serial():
    goals_b, starts_b, cons_b = _batch_from_problems(range(6))
    res_v = solve_batch(goals_b, starts_b, cons_b, CFG, VEH, DT)
    res_b = solve_batch_bl(goals_b, starts_b, cons_b, CFG, VEH, DT)
    np.testing.assert_array_equal(np.asarray(res_v.iters),
                                  np.asarray(res_b.iters))
    np.testing.assert_array_equal(np.asarray(res_v.status),
                                  np.asarray(res_b.status))
    np.testing.assert_allclose(np.asarray(res_b.us), np.asarray(res_v.us),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(res_b.init_us),
                               np.asarray(res_v.init_us), atol=1e-12)
    np.testing.assert_allclose(np.asarray(res_b.cost.total),
                               np.asarray(res_v.cost.total), rtol=1e-6)


def test_blast_oracle_gate():
    """Same gate as test_native_parity.test_solver_control_parity, run
    against the batch-last implementation directly."""
    from cilqr_tpu.native import bindings as NB

    goals_b, starts_b, cons_b = _batch_from_problems(range(4))
    res = solve_batch_bl(goals_b, starts_b, cons_b, CFG, VEH, DT)
    for i in range(goals_b.shape[0]):
        goals_t = np.asarray(S.transform_goals(goals_b[i], starts_b[i]))
        cons = jax.tree.map(lambda a: a[i], cons_b)
        ref = NB.ref_solve(
            goals_t, np.asarray(cons.corridor_planes),
            np.asarray(cons.corridor_mask), np.asarray(cons.left_planes),
            np.asarray(cons.left_segs), np.asarray(cons.left_mask),
            np.asarray(cons.right_planes), np.asarray(cons.right_segs),
            np.asarray(cons.right_mask), CFG, VEH, DT)
        assert int(res.status[i]) == ref.status
        max_dev = np.max(np.abs(np.asarray(res.us[i]) - ref.us))
        assert max_dev < 1e-3, f"lane {i}: control deviation {max_dev}"


def test_blast_jit_and_shapes():
    goals_b, starts_b, cons_b = _batch_from_problems(range(2))
    res = jax.jit(lambda g, s, c: solve_batch_bl(g, s, c, CFG, VEH, DT))(
        goals_b, starts_b, cons_b)
    assert res.xs.shape == (2, 81, 6)
    assert res.us.shape == (2, 80, 2)
    assert res.cost.total.shape == (2,)
    assert np.all(np.asarray(res.status) != 0)


def test_lane_window_matches_full_scan_on_fixture():
    """Quantized windowed lane search (default lane_window) is decision-
    and control-exact vs the full scan on real fixture problems (f64)."""
    import dataclasses
    import os

    from cilqr_tpu.costs import ConstraintSet

    fixture = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "benchdata", "problems.npz")
    if not os.path.exists(fixture):
        pytest.skip("no bench fixture")
    d = np.load(fixture)
    take = lambda k: (jnp.asarray(d[k][:6], jnp.float64)
                      if d[k].dtype != np.bool_ else jnp.asarray(d[k][:6]))
    cons = ConstraintSet(
        corridor_planes=take("corridor_planes"),
        corridor_mask=take("corridor_mask"),
        left_planes=take("left_planes"), left_segs=take("left_segs"),
        left_mask=take("left_mask"), right_planes=take("right_planes"),
        right_segs=take("right_segs"), right_mask=take("right_mask"))
    goals = take("goals")
    starts = take("starts")
    c_full = dataclasses.replace(CFG, lane_window=0)
    c_win = dataclasses.replace(CFG, lane_window=32)
    r0 = solve_batch_bl(goals, starts, cons, c_full, VEH, DT)
    rw = solve_batch_bl(goals, starts, cons, c_win, VEH, DT)
    np.testing.assert_array_equal(np.asarray(r0.iters), np.asarray(rw.iters))
    np.testing.assert_array_equal(np.asarray(r0.status),
                                  np.asarray(rw.status))
    np.testing.assert_allclose(np.asarray(rw.us), np.asarray(r0.us),
                               atol=1e-12)


def test_compaction_matches_single_phase_fixture():
    """Two-phase converged-lane compaction (solve_batch_compact) matches
    the single-phase solve decision-for-decision on fixture problems;
    controls agree to XLA's width-dependent fusion reassociation."""
    import dataclasses
    import os

    from cilqr_tpu.costs import ConstraintSet

    fixture = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "benchdata", "problems.npz")
    if not os.path.exists(fixture):
        pytest.skip("no bench fixture")
    d = np.load(fixture)
    take = lambda k: (jnp.asarray(d[k][:16], jnp.float64)
                      if d[k].dtype != np.bool_ else jnp.asarray(d[k][:16]))
    cons = ConstraintSet(
        corridor_planes=take("corridor_planes"),
        corridor_mask=take("corridor_mask"),
        left_planes=take("left_planes"), left_segs=take("left_segs"),
        left_mask=take("left_mask"), right_planes=take("right_planes"),
        right_segs=take("right_segs"), right_mask=take("right_mask"))
    goals, starts = take("goals"), take("starts")
    c1 = dataclasses.replace(CFG, compaction_phase1=0)
    c2 = dataclasses.replace(CFG, compaction_phase1=6, compaction_factor=4)
    # aggressive TRIP cap (round 4): phase 1 ends after 4 line-search
    # steps regardless of concluded iterations — lanes hand over to the
    # cascade mid-line-search (aidx carry). Still decision-identical.
    c3 = dataclasses.replace(CFG, compaction_phase1=6, compaction_factor=4,
                             compaction_phase1_trips=4)
    r1 = solve_batch_bl(goals, starts, cons, c1, VEH, DT)
    for cx in (c2, c3):
        r2 = solve_batch_bl(goals, starts, cons, cx, VEH, DT)
        np.testing.assert_array_equal(np.asarray(r1.iters),
                                      np.asarray(r2.iters))
        np.testing.assert_array_equal(np.asarray(r1.status),
                                      np.asarray(r2.status))
        np.testing.assert_array_equal(np.asarray(r1.lam), np.asarray(r2.lam))
        np.testing.assert_allclose(np.asarray(r2.us), np.asarray(r1.us),
                                   atol=1e-12)


def test_trim_constraints_exact():
    """Dropping all-invalid padded constraint slots doesn't change
    decisions or controls (beyond shape-dependent fp reassociation)."""
    import dataclasses
    import os

    from cilqr_tpu.costs import ConstraintSet, trim_constraints

    fixture = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "benchdata", "problems.npz")
    if not os.path.exists(fixture):
        pytest.skip("no bench fixture")
    d = np.load(fixture)
    take = lambda k: (jnp.asarray(d[k][:8], jnp.float64)
                      if d[k].dtype != np.bool_ else jnp.asarray(d[k][:8]))
    cons = ConstraintSet(
        corridor_planes=take("corridor_planes"),
        corridor_mask=take("corridor_mask"),
        left_planes=take("left_planes"), left_segs=take("left_segs"),
        left_mask=take("left_mask"), right_planes=take("right_planes"),
        right_segs=take("right_segs"), right_mask=take("right_mask"))
    trimmed = trim_constraints(cons)
    assert trimmed.corridor_planes.shape[-2] == 16
    assert trimmed.left_planes.shape[-2] == 40
    goals, starts = take("goals"), take("starts")
    cfg = dataclasses.replace(CFG, sweep_backend="xla")
    r1 = solve_batch_bl(goals, starts, cons, cfg, VEH, DT)
    r2 = solve_batch_bl(goals, starts, trimmed, cfg, VEH, DT)
    np.testing.assert_array_equal(np.asarray(r1.iters), np.asarray(r2.iters))
    np.testing.assert_array_equal(np.asarray(r1.status),
                                  np.asarray(r2.status))
    np.testing.assert_allclose(np.asarray(r2.us), np.asarray(r1.us),
                               atol=1e-11)


def test_paired_line_search_matches_serial_fixture():
    """alphas_per_trip=K for K in {2, 3, 4} applies the serial accept rule
    to K candidates rolled out from one frozen backward pass — decision-
    and control-identical to the 1-alpha-per-trip search on fixture
    problems (f64; candidate i's rollout equals the value trip i would
    have recomputed, so only program-level fusion reassociation can
    differ). Also exercised across the compaction cascade (aidx stays a
    multiple of K at every phase boundary)."""
    import dataclasses
    import os

    from cilqr_tpu.costs import ConstraintSet

    fixture = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "benchdata", "problems.npz")
    if not os.path.exists(fixture):
        pytest.skip("no bench fixture")
    d = np.load(fixture)
    take = lambda k: (jnp.asarray(d[k][:16], jnp.float64)
                      if d[k].dtype != np.bool_ else jnp.asarray(d[k][:16]))
    cons = ConstraintSet(
        corridor_planes=take("corridor_planes"),
        corridor_mask=take("corridor_mask"),
        left_planes=take("left_planes"), left_segs=take("left_segs"),
        left_mask=take("left_mask"), right_planes=take("right_planes"),
        right_segs=take("right_segs"), right_mask=take("right_mask"))
    goals, starts = take("goals"), take("starts")
    c1 = dataclasses.replace(
        CFG, line_search=dataclasses.replace(CFG.line_search,
                                             alphas_per_trip=1))
    r1 = solve_batch_bl(goals, starts, cons, c1, VEH, DT)
    for k, trips in ((4, 0), (4, 4), (3, 0), (2, 0)):
        ck = dataclasses.replace(
            c1, line_search=dataclasses.replace(c1.line_search,
                                                alphas_per_trip=k),
            compaction_phase1_trips=trips)
        rk = solve_batch_bl(goals, starts, cons, ck, VEH, DT)
        np.testing.assert_array_equal(np.asarray(r1.iters),
                                      np.asarray(rk.iters))
        np.testing.assert_array_equal(np.asarray(r1.status),
                                      np.asarray(rk.status))
        np.testing.assert_array_equal(np.asarray(r1.lam), np.asarray(rk.lam))
        np.testing.assert_allclose(np.asarray(rk.us), np.asarray(r1.us),
                                   atol=1e-11)
