"""Full pipeline (DP -> corridor -> CILQR) end-to-end tests
(BASELINE config 1 analog)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cilqr_tpu import pipeline as P
from cilqr_tpu import scenario as SC
from cilqr_tpu import world as W
from cilqr_tpu.config import PlannerConfig
from cilqr_tpu.types import SolverStatus

CFG = PlannerConfig()
START = (0.0, 0.0, 0.0, 10.0)  # planning_node.cc:24-27


@pytest.fixture(scope="module")
def scn():
    return SC.make_scenario(seed=7, dtype=jnp.float64)


def test_full_plan(scn):
    out = P.plan(scn, START, CFG)
    assert bool(out.dp_ok)
    # corridors built for every knot
    assert bool(out.corridors.ok.all())
    # solver finished with a terminal status
    assert int(out.solve.status) != SolverStatus.RUNNING
    xs = np.asarray(out.solve.xs)
    assert np.isfinite(xs).all()
    # starts at the fixed start state
    np.testing.assert_allclose(xs[0, :4], START, atol=1e-9)
    # trajectory stays within road bounds (lateral check, generous margin)
    from cilqr_tpu.reference_line import get_projection

    _, lat, _ = get_projection(scn.centerline, out.solve.xs[:, 0],
                               out.solve.xs[:, 1])
    lat = np.asarray(lat)
    assert np.all(lat < 2.5 + 0.5) and np.all(lat > -6.0 - 0.5), (
        lat.min(), lat.max())


def test_corridor_contains_coarse_trajectory(scn):
    out = P.plan(scn, START, CFG)
    planes = np.asarray(out.corridors.planes)
    mask = np.asarray(out.corridors.plane_mask)
    cx = np.asarray(out.coarse.x)
    cy = np.asarray(out.coarse.y)
    # each knot's coarse position satisfies its own (unshrunk) corridor
    g = planes[..., 0] * cx[:, None] + planes[..., 1] * cy[:, None] - planes[..., 2]
    g = np.where(mask, g, -1.0)
    viol = (g > 1e-6).any(axis=-1)
    assert viol.sum() == 0, f"{viol.sum()} knots outside their corridor"


def test_traj_from_solution(scn):
    out = P.plan(scn, START, CFG)
    tr = P.traj_from_solution(out.solve.xs, out.solve.us, CFG.delta_t,
                              CFG.vehicle.wheel_base)
    s = np.asarray(tr.s)
    assert s[0] == 0 and np.all(np.diff(s) >= -1e-12)
    np.testing.assert_allclose(
        np.asarray(tr.kappa),
        np.tan(np.asarray(out.solve.xs)[:, 5]) / CFG.vehicle.wheel_base)


def test_solve_hits_flags_a_planted_collision():
    """PlanOutput.solve_hits unit check: re-checking a trajectory rammed
    through a static obstacle must flag exactly the knots whose two-disc
    probe overlaps it, and the pipeline's own (healthy) output must
    re-check clean on the executed near-term horizon."""
    import jax

    from cilqr_tpu import pipeline as P
    from cilqr_tpu import scenario as SC
    from cilqr_tpu.config import PlannerConfig
    from cilqr_tpu.pipeline import _recheck_solution

    cfg = PlannerConfig()
    scn = SC.make_scenario(seed=1, dtype=jnp.float64)
    spec = SC.analytic_road_spec()
    out = P.plan(scn, (0.0, 0.0, 0.0, 10.0), cfg, spec=spec)
    hits = np.asarray(out.solve_hits)
    assert hits.shape == (81,)
    assert not hits[:25].any(), np.nonzero(hits[:25])[0]

    # plant: park the whole trajectory on top of the first static obstacle
    ob = np.asarray(scn.static_obs)[0]          # [4, 2] corners
    cx, cy = ob.mean(axis=0)
    xs = np.asarray(out.solve.xs).copy()
    xs[40:45, 0] = cx
    xs[40:45, 1] = cy
    hits2 = np.asarray(_recheck_solution(scn, jnp.asarray(xs), cfg, spec))
    assert hits2[40:45].all(), hits2[40:45]


def test_tighten_constraints_exact_boundary_shift():
    """costs.tighten_constraints moves every half-plane boundary inward
    by exactly `margin` metres regardless of the plane's normalization
    (the repair solve's corrective transform)."""
    from cilqr_tpu import costs as C

    rng = np.random.default_rng(3)
    planes = rng.normal(size=(5, 4, 3))
    cons = C.ConstraintSet(
        corridor_planes=jnp.asarray(planes), corridor_mask=jnp.ones((5, 4),
                                                                    bool),
        left_planes=jnp.asarray(planes[0]), left_segs=jnp.zeros((4, 2, 2)),
        left_mask=jnp.ones(4, bool), right_planes=jnp.asarray(planes[1]),
        right_segs=jnp.zeros((4, 2, 2)), right_mask=jnp.ones(4, bool))
    m = 0.7
    t = C.tighten_constraints(cons, m)
    for old, new in ((cons.corridor_planes, t.corridor_planes),
                     (cons.left_planes, t.left_planes),
                     (cons.right_planes, t.right_planes)):
        old = np.asarray(old)
        new = np.asarray(new)
        # boundary offset along the normal = c / |(a,b)| shrinks by m
        ab = np.hypot(old[..., 0], old[..., 1])
        np.testing.assert_allclose(old[..., 2] / ab - new[..., 2] / ab, m,
                                   atol=1e-12)
        np.testing.assert_array_equal(old[..., :2], new[..., :2])


def test_brake_goals_retimes_along_path():
    """pipeline.brake_goals: gamma-slower traversal of the SAME path —
    positions stay on the original polyline at gamma-scaled arc length,
    velocities scale by gamma, accelerations by gamma^2 (the repair
    brake round's transform, RepairConfig.brake_factor)."""
    from cilqr_tpu.pipeline import brake_goals

    t = np.arange(81) * 0.1
    g = np.zeros((81, 6))
    # curved path: quarter-ish arc with varying speed profile
    g[:, 0] = 30 * np.sin(0.3 * t)
    g[:, 1] = 30 * (1 - np.cos(0.3 * t))
    g[:, 2] = 0.3 * t
    g[:, 3] = 9.0 - 0.02 * np.arange(81)
    g[:, 4] = -0.2
    b = np.asarray(brake_goals(jnp.asarray(g), 0.6))
    # same start
    np.testing.assert_allclose(b[0], g[0], atol=1e-12)
    # arc length covered scales by gamma
    def arc(p):
        return np.hypot(np.diff(p[:, 0]), np.diff(p[:, 1])).sum()
    np.testing.assert_allclose(arc(b), 0.6 * arc(g), rtol=1e-6)
    # every braked knot lies ON the original polyline (distance to the
    # nearest original segment ~ 0)
    from cilqr_tpu.geometry import point_segment_distance
    d = point_segment_distance(
        jnp.asarray(b[:, 0:1]), jnp.asarray(b[:, 1:2]),
        jnp.asarray(g[:-1, 0][None]), jnp.asarray(g[:-1, 1][None]),
        jnp.asarray(g[1:, 0][None]), jnp.asarray(g[1:, 1][None]))
    assert float(jnp.min(d, axis=1).max()) < 1e-9
    # kinematic scaling (velocity at the retimed station, x gamma)
    assert abs(float(b[0, 3]) - 0.6 * float(g[0, 3])) < 1e-9
    np.testing.assert_allclose(b[:, 4], 0.36 * -0.2, atol=1e-9)


def test_repair_noop_on_clean_batch():
    """With every lane's near-term horizon clean, the repair pass must
    change NOTHING (the lax.cond skips every round) — outputs equal the
    repair-disabled pipeline bitwise."""
    import dataclasses

    cfg = PlannerConfig()
    cfg_off = cfg.replace(repair=dataclasses.replace(cfg.repair,
                                                     enabled=False))
    seeds = [0, 1, 2, 3]   # measured clean chunk (gate F: chunk 0 has
    # no dirty lanes under the f64/f32 pipelines)
    scns = SC.make_scenario_batch(seeds, dtype=jnp.float64)
    scn0 = jax.tree.map(lambda a: a[0], scns)
    lane = P.make_lane_tuple(scn0.left_barrier_xy, scn0.right_barrier_xy,
                             CFG)
    spec = SC.analytic_road_spec()
    starts = jnp.tile(jnp.asarray([0.0, 0.0, 0.0, 10.0], jnp.float64),
                      (4, 1))
    o_on = P.plan_batch(scns, starts, cfg, None, lane, spec=spec)
    o_off = P.plan_batch(scns, starts, cfg_off, None, lane, spec=spec)
    assert not bool(np.asarray(o_on.pre_hits)[:, :25].any())
    assert not bool(np.asarray(o_on.repaired).any())
    assert not bool(np.asarray(o_on.still_dirty).any())
    np.testing.assert_array_equal(np.asarray(o_on.solve.us),
                                  np.asarray(o_off.solve.us))
    np.testing.assert_array_equal(np.asarray(o_on.solve.status),
                                  np.asarray(o_off.solve.status))
    np.testing.assert_array_equal(np.asarray(o_on.solve_hits),
                                  np.asarray(o_off.solve_hits))
