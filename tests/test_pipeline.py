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
