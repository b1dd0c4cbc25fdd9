"""DP coarse planner tests (vs reference semantics, dp_planner.cpp).

The golden gate is test_dp_matches_oracle: a literal numpy transcription of
the reference DP planner (tests/dp_oracle.py, dp_planner.cpp:39-320 plus
its environment/reference-line dependencies) is run cell-by-cell on real
pedestrian_test scenarios and must produce the SAME winning (s,l) cells,
per-layer stations, min_cost, and 81-knot coarse trajectory as the device
implementation (exact collision mode, f64)."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from cilqr_tpu import dp as DP
from cilqr_tpu import scenario as SC
from cilqr_tpu import world as W
from cilqr_tpu.config import PlannerConfig

import dp_oracle

CFG = PlannerConfig()
CFG_EXACT = dataclasses.replace(
    CFG, dp=dataclasses.replace(CFG.dp, collision_mode="exact"))


@pytest.fixture(scope="module")
def empty_scn():
    return SC.make_scenario(seed=0, n_static=0, n_ped=0, n_dyn_veh=0,
                            dtype=jnp.float64)


@pytest.fixture(scope="module")
def ped_scn():
    return SC.make_scenario(seed=1, dtype=jnp.float64)


def _grid(scn):
    return W.build_barrier_grid(np.asarray(scn.barrier_xy), CFG.dp.grid_cell,
                                half=CFG.vehicle.radius)


def test_dp_empty_road(empty_scn):
    res = DP.plan(empty_scn, 0.0, 0.0, 0.0, CFG, _grid(empty_scn))
    assert bool(res.ok), f"min_cost {float(res.min_cost)}"
    tr = res.traj
    assert tr.x.shape == (81,)
    # time grid 0.1s
    np.testing.assert_allclose(np.asarray(tr.time), 0.1 * np.arange(81),
                               atol=1e-12)
    # station monotone increasing, speed close to nominal 10 m/s by the end
    s = np.asarray(tr.s)
    assert np.all(np.diff(s) >= -1e-9)
    v = np.asarray(tr.velocity)
    assert 6.0 < v[40:].mean() < 14.0
    # stays on the road (|lateral| within bounds)
    from cilqr_tpu.reference_line import get_projection

    _, lat, _ = get_projection(empty_scn.centerline, tr.x, tr.y)
    lat = np.asarray(lat)
    assert np.all(lat < 2.5 + 0.1) and np.all(lat > -6.0 - 0.1)


def test_dp_prefers_centerline_progress(empty_scn):
    res = DP.plan(empty_scn, 0.0, 0.0, 0.0, CFG, _grid(empty_scn))
    # on an empty road, total distance over 8 s should be in a sane band
    # around the DP station grid's preference (nominal velocity 10 m/s)
    ds = float(res.traj.s[-1] - res.traj.s[0])
    assert 50.0 < ds < 110.0, ds


def test_dp_with_obstacles_still_plans(ped_scn):
    res = DP.plan(ped_scn, 0.0, 0.0, 0.0, CFG, _grid(ped_scn))
    tr = res.traj
    assert np.isfinite(np.asarray(tr.x)).all()
    assert bool(res.ok)
    # The 81 knots ARE the DP's own collision probe points (same
    # interpolation, dp_planner.cpp:214-245 vs :283-320), so under the
    # REFERENCE's collision semantics (mutual-corner-containment overlap,
    # polygon2d.cpp HasOverlap(Box2d)) a successful plan has exactly zero
    # colliding knots.
    env = dp_oracle.env_from_scenario(ped_scn)
    ref_hit = env.check_optimization_collision(
        np.asarray(tr.time), np.asarray(tr.x), np.asarray(tr.y),
        np.asarray(tr.theta), CFG.vehicle)
    assert int(ref_hit.sum()) == 0, np.nonzero(ref_hit)
    # The device checker uses full SAT overlap (strictly stronger than the
    # reference's corner-containment): it may flag knots the reference's
    # probe misses (cross-shaped overlaps), but only marginally.
    hit = W.check_optimization_collision(
        ped_scn, tr.time, tr.x, tr.y, tr.theta,
        CFG.vehicle.radius, CFG.vehicle.r2x, CFG.vehicle.f2x,
        collision_buffer=0.0, grid=None, mode="exact")
    assert int(np.asarray(hit).sum()) <= 2


# Seeds chosen for winning-path diversity: 0 and 6 force lane + station
# changes around obstacles, 2 and 3 weave laterally; (3,9)x5 trivial
# centerline winners (seeds 1,4,5,8,9) are already covered by ped_scn
# tests above.
@pytest.mark.parametrize("seed", [0, 2, 3, 6])
def test_dp_matches_oracle(seed):
    scn = SC.make_scenario(seed=seed, dtype=jnp.float64)
    env = dp_oracle.env_from_scenario(scn)

    # the road-barrier set itself must match set_reference's sampling
    b_scn = np.asarray(scn.barrier_xy)[np.asarray(scn.barrier_mask)]
    order = lambda b: b[np.lexsort((b[:, 1], b[:, 0]))]
    assert b_scn.shape == env.barrier.shape
    np.testing.assert_allclose(order(b_scn), order(env.barrier), atol=1e-12)

    want = dp_oracle.DpOracle(env, CFG).plan(0.0, 0.0, 0.0)
    got = DP.plan(scn, 0.0, 0.0, 0.0, CFG_EXACT, None)

    # winning cells pinned exactly (a different cell = a different coarse
    # plan = every downstream corridor and solve changes)
    got_cells = list(zip(np.asarray(got.sel_s).tolist(),
                         np.asarray(got.sel_l).tolist()))
    assert got_cells == want["sel_cells"], (got_cells, want["sel_cells"])
    np.testing.assert_allclose(float(got.min_cost), want["min_cost"],
                               rtol=1e-9)
    assert bool(got.ok) == want["ok"]

    # 81-knot coarse trajectory to fp noise
    for f, tol in (("s", 1e-9), ("x", 1e-9), ("y", 1e-9), ("theta", 1e-9),
                   ("velocity", 1e-8), ("a", 1e-7), ("kappa", 1e-9),
                   ("delta", 1e-9)):
        np.testing.assert_allclose(np.asarray(getattr(got.traj, f)),
                                   want[f], atol=tol, err_msg=f)


# Same winning-path-diversity seeds as test_dp_matches_oracle, plus the
# trivial ped_scn seed; seed 6 originally exposed a miss of the earlier
# line-only frenet formulation on the r=5 hairpin (fixed by the exact
# per-arc circle test).
@pytest.mark.parametrize("seed", [0, 1, 2, 3, 6])
def test_dp_frenet_vs_exact(seed):
    """The gather-free 'frenet' barrier mode (world.barrier_hit_frenet,
    the TPU bench default — docs/PERF.md) must reproduce the exact-mode
    winning cells and coarse trajectory on real pedestrian_test scenarios:
    its closed-form per-arc boundary circle/line test is exact up to
    arc-joint-straddling boxes and the 0.1 m boundary sampling, so any
    disagreement here means a probe near a boundary flipped."""
    cfg_f = dataclasses.replace(
        CFG, dp=dataclasses.replace(CFG.dp, collision_mode="frenet"))
    scn = SC.make_scenario(seed=seed, dtype=jnp.float64)
    want = DP.plan(scn, 0.0, 0.0, 0.0, CFG_EXACT, None)
    got = DP.plan(scn, 0.0, 0.0, 0.0, cfg_f, None)
    assert np.array_equal(np.asarray(got.sel_s), np.asarray(want.sel_s))
    assert np.array_equal(np.asarray(got.sel_l), np.asarray(want.sel_l))
    np.testing.assert_allclose(float(got.min_cost), float(want.min_cost),
                               rtol=1e-12)
    np.testing.assert_allclose(np.asarray(got.traj.x),
                               np.asarray(want.traj.x), atol=1e-12)
    np.testing.assert_allclose(np.asarray(got.traj.y),
                               np.asarray(want.traj.y), atol=1e-12)


def test_dp_jit_compiles(empty_scn):
    import jax

    f = jax.jit(lambda s, x, y, th: DP.plan(s, x, y, th, CFG, _grid(empty_scn)))
    res = f(empty_scn, 0.0, 0.0, 0.0)
    assert res.traj.x.shape == (81,)


# The analytic-spec fast path (frenet + RoadSpec, the TPU bench default)
# is qualified against EXACT mode over 16 seeds x {f64, f32} x two road
# families in tests/test_dp_qualification.py (winning cells + bit-exact
# trajectory + conservative-divergence gates).
