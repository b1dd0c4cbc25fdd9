"""DP coarse planner tests (vs reference semantics, dp_planner.cpp)."""

import jax.numpy as jnp
import numpy as np
import pytest

from cilqr_tpu import dp as DP
from cilqr_tpu import scenario as SC
from cilqr_tpu import world as W
from cilqr_tpu.config import PlannerConfig

CFG = PlannerConfig()


@pytest.fixture(scope="module")
def empty_scn():
    return SC.make_scenario(seed=0, n_static=0, n_ped=0, n_dyn_veh=0,
                            dtype=jnp.float64)


@pytest.fixture(scope="module")
def ped_scn():
    return SC.make_scenario(seed=1, dtype=jnp.float64)


def _grid(scn):
    return W.build_barrier_grid(np.asarray(scn.barrier_xy), CFG.dp.grid_cell)


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
    # if DP claims success, verify no collision along the trajectory with
    # the exact checker
    if bool(res.ok):
        hit = W.check_optimization_collision(
            ped_scn, tr.time, tr.x, tr.y, tr.theta,
            CFG.vehicle.radius, CFG.vehicle.r2x, CFG.vehicle.f2x,
            collision_buffer=0.0, grid=None, mode="exact")
        # knot poses come from interpolation; allow no more than a couple
        # of marginal knots (the DP checks its own interp points)
        assert int(np.asarray(hit).sum()) <= 3


def test_dp_jit_compiles(empty_scn):
    import jax

    f = jax.jit(lambda s, x, y, th: DP.plan(s, x, y, th, CFG, _grid(empty_scn)))
    res = f(empty_scn, 0.0, 0.0, 0.0)
    assert res.traj.x.shape == (81,)
