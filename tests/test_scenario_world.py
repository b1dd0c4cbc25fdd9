import jax.numpy as jnp
import numpy as np
import pytest

from cilqr_tpu import scenario as SC
from cilqr_tpu import world as W


@pytest.fixture(scope="module")
def scn():
    return SC.make_scenario(seed=3, dtype=jnp.float64)


def test_centerline_shape_and_geometry():
    cl = SC.make_centerline()
    # total road length ~ 30 + 15.7 + 10 + 15.7 + 36 + 37.7 + 50 = ~195 m
    assert 190 < cl.s[-1] < 200
    # resolution ~0.1 m in s
    assert np.allclose(np.diff(cl.s), 0.1)
    # heading continuous
    assert np.max(np.abs(np.diff(cl.theta))) < 0.05
    # curvature values match segment config
    assert set(np.round(np.unique(cl.kappa), 4)) <= {
        0.0, -0.1, 0.2, round(-1 / 12, 4)}


def test_scenario_tensors(scn):
    # slots size exactly to the workload (padded slots burn full DP probe
    # cost, so none exist for the default counts)
    assert scn.static_obs.shape == (SC.N_STATIC, 4, 2)
    assert int(scn.static_mask.sum()) == SC.N_STATIC
    assert int(scn.dyn_mask.sum()) == SC.N_PEDESTRIANS + SC.N_DYNAMIC_VEHICLES
    # dynamic times monotonically nondecreasing
    dt = np.diff(np.asarray(scn.dyn_times), axis=1)
    assert np.all(dt >= -1e-12)


def test_barrier_grid_counts_match_exact(scn, rng):
    grid = W.build_barrier_grid(np.asarray(scn.barrier_xy))
    pts = np.asarray(scn.barrier_xy)
    for _ in range(50):
        c = pts[rng.integers(0, len(pts))] + rng.normal(size=2)
        minx, miny = c - 1.3
        maxx, maxy = c + 1.3
        exact = int(W.barrier_points_in_box_exact(
            scn.barrier_xy, scn.barrier_mask, jnp.asarray(minx),
            jnp.asarray(miny), jnp.asarray(maxx), jnp.asarray(maxy)))
        approx = int(W.barrier_points_in_box_grid(
            grid, jnp.asarray(minx), jnp.asarray(miny), jnp.asarray(maxx),
            jnp.asarray(maxy)))
        # conservative: approx >= exact, and only over-counts the 0.1m shell
        assert approx >= exact
        if exact == 0:
            # padded box of +0.15m should bound the overcount
            exact_pad = int(W.barrier_points_in_box_exact(
                scn.barrier_xy, scn.barrier_mask, jnp.asarray(minx - 0.15),
                jnp.asarray(miny - 0.15), jnp.asarray(maxx + 0.15),
                jnp.asarray(maxy + 0.15)))
            assert approx <= exact_pad


def test_static_collision_on_obstacle(scn):
    # box centered on a static obstacle must collide
    corners = np.asarray(scn.static_obs)[0]
    cx, cy = corners.mean(axis=0)
    hit = W.static_obstacle_overlap(scn, jnp.asarray(cx - 1), jnp.asarray(cy - 1),
                                    jnp.asarray(cx + 1), jnp.asarray(cy + 1))
    assert bool(hit)
    # far away box must not
    miss = W.static_obstacle_overlap(scn, jnp.asarray(1e4), jnp.asarray(1e4),
                                     jnp.asarray(1e4 + 1), jnp.asarray(1e4 + 1))
    assert not bool(miss)


def test_dynamic_obstacle_time_window(scn):
    # pick a dynamic vehicle (last 3 obstacles), probe at its first sample
    k = SC.N_PEDESTRIANS  # first dynamic vehicle
    t0 = float(scn.dyn_times[k, 0])
    c = np.asarray(scn.dyn_obs)[k, 0].mean(axis=0)
    hit = W.dynamic_obstacle_overlap(scn, jnp.asarray(t0 + 0.05),
                                     jnp.asarray(c[0] - 1), jnp.asarray(c[1] - 1),
                                     jnp.asarray(c[0] + 1), jnp.asarray(c[1] + 1))
    assert bool(hit)
    # before the obstacle's window: vehicles start at t=0, so probe a
    # pedestrian with positive time offset
    kp = 0
    tp0 = float(scn.dyn_times[kp, 0])
    cp = np.asarray(scn.dyn_obs)[kp, 0].mean(axis=0)
    if tp0 > 0.2:
        early = W.dynamic_obstacle_overlap(
            scn, jnp.asarray(tp0 - 0.2), jnp.asarray(cp[0] - 0.6),
            jnp.asarray(cp[1] - 0.6), jnp.asarray(cp[0] + 0.6),
            jnp.asarray(cp[1] + 0.6))
        assert not bool(early)


def test_query_dynamic_points(scn):
    pts, mask = W.query_dynamic_points(scn, jnp.asarray(0.05))
    assert pts.shape == (SC.MAX_DYNAMIC * 4, 2)
    # dynamic vehicles (t in [0,16]) are active at t=0.05
    assert int(mask.sum()) >= 3 * 4


def test_check_collision_oriented_box(scn):
    # ego box centered on a static obstacle -> collision
    obs = np.asarray(scn.static_obs)[np.asarray(scn.static_mask)][0]
    cx, cy = obs.mean(axis=0)
    hit = W.check_collision(scn, jnp.asarray(0.0), jnp.asarray(cx),
                            jnp.asarray(cy), jnp.asarray(0.3), 3.0, 1.9)
    assert bool(hit)
    # far away from the road entirely -> no collision at any angle
    for th in (0.0, 0.7, 2.0):
        hit = W.check_collision(scn, jnp.asarray(0.0), jnp.asarray(500.0),
                                jnp.asarray(500.0), jnp.asarray(th), 3.0, 1.9)
        assert not bool(hit)
    # batched query shapes broadcast
    cxs = jnp.asarray([cx, 500.0])
    cys = jnp.asarray([cy, 500.0])
    ths = jnp.asarray([0.3, 0.0])
    hits = W.check_collision(scn, jnp.zeros(2), cxs, cys, ths, 3.0, 1.9)
    assert hits.shape == (2,)
    assert bool(hits[0]) and not bool(hits[1])


def test_check_collision_matches_aabb_probe_at_theta0(scn):
    # at theta=0 an oriented square box equals the AABB probe on barriers
    pts = np.asarray(scn.barrier_xy)
    c = pts[1234]
    half = 0.8
    cnt = int(W.barrier_points_in_box_exact(
        scn.barrier_xy, scn.barrier_mask,
        jnp.asarray(c[0] - half), jnp.asarray(c[1] - half),
        jnp.asarray(c[0] + half), jnp.asarray(c[1] + half)))
    hit = W.check_collision(scn, jnp.asarray(0.0), jnp.asarray(c[0]),
                            jnp.asarray(c[1]), jnp.asarray(0.0),
                            2 * half, 2 * half)
    assert (cnt > 0) == bool(hit)


def test_uniform_time_index_matches_searchsorted():
    """_uniform_time_index (arithmetic guess + exact +-1 fixup) must equal
    np.searchsorted(side="right") on every generator track, including
    exact-knot queries and queries past both ends (the DP probes land
    exactly on dynamic-vehicle track timestamps)."""
    import jax

    scn = SC.make_scenario(seed=2, dtype=jnp.float64)
    times_all = np.asarray(scn.dyn_times)
    lens = np.asarray(scn.dyn_len)
    for k in range(times_all.shape[0]):
        times = times_all[k]
        L = max(int(lens[k]), 1)
        qs = np.concatenate([
            np.linspace(-1.0, times[-1] + 2.0, 997),
            times, times - 1e-10, times + 1e-10,
        ])
        want = np.searchsorted(times, qs, side="right")
        got = np.asarray(jax.vmap(
            lambda q, t=jnp.asarray(times): W._uniform_time_index(t, q))(
                jnp.asarray(qs)))
        # the +-1 exactness contract holds only off the constant padded
        # tail; every caller clips to [0, L-1] (_dyn_polygon_at), where
        # the two agree everywhere
        np.testing.assert_array_equal(np.clip(got, 0, L - 1),
                                      np.clip(want, 0, L - 1),
                                      err_msg=f"track {k}")


def test_dilated_polys_equal_sat_overlap():
    """point_hits_dilated(dilate_polys(P, half), c) must equal the SAT
    predicate convex_overlap_aabb(P, box(c, half)) — same separating
    axes, precomputed (world.DilatedPolys). Fuzz over random convex
    quads, probe points near and far, and degenerate/padded inputs."""
    import jax

    from cilqr_tpu.geometry import convex_overlap_aabb

    rng = np.random.default_rng(7)
    half = 1.1105
    NP_, NQ = 64, 257
    # random convex quads: sorted angles on an ellipse + jitter
    polys = np.zeros((NP_, 4, 2))
    for i in range(NP_):
        ang = np.sort(rng.uniform(0, 2 * np.pi, 4))
        r1, r2 = rng.uniform(0.5, 4.0, 2)
        cx, cy = rng.uniform(-10, 10, 2)
        polys[i] = np.stack([cx + r1 * np.cos(ang), cy + r2 * np.sin(ang)],
                            axis=-1)
    mask = np.ones((NP_, 4), bool)
    # a padded (invalid) polygon and a degenerate (repeated-vertex) one
    mask[0] = False
    polys[1, 2:] = polys[1, :2]
    qx = rng.uniform(-16, 16, NQ)
    qy = rng.uniform(-16, 16, NQ)

    d = W.dilate_polys(jnp.asarray(polys), jnp.asarray(mask), half)
    got = np.asarray(W.point_hits_dilated(
        d, jnp.asarray(qx)[:, None], jnp.asarray(qy)[:, None]))  # [NQ, NP]

    want = np.asarray(jax.vmap(  # over polys
        lambda p, m: convex_overlap_aabb(
            p, m, jnp.asarray(qx) - half, jnp.asarray(qy) - half,
            jnp.asarray(qx) + half, jnp.asarray(qy) + half),
        in_axes=(0, 0), out_axes=-1)(jnp.asarray(polys), jnp.asarray(mask)))

    np.testing.assert_array_equal(got, want)
