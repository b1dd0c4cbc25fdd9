import jax.numpy as jnp
import numpy as np
import pytest

from cilqr_tpu import geometry as G


def test_normalize_angle_matches_reference_semantics():
    # math_utils.cpp:53-59: fmod(angle+pi, 2pi), +2pi if negative, -pi
    xs = np.linspace(-20, 20, 1001)
    ref = np.mod(xs + np.pi, 2 * np.pi) - np.pi
    got = np.asarray(G.normalize_angle(jnp.asarray(xs)))
    np.testing.assert_allclose(got, ref, atol=1e-12)
    assert np.all(got >= -np.pi) and np.all(got < np.pi)


def test_slerp_wraps_shortest_path():
    a = G.slerp(jnp.asarray(3.0), 0.0, jnp.asarray(-3.0), 1.0, 0.5)
    # shortest path from 3 rad to -3 rad crosses pi
    assert abs(float(a)) > 3.0 or abs(abs(float(a)) - np.pi) < 0.3


def test_point_segment_distance():
    d = G.point_segment_distance(0.0, 1.0, -1.0, 0.0, 1.0, 0.0)
    assert float(d) == pytest.approx(1.0)
    # beyond endpoint
    d = G.point_segment_distance(2.0, 1.0, -1.0, 0.0, 1.0, 0.0)
    assert float(d) == pytest.approx(np.sqrt(2.0))


def test_box_corners():
    c = G.box_corners(jnp.asarray(1.0), jnp.asarray(2.0), jnp.asarray(0.0),
                      jnp.asarray(4.0), jnp.asarray(2.0))
    assert c.shape == (4, 2)
    np.testing.assert_allclose(np.asarray(c),
                               [[3, 3], [-1, 3], [-1, 1], [3, 1]], atol=1e-12)


def test_convex_overlap_aabb():
    # unit square polygon at origin vs boxes
    poly = jnp.asarray([[0, 0], [1, 0], [1, 1], [0, 1.0]])
    mask = jnp.ones((4,), bool)
    hit = G.convex_overlap_aabb(poly, mask, jnp.asarray(0.5), jnp.asarray(0.5),
                                jnp.asarray(2.0), jnp.asarray(2.0))
    assert bool(hit)
    miss = G.convex_overlap_aabb(poly, mask, jnp.asarray(1.5), jnp.asarray(1.5),
                                 jnp.asarray(2.0), jnp.asarray(2.0))
    assert not bool(miss)
    # rotated diamond separating-axis case: close but not overlapping
    diamond = jnp.asarray([[2.2, 1.0], [3.2, 2.0], [2.2, 3.0], [1.2, 2.0]])
    miss2 = G.convex_overlap_aabb(diamond, mask, jnp.asarray(0.0), jnp.asarray(0.0),
                                  jnp.asarray(1.5), jnp.asarray(1.0))
    assert not bool(miss2)
    hit2 = G.convex_overlap_aabb(diamond, mask, jnp.asarray(0.0), jnp.asarray(0.0),
                                 jnp.asarray(1.8), jnp.asarray(1.8))
    assert bool(hit2)
    # masked-out polygon never overlaps
    none = G.convex_overlap_aabb(poly, jnp.zeros((4,), bool), jnp.asarray(0.0),
                                 jnp.asarray(0.0), jnp.asarray(2.0), jnp.asarray(2.0))
    assert not bool(none)


def _hull_scipy(pts):
    from scipy.spatial import ConvexHull

    h = ConvexHull(pts)
    return pts[h.vertices]  # CCW


@pytest.mark.parametrize("seed", range(8))
def test_convex_hull_masked_random(seed):
    rng = np.random.default_rng(seed)
    K = 32
    n = rng.integers(5, K)
    pts = rng.normal(size=(n, 2)) * 10
    pad = np.zeros((K - n, 2))
    full = np.concatenate([pts, pad])
    mask = np.arange(K) < n
    hull, hmask, count = G.convex_hull_masked(jnp.asarray(full), jnp.asarray(mask))
    got = np.asarray(hull)[np.asarray(hmask)]
    want = _hull_scipy(pts)
    assert int(count) == len(want)
    # same vertex set (rotation of order allowed); compare as sets
    got_sorted = got[np.lexsort((got[:, 1], got[:, 0]))]
    want_sorted = want[np.lexsort((want[:, 1], want[:, 0]))]
    np.testing.assert_allclose(got_sorted, want_sorted, atol=1e-9)


def test_convex_hull_masked_is_ccw():
    rng = np.random.default_rng(42)
    pts = rng.normal(size=(20, 2))
    K = 32
    full = np.concatenate([pts, np.zeros((K - 20, 2))])
    mask = np.arange(K) < 20
    hull, hmask, count = G.convex_hull_masked(jnp.asarray(full), jnp.asarray(mask))
    h = np.asarray(hull)[: int(count)]
    # shoelace must be positive for CCW
    x, y = h[:, 0], h[:, 1]
    area = 0.5 * np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y)
    assert area > 0


def test_convex_hull_duplicates():
    pts = np.array([[0, 0], [1, 0], [1, 1], [0, 1], [0, 0], [1, 0], [0.5, 0.5]])
    K = 16
    full = np.concatenate([pts, np.zeros((K - len(pts), 2))])
    mask = np.arange(K) < len(pts)
    hull, hmask, count = G.convex_hull_masked(jnp.asarray(full), jnp.asarray(mask))
    assert int(count) == 4


def test_sample_polygon_edges():
    """Polygon2d::BuildSamplePoints semantics (polygon2d.cpp:259-271): each
    edge yields multiple+1 points at ratio steps 1/multiple, endpoints
    inclusive (corners appear twice across adjacent edges)."""
    sq = jnp.asarray([[0.0, 0.0], [2.0, 0.0], [2.0, 2.0], [0.0, 2.0]])
    out = np.asarray(G.sample_polygon_edges(sq, 5))
    assert out.shape == (24, 2)
    # first edge: (0,0) -> (2,0) at ratios 0, .2, ..., 1
    np.testing.assert_allclose(out[:6, 0], np.linspace(0, 2, 6), atol=1e-12)
    np.testing.assert_allclose(out[:6, 1], 0.0, atol=1e-12)
    # edge endpoints duplicated: sample 5 (end of edge 0) == sample 6 (start of edge 1)
    np.testing.assert_allclose(out[5], out[6], atol=1e-12)
    # multiple=1 degenerates to each corner twice (ratio 0 and 1)
    out1 = np.asarray(G.sample_polygon_edges(sq, 1))
    assert out1.shape == (8, 2)
    np.testing.assert_allclose(out1[0], [0, 0], atol=1e-12)
    np.testing.assert_allclose(out1[1], [2, 0], atol=1e-12)
    # batched leading dims pass through
    batched = G.sample_polygon_edges(jnp.stack([sq, sq + 1.0]), 5)
    assert batched.shape == (2, 24, 2)


def _rand_convex(rng, n, scale=2.0, center=(0.0, 0.0)):
    """Random convex polygon: hull of n random points (numpy monotone chain
    via angle sort of hull set through G.convex_hull_masked)."""
    pts = rng.normal(size=(n, 2)) * scale + np.asarray(center)
    hull, hmask, cnt = G.convex_hull_masked(jnp.asarray(pts),
                                            jnp.ones(n, bool))
    c = int(cnt)
    return np.asarray(hull)[:c]


def _pad(poly, K):
    p = np.zeros((K, 2))
    m = np.zeros(K, bool)
    p[:len(poly)] = poly
    m[:len(poly)] = True
    return jnp.asarray(p), jnp.asarray(m)


def test_convex_overlap_general_sat_vs_bruteforce(rng):
    # compare SAT verdict with dense point sampling of both polygons
    for trial in range(20):
        a = _rand_convex(rng, 8, center=rng.normal(size=2) * 2)
        b = _rand_convex(rng, 8, center=rng.normal(size=2) * 2)
        pa, ma = _pad(a, 12)
        pb, mb = _pad(b, 12)
        got = bool(G.convex_overlap(pa, ma, pb, mb))
        # brute force: grid over the union bbox, point in both polygons
        lo = np.minimum(a.min(0), b.min(0)) - 0.1
        hi = np.maximum(a.max(0), b.max(0)) + 0.1
        gx, gy = np.meshgrid(np.linspace(lo[0], hi[0], 80),
                             np.linspace(lo[1], hi[1], 80))
        ina = np.asarray(G.point_in_convex_polygon(
            jnp.asarray(gx.ravel()), jnp.asarray(gy.ravel()), pa, ma))
        inb = np.asarray(G.point_in_convex_polygon(
            jnp.asarray(gx.ravel()), jnp.asarray(gy.ravel()), pb, mb))
        brute = bool((ina & inb).any())
        # brute force misses thin overlaps; SAT missing a brute overlap is a bug
        if brute:
            assert got, f"trial {trial}: SAT says no overlap, sampling found one"


def test_convex_overlap_disjoint_and_invalid():
    sq = np.array([[0, 0], [1, 0], [1, 1], [0, 1.0]])
    pa, ma = _pad(sq, 8)
    pb, mb = _pad(sq + 5.0, 8)
    assert not bool(G.convex_overlap(pa, ma, pb, mb))
    assert bool(G.convex_overlap(pa, ma, pa, ma))
    # touching edge counts as overlap (closed sets)
    pc, mc = _pad(sq + np.array([1.0, 0.0]), 8)
    assert bool(G.convex_overlap(pa, ma, pc, mc))
    # fully-invalid polygon never overlaps
    assert not bool(G.convex_overlap(pa, ma, pb, jnp.zeros(8, bool)))


def test_point_in_convex_polygon_windings():
    sq_ccw = np.array([[0, 0], [2, 0], [2, 2], [0, 2.0]])
    sq_cw = sq_ccw[::-1].copy()
    for sq in (sq_ccw, sq_cw):
        p, m = _pad(sq, 8)
        assert bool(G.point_in_convex_polygon(jnp.asarray(1.0), jnp.asarray(1.0), p, m))
        assert bool(G.point_in_convex_polygon(jnp.asarray(0.0), jnp.asarray(0.0), p, m))  # vertex
        assert bool(G.point_in_convex_polygon(jnp.asarray(1.0), jnp.asarray(0.0), p, m))  # edge
        assert not bool(G.point_in_convex_polygon(jnp.asarray(3.0), jnp.asarray(1.0), p, m))


def test_polygon_distance_point():
    sq = np.array([[0, 0], [2, 0], [2, 2], [0, 2.0]])
    p, m = _pad(sq, 8)
    assert float(G.polygon_distance_point(jnp.asarray(1.0), jnp.asarray(1.0), p, m)) == 0.0
    assert float(G.polygon_distance_point(jnp.asarray(3.0), jnp.asarray(1.0), p, m)) == pytest.approx(1.0)
    assert float(G.polygon_distance_point(jnp.asarray(3.0), jnp.asarray(3.0), p, m)) == pytest.approx(np.sqrt(2))
    assert np.isinf(float(G.polygon_distance_point(jnp.asarray(0.0), jnp.asarray(0.0), p, jnp.zeros(8, bool))))


def test_point_in_oriented_box():
    # box centered (1,1), theta=45deg, length 2sqrt2, width sqrt2/2... use simple:
    th = np.pi / 4
    inside = G.point_in_oriented_box(jnp.asarray(1.0 + np.cos(th)), jnp.asarray(1.0 + np.sin(th)),
                                     1.0, 1.0, th, 2.5, 0.5)
    assert bool(inside)
    outside = G.point_in_oriented_box(jnp.asarray(1.0 - np.sin(th)), jnp.asarray(1.0 + np.cos(th)),
                                      1.0, 1.0, th, 2.5, 0.5)
    assert not bool(outside)
