"""Corridor construction tests: device implementation vs an independent
numpy/scipy oracle following the reference algorithm (corridor.cc:122-263),
plus containment properties."""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial import ConvexHull

from cilqr_tpu import corridor as CR
from cilqr_tpu.config import CorridorConfig

CFG = CorridorConfig()


def oracle_corridor(origin, pts, cfg=CFG):
    """Literal numpy transcription of BuildCorridor (corridor.cc:122-263)."""
    ox, oy = origin
    R = cfg.radius
    filtered = []
    for p in pts:
        dx, dy = p[0] - ox, p[1] - oy
        if abs(dx) > cfg.max_diff_x or abs(dy) > cfg.max_diff_y:
            continue
        if np.hypot(dx, dy) < 1e-10:
            continue
        filtered.append(np.asarray(p, float))
    safe_radius = R
    flip = []
    for p in filtered:
        d = p - np.array([ox, oy])
        n = np.hypot(*d)
        if n < R:
            safe_radius = n
        flip.append(d + 2 * (R - n) * d / n)
    if len(flip) < 4:
        return None
    flip.append(np.zeros(2))
    flip = np.asarray(flip)

    h1 = ConvexHull(flip).vertices  # CCW indices
    vertex_data = []
    origin_pos = -1
    for i, v in enumerate(h1):
        if v == len(filtered):
            origin_pos = i
            vertex_data.append(np.array([ox, oy]))
        else:
            vertex_data.append(filtered[v])
    vertex_data = np.asarray(vertex_data)

    if origin_pos >= 0:
        last = (origin_pos - 1) % len(h1)
        nxt = (origin_pos + 1) % len(h1)
        d = (filtered[h1[last]] + np.array([ox, oy]) + filtered[h1[nxt]]) / 3 \
            - np.array([ox, oy])
        dn = np.hypot(*d)
        interior = 0.99 * safe_radius * d / dn + np.array([ox, oy])
    else:
        interior = np.array([ox, oy])

    h2 = ConvexHull(vertex_data).vertices  # CCW positions into vertex_data
    cons = []
    H2 = len(h2)
    for j in range(H2):
        jp = (j + 1) % H2
        ray = vertex_data[h2[jp]] - vertex_data[h2[j]]
        n = np.array([ray[1], -ray[0]])
        n = n / np.hypot(*n)
        k = h2[j]
        while k != h2[jp]:
            c = (vertex_data[k] - interior) @ n
            cons.append((n[0], n[1], c))
            k = (k + 1) % len(vertex_data)
    cons = np.asarray(cons)

    dual = cons[:, :2] / cons[:, 2:3]
    dh = ConvexHull(dual).vertices[::-1]  # clockwise
    dv = dual[dh]
    poly = []
    for i in range(len(dv)):
        ip = (i + 1) % len(dv)
        ray = dv[ip] - dv[i]
        c = ray[1] * dv[i][0] - ray[0] * dv[i][1]
        poly.append([interior[0] + ray[1] / c, interior[1] - ray[0] / c])
    poly = np.asarray(poly)
    planes = []
    for i in range(len(poly)):
        ip = (i + 1) % len(poly)
        ray = poly[ip] - poly[i]
        a, b = -ray[1], ray[0]
        c = a * poly[i][0] + b * poly[i][1]
        planes.append((a, b, c))
    return np.asarray(planes), poly, interior


def _norm_planes(planes):
    """Scale planes to unit (a,b) and sort by angle for set comparison."""
    ab = np.hypot(planes[:, 0], planes[:, 1])
    p = planes / ab[:, None]
    ang = np.arctan2(p[:, 1], p[:, 0])
    order = np.argsort(ang)
    return p[order]


def _device_corridor(origin, pts, cfg=CFG, K=64):
    arr = np.zeros((K, 2))
    arr[: len(pts)] = pts
    mask = np.arange(K) < len(pts)
    planes, pmask, poly, polymask, ok = CR.build_corridor(
        jnp.asarray(float(origin[0])), jnp.asarray(float(origin[1])),
        jnp.asarray(arr), jnp.asarray(mask), cfg, cfg.max_constraints)
    planes = np.asarray(planes)[np.asarray(pmask)]
    poly = np.asarray(poly)[np.asarray(polymask)]
    return planes, poly, bool(ok)


@pytest.mark.parametrize("seed", range(6))
def test_corridor_matches_oracle_random(seed):
    rng = np.random.default_rng(seed)
    # random obstacle points around origin + a surrounding box (like the
    # reference's synthetic box samples)
    n = rng.integers(6, 30)
    pts = list(rng.normal(size=(n, 2)) * 8)
    box = np.array([[10, 10], [10, -10], [-10, -10], [-10, 10.0]])
    pts += [box[i] for i in range(4)]
    origin = (0.0, 0.0)

    got_planes, got_poly, ok = _device_corridor(origin, pts)
    want = oracle_corridor(origin, pts)
    assert want is not None and ok
    want_planes, want_poly, interior = want

    gp = _norm_planes(got_planes)
    wp = _norm_planes(want_planes)
    assert gp.shape == wp.shape, f"{gp.shape} vs {wp.shape}"
    np.testing.assert_allclose(gp, wp, atol=1e-6)


def test_corridor_origin_inside():
    rng = np.random.default_rng(11)
    pts = list(rng.normal(size=(20, 2)) * 10 + 3)
    pts += [[15, 15], [15, -15], [-15, -15], [-15, 15]]
    planes, poly, ok = _device_corridor((0.0, 0.0), pts)
    assert ok
    # origin satisfies all half-planes
    assert np.all(planes[:, 2] - 0 * planes[:, 0] - 0 * planes[:, 1] >= -1e-9)


def test_corridor_excludes_seed_points():
    rng = np.random.default_rng(5)
    pts = list(rng.normal(size=(15, 2)) * 6)
    pts += [[12, 12], [12, -12], [-12, -12], [-12, 12]]
    planes, poly, ok = _device_corridor((0.0, 0.0), pts)
    assert ok
    # no seed point strictly inside the corridor
    for p in pts:
        g = planes[:, 0] * p[0] + planes[:, 1] * p[1] - planes[:, 2]
        assert g.max() >= -1e-6, f"seed point {p} strictly inside corridor"


def test_too_few_points_fails():
    pts = [[1.0, 1.0], [2.0, 2.0]]
    planes, poly, ok = _device_corridor((0.0, 0.0), pts)
    assert not ok


def test_lane_constraints_orientation():
    # straight road: left barrier at y=+2.5, right at y=-6 (station order +x)
    xs = np.arange(0, 100, 0.1)
    left = np.stack([xs, np.full_like(xs, 2.5)], axis=-1)
    right = np.stack([xs, np.full_like(xs, -6.0)], axis=-1)
    lp, lsg, lm, rp, rsg, rm = CR.lane_constraints(left, right, CFG)
    lp = lp[lm]
    rp = rp[rm]
    # interior point (0,0) must satisfy both: a x + b y <= c
    assert np.all(lp[:, 2] >= -1e-9)
    assert np.all(rp[:, 2] >= -1e-9)
    # a point above the left boundary violates the left constraint
    g = lp[:, 0] * 50 + lp[:, 1] * 5.0 - lp[:, 2]
    assert np.all(g > 0)
    # segments ~5 m long
    seglen = np.hypot(*(lsg[lm][:, 1] - lsg[lm][:, 0]).T)
    assert np.all(seglen >= 4.9)


def test_multiple_sample_seed_points():
    """is_multiple_sample=True samples obstacle + box edges 5x
    (environment.cpp:161,178; corridor.cc:110): all single-sample seeds are
    a subset of the multi-sample seeds, and the corridor built from them
    still contains the pose."""
    import dataclasses

    from cilqr_tpu import scenario as SC

    scn = SC.make_scenario(0, dtype=jnp.float64)
    cfg1 = CFG
    cfg5 = dataclasses.replace(CFG, is_multiple_sample=True, max_points=416)
    x, y, th, t = (jnp.asarray(5.0), jnp.asarray(0.0),
                   jnp.asarray(0.0), jnp.asarray(0.0))
    p1, m1 = CR.corridor_seed_points(scn, x, y, th, t, cfg1, cfg1.max_points)
    p5, m5 = CR.corridor_seed_points(scn, x, y, th, t, cfg5, cfg5.max_points)
    assert int(m5.sum()) > int(m1.sum())
    s1 = {tuple(np.round(p, 9)) for p in np.asarray(p1)[np.asarray(m1)]}
    s5 = {tuple(np.round(p, 9)) for p in np.asarray(p5)[np.asarray(m5)]}
    assert s1 <= s5
    planes, pmask, poly, polymask, ok = CR.build_corridor(
        x, y, p5, m5, cfg5, cfg5.max_constraints)
    assert bool(ok)
    pl = np.asarray(planes)[np.asarray(pmask)]
    # pose strictly inside every half-plane a*x + b*y <= c
    assert np.all(pl[:, 0] * 5.0 + pl[:, 1] * 0.0 <= pl[:, 2] + 1e-9)


def test_hull_max_overflow_flags_not_silently_truncates():
    """build_corridor truncates the hull-1 vertex set to
    CorridorConfig.hull_max=32 and must flag ok=False when hull 1
    actually exceeds that (corridor.py compacted-width optimization; the
    reference's dynamic std::vector has no such limit, corridor.cc:184).
    Seed cloud: N points on a circle around the origin — the sphere flip
    maps them onto another circle, so ALL of them are hull-1 vertices."""
    def circle(n, r=8.0):
        ang = np.linspace(0.0, 2 * np.pi, n, endpoint=False)
        return np.stack([r * np.cos(ang), r * np.sin(ang)], axis=-1)

    # overflow case: 40 hull-1 vertices > hull_max=32 -> flagged
    pts40 = circle(40)
    _, _, ok40 = _device_corridor((0.0, 0.0), pts40)
    assert not ok40, "hull_max overflow must flag ok=False"
    # independent witness that hull 1 genuinely has > hull_max vertices
    # (the flag fires for a real overflow, not spuriously): scipy hull of
    # the flipped cloud
    d = pts40
    n = np.hypot(d[:, 0], d[:, 1])
    flip = d + 2 * (CFG.radius - n)[:, None] * d / n[:, None]
    flip = np.concatenate([flip, np.zeros((1, 2))])
    assert len(ConvexHull(flip).vertices) > CFG.hull_max

    # 30 points fit hull_max=32 but yield a 30-edge final polygon >
    # max_constraints=24: the plane-cap overflow must ALSO flag (dropping
    # half-planes silently would make the corridor less constrained than
    # computed)
    _, _, ok30 = _device_corridor((0.0, 0.0), circle(30))
    assert not ok30, "max_constraints overflow must flag ok=False"

    # control below every cap: 20 points pass and match the oracle
    pts20 = circle(20)
    got_planes, got_poly, ok20 = _device_corridor((0.0, 0.0), pts20)
    assert ok20
    want_planes, want_poly, _ = oracle_corridor((0.0, 0.0), pts20)
    np.testing.assert_allclose(_norm_planes(got_planes),
                               _norm_planes(want_planes), atol=1e-8)
