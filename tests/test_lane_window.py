"""Lane-segment window safety (IlqrConfig.lane_window).

The batch-last solver replaces the reference's full per-disc scan over all
lane segments (FindNeastLaneSegment, ilqr_optimizer.cc:605-618) with a
per-knot window of W segments centered on the goal-nearest segment
(solver_blast.cons_to_bl). Selection is identical while the runtime
euclidean-nearest segment stays inside the window; when the trajectory
drifts past a window edge, the argmin lands on the clipped edge slot
(point-segment distance is continuous in index space along a boundary
polyline) and the solver surfaces SolveResult.lane_clipped.

Since cfcad79 the search runs ONCE over a stacked disc axis
(_nearest_lane_sel_discs: cx, cy [D, N, B] -> per-disc selections
[D, N, B] + per-disc edge flag). Covered here: (1) fire/no-fire of the
stacked edge flag and agreement with the full scan; (2) the per-disc
ASYMMETRIC edge semantics `(idx==0)&lo | (idx==S-1)&hi`
(solver_blast.py) — an argmin on a window edge flags only the discs that
land on an edge that actually clips off real segments, which the old
single-disc API could not express; (3) bitwise identity of the stacked
search vs per-disc calls; (4) a tight-arc road (5 m radii, the
corridor.cc:307-320 resampling regime) where the windowed solve must
match the full-scan solve decision-for-decision with no clip flag."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from cilqr_tpu.config import IlqrConfig, PlannerConfig, VehicleParam
from cilqr_tpu.costs import ConstraintSet
from cilqr_tpu.solver_blast import (_bl, _nearest_lane_sel_discs, cons_to_bl,
                                    solve_batch_bl)

VEH = VehicleParam()


def _straight_lane_cons(S=64, N=81, B=1, seg_len=5.0, goal_x=25.0):
    """One straight boundary at y=+4, segment i spanning x in
    [i*seg_len, (i+1)*seg_len); planes carry the segment index in 'a' so
    the selected segment is identifiable."""
    xs = np.arange(S + 1) * seg_len
    segs = np.zeros((S, 2, 2))
    segs[:, 0, 0] = xs[:-1]
    segs[:, 1, 0] = xs[1:]
    segs[:, :, 1] = 4.0
    planes = np.zeros((S, 3))
    planes[:, 0] = np.arange(S)
    mask = np.ones(S, bool)
    side = (jnp.asarray(planes)[None].repeat(B, 0),
            jnp.asarray(segs)[None].repeat(B, 0),
            jnp.asarray(mask)[None].repeat(B, 0))
    cons = ConstraintSet(
        corridor_planes=jnp.zeros((B, N, 4, 3)),
        corridor_mask=jnp.zeros((B, N, 4), bool),
        left_planes=side[0], left_segs=side[1], left_mask=side[2],
        right_planes=side[0], right_segs=side[1], right_mask=side[2])
    goals = np.zeros((B, N, 6))
    goals[..., 0] = goal_x
    return cons, _bl(jnp.asarray(goals))


def _discs(*xs_per_disc, N=81, B=1):
    """Per-disc constant query positions -> cx, cy [D, N, B]."""
    D = len(xs_per_disc)
    cx = jnp.asarray(xs_per_disc, jnp.float64)[:, None, None]
    return (jnp.broadcast_to(cx, (D, N, B)), jnp.zeros((D, N, B)))


def test_window_clip_flag_fires_on_drift():
    cons, goals_bl = _straight_lane_cons()
    win = cons_to_bl(cons, goals_bl=goals_bl, lane_window=32)
    full = cons_to_bl(cons, goals_bl=None, lane_window=0)

    # benign: all 5 discs query at the goals (x=25, segment 5, window
    # interior) — no flag, same selection as the full scan
    cx, cy = _discs(*([25.0] * 5))
    aw, _, _, edge = _nearest_lane_sel_discs(cx, cy, win.lanes[0])
    af, _, _, ef = _nearest_lane_sel_discs(cx, cy, full.lanes[0])
    assert ef is None
    assert not bool(edge.any())
    np.testing.assert_array_equal(np.asarray(aw), np.asarray(af))

    # drifted: all discs at x=300 (true nearest segment 59) while the
    # window covers [0, 32) — the in-window argmin lands on the clipped
    # edge slot, the flag fires on every disc, and the selection is wrong
    cx2, _ = _discs(*([300.0] * 5))
    aw2, _, _, edge2 = _nearest_lane_sel_discs(cx2, cy, win.lanes[0])
    af2, _, _, _ = _nearest_lane_sel_discs(cx2, cy, full.lanes[0])
    assert bool(edge2.all())
    assert np.asarray(aw2).max() == 31          # clipped to the edge
    assert np.asarray(af2).min() == 59          # the real nearest
    # window edges that clip off NO real segments never flag: same drift
    # against a window whose high edge is the last valid segment
    consb, goalsb = _straight_lane_cons(goal_x=64 * 5.0 - 10.0)
    winb = cons_to_bl(consb, goals_bl=goalsb, lane_window=32)
    _, _, _, edge3 = _nearest_lane_sel_discs(cx2, cy, winb.lanes[0])
    assert not bool(edge3.any())


def test_per_disc_asymmetric_clip():
    """Discs landing on the SAME window's two edges flag independently,
    and only on an edge that clips off real segments.

    Window [0, 32) of 64 valid segments: lo=False (nothing clipped below
    index 0), hi=True. A disc drifted LEFT of segment 0 argmins on slot 0
    — a true global nearest, no flag. A disc drifted far RIGHT argmins on
    slot 31 — clipped, flags. Mirrored window [32, 64): lo=True, hi=False
    — the flags swap sides."""
    N, B = 81, 1
    # window [0, 32): goal at x=25 -> quantized start 0
    cons, goals_bl = _straight_lane_cons(goal_x=25.0)
    win = cons_to_bl(cons, goals_bl=goals_bl, lane_window=32)
    # disc 0 left-drifted, disc 1 right-drifted, disc 2 interior
    cx, cy = _discs(-50.0, 300.0, 25.0)
    a, _, _, edge = _nearest_lane_sel_discs(cx, cy, win.lanes[0])
    edge = np.asarray(edge)
    a = np.asarray(a)
    assert not edge[0].any()          # idx==0 but lo=False: no clip
    assert a[0].max() == 0            # and it's the true nearest segment
    assert edge[1].all()              # idx==W-1 with hi=True: clipped
    assert a[1].min() == 31
    assert not edge[2].any()          # interior

    # mirrored window [32, 64): goal at x=310 -> quantized start 32
    consb, goalsb = _straight_lane_cons(goal_x=64 * 5.0 - 10.0)
    winb = cons_to_bl(consb, goals_bl=goalsb, lane_window=32)
    # disc 0 left-drifted (now clipped), disc 1 right-drifted past the
    # LAST real segment (idx==W-1 but hi=False: true nearest, no flag)
    cxb, cyb = _discs(-50.0, 1000.0, 310.0)
    ab, _, _, edgeb = _nearest_lane_sel_discs(cxb, cyb, winb.lanes[0])
    edgeb = np.asarray(edgeb)
    ab = np.asarray(ab)
    assert edgeb[0].all()             # idx==0 with lo=True: clipped
    assert ab[0].max() == 32
    assert not edgeb[1].any()         # idx==W-1 but hi=False: no clip
    assert ab[1].min() == 63          # the true last segment
    assert not edgeb[2].any()


def test_reduce_method_matches_onehot_bitwise():
    """IlqrConfig.lane_search='reduce' (one variadic lax.reduce with a
    lexicographic (d, idx) key) must select bitwise-identically to the
    argmin+one-hot formulation — including exact-tie cases (first index
    wins) and all-masked columns (index 0's plane values) — windowed and
    full-scan."""
    cons, goals_bl = _straight_lane_cons()
    win = cons_to_bl(cons, goals_bl=goals_bl, lane_window=32)
    full = cons_to_bl(cons, goals_bl=None, lane_window=0)
    rng = np.random.default_rng(7)
    cx = jnp.asarray(rng.uniform(-60.0, 340.0, size=(5, 81, 1)))
    # y=4 boundary: put some queries exactly equidistant from two
    # segments (x on a shared endpoint) to force distance ties
    cx = cx.at[0, :10, 0].set(jnp.arange(10, dtype=cx.dtype) * 5.0)
    cy = jnp.asarray(rng.uniform(-2.0, 6.0, size=(5, 81, 1)))
    for lane in (win.lanes[0], full.lanes[0]):
        r = _nearest_lane_sel_discs(cx, cy, lane, method="reduce")
        o = _nearest_lane_sel_discs(cx, cy, lane, method="onehot")
        for vr, vo in zip(r, o):
            if vr is None:
                assert vo is None
            else:
                np.testing.assert_array_equal(np.asarray(vr), np.asarray(vo))


def test_lane_search_methods_same_solve():
    """Full batched solves under the two lane_search methods are
    bitwise-equal (same selected planes -> same downstream fp ops)."""
    import sys

    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import _synthetic_problem

    cfg, goals, starts, cons = _synthetic_problem(batch=4, n_knots=21,
                                                  dtype=jnp.float64)
    res_r = solve_batch_bl(goals, starts, cons,
                           dataclasses.replace(cfg.ilqr,
                                               lane_search="reduce"),
                           cfg.vehicle, cfg.delta_t)
    res_o = solve_batch_bl(goals, starts, cons,
                           dataclasses.replace(cfg.ilqr,
                                               lane_search="onehot"),
                           cfg.vehicle, cfg.delta_t)
    np.testing.assert_array_equal(np.asarray(res_r.us), np.asarray(res_o.us))
    np.testing.assert_array_equal(np.asarray(res_r.status),
                                  np.asarray(res_o.status))
    np.testing.assert_array_equal(np.asarray(res_r.iters),
                                  np.asarray(res_o.iters))


def test_stacked_search_matches_per_disc_calls():
    """The one-shot [D, N, B] search is bitwise-identical to D separate
    single-disc calls (the cfcad79 batching claim), windowed and full."""
    cons, goals_bl = _straight_lane_cons()
    win = cons_to_bl(cons, goals_bl=goals_bl, lane_window=32)
    full = cons_to_bl(cons, goals_bl=None, lane_window=0)
    rng = np.random.default_rng(0)
    cx = jnp.asarray(rng.uniform(-60.0, 340.0, size=(5, 81, 1)))
    cy = jnp.asarray(rng.uniform(-2.0, 6.0, size=(5, 81, 1)))
    for lane in (win.lanes[0], full.lanes[0]):
        a, b, c, edge = _nearest_lane_sel_discs(cx, cy, lane)
        for d in range(5):
            ad, bd, cd, ed = _nearest_lane_sel_discs(
                cx[d:d + 1], cy[d:d + 1], lane)
            np.testing.assert_array_equal(np.asarray(a[d]), np.asarray(ad[0]))
            np.testing.assert_array_equal(np.asarray(b[d]), np.asarray(bd[0]))
            np.testing.assert_array_equal(np.asarray(c[d]), np.asarray(cd[0]))
            if edge is not None:
                np.testing.assert_array_equal(np.asarray(edge[d]),
                                              np.asarray(ed[0]))


# long enough for the obstacle samplers (dynamic vehicles need
# cl.n > 1100, scenario._random_ref_indices back_idx=1000)
TIGHT_ROAD = (40.0, (180.0, 5.0), 15.0, (-180.0, 5.0), 50.0)


def test_tight_arc_road_window_matches_full_scan():
    """On a 5 m-radius S-curve road (the corridor.cc lane resampling's
    tightest regime in the reference recipe), the W=32 windowed solve must
    reproduce the full-scan solve decision-for-decision, with the clip
    flag clean."""
    from cilqr_tpu import pipeline as P
    from cilqr_tpu import scenario as SC
    from cilqr_tpu.costs import shrink_and_normalize

    cfg = PlannerConfig()
    scn = SC.make_scenario(seed=3, road=TIGHT_ROAD, n_ped=2, n_dyn_veh=1,
                           n_static=1, dtype=jnp.float64)
    out = P.plan(scn, (0.0, 0.0, 0.0, 6.0), cfg)
    assert bool(out.dp_ok)
    cors = out.corridors
    cons1 = shrink_and_normalize(
        cors.planes, cors.plane_mask, cors.left_planes, cors.left_segs,
        cors.left_mask, cors.right_planes, cors.right_segs,
        cors.right_mask, cfg.ilqr, cfg.vehicle)
    goals = P.coarse_to_states(out.coarse)
    start = jnp.asarray([0.0, 0.0, 0.0, 6.0, 0.0, 0.0], jnp.float64)
    gb = goals[None]
    sb = start[None]
    cb = jax.tree.map(lambda a: a[None], cons1)

    res_win = solve_batch_bl(gb, sb, cb, cfg.ilqr, VEH, cfg.delta_t)
    cfg_full = dataclasses.replace(cfg.ilqr, lane_window=0)
    res_full = solve_batch_bl(gb, sb, cb, cfg_full, VEH, cfg.delta_t)

    assert not bool(np.asarray(res_win.lane_clipped).any())
    np.testing.assert_array_equal(np.asarray(res_win.status),
                                  np.asarray(res_full.status))
    np.testing.assert_array_equal(np.asarray(res_win.iters),
                                  np.asarray(res_full.iters))
    np.testing.assert_allclose(np.asarray(res_win.us),
                               np.asarray(res_full.us), atol=1e-9)
