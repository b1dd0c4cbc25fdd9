"""Lane-segment window safety (IlqrConfig.lane_window).

The batch-last solver replaces the reference's full per-disc scan over all
lane segments (FindNeastLaneSegment, ilqr_optimizer.cc:605-618) with a
per-knot window of W segments centered on the goal-nearest segment
(solver_blast.cons_to_bl). Selection is identical while the runtime
euclidean-nearest segment stays inside the window; when the trajectory
drifts past a window edge, the argmin lands on the clipped edge slot
(point-segment distance is continuous in index space along a boundary
polyline) and the solver surfaces SolveResult.lane_clipped.

Covered here: (1) the flag's fire/no-fire behavior and its agreement with
the full scan on synthetic drift cases; (2) a tight-arc road (5 m radii,
the corridor.cc:307-320 resampling regime) where the windowed solve must
match the full-scan solve decision-for-decision with no clip flag."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from cilqr_tpu.config import IlqrConfig, PlannerConfig, VehicleParam
from cilqr_tpu.costs import ConstraintSet
from cilqr_tpu.solver_blast import (_bl, _nearest_lane_sel, cons_to_bl,
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


def test_window_clip_flag_fires_on_drift():
    cons, goals_bl = _straight_lane_cons()
    win = cons_to_bl(cons, goals_bl=goals_bl, lane_window=32)
    full = cons_to_bl(cons, goals_bl=None, lane_window=0)
    N, B = 81, 1

    # benign: query at the goals (x=25, segment 5, window interior) —
    # no flag, same selection as the full scan
    cx = jnp.full((N, B), 25.0)
    cy = jnp.zeros((N, B))
    aw, _, _, edge = _nearest_lane_sel(cx, cy, win.lanes[0])
    af, _, _, ef = _nearest_lane_sel(cx, cy, full.lanes[0])
    assert ef is None
    assert not bool(edge.any())
    np.testing.assert_array_equal(np.asarray(aw), np.asarray(af))

    # drifted: query at x=300 (true nearest segment 59) while the window
    # covers [0, 32) — the in-window argmin lands on the clipped edge
    # slot, the flag fires, and the selection is indeed wrong
    cx2 = jnp.full((N, B), 300.0)
    aw2, _, _, edge2 = _nearest_lane_sel(cx2, cy, win.lanes[0])
    af2, _, _, _ = _nearest_lane_sel(cx2, cy, full.lanes[0])
    assert bool(edge2.all())
    assert np.asarray(aw2).max() == 31          # clipped to the edge
    assert np.asarray(af2).min() == 59          # the real nearest
    # window edges that clip off NO real segments never flag: same drift
    # against a window whose high edge is the last valid segment
    consb, goalsb = _straight_lane_cons(goal_x=64 * 5.0 - 10.0)
    winb = cons_to_bl(consb, goals_bl=goalsb, lane_window=32)
    _, _, _, edge3 = _nearest_lane_sel(cx2, cy, winb.lanes[0])
    assert not bool(edge3.any())


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
