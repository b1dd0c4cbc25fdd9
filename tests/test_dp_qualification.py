"""Qualification gates for the DP fast paths the TPU bench defaults to:
'frenet' collision mode + analytic RoadSpec station evaluation
(world.barrier_hit_road_spec + reference_line.evaluate_station_fields_analytic).

Graduated from round-2 scratch qualification scripts into the suite (where
they rot loudly). The gates, per road family and dtype:

1. Completeness: every 0.1 m-sampled road-barrier point, probed with a
   tiny box, is reported by the finite-extent spec test — the property
   that makes the fast path conservative (it can over-report near arc
   endpoints/joints, never miss a sampled point).
2. Default pedestrian_test road: frenet+spec reproduces the EXACT-mode
   winning cells on 16 seeds in f64 AND f32 — and then the 81-knot
   trajectory bit-exactly (the traceback/output interpolation runs on the
   table in both modes, and the stored layer stations are
   table-independent arithmetic).
3. TIGHT_ROAD (5 m S-curve, the family where the infinite-extent frenet
   stand-in was measured UNSAFE): frenet+spec may diverge from exact only
   conservatively — divergent seeds must pick an equal-or-higher-cost
   plan and must not introduce collisions the exact plan doesn't have
   (reference corner-containment checker, dp_oracle).
4. A pinned witness that the spec-less infinite frenet test really is
   unsafe on TIGHT_ROAD (under-reports barrier hits -> cheaper colliding
   plan), documenting why dp.plan should be given the RoadSpec whenever
   the road recipe is known.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cilqr_tpu import dp as DP
from cilqr_tpu import scenario as SC
from cilqr_tpu import world as W
from cilqr_tpu.config import PlannerConfig

import dp_oracle

CFG = PlannerConfig()
TIGHT_ROAD = (40.0, (180.0, 5.0), 15.0, (-180.0, 5.0), 50.0)
ROADS = {"default": SC.DEFAULT_ROAD, "tight": TIGHT_ROAD}


def _mode_cfg(m):
    return dataclasses.replace(
        CFG, dp=dataclasses.replace(CFG.dp, collision_mode=m))


def _cells(r):
    return (np.asarray(r.sel_s).tolist(), np.asarray(r.sel_l).tolist())


@pytest.mark.parametrize("road_name", ["default", "tight"])
def test_road_spec_test_covers_all_barrier_points(road_name):
    """Conservative-completeness of barrier_hit_road_spec: a tiny probe
    box AT each sampled barrier point must hit (the pad + extended
    extents cover the points' deviation from the ideal offset curves:
    row-0 start sample, joint chords, lerped-theta offsets)."""
    road = ROADS[road_name]
    cl = SC.make_centerline(road)
    both, _, _ = SC.build_road_barriers(cl)
    spec = SC.analytic_road_spec(road=road)
    pts = jnp.asarray(both)
    hit = W.barrier_hit_road_spec(jnp.asarray(1e-6), pts[:, 0], pts[:, 1],
                                  spec)
    missed = int((~np.asarray(hit)).sum())
    assert missed == 0, f"{missed}/{len(both)} barrier points not covered"


@pytest.mark.parametrize("dtype", [jnp.float64, jnp.float32],
                         ids=["f64", "f32"])
def test_fastpath_vs_exact_default_road(dtype):
    """frenet+RoadSpec == exact winning cells (and bit-exact trajectory)
    on 16 pedestrian_test seeds, in the dtype the TPU bench actually
    runs. Any flip means a probe near a boundary/tie moved — investigate,
    don't widen."""
    np_dt = np.float64 if dtype == jnp.float64 else np.float32
    cl = SC.make_centerline()
    barriers = SC.build_road_barriers(cl)
    spec = SC.analytic_road_spec(dtype=np_dt)
    pe = jax.jit(lambda s: DP.plan(s, 0.0, 0.0, 0.0, _mode_cfg("exact"),
                                   None))
    pa = jax.jit(lambda s: DP.plan(s, 0.0, 0.0, 0.0, _mode_cfg("frenet"),
                                   None, spec=spec))
    for seed in range(16):
        scn = SC.make_scenario(seed=seed, cl=cl, barriers=barriers,
                               dtype=dtype)
        re, ra = pe(scn), pa(scn)
        assert _cells(ra) == _cells(re), f"seed {seed}"
        assert np.array_equal(np.asarray(ra.traj.x), np.asarray(re.traj.x))
        assert np.array_equal(np.asarray(ra.traj.y), np.asarray(re.traj.y))
        assert float(ra.min_cost) == pytest.approx(float(re.min_cost),
                                                   rel=1e-6)


@pytest.mark.parametrize("dtype", [jnp.float64, jnp.float32],
                         ids=["f64", "f32"])
def test_fastpath_tight_road_conservative(dtype):
    """On the 5 m S-curve family the finite spec test over-reports near
    arc joints/endpoints, so frenet+spec may pick a different cell path —
    but only a CONSERVATIVE one: equal-or-higher DP cost and no
    collisions the exact plan doesn't have (reference corner-containment
    semantics). At authoring time 6/8 seeds agree exactly and seeds
    {0, 6} diverge conservatively."""
    cl = SC.make_centerline(TIGHT_ROAD)
    barriers = SC.build_road_barriers(cl)
    np_dt = np.float64 if dtype == jnp.float64 else np.float32
    spec = SC.analytic_road_spec(road=TIGHT_ROAD, dtype=np_dt)
    pe = jax.jit(lambda s: DP.plan(s, 0.0, 0.0, 0.0, _mode_cfg("exact"),
                                   None))
    pa = jax.jit(lambda s: DP.plan(s, 0.0, 0.0, 0.0, _mode_cfg("frenet"),
                                   None, spec=spec))
    agree = 0
    for seed in range(8):
        scn = SC.make_scenario(seed=seed, road=TIGHT_ROAD, cl=cl,
                               barriers=barriers, dtype=dtype)
        re, ra = pe(scn), pa(scn)
        if _cells(ra) == _cells(re):
            agree += 1
            continue
        # divergence must be conservative
        assert float(ra.min_cost) >= float(re.min_cost) - 1e-6, f"seed {seed}"
        env = dp_oracle.env_from_scenario(scn)

        def hits(tr):
            return int(env.check_optimization_collision(
                np.asarray(tr.time, np.float64), np.asarray(tr.x, np.float64),
                np.asarray(tr.y, np.float64), np.asarray(tr.theta, np.float64),
                CFG.vehicle).sum())

        assert hits(ra.traj) <= hits(re.traj), f"seed {seed}"
    assert agree >= 6, f"only {agree}/8 tight-road seeds agree with exact"


def test_frenet_without_spec_unsafe_on_tight_road():
    """Pinned witness for the infinite-extent frenet stand-in's blind
    spot (world.barrier_hit_frenet: the probe station's segment is
    extended across the box span): on TIGHT_ROAD seed 2 it under-reports
    road-barrier hits and picks a much cheaper plan that COLLIDES under
    the reference checker, while the exact plan is collision-free. This
    is why dp.plan should be handed the RoadSpec whenever the road recipe
    is known (pipeline/bench do); if this test ever starts failing
    because the spec-less mode became safe, delete it and retire the
    caveat from the docstrings."""
    cl = SC.make_centerline(TIGHT_ROAD)
    barriers = SC.build_road_barriers(cl)
    scn = SC.make_scenario(seed=2, road=TIGHT_ROAD, cl=cl, barriers=barriers,
                           dtype=jnp.float64)
    re = DP.plan(scn, 0.0, 0.0, 0.0, _mode_cfg("exact"), None)
    rf = DP.plan(scn, 0.0, 0.0, 0.0, _mode_cfg("frenet"), None)
    env = dp_oracle.env_from_scenario(scn)

    def hits(tr):
        return int(env.check_optimization_collision(
            np.asarray(tr.time), np.asarray(tr.x), np.asarray(tr.y),
            np.asarray(tr.theta), CFG.vehicle).sum())

    assert hits(re.traj) == 0
    assert hits(rf.traj) > 0, ("spec-less frenet mode no longer under-"
                               "reports on the tight road — retire the "
                               "caveat (see docstring)")
    assert float(rf.min_cost) < float(re.min_cost)
