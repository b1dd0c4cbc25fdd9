"""End-to-end f32 qualification of the FULL pipeline (VERDICT round-2
item 4): the TPU bench runs f32 DP decisions + f32 corridors + f32 solves,
but round 2 gated f32 only at the solve stage. This gates the whole
benched program, mirroring test_f32_fixture_gate's structure at pipeline
level.

What the measurement showed (2026-08-20, 64 seeds; docs/PERF.md "f32 at
pipeline level"): DP decisions are rock-solid in f32 (64/64 agree with
f64), corridors always build, every lane "converges" — but the solver's
threshold-chaotic subpopulation is LARGER end-to-end than on the round-2
fixture: ~15/64 lanes land in a different basin with f64-evaluated cost
>20% off (two-sided: several lanes come out BETTER). Tightening
rel/abs_cost_tol to 1e-4 does not fix it (forks happen in the iterate
path, not the stop rule), and upcasting the corridor hull internals to
f64 changes nothing — the forks come from ulp-level differences anywhere
in the pipeline. Crucially, the damage is confined to the FAR tail of
the horizon: every collision of every lane (both precisions, including
the cost-catastrophic f32 ones) starts at knot >= 29 except one lane at
knot 6 in BOTH precisions, and the executed near-term horizon re-checks
clean — in the receding-horizon deployment the tail is replanned ~80
times before execution, exactly like the reference's own rel-cost-stop
residuals. PlanOutput.solve_hits (the new per-knot re-check) is how a
caller gates the horizon it actually executes.

Gates:
  A: DP winning-cell agreement on >= 60/64 seeds (measured 64/64);
  B: every corridor knot ok in BOTH precisions;
  C: 100% solver convergence in BOTH precisions;
  D: quality distribution pinned — median |rel cost| < 5% (measured
     ~2.5%), at most 24/64 lanes >5% worse, at most 16/64 lanes >20%
     worse (measured 17/15);
  E: executed-horizon safety — at most 2/64 lanes with any re-check hit
     in the first 25 knots, in BOTH precisions (measured 1, the same
     lane both times);
  F (bench scale, round 4): the near-dirty rate over the bench's FULL
     seed population 0..255 (f32, four B=64 chunks sharing gate A-E's
     compiled program) stays inside the characterized tail, and the
     bench's start perturbation does not create dirt beyond jitter.
     Round-4 reconciliation of BENCH_r03's 71/2048 vs gate E's 1/64
     (/tmp-scale diagnosis now recorded in docs/PERF.md): the dirt is
     SCENARIO-specific, not perturbation-created — unperturbed B=256
     already shows 5/256 (lanes 40/145/156/163/240), the same lanes
     recur across perturbation draws, and per-lane diagnosis shows
     shallow penetrations (0.007-0.3 m, mostly road-barrier grazes; the
     worst, seed 156's 0.3 m static-vehicle graze, reproduces in BOTH
     precisions) left by the reference's rel-cost stopping rule.
"""

import jax
import jax.numpy as jnp
import numpy as np

from cilqr_tpu import costs as C
from cilqr_tpu import pipeline, scenario
from cilqr_tpu import solver as S
from cilqr_tpu.config import PlannerConfig
from cilqr_tpu.types import SolverStatus

SUCCESS = (int(SolverStatus.SUCCESS_GNORM), int(SolverStatus.SUCCESS_ABS_COST),
           int(SolverStatus.SUCCESS_REL_COST))

B = 64


def _run(dtype, np_dt):
    cfg = PlannerConfig()
    scns = scenario.make_scenario_batch(range(B), dtype=dtype)
    scn0 = jax.tree.map(lambda a: a[0], scns)
    lane = pipeline.make_lane_tuple(scn0.left_barrier_xy,
                                    scn0.right_barrier_xy, cfg, np_dt)
    spec = scenario.analytic_road_spec(dtype=np_dt)
    starts = jnp.tile(jnp.asarray([0.0, 0.0, 0.0, 10.0], dtype), (B, 1))
    out = pipeline.plan_batch(scns, starts, cfg, None, lane, spec=spec)
    return cfg, out


def test_full_pipeline_f32_gates():
    cfg, o64 = _run(jnp.float64, np.float64)
    _, o32 = _run(jnp.float32, np.float32)

    # gate A: DP winning-cell agreement, detected through the coarse
    # trajectory (the traceback runs on the table with arithmetic
    # stations, so identical cells => coarse knots equal to f32 rounding
    # ~1e-4 m, while any cell flip moves knots by at least a lateral-grid
    # step ~0.5 m — the 0.05 m threshold separates cleanly)
    dx = np.abs(np.asarray(o32.coarse.x, np.float64)
                - np.asarray(o64.coarse.x)).max(axis=1)
    dy = np.abs(np.asarray(o32.coarse.y, np.float64)
                - np.asarray(o64.coarse.y)).max(axis=1)
    agree = (dx < 0.05) & (dy < 0.05)
    n_agree = int(agree.sum())
    assert n_agree >= 60, (n_agree, np.nonzero(~agree)[0])

    # gate B: corridors
    assert bool(np.asarray(o64.corridors.ok).all())
    assert bool(np.asarray(o32.corridors.ok).all())

    # gate C: convergence
    assert np.isin(np.asarray(o64.solve.status), SUCCESS).all()
    assert np.isin(np.asarray(o32.solve.status), SUCCESS).all(), \
        np.unique(np.asarray(o32.solve.status))

    # gate D: f64-evaluated quality against the f64 pipeline's own
    # goals/constraints
    goals64 = pipeline.coarse_to_states(o64.coarse)
    starts64 = goals64[:, 0]
    goals_t = jax.vmap(S.transform_goals)(goals64, starts64)
    cons64 = C.shrink_and_normalize(
        o64.corridors.planes, o64.corridors.plane_mask,
        o64.corridors.left_planes, o64.corridors.left_segs,
        o64.corridors.left_mask, o64.corridors.right_planes,
        o64.corridors.right_segs, o64.corridors.right_mask,
        cfg.ilqr, cfg.vehicle)

    def eval64(xs, us):
        return jax.vmap(
            lambda x, u, g, c: C.total_cost(x, u, g, c, cfg.ilqr,
                                            cfg.vehicle).total)(
                jnp.asarray(xs, jnp.float64), jnp.asarray(us, jnp.float64),
                goals_t, cons64)

    q64 = np.asarray(eval64(o64.solve.xs, o64.solve.us))
    q32 = np.asarray(eval64(o32.solve.xs, o32.solve.us))
    rel = (q32 - q64) / np.maximum(1.0, np.abs(q64))
    # measured median |rel| ~2.5% — cost surfaces are flat-valleyed and
    # two-sided; gate the median at 5% and the tails below
    assert float(np.median(np.abs(rel[agree]))) < 0.05
    assert int((rel[agree] > 0.05).sum()) <= 24, (
        int((rel[agree] > 0.05).sum()), np.nonzero(rel > 0.05)[0])
    assert int((rel[agree] > 0.20).sum()) <= 16, (
        int((rel[agree] > 0.20).sum()), np.nonzero(rel > 0.20)[0])

    # gate F companion runs in test_bench_population_near_dirty_gate below
    # (B=64-shaped chunks over seeds 0..255).

    # gate E: executed-horizon safety via the re-check. Measured: ALL
    # violations (both precisions, including the cost-catastrophic f32
    # lanes) are confined to the far tail (first hit at knot >= 29 except
    # one lane at knot 6 in BOTH precisions) — the rel-cost stop's
    # reference-faithful residuals, replanned away before execution. The
    # near-term horizon (25 knots = 2.5 s) must re-check clean on all but
    # a bounded handful of lanes, identically across precision. Pinned on
    # PRE-repair hits (pre_hits): the characterized phenomenon, before
    # the round-5 repair loop acts on it.
    near64 = np.asarray(o64.pre_hits)[:, :25].any(axis=1)
    near32 = np.asarray(o32.pre_hits)[:, :25].any(axis=1)
    assert int(near64.sum()) <= 2, np.nonzero(near64)[0]
    assert int(near32.sum()) <= 2, np.nonzero(near32)[0]

    # gate G (round 5): the repair loop closes what it can — every
    # pre-dirty lane is either repaired (output replaced, FINAL near-term
    # re-check clean) or explicitly still_dirty, and the residual is zero
    # on this population in both precisions (measured: the escalating
    # margins + cold restart clear every characterized lane)
    for o in (o64, o32):
        pre = np.asarray(o.pre_hits)[:, :25].any(axis=1)
        rep = np.asarray(o.repaired)
        still = np.asarray(o.still_dirty)
        post = np.asarray(o.solve_hits)[:, :25].any(axis=1)
        np.testing.assert_array_equal(still, post)
        np.testing.assert_array_equal(rep | still, pre)
        assert int(still.sum()) == 0, np.nonzero(still)[0]


def _run_chunk(seeds, dy=None):
    """One B=64 f32 pipeline chunk (same shapes as _run -> same compiled
    program); returns the near-dirty lane count."""
    cfg = PlannerConfig()
    scns = scenario.make_scenario_batch(seeds, dtype=jnp.float32)
    scn0 = jax.tree.map(lambda a: a[0], scns)
    lane = pipeline.make_lane_tuple(scn0.left_barrier_xy,
                                    scn0.right_barrier_xy, cfg, np.float32)
    spec = scenario.analytic_road_spec(dtype=np.float32)
    starts = jnp.tile(jnp.asarray([0.0, 0.0, 0.0, 10.0], jnp.float32),
                      (len(seeds), 1))
    if dy is not None:
        starts = starts.at[:, 1].add(jnp.asarray(dy, jnp.float32))
    out = pipeline.plan_batch(scns, starts, cfg, None, lane, spec=spec)
    near = np.asarray(out.pre_hits)[:, :pipeline.NEAR_TERM_KNOTS]
    return (int(near.any(axis=1).sum()),
            int(np.asarray(out.repaired).sum()),
            int(np.asarray(out.still_dirty).sum()))


def test_bench_population_near_dirty_gate():
    """Gate F: pin the executed-horizon near-dirty rate at bench scale.

    (a) Over the full bench seed population 0..255, unperturbed, the
        near-dirty count per 64-seed chunk stays <= 6 and the total
        <= 14 (measured 5/256 at B=256 width; chunk counts can jitter a
        few lanes through XLA's width-dependent reassociation on the
        threshold-chaotic subpopulation, docs/PERF.md "fp sensitivity").
    (b) The bench's +-0.2 m start perturbation (its exact rng recipe)
        does not CREATE dirt: the perturbed count on the dirtiest chunk
        stays within +3 of its unperturbed count (measured: same lanes,
        +-1 across draws)."""
    stats = [_run_chunk(range(k, k + 64)) for k in (0, 64, 128, 192)]
    counts = [s[0] for s in stats]
    for k, c in zip((0, 64, 128, 192), counts):
        assert c <= 6, (k, c)
    assert sum(counts) <= 14, counts
    # gate G at bench scale: the repair loop accounts for every pre-dirty
    # lane and leaves zero residual over the full seed population
    for k, (pre, rep, still) in zip((0, 64, 128, 192), stats):
        assert rep + still == pre, (k, pre, rep, still)
        assert still == 0, (k, pre, rep, still)

    rng = np.random.default_rng(1)
    dy = rng.uniform(-0.2, 0.2, 64)
    perturbed, rep_p, still_p = _run_chunk(range(128, 192), dy=dy)
    assert perturbed <= counts[2] + 3, (perturbed, counts[2])
    assert still_p == 0, (perturbed, rep_p, still_p)
