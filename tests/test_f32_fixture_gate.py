"""Fixture-level precision qualification gates (VERDICT round-1 item 4).

Round 1 qualified f32 on one synthetic problem; the fixture-level truth is
more interesting. The solver's accept/stop rules are hard thresholds on
cost differences (reference semantics, ilqr_optimizer.cc:246-293), and a
subpopulation of the 256 real pedestrian_test problems is DECISION-CHAOTIC:
an ulp-level perturbation (precision, batch width via XLA reassociation,
backend) flips a threshold comparison, the iterate path forks, and the
converged point moves within the solution valley — sometimes far along a
barrier cliff (measured: 13/256 lanes flip between the f64 JAX solve and
the f64 native oracle; one lane's converged cost spans 610..125k across
ulp-equivalent runs). This is inherent to the reference's algorithm, not a
defect of any implementation of it, so the gates are:

  gate 1: 100% of lanes converge in f32;
  gate 2: f64 vs the native oracle — decisions match on >= 90% of lanes
          and control deviation < 1e-3 there (the BASELINE parity gate,
          extended from round 1's 4 synthetic seeds to all 256 fixture
          problems; measured: 243/256 stable, dev <= 8.3e-5);
  gate 3: flipped-lane counts are pinned (f64-vs-oracle <= 20,
          f32-vs-f64 <= 96; measured 13 and 77);
  gate 4: f32 solution QUALITY, i.e. the f64-evaluated total cost of the
          f32 solution vs the f64 solution's: at most 10% of lanes may be
          >5% worse and at most 6% of lanes >20% worse (measured: 10/256
          and <=8/256) — quality jitter is two-sided (29 lanes come out
          BETTER in f32), a systematic precision bug is not.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cilqr_tpu import costs as C
from cilqr_tpu import solver as S
from cilqr_tpu.batch import solve_batch
from cilqr_tpu.config import PlannerConfig
from cilqr_tpu.costs import ConstraintSet, trim_constraints
from cilqr_tpu.native import bindings as NB
from cilqr_tpu.types import SolverStatus

FIXTURE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "benchdata", "problems.npz")

SUCCESS = (int(SolverStatus.SUCCESS_GNORM), int(SolverStatus.SUCCESS_ABS_COST),
           int(SolverStatus.SUCCESS_REL_COST))


def _load(dtype):
    d = np.load(FIXTURE)
    cons = ConstraintSet(
        corridor_planes=jnp.asarray(d["corridor_planes"], dtype),
        corridor_mask=jnp.asarray(d["corridor_mask"]),
        left_planes=jnp.asarray(d["left_planes"], dtype),
        left_segs=jnp.asarray(d["left_segs"], dtype),
        left_mask=jnp.asarray(d["left_mask"]),
        right_planes=jnp.asarray(d["right_planes"], dtype),
        right_segs=jnp.asarray(d["right_segs"], dtype),
        right_mask=jnp.asarray(d["right_mask"]))
    return (jnp.asarray(d["goals"], dtype), jnp.asarray(d["starts"], dtype),
            trim_constraints(cons))


@pytest.mark.skipif(not os.path.exists(FIXTURE),
                    reason="bench fixture not generated")
def test_precision_gates_on_full_fixture():
    cfg = PlannerConfig()
    ilqr, veh, dt = cfg.ilqr, cfg.vehicle, cfg.delta_t

    g64, s64, c64 = _load(jnp.float64)
    r64 = solve_batch(g64, s64, c64, ilqr, veh, dt, backend="blast")
    g32, s32, c32 = _load(jnp.float32)
    r32 = solve_batch(g32, s32, c32, ilqr, veh, dt, backend="blast")
    B = g64.shape[0]

    st64 = np.asarray(r64.status)
    st32 = np.asarray(r32.status)
    assert np.isin(st64, SUCCESS).all()
    # gate 1: f32 convergence
    assert np.isin(st32, SUCCESS).all(), np.unique(st32)

    # ---- f64 vs native oracle
    ref_us = np.zeros((B,) + r64.us.shape[1:])
    ref_status = np.zeros(B, int)
    ref_iters = np.zeros(B, int)
    for i in range(B):
        goals_t = np.asarray(S.transform_goals(g64[i], s64[i]))
        c = jax.tree.map(lambda a: np.asarray(a[i]), c64)
        ref = NB.ref_solve(
            goals_t, c.corridor_planes, c.corridor_mask, c.left_planes,
            c.left_segs, c.left_mask, c.right_planes, c.right_segs,
            c.right_mask, ilqr, veh, dt)
        ref_us[i] = ref.us
        ref_status[i] = ref.status
        ref_iters[i] = ref.iters
    assert np.isin(ref_status, SUCCESS).all()

    stable = ((st64 == ref_status)
              & (np.asarray(r64.iters) == ref_iters))
    dev64 = np.abs(np.asarray(r64.us) - ref_us).max(axis=(1, 2))
    # gate 2: decision-stable majority meets the BASELINE control gate
    assert stable.sum() >= int(0.90 * B), int(stable.sum())
    assert dev64[stable].max() < 1e-3, float(dev64[stable].max())
    # gate 3a: oracle flips pinned
    assert int((~stable).sum()) <= 20, np.nonzero(~stable)[0]

    # ---- f32 vs f64 (production precision)
    flips32 = int((((st32 != st64)
                    | (np.asarray(r32.iters) != np.asarray(r64.iters)))
                   ).sum())
    # gate 3b: f32 decision flips pinned
    assert flips32 <= 96, flips32

    # gate 4: quality distribution — f64-evaluate both solutions
    goals_t = jax.vmap(S.transform_goals)(g64, s64)

    def eval64(xs, us):
        return jax.vmap(
            lambda x, u, g, c: C.total_cost(x, u, g, c, ilqr, veh).total)(
                jnp.asarray(xs, jnp.float64), jnp.asarray(us, jnp.float64),
                goals_t, c64)

    q64 = np.asarray(eval64(r64.xs, r64.us))
    q32 = np.asarray(eval64(r32.xs, r32.us))
    rel = (q32 - q64) / np.maximum(1.0, np.abs(q64))
    assert int((rel > 0.05).sum()) <= int(0.10 * B), (
        int((rel > 0.05).sum()), np.nonzero(rel > 0.05)[0])
    assert int((rel > 0.20).sum()) <= int(0.06 * B), (
        int((rel > 0.20).sum()), np.nonzero(rel > 0.20)[0])
