"""Full-solve Pallas megakernel (pallas/megasolve.py) vs the batch-last XLA
solver, interpret mode on CPU.

In float64 the megakernel reproduces the XLA solver decision-for-decision
on the real pedestrian_test fixture problems (the float32 TPU path can flip
line-search accepts on threshold lanes through fp reassociation — the same
cross-backend sensitivity documented in docs/PERF.md)."""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cilqr_tpu.config import IlqrConfig, VehicleParam
from cilqr_tpu.costs import ConstraintSet
from cilqr_tpu.pallas.megasolve import solve_batch_mega
from cilqr_tpu.solver_blast import solve_batch_bl

VEH = VehicleParam()
# lane_window=0: the megakernel searches all lane segments (reference
# semantics); decision-exact comparison needs the XLA solver unwindowed
CFG = dataclasses.replace(IlqrConfig(), sweep_backend="xla", lane_window=0)
DT = 0.1
FIXTURE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "benchdata", "problems.npz")


def _fixture_lanes(n, dtype):
    d = np.load(FIXTURE)
    take = lambda k: (jnp.asarray(d[k][:n], dtype)
                      if d[k].dtype != np.bool_ else jnp.asarray(d[k][:n]))
    cons = ConstraintSet(
        corridor_planes=take("corridor_planes"),
        corridor_mask=take("corridor_mask"),
        left_planes=take("left_planes"), left_segs=take("left_segs"),
        left_mask=take("left_mask"), right_planes=take("right_planes"),
        right_segs=take("right_segs"), right_mask=take("right_mask"))
    return take("goals"), take("starts"), cons


@pytest.mark.skipif(not os.path.exists(FIXTURE), reason="no bench fixture")
def test_mega_matches_blast_on_fixture_f64():
    """6 real problems (4-17 iterations), block_nb=8 -> also exercises the
    pad-to-block path (6 lanes padded to 8)."""
    goals, starts, cons = _fixture_lanes(6, jnp.float64)
    res_b = solve_batch_bl(goals, starts, cons, CFG, VEH, DT)
    res_m = solve_batch_mega(goals, starts, cons, CFG, VEH, DT,
                             interpret=True, block_nb=8)
    np.testing.assert_array_equal(np.asarray(res_b.iters),
                                  np.asarray(res_m.iters))
    np.testing.assert_array_equal(np.asarray(res_b.status),
                                  np.asarray(res_m.status))
    np.testing.assert_allclose(np.asarray(res_m.us), np.asarray(res_b.us),
                               atol=1e-8)
    np.testing.assert_allclose(np.asarray(res_m.cost.total),
                               np.asarray(res_b.cost.total), rtol=1e-9)
    # final trajectories satisfy the solver invariants
    assert np.all(np.asarray(res_m.status) != 0)
    np.testing.assert_allclose(np.asarray(res_m.xs[:, 0]),
                               np.asarray(res_b.xs[:, 0]), atol=1e-12)


def test_mega_f32_synthetic_decisions():
    """float32 parity on moderate problems (decision-stable)."""
    import sys
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_native_parity import _problem
    from cilqr_tpu import costs as C

    gs, cs, ss = [], [], []
    for seed in range(4):
        goals, planes, mask, lp, ls, rp, rs, m, start = _problem(seed)
        cons = C.shrink_and_normalize(
            jnp.asarray(planes, jnp.float32), jnp.asarray(mask),
            jnp.asarray(lp, jnp.float32), jnp.asarray(ls, jnp.float32),
            jnp.asarray(m), jnp.asarray(rp, jnp.float32),
            jnp.asarray(rs, jnp.float32), jnp.asarray(m), CFG, VEH)
        gs.append(jnp.asarray(goals, jnp.float32))
        cs.append(cons)
        ss.append(jnp.asarray(start, jnp.float32))
    goals_b = jnp.stack(gs)
    starts_b = jnp.stack(ss)
    cons_b = jax.tree.map(lambda *a: jnp.stack(a), *cs)
    res_b = solve_batch_bl(goals_b, starts_b, cons_b, CFG, VEH, DT)
    res_m = solve_batch_mega(goals_b, starts_b, cons_b, CFG, VEH, DT,
                             interpret=True, block_nb=8)
    np.testing.assert_array_equal(np.asarray(res_b.iters),
                                  np.asarray(res_m.iters))
    np.testing.assert_array_equal(np.asarray(res_b.status),
                                  np.asarray(res_m.status))
    assert np.max(np.abs(np.asarray(res_m.us) - np.asarray(res_b.us))) < 1e-4
