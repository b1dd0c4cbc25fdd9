"""Fused Pallas corridor+lane cost-stack kernel (pallas/coststack.py) vs
the XLA formulation in solver_blast._cost_stack_bl.

Run in interpret mode on the CPU backend (like tests/test_pallas_sweep.py)
— the same program text Mosaic compiles on TPU, executed by XLA, so the
math/selection logic is validated host-side; bitwise behavior on real
hardware is additionally covered by the decision-parity fixture gates."""

import dataclasses
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, "/root/repo")

from cilqr_tpu.config import PlannerConfig
from cilqr_tpu.solver_blast import (_bl, _cost_stack_bl, cons_to_bl,
                                    solve_batch_bl)

from __graft_entry__ import _synthetic_problem


def _problem(B=128, n_knots=21, dtype=jnp.float32):
    cfg, goals, starts, cons = _synthetic_problem(B, n_knots, dtype)
    goals_bl = _bl(goals)
    cbl = cons_to_bl(cons, goals_bl=goals_bl, lane_window=4)
    # a plausible iterate: the goals themselves plus a wiggle
    rng = np.random.default_rng(0)
    xs = goals_bl + jnp.asarray(
        rng.normal(0, 0.05, goals_bl.shape), dtype)
    us = jnp.asarray(rng.normal(0, 0.1, (2, n_knots - 1, B)), dtype)
    return cfg, xs, us, goals_bl, cbl


@pytest.mark.parametrize("want_derivs", [False, True])
def test_kernel_matches_xla_path(want_derivs):
    cfg, xs, us, goals_bl, cbl = _problem()
    ilqr_x = dataclasses.replace(cfg.ilqr, cost_stack_backend="xla",
                                 lane_window=4)
    ilqr_p = dataclasses.replace(cfg.ilqr, cost_stack_backend="pallas",
                                 lane_window=4)
    rx = _cost_stack_bl(xs, us, goals_bl, cbl, ilqr_x, cfg.vehicle,
                        want_derivs)
    rp = _cost_stack_bl(xs, us, goals_bl, cbl, ilqr_p, cfg.vehicle,
                        want_derivs)
    # cost breakdown
    for cx, cp in zip(jax.tree.leaves(rx[0]), jax.tree.leaves(rp[0])):
        np.testing.assert_allclose(np.asarray(cp), np.asarray(cx),
                                   rtol=2e-5, atol=1e-5)
    # per-knot totals
    np.testing.assert_allclose(np.asarray(rp[1]), np.asarray(rx[1]),
                               rtol=2e-5, atol=1e-5)
    # clip flags identical
    np.testing.assert_array_equal(np.asarray(rp[2]), np.asarray(rx[2]))
    if want_derivs:
        names = ("Jx", "Ju", "Hx", "Hu")
        for name, vx, vp in zip(names, rx[3:], rp[3:]):
            np.testing.assert_allclose(
                np.asarray(vp), np.asarray(vx), rtol=2e-4, atol=2e-4,
                err_msg=name)


def test_kernel_solve_matches_xla_solve():
    """Full batched solves under the two cost-stack backends: decisions
    must match on the synthetic problem (interpret mode = same XLA ops,
    so statuses and iteration counts are identical; controls to fp
    noise)."""
    cfg, goals, starts, cons = _synthetic_problem(128, 21, jnp.float32)
    ix = dataclasses.replace(cfg.ilqr, cost_stack_backend="xla")
    ip = dataclasses.replace(cfg.ilqr, cost_stack_backend="pallas")
    rx = solve_batch_bl(goals, starts, cons, ix, cfg.vehicle, cfg.delta_t)
    rp = solve_batch_bl(goals, starts, cons, ip, cfg.vehicle, cfg.delta_t)
    np.testing.assert_array_equal(np.asarray(rp.status),
                                  np.asarray(rx.status))
    assert int(np.abs(np.asarray(rp.iters) - np.asarray(rx.iters)).max()) \
        <= 1
    np.testing.assert_allclose(np.asarray(rp.us), np.asarray(rx.us),
                               atol=5e-4)
