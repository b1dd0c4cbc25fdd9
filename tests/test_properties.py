"""Solution-property tests (SURVEY.md §4 item 3): invariants the reference
only ever checked visually/with commented-out debug code
(corridor.cc:251-259, corridor.cc:333-389 CheckLaneConstraints).

1. The converged trajectory keeps every collision disc inside the SHRUNK
   corridor half-planes (the barriers act on disc centers against planes
   already shrunk by disc_radius + safe_margin, ilqr_optimizer.cc:438-473)
   — up to the slack the relaxed log barrier permits (barrier_function.h:
   104-140 penalizes but does not hard-enforce near the eps boundary).
2. Actuator/state limits (vehicle_param.h:26-74) hold on the converged
   states and controls, same soft-barrier slack.
3. The recorded cost history is monotonically non-increasing: rejected
   iterations keep the old iterate, accepted ones require dcost > 0
   (ilqr_optimizer.cc:255-258), so total cost never rises.
"""

import jax
import jax.numpy as jnp
import numpy as np

from cilqr_tpu import costs as C
from cilqr_tpu import solver as S
from cilqr_tpu.batch import solve_batch
from cilqr_tpu.config import IlqrConfig, VehicleParam
from cilqr_tpu.types import SolverStatus

from test_solver_blast import _batch_from_problems

VEH = VehicleParam()
CFG = IlqrConfig()
DT = 0.1

# Slack for soft (relaxed-log) barriers: the quadratic branch activates
# inside |x| < eps = 0.01 of the boundary and trades off against tracking,
# so converged iterates may sit a few centimeters over a shrunk plane
# (the true vehicle footprint still clears the obstacle by up to
# safe_margin = 0.2 m).
BARRIER_SLACK = 5e-2


def _solved_batch(n=6):
    goals, starts, cons = _batch_from_problems(range(n))
    res = solve_batch(goals, starts, cons, CFG, VEH, DT)
    ok = np.isin(np.asarray(res.status),
                 [SolverStatus.SUCCESS_GNORM,
                  SolverStatus.SUCCESS_ABS_COST,
                  SolverStatus.SUCCESS_REL_COST])
    assert ok.all(), np.asarray(res.status)
    return goals, starts, cons, res


def test_final_trajectory_satisfies_shrunk_corridor():
    _, _, cons, res = _solved_batch()
    cx, cy, _, _ = jax.vmap(lambda xs: C.disc_geometry(xs, CFG, VEH))(res.xs)
    # violation of plane (a,b,c): a*x + b*y - c  (feasible <= 0)
    a = cons.corridor_planes[..., 0]                 # [B, N, KC]
    b = cons.corridor_planes[..., 1]
    c = cons.corridor_planes[..., 2]
    viol = (a[..., None, :] * np.asarray(cx)[..., :, None]
            + b[..., None, :] * np.asarray(cy)[..., :, None]
            - c[..., None, :])                       # [B, N, D, KC]
    viol = np.where(np.asarray(cons.corridor_mask)[..., None, :], viol,
                    -np.inf)
    assert viol.max() <= BARRIER_SLACK, viol.max()


def test_final_trajectory_satisfies_actuator_limits():
    _, _, _, res = _solved_batch()
    xs = np.asarray(res.xs)
    us = np.asarray(res.us)
    tol = BARRIER_SLACK
    assert xs[..., 3].min() >= 0.0 - tol              # v >= 0
    assert xs[..., 3].max() <= VEH.max_velocity + tol
    assert xs[..., 4].min() >= VEH.min_acceleration - tol
    assert xs[..., 4].max() <= VEH.max_acceleration + tol
    assert np.abs(xs[..., 5]).max() <= VEH.delta_max + tol
    assert us[..., 0].min() >= VEH.jerk_min - tol
    assert us[..., 0].max() <= VEH.jerk_max + tol
    assert np.abs(us[..., 1]).max() <= VEH.delta_rate_max + tol


def test_cost_history_monotone_nonincreasing():
    goals, starts, cons = _batch_from_problems(range(3))
    n_it = 40

    def one(g, s, cn):
        res, hist = S.solve_with_history(g, s, cn, CFG, VEH, DT,
                                         num_iters=n_it)
        return res.iters, hist.total

    iters, totals = jax.vmap(one)(goals, starts, cons)
    totals = np.asarray(totals)                       # [B, n_it+1]
    for lane in range(totals.shape[0]):
        t = totals[lane]
        # frozen tail after convergence repeats the last value — still
        # non-increasing, so check the whole recorded sequence
        d = np.diff(t)
        assert (d <= 1e-9 * np.maximum(1.0, np.abs(t[:-1]))).all(), (
            lane, t)
