"""Core array-structured data types (registered pytrees).

The reference models the world with pointer-rich C++ containers
(TrajectoryPoint vectors, Polygon2d lists, per-knot constraint vectors —
/root/reference/algorithm/utils/discretized_trajectory.h,
 algorithm/utils/environment.h, algorithm/ilqr/corridor.h:20-31). A TPU
cannot chase pointers, so everything here is a fixed-shape struct-of-arrays
with explicit masks; all types vmap over a leading batch axis.
"""

from __future__ import annotations

import enum

import jax.numpy as jnp
from flax import struct


class SolverStatus(enum.IntEnum):
    """Formalizes the reference's printf-only exit states
    (ilqr_optimizer.cc:224,237,288,290,304,313) following the enum sketched
    in its dead library (slover/typedefs.h:32-40)."""

    RUNNING = 0
    SUCCESS_GNORM = 1          # gnorm < tol and lambda small
    SUCCESS_ABS_COST = 2       # dcost < abs_cost_tol
    SUCCESS_REL_COST = 3       # dcost/cost < rel_cost_tol
    FAIL_LAMBDA_MAX = 4        # regularization blew up (kUnsolved)
    MAX_ITER = 5


@struct.dataclass
class Traj:
    """Struct-of-arrays trajectory / reference line.

    Mirrors TrajectoryPoint's fields (discretized_trajectory.h) as [P]
    arrays. Also serves as the centerline (with bounds) and the coarse DP
    output.
    """

    time: jnp.ndarray
    s: jnp.ndarray
    x: jnp.ndarray
    y: jnp.ndarray
    theta: jnp.ndarray
    kappa: jnp.ndarray
    velocity: jnp.ndarray
    left_bound: jnp.ndarray
    right_bound: jnp.ndarray
    a: jnp.ndarray
    jerk: jnp.ndarray
    delta: jnp.ndarray
    delta_rate: jnp.ndarray

    @classmethod
    def zeros(cls, n: int, dtype=jnp.float32) -> "Traj":
        z = jnp.zeros((n,), dtype)
        return cls(time=z, s=z, x=z, y=z, theta=z, kappa=z, velocity=z,
                   left_bound=z, right_bound=z, a=z, jerk=z, delta=z,
                   delta_rate=z)

    @property
    def n(self) -> int:
        return self.x.shape[-1]


@struct.dataclass
class Scenario:
    """World state tensors, replacing the Environment class
    (environment.h:24-88).

    static_obs:      [KS, 4, 2] obstacle polygon corners (CCW)
    static_mask:     [KS]
    dyn_obs:         [KD, TD, 4, 2] per-sample polygon corners
    dyn_times:       [KD, TD] sample timestamps
    dyn_mask:        [KD] obstacle validity
    dyn_len:         [KD] number of valid samples per obstacle
    barrier_xy:      [B, 2] road-barrier points sampled @0.1 m on both bounds
                     (environment.cpp:18-44)
    barrier_mask:    [B]
    left_barrier_xy / right_barrier_xy: [B2, 2] per-side barrier polylines in
                     station order (+ masks) for lane-constraint sampling
    """

    centerline: Traj
    static_obs: jnp.ndarray
    static_mask: jnp.ndarray
    dyn_obs: jnp.ndarray
    dyn_times: jnp.ndarray
    dyn_mask: jnp.ndarray
    dyn_len: jnp.ndarray
    barrier_xy: jnp.ndarray
    barrier_mask: jnp.ndarray
    left_barrier_xy: jnp.ndarray
    left_barrier_mask: jnp.ndarray
    right_barrier_xy: jnp.ndarray
    right_barrier_mask: jnp.ndarray


@struct.dataclass
class CorridorSet:
    """Per-knot convex safe corridors + shared lane constraints.

    planes:      [N, KC, 3] half-planes a x + b y <= c (corridor.h:20-25)
    plane_mask:  [N, KC]
    polygons:    [N, KC, 2] corridor polygon vertices (for viz/tests)
    poly_mask:   [N, KC]
    left/right_planes:  [S, 3] lane half-planes
    left/right_segs:    [S, 2, 2] the generating segments (for nearest lookup,
                        corridor.h:24-25)
    left/right_mask:    [S]
    ok:          [N] per-knot corridor construction success
    """

    planes: jnp.ndarray
    plane_mask: jnp.ndarray
    polygons: jnp.ndarray
    poly_mask: jnp.ndarray
    left_planes: jnp.ndarray
    left_segs: jnp.ndarray
    left_mask: jnp.ndarray
    right_planes: jnp.ndarray
    right_segs: jnp.ndarray
    right_mask: jnp.ndarray
    ok: jnp.ndarray


@struct.dataclass
class CostBreakdown:
    """Cost components per evaluation (ilqr_optimizer.h:14-27)."""

    total: jnp.ndarray
    target: jnp.ndarray     # tracking + control quadratics (JCost)
    dynamic: jnp.ndarray    # state/control limit barriers
    corridor: jnp.ndarray
    lane: jnp.ndarray


@struct.dataclass
class SolveResult:
    """Output of one CILQR solve (batched: leading axis).

    xs: [N, 6] states; us: [N-1, 2] controls; status: SolverStatus code;
    iters: outer iterations executed; cost: final CostBreakdown;
    init_xs/init_us: the LQR initial guess (iter_trajs[0] analog);
    lane_clipped: bool — True when the batch-last solver's windowed
    lane-segment search (IlqrConfig.lane_window) saw a nearest-segment
    argmin land on a clipped window edge at any point of the solve, i.e.
    the euclidean-nearest segment may lie outside the window and a wrong
    lane plane may have been selected (solver_blast._nearest_lane_sel_discs);
    always False for full-scan backends/configs.
    """

    xs: jnp.ndarray
    us: jnp.ndarray
    status: jnp.ndarray
    iters: jnp.ndarray
    cost: CostBreakdown
    lam: jnp.ndarray
    init_xs: jnp.ndarray
    init_us: jnp.ndarray
    lane_clipped: jnp.ndarray | None = None
