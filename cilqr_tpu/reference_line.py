"""Reference-line / trajectory query engine.

TPU-native replacement for DiscretizedTrajectory's binary-search +
interpolation queries (/root/reference/algorithm/utils/
discretized_trajectory.cpp:34-196): ``jnp.searchsorted`` + gathers, all
vmap-able over query batches.
"""

from __future__ import annotations

import jax.numpy as jnp

from .geometry import normalize_angle, slerp
from .types import Traj


def _interp_fields(traj: Traj, i0, i1, key_arr, key):
    """Linear interpolation of all fields between knots i0 and i1 at ``key``
    along ``key_arr`` (LinearInterpolateTrajectory,
    discretized_trajectory.cpp:66-110)."""
    k0 = key_arr[i0]
    k1 = key_arr[i1]
    denom = k1 - k0
    near = jnp.abs(denom) < 1e-10
    w = jnp.where(near, 0.0, (key - k0) / jnp.where(near, 1.0, denom))

    def lin(f):
        return (1 - w) * f[i0] + w * f[i1]

    return Traj(
        time=lin(traj.time),
        s=lin(traj.s),
        x=lin(traj.x),
        y=lin(traj.y),
        theta=slerp(traj.theta[i0], k0, traj.theta[i1], k1,
                    jnp.where(near, k0, key)),
        kappa=lin(traj.kappa),
        velocity=lin(traj.velocity),
        left_bound=lin(traj.left_bound),
        right_bound=lin(traj.right_bound),
        a=lin(traj.a),
        jerk=lin(traj.jerk),
        delta=lin(traj.delta),
        delta_rate=lin(traj.delta_rate),
    )


def evaluate_station(traj: Traj, station):
    """EvaluateStation (discretized_trajectory.cpp:112-123). ``station`` may
    be any shape; fields broadcast accordingly."""
    idx = jnp.searchsorted(traj.s, station, side="left")
    idx = jnp.clip(idx, 1, traj.s.shape[-1] - 1)
    # interpolate with key = s but replicate the exact-lower-bound weight:
    return _interp_fields(traj, idx - 1, idx, traj.s, station)


def evaluate_time(traj: Traj, time):
    """EvaluateTime (discretized_trajectory.cpp:125-136)."""
    idx = jnp.searchsorted(traj.time, time, side="left")
    idx = jnp.clip(idx, 1, traj.time.shape[-1] - 1)
    return _interp_fields(traj, idx - 1, idx, traj.time, time)


DP_FIELDS = ("x", "y", "theta", "kappa", "left_bound", "right_bound")


def uniform_station_index(s_table, station):
    """Lower-bound index into a UNIFORMLY-spaced station table by
    arithmetic instead of searchsorted (an ~80 ms/chunk binary-search
    chain on TPU at DP probe counts).

    The scenario centerline accumulates s += resolution per point
    (scenario.generate_center_line, replicating reference_publisher.py:
    58,68), so s[i] = i*h up to ~n*ulp accumulation noise. The arithmetic
    index can differ from searchsorted only when ``station`` lies within
    that noise of a knot — and a lower-bound flip at an exact knot is
    value-continuous (weight 1 on [i-1,i] and weight 0 on [i,i+1] select
    the same table row), so interpolants match to fp noise. The DP golden
    oracle (tests/test_dp.py, 1e-9 gates) pins this equivalence."""
    n = s_table.shape[-1]
    h = (s_table[-1] - s_table[0]) / (n - 1)
    idx = jnp.ceil((station - s_table[0]) / h).astype(jnp.int32)
    return jnp.clip(idx, 1, n - 1)


PACK_FIELDS = ("s",) + DP_FIELDS  # row layout of pack_station_rows


def pack_station_rows(traj: Traj, dtype=None):
    """Pack the 7 station-query fields into one [N, 8] row table (one
    padding column keeps rows lane-aligned).

    evaluate_station_fields' per-field table reads are 14 independent
    scalar gathers per query station; on TPU gather cost scales with the
    INDEX count, so gathering two 8-wide contiguous rows instead retires
    the same bytes at 1/7 the indices. Raw field values are stored
    unchanged (theta raw, not pre-normalized), so the interpolation
    arithmetic after the gather is bit-identical to the unpacked path."""
    cols = [getattr(traj, f) for f in PACK_FIELDS]
    cols.append(jnp.zeros_like(cols[0]))
    rows = jnp.stack(cols, axis=-1)
    return rows if dtype is None else rows.astype(dtype)


def evaluate_station_fields(traj: Traj, station, fields=DP_FIELDS,
                            packed=None):
    """Lean EvaluateStation: interpolate only the requested fields.

    Matches evaluate_station per field (same lerp/slerp) with two TPU
    cost cuts for the DP probe sweep (dp.py): only the needed table
    gathers (the full Traj interpolation costs 13 x 2 per query), and the
    uniform-grid arithmetic index instead of searchsorted (see
    uniform_station_index for the equivalence argument).

    packed: optional pack_station_rows(traj) table — serves all fields
    from two row gathers with bit-identical interpolation arithmetic."""
    idx = uniform_station_index(traj.s, station)
    i0 = idx - 1
    i1 = idx

    if packed is not None:
        r0 = packed[i0]        # [..., 8] row gathers
        r1 = packed[i1]
        col = {f: i for i, f in enumerate(PACK_FIELDS)}

        def v0(f):
            return r0[..., col[f]]

        def v1(f):
            return r1[..., col[f]]
    else:
        def v0(f):
            return getattr(traj, f)[i0]

        def v1(f):
            return getattr(traj, f)[i1]

    k0 = v0("s") if packed is not None else traj.s[i0]
    k1 = v1("s") if packed is not None else traj.s[i1]
    denom = k1 - k0
    near = jnp.abs(denom) < 1e-10
    w = jnp.where(near, 0.0, (station - k0) / jnp.where(near, 1.0, denom))
    out = {}
    for f in fields:
        if f == "theta":
            out[f] = slerp(v0(f), k0, v1(f), k1,
                           jnp.where(near, k0, station))
        else:
            out[f] = (1 - w) * v0(f) + w * v1(f)
    return out


def get_projection(traj: Traj, px, py):
    """GetProjection (discretized_trajectory.cpp:159-190): nearest knot,
    then chord projection over [i-1, i+1]. Returns (s, l, project_point)."""
    d2 = (traj.x - px[..., None]) ** 2 + (traj.y - py[..., None]) ** 2
    i = jnp.argmin(d2, axis=-1)
    n = traj.x.shape[-1]
    i0 = jnp.maximum(0, i - 1)
    i1 = jnp.minimum(n - 1, i + 1)

    v0x = px - traj.x[i0]
    v0y = py - traj.y[i0]
    v1x = traj.x[i1] - traj.x[i0]
    v1y = traj.y[i1] - traj.y[i0]
    v1n = jnp.sqrt(v1x * v1x + v1y * v1y)
    dot = v0x * v1x + v0y * v1y
    delta_s = jnp.where(v1n > 0, dot / jnp.where(v1n == 0, 1.0, v1n), 0.0)

    has_seg = i0 < i1
    proj_seg = _interp_fields(traj, i0, i1, traj.s, traj.s[i0] + delta_s)
    proj_knot = _interp_fields(traj, i, i, traj.s, traj.s[i])

    def pick(a, b):
        return jnp.where(has_seg, a, b)

    proj = Traj(**{f: pick(getattr(proj_seg, f), getattr(proj_knot, f))
                   for f in ("time", "s", "x", "y", "theta", "kappa",
                             "velocity", "left_bound", "right_bound", "a",
                             "jerk", "delta", "delta_rate")})

    nrx = px - proj.x
    nry = py - proj.y
    lateral = jnp.copysign(jnp.hypot(nrx, nry),
                           nry * jnp.cos(proj.theta) - nrx * jnp.sin(proj.theta))
    return proj.s, lateral, proj


def get_cartesian(traj: Traj, station, lateral):
    """GetCartesian (discretized_trajectory.cpp:192-196)."""
    ref = evaluate_station(traj, station)
    return (ref.x - lateral * jnp.sin(ref.theta),
            ref.y + lateral * jnp.cos(ref.theta))


def compute_path_profile(dt, xs, ys):
    """Finite-difference path profile from xy points: headings, accumulated
    s, speeds, accelerations, kappas (DiscretePointsMath::ComputePathProfile,
    discrete_points_math.cc:27-176)."""
    def central_diff(v):
        d0 = v[1] - v[0]
        dn = v[-1] - v[-2]
        dm = 0.5 * (v[2:] - v[:-2])
        return jnp.concatenate([d0[None], dm, dn[None]])

    dxs = central_diff(xs)
    dys = central_diff(ys)
    headings = jnp.arctan2(dys, dxs)

    seg = jnp.sqrt(jnp.diff(xs) ** 2 + jnp.diff(ys) ** 2)
    s = jnp.concatenate([jnp.zeros((1,), xs.dtype), jnp.cumsum(seg)])

    speeds = jnp.diff(s) / dt
    speeds = jnp.concatenate([speeds, speeds[-1:]])
    accels = jnp.diff(speeds) / dt
    accels = jnp.concatenate([accels, accels[-1:]])

    def diff_over(v, svals):
        # Zero-length segments (a stalled DP path) make these 0/0 — the
        # reference NaN-poisons there (discrete_points_math.cc:111-132, a
        # documented defect); we define the derivative as 0 instead.
        def safe(num, den):
            ok = jnp.abs(den) > 1e-12
            return jnp.where(ok, num / jnp.where(ok, den, 1.0), 0.0)

        d0 = safe(v[1] - v[0], svals[1] - svals[0])
        dn = safe(v[-1] - v[-2], svals[-1] - svals[-2])
        dm = safe(v[2:] - v[:-2], svals[2:] - svals[:-2])
        return jnp.concatenate([d0[None], dm, dn[None]])

    xds = diff_over(xs, s)
    yds = diff_over(ys, s)
    xdds = diff_over(xds, s)
    ydds = diff_over(yds, s)
    kappas = (xds * ydds - yds * xdds) / (
        jnp.sqrt(xds * xds + yds * yds) * (xds * xds + yds * yds) + 1e-6)
    return headings, s, speeds, accels, kappas


def _analytic_row_fields(spec, i, fields):
    """Closed-form centerline table row ``i`` from the RoadSpec — the same
    values generate_center_line wrote into the table (arc rows ARE closed
    form there; straight x/y and all thetas are step-accumulated, so those
    reproduce to fp-accumulation noise only). One-hot over the ~7 road
    segments, pure elementwise — zero table gathers."""
    dtype = spec.h.dtype
    i_e = i[..., None]
    in_seg = (i_e >= spec.row_start) & (i_e < spec.row_start + spec.count)
    j = (i_e - spec.row_start + 1).astype(dtype)

    def sel(v):
        return jnp.sum(jnp.where(in_seg, v, 0.0), axis=-1)

    out = {}
    if "x" in fields or "y" in fields:
        ang = spec.ang0 + (j - 1.0) * spec.dang
        if "x" in fields:
            x_seg = jnp.where(spec.is_arc, spec.xc + spec.radius * jnp.cos(ang),
                              spec.x0 + j * spec.stepx)
            out["x"] = sel(x_seg)
        if "y" in fields:
            y_seg = jnp.where(spec.is_arc, spec.yc + spec.radius * jnp.sin(ang),
                              spec.y0 + j * spec.stepy)
            out["y"] = sel(y_seg)
    if "theta" in fields:
        out["theta"] = sel(spec.yaw0 + j * spec.yaw_inc)
    if "kappa" in fields:
        k = sel(jnp.where(in_seg, spec.kappa, 0.0))
        out["kappa"] = jnp.where(i == 0, spec.kappa0, k)
    if "left_bound" in fields:
        out["left_bound"] = jnp.full(i.shape, spec.lb, dtype)
    if "right_bound" in fields:
        out["right_bound"] = jnp.full(i.shape, spec.rb, dtype)
    # row 0 is the initial pose (0, 0, theta 0); kappa handled above
    for f in ("x", "y", "theta"):
        if f in out:
            out[f] = jnp.where(i == 0, 0.0, out[f])
    return out


def evaluate_station_fields_analytic(spec, station, fields=DP_FIELDS):
    """evaluate_station_fields against the closed-form RoadSpec instead of
    the sampled table: same arithmetic index (uniform grid), same
    lerp/slerp between the two bracketing rows, but the row values come
    from _analytic_row_fields — no gathers at all. Row values match the
    table to fp-accumulation noise, so interpolants (and thus DP
    decisions) agree except within that noise of a tie; qualified
    decision-identical on pedestrian_test seeds
    (tests/test_dp.py::test_dp_analytic_vs_table)."""
    dtype = spec.h.dtype
    idx = jnp.clip(jnp.ceil(station / spec.h).astype(jnp.int32), 1,
                   spec.n - 1)
    i0 = idx - 1
    i1 = idx
    need = tuple(fields)
    r0 = _analytic_row_fields(spec, i0, need)
    r1 = _analytic_row_fields(spec, i1, need)
    k0 = i0.astype(dtype) * spec.h
    k1 = i1.astype(dtype) * spec.h
    denom = k1 - k0
    near = jnp.abs(denom) < 1e-10
    w = jnp.where(near, 0.0, (station - k0) / jnp.where(near, 1.0, denom))
    out = {}
    for f in need:
        if f == "theta":
            out[f] = slerp(r0[f], k0, r1[f], k1, jnp.where(near, k0, station))
        else:
            out[f] = (1 - w) * r0[f] + w * r1[f]
    return out
