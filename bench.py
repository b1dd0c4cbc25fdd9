"""Benchmark: batched CILQR solves/s on one chip, on real pedestrian_test
problems.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is measured against the driver-set target of 1000 solves/s/chip
(BASELINE.md; the reference publishes no numbers — it is a single-threaded
C++ planner with an implied 0.1 s/cycle real-time budget).

Problem data: benchdata/problems.npz — 256 random pedestrian_test scenarios
taken through the DP coarse planner + corridor construction + constraint
prep (regenerate with `python -m cilqr_tpu.bench_prep`). The timed region
is the batched barrier-CILQR solve (vmapped while_loop solver), the
dominant stage. Falls back to a synthetic wide-corridor problem if the
fixture is missing (easier problems; labeled accordingly).
"""

import json
import os
import time

import numpy as np

FIXTURE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "benchdata", "problems.npz")


def _load_fixture(dtype):
    import jax.numpy as jnp

    from cilqr_tpu.costs import ConstraintSet, trim_constraints

    d = np.load(FIXTURE)
    goals = jnp.asarray(d["goals"], dtype)
    starts = jnp.asarray(d["starts"], dtype)
    cons = ConstraintSet(
        corridor_planes=jnp.asarray(d["corridor_planes"], dtype),
        corridor_mask=jnp.asarray(d["corridor_mask"]),
        left_planes=jnp.asarray(d["left_planes"], dtype),
        left_segs=jnp.asarray(d["left_segs"], dtype),
        left_mask=jnp.asarray(d["left_mask"]),
        right_planes=jnp.asarray(d["right_planes"], dtype),
        right_segs=jnp.asarray(d["right_segs"], dtype),
        right_mask=jnp.asarray(d["right_mask"]))
    # drop all-invalid padded slots (exact; fixture uses <=12 of 24
    # corridor planes and <=39 of 64 lane segments)
    return goals, starts, trim_constraints(cons)


def main():
    import jax
    import jax.numpy as jnp

    from cilqr_tpu.batch import solve_batch
    from cilqr_tpu.config import PlannerConfig

    # Default batch 1024: the 256-problem fixture tiled 4x with per-rep
    # perturbed start states (each instance is a distinct problem). The
    # cascading-width compaction amortizes best here — measured 4310 (256)
    # / 6040 (1024) / 5839 (2048) / 5311 (4096) solves/s.
    B_env = os.environ.get("BENCH_BATCH", "1024")
    REPS = int(os.environ.get("BENCH_REPS", 4))
    # Inner replications executed inside ONE jitted call (lax.map over
    # perturbed start states): the tunneled-TPU dispatch adds tens-of-ms
    # noise per call, so per-call timing of a sub-ms batch is dominated by
    # dispatch; amortizing INNER batches per dispatch divides that noise
    # out.
    INNER = int(os.environ.get("BENCH_INNER", 4))
    cfg = PlannerConfig()
    mode = os.environ.get("BENCH_LS_MODE")
    if mode:
        import dataclasses

        cfg = cfg.replace(ilqr=dataclasses.replace(
            cfg.ilqr, line_search=dataclasses.replace(
                cfg.ilqr.line_search, mode=mode)))
    ilqr = cfg.ilqr
    veh = cfg.vehicle
    dt = cfg.delta_t

    if os.path.exists(FIXTURE):
        goals, starts, cons = _load_fixture(jnp.float32)
        metric = "cilqr_solves_per_s_per_chip"
    else:
        from __graft_entry__ import _synthetic_problem

        cfg, goals, starts, cons = _synthetic_problem(
            batch=int(B_env or 256), n_knots=81, dtype=jnp.float32)
        ilqr, veh, dt = cfg.ilqr, cfg.vehicle, cfg.delta_t
        metric = "cilqr_solves_per_s_per_chip_synthetic"

    if B_env:
        B = int(B_env)
        rep = -(-B // goals.shape[0])  # tile fixture up to requested batch
        goals, starts, cons = jax.tree.map(
            lambda a: jnp.concatenate([a] * rep, axis=0)[:B],
            (goals, starts, cons))
    B = goals.shape[0]

    BACKEND = os.environ.get("BENCH_BACKEND", "blast")

    if os.environ.get("BENCH_MODE") == "latency":
        # Per-dispatch replan latency for one batch of B problems — the
        # BASELINE.md real-time target (p99 within the 0.1 s planning
        # cycle). Each rep is one un-amortized dispatch + forced
        # device->host sync, so on the tunneled backend the figure
        # includes the ~tens-of-ms RPC round trip and is an UPPER BOUND
        # on directly-attached-hardware latency.
        @jax.jit
        def step_once(goals, starts, cons, d):
            res = solve_batch(goals, starts.at[:, 1].add(d), cons,
                              ilqr, veh, dt, backend=BACKEND)
            return res.us.sum(), res.iters.sum(), (res.status != 0).all()

        rng = np.random.default_rng(1)
        reps = int(os.environ.get("BENCH_REPS", 30))
        d0 = jnp.asarray(rng.uniform(-0.2, 0.2, B), starts.dtype)
        jax.block_until_ready(step_once(goals, starts, cons, d0))
        lat = []
        for _ in range(reps):
            d = jnp.asarray(rng.uniform(-0.2, 0.2, B), starts.dtype)
            jax.block_until_ready(d)
            t0 = time.perf_counter()
            out = step_once(goals, starts, cons, d)
            _ = float(out[0])
            lat.append((time.perf_counter() - t0) * 1e3)
        p99 = float(np.percentile(lat, 99))
        print(json.dumps({
            "metric": f"batch{B}_replan_p99_ms",
            "value": round(p99, 2),
            "unit": "ms",
            # target: within the 0.1 s replan budget -> ratio >= 1 is good
            "vs_baseline": round(100.0 / p99, 3),
        }))
        return

    @jax.jit
    def step_many(goals, starts, cons, deltas):
        """INNER perturbed batch solves in one dispatch; outputs reduced to
        scalars so device->host transfer stays off the timed path."""

        def one(d):
            res = solve_batch(goals, starts.at[:, 1].add(d), cons,
                              ilqr, veh, dt, backend=BACKEND)
            return (res.us.sum(), res.iters.sum(),
                    (res.status != 0).all())

        us_sum, it_sum, done = jax.lax.map(one, deltas)
        return us_sum.sum(), it_sum.sum(), done.all()

    rng = np.random.default_rng(1)

    def mk_deltas():
        return jnp.asarray(rng.uniform(-0.2, 0.2, (INNER, B)), starts.dtype)

    out = step_many(goals, starts, cons, mk_deltas())
    jax.block_until_ready(out)

    times = []
    for _ in range(REPS):
        d = mk_deltas()
        jax.block_until_ready(d)
        t0 = time.perf_counter()
        out = step_many(goals, starts, cons, d)
        # float() forces a device->host transfer of the scalar result: on
        # the tunneled backend this is the only sync guaranteed to wait for
        # the computation itself, not just the dispatch.
        _ = float(out[0])
        times.append(time.perf_counter() - t0)

    best = min(times)
    solves_per_s = B * INNER / best
    print(json.dumps({
        "metric": metric,
        "value": round(solves_per_s, 2),
        "unit": "solves/s",
        "vs_baseline": round(solves_per_s / 1000.0, 3),
    }))


if __name__ == "__main__":
    main()
