"""Benchmark: batched CILQR solves/s on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is measured against the driver-set target of 1000 solves/s/chip
(BASELINE.md; the reference publishes no numbers — it is a single-threaded
C++ planner with an implied 0.1 s/cycle real-time budget).

The benchmark solves a batch of B=256 independent 81-knot CILQR problems
(pedestrian_test horizon: corridor + lane + actuator barriers, randomized
starts) via the vmapped while_loop solver — the BASELINE config-3 shape.
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _synthetic_problem
    from cilqr_tpu.batch import solve_batch

    B = int(__import__("os").environ.get("BENCH_BATCH", 256))
    REPS = int(__import__("os").environ.get("BENCH_REPS", 5))

    cfg, goals, starts, cons = _synthetic_problem(batch=B, n_knots=81,
                                                  dtype=jnp.float32)
    ilqr = cfg.ilqr
    veh = cfg.vehicle
    dt = cfg.delta_t

    @jax.jit
    def step(goals, starts, cons):
        res = solve_batch(goals, starts, cons, ilqr, veh, dt)
        return res.us, res.status, res.iters

    # warmup & compile
    us, status, iters = step(goals, starts, cons)
    jax.block_until_ready(us)

    # vary starts per rep so no rep is a cached no-op
    rng = np.random.default_rng(1)
    times = []
    for _ in range(REPS):
        s2 = starts + jnp.asarray(
            np.concatenate([rng.uniform(-0.2, 0.2, (B, 2)),
                            np.zeros((B, 4))], axis=1), starts.dtype)
        t0 = time.perf_counter()
        us, status, iters = step(goals, s2, cons)
        jax.block_until_ready(us)
        times.append(time.perf_counter() - t0)

    best = min(times)
    solves_per_s = B / best
    print(json.dumps({
        "metric": "cilqr_solves_per_s_per_chip",
        "value": round(solves_per_s, 2),
        "unit": "solves/s",
        "vs_baseline": round(solves_per_s / 1000.0, 3),
    }))


if __name__ == "__main__":
    main()
