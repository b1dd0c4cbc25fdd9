"""Multi-process jax.distributed worker, spawned by
tests/test_multiprocess_dist.py (one subprocess per simulated host).

Each process: init_distributed -> global 1-D batch mesh over BOTH
processes' virtual CPU devices -> contributes its own slice of the problem
batch via dist.global_batch (host_local_array_to_global_array) -> runs the
sharded solve step whose convergence stats psum across processes ->
process 0 prints the globally-reduced stats.

This executes the real multi-host code path (BASELINE configs 4-5,
SURVEY.md §4 item 4) on the CPU backend without a pod.
"""

import argparse
import json
import os
import sys

# __graft_entry__ lives at the repo root; the worker is launched from
# tests/, so sys.path[0] is tests/
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", required=True)
    ap.add_argument("--nproc", type=int, required=True)
    ap.add_argument("--pid", type=int, required=True)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--mode", choices=["solve", "pipeline"], default="solve")
    args = ap.parse_args()

    import jax

    # the container pins an 'axon' TPU plugin; force CPU before any
    # backend init (env JAX_PLATFORMS is ignored, see tests/conftest.py)
    jax.config.update("jax_platforms", "cpu")
    # share the suite's persistent compile cache (the pipeline program is
    # a large while-loop graph; cold compiles dominate otherwise)
    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    from cilqr_tpu.dist import (global_batch, init_distributed,
                                make_batch_mesh, sharded_pipeline_step,
                                sharded_solve_step)

    init_distributed(args.coordinator, args.nproc, args.pid)
    assert jax.process_count() == args.nproc, jax.process_count()

    def barrier(name, timeout_ms=600_000):
        """Align all processes via the COORDINATION service (generous
        timeout) before the first gloo collective: the gloo rendezvous
        KV get has a hard ~30 s deadline, and per-process COMPILE skew
        under CPU contention exceeds it (the round-4 suite flake —
        'Gloo context initialization failed: DEADLINE_EXCEEDED'). AOT
        compile + barrier + execute keeps the skew out of gloo's
        window."""
        from jax._src import distributed

        distributed.global_state.client.wait_at_barrier(name, timeout_ms)

    import jax.numpy as jnp

    mesh = make_batch_mesh()  # global mesh: all processes' devices
    n_dev = len(jax.devices())
    lo = args.pid * args.batch // args.nproc
    hi = (args.pid + 1) * args.batch // args.nproc

    if args.mode == "pipeline":
        # the FULL replan pipeline (DP -> corridor -> prep -> blast solve)
        # on real pedestrian_test scenario tensors, 81 knots, sharded over
        # the 2-process mesh — the headline-metric program, not the
        # solve-only slice
        jax.config.update("jax_enable_x64", True)
        import numpy as np

        from cilqr_tpu import pipeline, scenario
        from cilqr_tpu.config import PlannerConfig

        cfg = PlannerConfig()
        scns = scenario.make_scenario_batch(range(args.batch),
                                            dtype=jnp.float64)
        scn0 = jax.tree.map(lambda a: a[0], scns)
        lane = pipeline.make_lane_tuple(scn0.left_barrier_xy,
                                        scn0.right_barrier_xy, cfg)
        spec = scenario.analytic_road_spec()
        starts = jnp.tile(jnp.asarray([0.0, 0.0, 0.0, 10.0], jnp.float64),
                          (args.batch, 1))
        local = jax.tree.map(lambda a: a[lo:hi], (scns, starts))
        g_scns, g_starts = global_batch(mesh, local)
        step = sharded_pipeline_step(cfg, mesh, None, lane, road_spec=spec)
        compiled = step.lower(g_scns, g_starts).compile()
        barrier("pipeline_post_compile")
        out, stats = compiled(g_scns, g_starts)
        jax.block_until_ready(stats)

        # the deployment loop across the SAME 2-process mesh: one warm
        # MPC replan cycle (corridor rebuild at shifted times, warm
        # solve, re-check + repair) seeded from the pipeline's plans
        # (dist.sharded_mpc_step); its psum'd safety stats ride the
        # same STATS line with an mpc_ prefix
        from cilqr_tpu import mpc
        from cilqr_tpu.dist import sharded_mpc_step

        mstep = sharded_mpc_step(cfg, mesh, lane, n_cycles=1,
                                 road_spec=spec)
        # cycle_time must be a GLOBAL array like the pipeline outputs it
        # rides with (process-local jnp.zeros cannot address a
        # cross-process mesh)
        (g_ct,) = global_batch(
            mesh, (np.zeros(hi - lo, np.float64),))
        carry = mpc.MpcCarry(xs=out.solve.xs, us=out.solve.us,
                             cycle_time=g_ct)
        mcompiled = mstep.lower(g_scns, carry).compile()
        barrier("mpc_post_compile")
        _, mstats = mcompiled(g_scns, carry)
        jax.block_until_ready(mstats)
        stats = dict(stats)
        stats.update({f"mpc_{k}": v for k, v in mstats.items()})
    else:
        from __graft_entry__ import _synthetic_problem

        cfg, goals, starts, cons = _synthetic_problem(
            batch=args.batch, n_knots=21, dtype=jnp.float32)
        local = jax.tree.map(lambda a: a[lo:hi], (goals, starts, cons))
        g_goals, g_starts, g_cons = global_batch(mesh, local)

        step = sharded_solve_step(cfg, mesh)
        compiled = step.lower(g_goals, g_starts, g_cons).compile()
        barrier("solve_post_compile")
        res, stats = compiled(g_goals, g_starts, g_cons)
        jax.block_until_ready(stats)

    if jax.process_index() == 0:
        out = {k: float(v) for k, v in stats.items()}
        out["n_devices"] = n_dev
        out["n_processes"] = jax.process_count()
        print("STATS " + json.dumps(out), flush=True)

    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
