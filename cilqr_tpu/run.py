"""CLI driver — the reference's planning_node/main + launch-file analog.

Usage examples:
  python -m cilqr_tpu.run plan --seed 7 --out /tmp/plan.png
  python -m cilqr_tpu.run batch --batch 64 --seeds 0
  python -m cilqr_tpu.run mpc --cycles 20
  python -m cilqr_tpu.run scenario --seed 3 --out /tmp/scn.npz
  python -m cilqr_tpu.run plan --config overrides.json

The reference triggers planning from an RViz click with a fixed start state
(planning_node.cc:24-27,82); here `plan` runs the same fixed
pedestrian_test case headlessly and writes matplotlib dashboards instead of
RViz markers.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def _load_config(path):
    from .config import PlannerConfig, from_dict

    if not path:
        return PlannerConfig()
    with open(path) as f:
        return from_dict(json.load(f))


def _add_common(p):
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--config", type=str, default="",
                   help="JSON config override file")
    p.add_argument("--cpu", action="store_true", help="force CPU backend")
    p.add_argument("--f64", action="store_true", help="double precision")
    p.add_argument("--host-devices", type=int, default=0,
                   help="virtual CPU device count (set before first jax use)")


def main(argv=None):
    ap = argparse.ArgumentParser(prog="cilqr_tpu.run")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p_plan = sub.add_parser("plan", help="single full plan (pedestrian_test)")
    _add_common(p_plan)
    p_plan.add_argument("--out", type=str, default="",
                        help="write scenario+trajectory figure (png)")
    p_plan.add_argument("--save", type=str, default="",
                        help="save result npz")
    p_plan.add_argument("--animate", type=str, default="",
                        help="write animated playback GIF (planning_node.cc"
                             ":82-112 analog)")
    p_plan.add_argument("--animate-every", type=int, default=2,
                        help="animate every k-th knot")

    p_batch = sub.add_parser("batch", help="batched scenario solves")
    _add_common(p_batch)
    p_batch.add_argument("--batch", type=int, default=64)

    p_mpc = sub.add_parser("mpc", help="receding-horizon MPC loop")
    _add_common(p_mpc)
    p_mpc.add_argument("--cycles", type=int, default=20)

    p_scn = sub.add_parser("scenario", help="generate + save a scenario npz")
    _add_common(p_scn)
    p_scn.add_argument("--out", type=str, required=True)

    p_dist = sub.add_parser(
        "dist", help="sharded batch solve over a device mesh with psum stats")
    _add_common(p_dist)
    p_dist.add_argument("--batch", type=int, default=64)
    p_dist.add_argument("--devices", type=int, default=0,
                        help="mesh size (0 = all devices)")
    p_dist.add_argument("--coordinator", type=str, default="",
                        help="multi-host coordinator address")
    p_dist.add_argument("--num-processes", type=int, default=1)
    p_dist.add_argument("--process-id", type=int, default=0)

    args = ap.parse_args(argv)

    if getattr(args, "host_devices", 0):
        import os

        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + " --xla_force_host_platform_device_count="
                f"{args.host_devices}").strip()

    if getattr(args, "num_processes", 1) > 1:
        from .dist import init_distributed

        init_distributed(args.coordinator, args.num_processes,
                         args.process_id)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if args.f64:
        jax.config.update("jax_enable_x64", True)

    import jax.numpy as jnp
    import numpy as np

    from . import pipeline, scenario
    from .types import SolverStatus

    dtype = jnp.float64 if args.f64 else jnp.float32
    start = (0.0, 0.0, 0.0, 10.0)
    cfg = _load_config(args.config)
    # the CLI always plans on the generated pedestrian_test road, so the
    # closed-form RoadSpec is always available — pass it through so the
    # frenet DP mode runs its finite-extent (safe-everywhere) barrier
    # test and the gather-free station evaluation (dp.plan)
    np_dt = np.float64 if args.f64 else np.float32
    spec = (scenario.analytic_road_spec(dtype=np_dt)
            if cfg.dp.collision_mode == "frenet" else None)

    if args.cmd == "scenario":
        from . import checkpoint

        scn = scenario.make_scenario(args.seed, dtype=dtype)
        checkpoint.save_scenario(args.out, scn)
        print(f"scenario seed={args.seed} -> {args.out}")
        return 0

    if args.cmd == "plan":
        scn = scenario.make_scenario(args.seed, dtype=dtype)
        t0 = time.perf_counter()
        out = pipeline.plan(scn, start, cfg, spec=spec)
        jax.block_until_ready(out.solve.us)
        dt_ms = (time.perf_counter() - t0) * 1e3
        hits = np.asarray(out.solve_hits)
        print(f"dp_ok={bool(out.dp_ok)} corridors_ok={bool(out.corridors.ok.all())} "
              f"status={SolverStatus(int(out.solve.status)).name} "
              f"iters={int(out.solve.iters)} "
              f"cost={float(out.solve.cost.total):.3f} "
              f"recheck: near25={int(hits[:25].sum())} "
              f"tail={int(hits[25:].sum())} colliding knots; "
              f"wall={dt_ms:.1f} ms (incl. compile)")
        if args.save:
            from . import checkpoint

            checkpoint.save_result(args.save, out.solve)
        if args.out:
            from . import viz

            fig = viz.plot_scenario(scn, out)
            viz.plot_corridors(out.corridors, fig.axes[0])
            fig.savefig(args.out, dpi=120)
            tr = pipeline.traj_from_solution(out.solve.xs, out.solve.us,
                                             cfg.delta_t,
                                             cfg.vehicle.wheel_base)
            fig2 = viz.plot_states_dashboard(tr, cfg.vehicle)
            fig2.savefig(args.out.replace(".png", "_states.png"), dpi=120)
            print(f"figures -> {args.out}")
        if args.animate:
            from . import viz

            viz.animate_plan(scn, out, cfg, args.animate,
                             every=args.animate_every)
            print(f"animation -> {args.animate}")
        return 0

    if args.cmd == "batch":
        from .batch import BatchMetrics, solve_batch_jit
        from .costs import shrink_and_normalize
        from . import corridor as corridor_mod

        scns = scenario.make_scenario_batch(
            range(args.seed, args.seed + args.batch), dtype=dtype)
        # plan each scenario through the full pipeline, vmapped
        scn0 = jax.tree.map(lambda a: a[0], scns)
        grid = None
        if cfg.dp.collision_mode == "grid":
            from .world import build_barrier_grid

            grid = build_barrier_grid(np.asarray(scn0.barrier_xy),
                                      cfg.dp.grid_cell)
        lane = pipeline.make_lane_tuple(scn0.left_barrier_xy,
                                        scn0.right_barrier_xy, cfg)

        @jax.jit
        def run(scns):
            return jax.vmap(
                lambda s: pipeline.plan(s, start, cfg, grid, lane,
                                        spec=spec))(scns)

        t0 = time.perf_counter()
        out = run(scns)
        jax.block_until_ready(out.solve.us)
        wall = time.perf_counter() - t0
        m = BatchMetrics.from_result(out.solve)
        print(f"batch={args.batch} wall={wall:.2f}s (incl. compile) "
              f"converged={m.converged_fraction:.2%} "
              f"iters mean={m.iters_mean:.1f} p99={m.iters_p99:.0f}")
        print("statuses:", m.status_counts)
        return 0

    if args.cmd == "dist":
        from .dist import make_batch_mesh, shard_batch, sharded_pipeline_step
        from .world import build_barrier_grid

        n_dev = args.devices or len(jax.devices())
        mesh = make_batch_mesh(jax.devices()[:n_dev])
        B = args.batch - args.batch % n_dev or n_dev
        scns = scenario.make_scenario_batch(
            range(args.seed, args.seed + B), dtype=dtype)
        scn0 = jax.tree.map(lambda a: a[0], scns)
        grid = (build_barrier_grid(np.asarray(scn0.barrier_xy),
                                   cfg.dp.grid_cell)
                if cfg.dp.collision_mode == "grid" else None)
        lane = pipeline.make_lane_tuple(scn0.left_barrier_xy,
                                        scn0.right_barrier_xy, cfg)
        starts = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 0.0, 10.0], dtype),
                                  (B, 4))
        step = sharded_pipeline_step(cfg, mesh, grid, lane, road_spec=spec)
        scns, starts = shard_batch(mesh, (scns, starts))
        t0 = time.perf_counter()
        out, stats = step(scns, starts)
        jax.block_until_ready(out.solve.us)
        wall = time.perf_counter() - t0
        stats = {k: float(v) for k, v in stats.items()}
        print(f"mesh={n_dev} batch={B} wall={wall:.2f}s (incl. compile) "
              f"stats={stats}")
        return 0

    if args.cmd == "mpc":
        from .mpc import run_mpc

        scn = scenario.make_scenario(args.seed, dtype=dtype)
        t0 = time.perf_counter()
        results = run_mpc(scn, start, cfg, args.cycles, spec=spec)
        wall = time.perf_counter() - t0
        statuses = [SolverStatus(int(r.solve.status)).name for r in results]
        iters = [int(r.solve.iters) for r in results]
        cor_ok = sum(bool(r.corridor_ok) for r in results)
        near_dirty = sum(bool(r.near_hits) for r in results)
        print(f"mpc cycles={args.cycles} wall={wall:.2f}s "
              f"iters: first={iters[0]} mean_rest={np.mean(iters[1:]):.1f} "
              f"corridor_ok={cor_ok}/{len(results)} "
              f"executed-horizon dirty={near_dirty}/{len(results)}")
        print("statuses:", {s: statuses.count(s) for s in set(statuses)})
        return 0

    return 1


if __name__ == "__main__":
    sys.exit(main())
