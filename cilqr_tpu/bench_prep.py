"""Generate the benchmark fixture: B pedestrian_test problems taken through
DP + corridor + constraint prep on CPU, saved as npz for bench.py to time
the CILQR solve stage on real problem data.

Usage: python -m cilqr_tpu.bench_prep [--batch 256] [--out benchdata/problems.npz]
"""

from __future__ import annotations

import argparse
import os


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--out", type=str, default="benchdata/problems.npz")
    args = ap.parse_args(argv)

    import jax

    jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from . import corridor as corridor_mod
    from . import costs as costs_mod
    from . import dp as dp_mod
    from . import pipeline, scenario
    from .config import PlannerConfig
    from .world import build_barrier_grid

    cfg = PlannerConfig()
    start = (0.0, 0.0, 0.0, 10.0)
    cl = scenario.make_centerline()
    barriers = scenario.build_road_barriers(cl)
    grid = build_barrier_grid(barriers[0], cfg.dp.grid_cell,
                              half=cfg.vehicle.radius)
    lane = pipeline.make_lane_tuple(barriers[1], barriers[2], cfg)

    def prep_one(scn):
        dp_res = dp_mod.plan(scn, *map(jnp.asarray, start[:3]), cfg, grid)
        cors = corridor_mod.plan_corridors(scn, dp_res.traj, cfg.corridor,
                                           lane)
        cons = costs_mod.shrink_and_normalize(
            cors.planes, cors.plane_mask,
            cors.left_planes, cors.left_segs, cors.left_mask,
            cors.right_planes, cors.right_segs, cors.right_mask,
            cfg.ilqr, cfg.vehicle)
        goals = pipeline.coarse_to_states(dp_res.traj)
        return goals, cons, dp_res.ok

    prep = jax.jit(prep_one)

    all_goals, all_cons, oks = [], [], []
    for seed in range(args.batch):
        scn = scenario.make_scenario(seed, cl=cl, barriers=barriers,
                                     dtype=jnp.float32)
        goals, cons, ok = prep(scn)
        all_goals.append(np.asarray(goals))
        all_cons.append(jax.tree.map(np.asarray, cons))
        oks.append(bool(ok))
        if seed % 32 == 0:
            print(f"  prep {seed}/{args.batch}", flush=True)

    goals = np.stack(all_goals)
    cons = jax.tree.map(lambda *xs: np.stack(xs), *all_cons)
    starts = np.zeros((args.batch, 6), np.float32)
    starts[:, 3] = start[3]

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    np.savez_compressed(
        args.out, goals=goals, starts=starts, dp_ok=np.asarray(oks),
        corridor_planes=cons.corridor_planes,
        corridor_mask=cons.corridor_mask,
        left_planes=cons.left_planes, left_segs=cons.left_segs,
        left_mask=cons.left_mask, right_planes=cons.right_planes,
        right_segs=cons.right_segs, right_mask=cons.right_mask)
    print(f"wrote {args.out}: {goals.shape[0]} problems, "
          f"dp_ok={np.mean(oks):.2%}")


if __name__ == "__main__":
    main()
