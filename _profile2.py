"""Attribute corridor + DP stage cost on TPU (B=32) — scratch."""
import time

import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp
import numpy as np

from cilqr_tpu import corridor as C
from cilqr_tpu import geometry as G
from cilqr_tpu import pipeline as P
from cilqr_tpu import scenario as SC
from cilqr_tpu import world as W
from cilqr_tpu import dp as DP
from cilqr_tpu.config import PlannerConfig

B = 32
cfg = PlannerConfig()
dtype = jnp.float32
scns = SC.make_scenario_batch(range(B), dtype=dtype)
cl1 = SC.make_centerline()
barriers = SC.build_road_barriers(cl1)
grid = W.build_barrier_grid(barriers[0], cfg.dp.grid_cell,
                            half=cfg.vehicle.radius)
lane = P.make_lane_tuple(barriers[1], barriers[2], cfg, np.float32)
starts = jnp.tile(jnp.asarray([0.0, 0.0, 0.0, 10.0], dtype), (B, 1))

dp_j = jax.jit(lambda s, st: jax.vmap(lambda a, b: DP.plan(
    a, b[0], b[1], b[2], cfg, grid))(s, st))
dp_res = dp_j(scns, starts)
jax.block_until_ready(dp_res.traj.x)
trajs = dp_res.traj


def timeit(name, fn, *args):
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(4):
        t0 = time.perf_counter()
        out = f(*args)
        _ = jax.tree.leaves(out)[0].sum().item()  # honest device->host sync
        ts.append(time.perf_counter() - t0)
    print(f"{name:40s} {min(ts)*1e3:8.1f} ms", flush=True)


# ---- corridor attribution -------------------------------------------------
ccfg = cfg.corridor


def seeds_only(s, t):
    def one(scn, tr):
        def per_knot(x, y, th, tm):
            return C.corridor_seed_points(scn, x, y, th, tm, ccfg,
                                          ccfg.max_points)
        return jax.vmap(per_knot)(tr.x, tr.y, tr.theta, tr.time)
    pts, mask = jax.vmap(one)(s, t)
    return pts.sum()


def seeds_hull1(s, t):
    def one(scn, tr):
        def per_knot(x, y, th, tm):
            pts, mask = C.corridor_seed_points(scn, x, y, th, tm, ccfg,
                                               ccfg.max_points)
            dx = pts[:, 0] - x
            dy = pts[:, 1] - y
            norm = jnp.hypot(dx, dy)
            valid = (mask & (jnp.abs(dx) <= ccfg.max_diff_x) &
                     (jnp.abs(dy) <= ccfg.max_diff_y) & (norm >= 1e-10))
            scale = jnp.where(valid, 2.0 * ccfg.radius /
                              jnp.where(norm > 0, norm, 1.0) - 1.0, 0.0)
            flip = jnp.stack([jnp.concatenate([dx * scale, jnp.zeros((1,), pts.dtype)]),
                              jnp.concatenate([dy * scale, jnp.zeros((1,), pts.dtype)])],
                             axis=-1)
            fm = jnp.concatenate([valid, jnp.ones((1,), bool)])
            h, hm, cnt, hi = G.convex_hull_masked(flip, fm, return_indices=True)
            return h.sum() + cnt
        return jax.vmap(per_knot)(tr.x, tr.y, tr.theta, tr.time)
    return jax.vmap(one)(s, t).sum()


def full_cor(s, t):
    return jax.vmap(lambda a, tr: C.plan_corridors(
        a, tr, ccfg, lane))(s, t).planes.sum()


def dp_full(s, st):
    r = jax.vmap(lambda a, b: DP.plan(a, b[0], b[1], b[2], cfg, grid))(s, st)
    return r.traj.x.sum()


timeit("dp: full", dp_full, scns, starts)
timeit("corridor: seeds only", seeds_only, scns, trajs)
timeit("corridor: seeds + flip + hull1", seeds_hull1, scns, trajs)
timeit("corridor: full", full_cor, scns, trajs)
