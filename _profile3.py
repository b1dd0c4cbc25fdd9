"""Attribute DP stage cost on TPU (B=32) by stubbing out components —
XLA dead-code-eliminates whatever the stub makes unreachable."""
import time

import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp
import numpy as np

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
starts = jnp.tile(jnp.asarray([0.0, 0.0, 0.0, 10.0], dtype), (B, 1))


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


def dp_full(s, st):
    r = jax.vmap(lambda a, b: DP.plan(a, b[0], b[1], b[2], cfg, grid))(s, st)
    return r.traj.x.sum()


timeit("dp: full", dp_full, scns, starts)

orig_hits = W.point_hits_dilated
orig_barrier = W.barrier_box_hit_dilated


def no_dyn_hits(d, cx, cy):
    if d.nx.ndim == 3:   # the [T', KD, E] dynamic entry
        shp = jnp.broadcast_shapes((cx * cy).shape, d.valid.shape)
        return jnp.zeros(shp, bool)
    return orig_hits(d, cx, cy)


def no_hits(d, cx, cy):
    shp = jnp.broadcast_shapes((cx * cy).shape, d.valid.shape)
    return jnp.zeros(shp, bool)


def no_barrier(grid, minx, miny, maxx, maxy):
    return jnp.zeros(jnp.broadcast_shapes(jnp.shape(minx)), bool)


W.point_hits_dilated = no_dyn_hits
DP.world_hits = None
timeit("dp: dyn SAT stubbed", dp_full, scns, starts)
W.point_hits_dilated = no_hits
timeit("dp: all poly SAT stubbed", dp_full, scns, starts)
W.point_hits_dilated = orig_hits
W.barrier_box_hit_dilated = no_barrier
timeit("dp: barrier gather stubbed", dp_full, scns, starts)
W.point_hits_dilated = no_hits
timeit("dp: all collision stubbed", dp_full, scns, starts)
W.point_hits_dilated = orig_hits
W.barrier_box_hit_dilated = orig_barrier
