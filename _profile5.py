"""DP structural attribution: scale nt/ns/nl and watch the time."""
import dataclasses
import time

import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp
import numpy as np

from cilqr_tpu import scenario as SC
from cilqr_tpu import world as W
from cilqr_tpu import dp as DP
from cilqr_tpu.config import PlannerConfig

B = 32
cfg0 = PlannerConfig()
dtype = jnp.float32
scns = SC.make_scenario_batch(range(B), dtype=dtype)
cl1 = SC.make_centerline()
barriers = SC.build_road_barriers(cl1)
grid = W.build_barrier_grid(barriers[0], cfg0.dp.grid_cell,
                            half=cfg0.vehicle.radius)
starts = jnp.tile(jnp.asarray([0.0, 0.0, 0.0, 10.0], dtype), (B, 1))


def timeit(name, fn, *args):
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(4):
        t0 = time.perf_counter()
        out = f(*args)
        _ = jax.tree.leaves(out)[0].sum().item()
        ts.append(time.perf_counter() - t0)
    print(f"{name:44s} {min(ts)*1e3:8.1f} ms", flush=True)


def dp_with(**kw):
    cfg = dataclasses.replace(cfg0, dp=dataclasses.replace(cfg0.dp, **kw))

    def f(s, st):
        r = jax.vmap(lambda a, b: DP.plan(a, b[0], b[1], b[2], cfg, grid))(
            s, st)
        return r.traj.x.sum()

    return f


timeit("dp nt=5 (default)", dp_with(), scns, starts)
timeit("dp nt=2", dp_with(nt=2), scns, starts)
timeit("dp nt=3", dp_with(nt=3), scns, starts)
timeit("dp ns=3 nl=4", dp_with(ns=3, nl=4), scns, starts)
