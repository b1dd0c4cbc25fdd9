"""Bisect the DP skeleton cost (B=32): stub station fields / segment cost."""
import time

import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp
import numpy as np

from cilqr_tpu import reference_line as RL
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
    print(f"{name:44s} {min(ts)*1e3:8.1f} ms", flush=True)


def dp_full(s, st):
    r = jax.vmap(lambda a, b: DP.plan(a, b[0], b[1], b[2], cfg, grid))(s, st)
    return r.traj.x.sum()


timeit("dp: full", dp_full, scns, starts)

orig_fields = RL.evaluate_station_fields


def stub_fields(traj, station, fields=RL.DP_FIELDS, packed=None):
    z = jnp.zeros(jnp.shape(station), station.dtype)
    out = {}
    for f in fields:
        out[f] = z + {"x": 1.0, "y": 2.0, "theta": 0.1, "kappa": 0.01,
                      "left_bound": 2.5, "right_bound": 6.0}[f]
    return out


DP.evaluate_station_fields = stub_fields
timeit("dp: station fields stubbed", dp_full, scns, starts)
DP.evaluate_station_fields = orig_fields

orig_seg = DP._segment_cost


def stub_seg(cl, scn, grid, cfg2, s_pts, l_pts, last_s, last_l, dyn_polys,
             nseg, safe_margin, ref=None, dilated=None):
    return jnp.zeros(s_pts.shape[:-1], s_pts.dtype)


DP._segment_cost = stub_seg
timeit("dp: segment cost stubbed", dp_full, scns, starts)
DP.evaluate_station_fields = stub_fields
timeit("dp: fields + segment stubbed", dp_full, scns, starts)
DP._segment_cost = orig_seg
DP.evaluate_station_fields = orig_fields
