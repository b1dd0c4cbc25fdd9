"""DP stage ablation: which probe component dominates (frenet mode)."""
import dataclasses
import time

import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp

from cilqr_tpu import dp as DP
from cilqr_tpu import scenario as SC
from cilqr_tpu import world as W
from cilqr_tpu.config import PlannerConfig

B = 64
cfg0 = PlannerConfig()
cfg = dataclasses.replace(cfg0, dp=dataclasses.replace(
    cfg0.dp, collision_mode="frenet"))
dtype = jnp.float32
scns = SC.make_scenario_batch(range(B), dtype=dtype)
starts = jnp.tile(jnp.asarray([0.0, 0.0, 0.0, 10.0], dtype), (B, 1))


def run(name):
    def dpf(s, st):
        r = jax.vmap(lambda a, b: DP.plan(a, b[0], b[1], b[2], cfg, None))(
            s, st)
        return r.traj.x.sum() + r.min_cost.sum()

    f = jax.jit(dpf)
    out = f(scns, starts)
    jax.block_until_ready(out)
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        out = f(scns, starts)
        _ = out.sum().item()
        ts.append(time.perf_counter() - t0)
    print(f"{name:40s} {min(ts)*1e3:8.1f} ms  (B={B})", flush=True)


orig_phd = W.point_hits_dilated
orig_bhf = W.barrier_hit_frenet

run("full dp (frenet)")

W.point_hits_dilated = lambda d, cx, cy: jnp.zeros(
    jnp.broadcast_shapes(jnp.shape(cx), d.valid.shape), bool)
run("obstacle hits stubbed (False)")
W.point_hits_dilated = orig_phd

W.barrier_hit_frenet = lambda h, cx, cy, rx, ry, th, ka, lb, rb: (
    jnp.broadcast_to(False, jnp.broadcast_shapes(
        jnp.shape(cx), jnp.shape(rx), jnp.shape(lb))))
run("frenet barrier stubbed (False)")
W.barrier_hit_frenet = orig_bhf
