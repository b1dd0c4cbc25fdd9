"""B scaling + kernel count of DP program."""
import time, re, collections
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp
from cilqr_tpu import scenario as SC
from cilqr_tpu import world as W
from cilqr_tpu import dp as DP
from cilqr_tpu.config import PlannerConfig

cfg = PlannerConfig()
dtype = jnp.float32
cl1 = SC.make_centerline()
barriers = SC.build_road_barriers(cl1)
grid = W.build_barrier_grid(barriers[0], cfg.dp.grid_cell, half=cfg.vehicle.radius)

def timeit(name, fn, *args):
    f = jax.jit(fn)
    out = f(*args); jax.block_until_ready(out)
    ts = []
    for _ in range(4):
        t0 = time.perf_counter()
        out = f(*args)
        _ = jax.tree.leaves(out)[0].sum().item()
        ts.append(time.perf_counter() - t0)
    print(f"{name:44s} {min(ts)*1e3:8.1f} ms", flush=True)
    return f

def dpf(s, st):
    r = jax.vmap(lambda a, b: DP.plan(a, b[0], b[1], b[2], cfg, grid))(s, st)
    return r.traj.x.sum()

for B in (1, 8, 32, 128):
    scns = SC.make_scenario_batch(range(B), dtype=dtype)
    starts = jnp.tile(jnp.asarray([0.0, 0.0, 0.0, 10.0], dtype), (B, 1))
    f = timeit(f"dp full B={B}", dpf, scns, starts)
    if B == 32:
        txt = jax.jit(dpf).lower(scns, starts).compile().as_text()
        # entry computation instruction count
        m = re.search(r"ENTRY[^\{]*\{(.*?)\n\}", txt, re.S)
        body = m.group(1)
        ops = collections.Counter(mm.group(1) for mm in re.finditer(r"= \S+ (\S+?)\(", body))
        print("entry instrs:", sum(ops.values()))
        for k, v in ops.most_common(15): print(f"   {k:20s} {v}")
