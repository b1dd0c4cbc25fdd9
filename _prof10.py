import time, re
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp
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
grid = W.build_barrier_grid(barriers[0], cfg.dp.grid_cell, half=cfg.vehicle.radius)
starts = jnp.tile(jnp.asarray([0.0, 0.0, 0.0, 10.0], dtype), (B, 1))
print("grid dilated shape:", None if grid.dilated is None else grid.dilated.shape)

def timeit(name, f, *args):
    out = f(*args); jax.block_until_ready(out)
    ts = []
    for _ in range(4):
        t0 = time.perf_counter()
        out = f(*args)
        _ = jax.tree.leaves(out)[0].sum().item()
        ts.append(time.perf_counter() - t0)
    print(f"{name:48s} {min(ts)*1e3:8.1f} ms", flush=True)

# stub barrier_box_hit_dilated only (as imported into world's own namespace)
orig = W.barrier_box_hit_dilated
W.barrier_box_hit_dilated = lambda g, minx, miny, maxx, maxy: jnp.zeros(jnp.broadcast_shapes(jnp.shape(minx)), bool)
def dpf_stub(s, st):
    r = jax.vmap(lambda a, b: DP.plan(a, b[0], b[1], b[2], cfg, grid))(s, st)
    return r.traj.x.sum()
j = jax.jit(dpf_stub)
txt = j.lower(scns, starts).compile().as_text()
print("s8 gathers in stubbed HLO:", len(re.findall(r"gather\(", txt)))
timeit("dp with grid-gather stubbed", j, scns, starts)
W.barrier_box_hit_dilated = orig

# gather microbenchmarks
N = 2508800
T = 2532332
key = jax.random.PRNGKey(0)
idx = jax.random.randint(key, (N,), 0, T)
tab8 = jnp.zeros((T,), jnp.int8)
tab32 = jnp.zeros((T,), jnp.int32)
tabf = jnp.zeros((T,), jnp.float32)

timeit("gather s8 flat (as shipped)", jax.jit(lambda t, i: (t[i] > 0).sum()), tab8, idx)
timeit("gather s32 flat", jax.jit(lambda t, i: (t[i] > 0).sum()), tab32, idx)
timeit("gather f32 flat", jax.jit(lambda t, i: (t > 0.).astype(jnp.float32)[i].sum()), tabf, idx)
# 5D-shaped indices like in the program
idx5 = idx.reshape(32, 70, 7, 10, 16)
timeit("gather s8 5d idx", jax.jit(lambda t, i: (t[i] > 0).sum()), tab8, idx5)
