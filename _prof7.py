"""DP attribution round 3: stub variants, honest sync."""
import time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp
from cilqr_tpu import scenario as SC
from cilqr_tpu import world as W
from cilqr_tpu import dp as DP
from cilqr_tpu import reference_line as RL
from cilqr_tpu.config import PlannerConfig

B = 32
cfg = PlannerConfig()
dtype = jnp.float32
scns = SC.make_scenario_batch(range(B), dtype=dtype)
cl1 = SC.make_centerline()
barriers = SC.build_road_barriers(cl1)
grid = W.build_barrier_grid(barriers[0], cfg.dp.grid_cell, half=cfg.vehicle.radius)
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

def dpf(s, st):
    r = jax.vmap(lambda a, b: DP.plan(a, b[0], b[1], b[2], cfg, grid))(s, st)
    return r.traj.x.sum()

timeit("dp full", dpf, scns, starts)

# stub 1: _segment_cost -> zeros (kills collision + off-road + heading math)
orig_seg = DP._segment_cost
def seg_stub(cl, scn, grid, cfg, s_pts, l_pts, last_s, last_l, dyn_polys,
             nseg, safe_margin, ref=None, dilated=None):
    return jnp.zeros(s_pts.shape[:-1], s_pts.dtype)
DP._segment_cost = seg_stub
timeit("dp seg_cost stubbed", dpf, scns, starts)
DP._segment_cost = orig_seg

# stub 2: collision only (keep off-road/station reads)
orig_coll = DP.check_optimization_collision
DP.check_optimization_collision = lambda *a, **k: jnp.zeros(a[2].shape, bool)
timeit("dp collision stubbed", dpf, scns, starts)
DP.check_optimization_collision = orig_coll

# stub 3: evaluate_station_fields -> zeros dict (kills all table reads)
orig_ev = RL.evaluate_station_fields
def ev_stub(cl, s, fields=("x","y","theta","kappa","left_bound","right_bound"), packed=None):
    z = jnp.zeros_like(s)
    return {f: z for f in fields}
RL.evaluate_station_fields = ev_stub
DP.evaluate_station_fields = ev_stub
timeit("dp station fields stubbed", dpf, scns, starts)
RL.evaluate_station_fields = orig_ev
DP.evaluate_station_fields = orig_ev

# stub 4: both
DP._segment_cost = seg_stub
RL.evaluate_station_fields = ev_stub
DP.evaluate_station_fields = ev_stub
timeit("dp seg+fields stubbed", dpf, scns, starts)
DP._segment_cost = orig_seg
RL.evaluate_station_fields = orig_ev
DP.evaluate_station_fields = orig_ev
