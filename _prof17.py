"""DP ablation with analytic spec."""
import dataclasses, time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp
import numpy as np
from cilqr_tpu import scenario as SC
from cilqr_tpu import dp as DP
from cilqr_tpu import world as W
from cilqr_tpu import reference_line as RL
from cilqr_tpu.config import PlannerConfig

B = 64
cfg0 = PlannerConfig()
cfg = dataclasses.replace(cfg0, dp=dataclasses.replace(cfg0.dp, collision_mode="frenet"))
dtype = jnp.float32
scns = SC.make_scenario_batch(range(B), dtype=dtype)
starts = jnp.tile(jnp.asarray([0.0, 0.0, 0.0, 10.0], dtype), (B, 1))
spec = SC.analytic_road_spec(dtype=np.float32)

def run(name):
    def dpf(s, st):
        r = jax.vmap(lambda a, b: DP.plan(a, b[0], b[1], b[2], cfg, None, spec=spec))(s, st)
        return r.traj.x.sum() + r.min_cost.sum()
    f = jax.jit(dpf)
    out = f(scns, starts); jax.block_until_ready(out)
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        out = f(scns, starts)
        _ = out.sum().item()
        ts.append(time.perf_counter() - t0)
    print(f"{name:44s} {min(ts)*1e3:8.1f} ms (B={B})", flush=True)

run("full (analytic)")

o = W.point_hits_dilated
W.point_hits_dilated = lambda d, cx, cy: jnp.zeros(
    jnp.broadcast_shapes(jnp.shape(cx), d.valid.shape), bool)
run("- obstacle hits")
W.point_hits_dilated = o

o2 = W.barrier_hit_frenet
W.barrier_hit_frenet = lambda h, cx, cy, rx, ry, th, ka, lb, rb: (
    jnp.broadcast_to(False, jnp.broadcast_shapes(jnp.shape(cx), jnp.shape(rx), jnp.shape(lb))))
run("- frenet barrier")
W.barrier_hit_frenet = o2

o3 = RL.evaluate_station_fields_analytic
def cheap_eval(sp, st, fields=RL.DP_FIELDS):
    z = st * 0.001
    out = {}
    for f in fields:
        out[f] = z + {"x": 1.0, "y": 2.0, "theta": 0.1, "kappa": 0.0,
                      "left_bound": 2.5, "right_bound": 6.0}[f]
    return out
RL.evaluate_station_fields_analytic = cheap_eval
run("- analytic eval stubbed")
RL.evaluate_station_fields_analytic = o3

o4 = W.dyn_polys_at
def dz(scn, times):
    r = o4(scn, times)
    return jax.tree.map(jnp.zeros_like, r)
run("full again (sanity)")
