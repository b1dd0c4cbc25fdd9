"""Corridor stage split: seeds vs hull1 vs downstream, honest timing."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from cilqr_tpu import corridor as cm
from cilqr_tpu import dp as dp_mod
from cilqr_tpu import pipeline, scenario
from cilqr_tpu.config import PlannerConfig
from cilqr_tpu.geometry import convex_hull_masked

cfg = PlannerConfig()
import dataclasses
cfg = dataclasses.replace(cfg, dp=dataclasses.replace(cfg.dp, collision_mode="frenet"))
B = 64
INNER = 4
dtype = jnp.float32

cl = scenario.make_centerline()
barriers = scenario.build_road_barriers(cl)
lane = pipeline.make_lane_tuple(barriers[1], barriers[2], cfg, np.float32)
scns = scenario.make_scenario_batch(range(B), dtype=dtype)
starts = jnp.tile(jnp.asarray([0.0, 0.0, 0.0, 10.0], dtype), (B, 1))


def dp_batch(starts):
    def one(scn, st):
        return dp_mod.plan(scn, st[0], st[1], st[2], cfg, None)
    return jax.vmap(one)(scns, starts)


dp_res = jax.jit(dp_batch)(starts)
traj = jax.block_until_ready(dp_res.traj)


def seeds_only(traj, d):
    def one_scn(scn, tr):
        def one(x, y, th, t):
            return cm.corridor_seed_points(scn, x, y, th, t, cfg.corridor,
                                           cfg.corridor.max_points)
        return jax.vmap(one)(tr.x + d, tr.y, tr.theta, tr.time)
    return jax.vmap(one_scn)(scns, traj)


def hull1_only(traj, d):
    pts, mask = seeds_only(traj, d)
    K = pts.shape[-2]
    ox = (traj.x + d)[..., None]
    oy = traj.y[..., None]
    dx = pts[..., 0] - ox
    dy = pts[..., 1] - oy
    norm = jnp.hypot(dx, dy)
    valid = (mask & (jnp.abs(dx) <= 25.0) & (jnp.abs(dy) <= 25.0)
             & (norm >= 1e-10))
    scale = jnp.where(valid, 2.0 * 150.0 / jnp.where(norm > 0, norm, 1.0)
                      - 1.0, 0.0)
    fx = dx * scale
    fy = dy * scale
    z = jnp.zeros(fx.shape[:-1] + (1,), fx.dtype)
    flip = jnp.stack([jnp.concatenate([fx, z], -1),
                      jnp.concatenate([fy, z], -1)], axis=-1)
    fmask = jnp.concatenate([valid, jnp.ones(valid.shape[:-1] + (1,), bool)],
                            -1)
    f2 = lambda p, m: convex_hull_masked(p, m, return_indices=True)
    out = jax.vmap(jax.vmap(f2))(flip, fmask)
    return out[2]


def full(traj, d):
    def one_scn(scn, tr):
        return cm.plan_corridors(
            scn, tr.replace(x=tr.x + d), cfg.corridor, lane)
    return jax.vmap(one_scn)(scns, traj)


def timeit(name, fn, red):
    @jax.jit
    def many(traj, deltas):
        return jax.lax.map(lambda d: red(fn(traj, d)), deltas).sum()

    rng = np.random.default_rng(0)
    mk = lambda: jnp.asarray(rng.uniform(-0.01, 0.01, (INNER,)), dtype)
    _ = float(many(traj, mk()))
    ts = []
    for _ in range(3):
        dd = jax.block_until_ready(mk())
        t0 = time.perf_counter()
        v = float(many(traj, dd))
        ts.append((time.perf_counter() - t0) * 1e3)
    per = min(ts) / INNER
    print(f"{name}: {per:.1f} ms per B={B} dispatch")


timeit("seeds", seeds_only, lambda o: o[0].sum())
timeit("seeds+flip+hull1", hull1_only, lambda o: o.sum())
timeit("full corridor", full, lambda o: o.planes.sum())
