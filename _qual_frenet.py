"""Qualify frenet DP mode vs exact and grid on pedestrian_test seeds."""
import dataclasses
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np
from cilqr_tpu import dp as DP
from cilqr_tpu import scenario as SC
from cilqr_tpu import world as W
from cilqr_tpu.config import PlannerConfig

CFG = PlannerConfig()
modes = {}
for m in ("exact", "grid", "frenet"):
    modes[m] = dataclasses.replace(CFG, dp=dataclasses.replace(CFG.dp, collision_mode=m))

agree_g = agree_f = n = 0
for seed in range(12):
    scn = SC.make_scenario(seed=seed, dtype=jnp.float64)
    grid = W.build_barrier_grid(np.asarray(scn.barrier_xy), CFG.dp.grid_cell,
                                half=CFG.vehicle.radius)
    res = {}
    for m, cfg in modes.items():
        res[m] = DP.plan(scn, 0.0, 0.0, 0.0, cfg,
                         grid if m == "grid" else None)
    e = res["exact"]
    for m in ("grid", "frenet"):
        r = res[m]
        same = (np.array_equal(np.asarray(r.sel_s), np.asarray(e.sel_s)) and
                np.array_equal(np.asarray(r.sel_l), np.asarray(e.sel_l)))
        dtraj = float(jnp.abs(r.traj.x - e.traj.x).max() +
                      jnp.abs(r.traj.y - e.traj.y).max())
        print(f"seed {seed:2d} {m:7s} cells_same={same} dcost="
              f"{float(r.min_cost - e.min_cost):+.3g} dtraj={dtraj:.3g}")
        if m == "grid": agree_g += same
        else: agree_f += same
    n += 1
print(f"\ngrid agrees {agree_g}/{n}, frenet agrees {agree_f}/{n}")
