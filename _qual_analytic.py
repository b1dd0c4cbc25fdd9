"""Qualify analytic station eval vs the table path on pedestrian_test seeds."""
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import dataclasses
import jax.numpy as jnp
import numpy as np
from cilqr_tpu import dp as DP
from cilqr_tpu import scenario as SC
from cilqr_tpu.config import PlannerConfig

CFG0 = PlannerConfig()
CFG = dataclasses.replace(CFG0, dp=dataclasses.replace(
    CFG0.dp, collision_mode="frenet"))

for dtype, jdt in (("f64", jnp.float64), ("f32", jnp.float32)):
    spec = SC.analytic_road_spec(dtype=np.float64 if dtype == "f64"
                                 else np.float32)
    agree = 0
    n = 12
    for seed in range(n):
        scn = SC.make_scenario(seed=seed, dtype=jdt)
        t = DP.plan(scn, 0.0, 0.0, 0.0, CFG, None)
        a = DP.plan(scn, 0.0, 0.0, 0.0, CFG, None, spec=spec)
        same = (np.array_equal(np.asarray(a.sel_s), np.asarray(t.sel_s)) and
                np.array_equal(np.asarray(a.sel_l), np.asarray(t.sel_l)))
        dtraj = float(jnp.abs(a.traj.x - t.traj.x).max() +
                      jnp.abs(a.traj.y - t.traj.y).max())
        dc = float(a.min_cost - t.min_cost)
        print(f"{dtype} seed {seed:2d} cells_same={same} dcost={dc:+.3g} "
              f"dtraj={dtraj:.3g}")
        agree += same
    print(f"{dtype}: {agree}/{n} agree\n")
