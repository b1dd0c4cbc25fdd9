"""Wider frenet qualification: 24 seeds x 3 perturbed starts vs exact."""
import dataclasses
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np
from cilqr_tpu import dp as DP
from cilqr_tpu import scenario as SC
from cilqr_tpu.config import PlannerConfig

CFG = PlannerConfig()
cfg_e = dataclasses.replace(CFG, dp=dataclasses.replace(CFG.dp, collision_mode="exact"))
cfg_f = dataclasses.replace(CFG, dp=dataclasses.replace(CFG.dp, collision_mode="frenet"))
rng = np.random.default_rng(123)
same = tot = 0
diffs = []
for seed in range(24):
    scn = SC.make_scenario(seed=seed, dtype=jnp.float64)
    for p in range(3):
        x0 = float(rng.uniform(-0.5, 0.5)); y0 = float(rng.uniform(-0.3, 0.3))
        th0 = float(rng.uniform(-0.1, 0.1))
        re = DP.plan(scn, x0, y0, th0, cfg_e, None)
        rf = DP.plan(scn, x0, y0, th0, cfg_f, None)
        ok = (np.array_equal(np.asarray(rf.sel_s), np.asarray(re.sel_s)) and
              np.array_equal(np.asarray(rf.sel_l), np.asarray(re.sel_l)))
        same += ok; tot += 1
        if not ok:
            diffs.append((seed, p, float(rf.min_cost - re.min_cost)))
print(f"frenet winning-cell agreement vs exact: {same}/{tot}")
print("diffs:", diffs)
