"""Scenario/result checkpointing (npz).

Replaces the reference's pickle serialize/replay fixture mechanism
(reference_publisher.py:232-236, pickle_publisher.py:24-40) with flat npz
archives of the Scenario/SolveResult pytrees — the solver itself stays
pure-functional and stateless per call (SURVEY.md §5)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .types import CostBreakdown, Scenario, SolveResult, Traj


def _flatten(prefix, tree, out):
    leaves, treedef = jax.tree_util.tree_flatten_with_path(tree)
    for path, leaf in leaves:
        key = prefix + "/".join(str(getattr(p, "name", getattr(p, "idx", p)))
                                for p in path)
        out[key] = np.asarray(leaf)


def save_scenario(path, scn: Scenario):
    out = {}
    _flatten("scn:", scn, out)
    np.savez_compressed(path, **out)


def load_scenario(path, dtype=jnp.float32) -> Scenario:
    data = np.load(path)

    def get(name, cast=True):
        a = data[f"scn:{name}"]
        if cast and a.dtype.kind == "f":
            return jnp.asarray(a, dtype)
        return jnp.asarray(a)

    cl = Traj(**{f: get(f"centerline/{f}") for f in Traj.__dataclass_fields__})
    return Scenario(
        centerline=cl,
        static_obs=get("static_obs"), static_mask=get("static_mask"),
        dyn_obs=get("dyn_obs"), dyn_times=get("dyn_times"),
        dyn_mask=get("dyn_mask"), dyn_len=get("dyn_len"),
        barrier_xy=get("barrier_xy"), barrier_mask=get("barrier_mask"),
        left_barrier_xy=get("left_barrier_xy"),
        left_barrier_mask=get("left_barrier_mask"),
        right_barrier_xy=get("right_barrier_xy"),
        right_barrier_mask=get("right_barrier_mask"))


def save_result(path, res: SolveResult):
    out = {}
    _flatten("res:", res, out)
    np.savez_compressed(path, **out)


def load_result(path) -> SolveResult:
    data = np.load(path)

    def get(name):
        return jnp.asarray(data[f"res:{name}"])

    return SolveResult(
        xs=get("xs"), us=get("us"), status=get("status"), iters=get("iters"),
        cost=CostBreakdown(total=get("cost/total"), target=get("cost/target"),
                           dynamic=get("cost/dynamic"),
                           corridor=get("cost/corridor"),
                           lane=get("cost/lane")),
        lam=get("lam"), init_xs=get("init_xs"), init_us=get("init_us"),
        lane_clipped=(get("lane_clipped")
                      if "res:lane_clipped" in data else None))
