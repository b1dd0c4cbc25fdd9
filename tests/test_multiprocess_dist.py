"""Executed multi-PROCESS jax.distributed path (SURVEY.md §4 item 4,
BASELINE configs 4-5): spawn 2 worker processes with 4 virtual CPU devices
each, build the global 8-device mesh, feed per-process local shards through
dist.global_batch, run the sharded solve step, and check the psum-reduced
global stats against a single-process solve of the same batch."""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

# Both tests spawn 2 compile-heavy jax.distributed child processes; on the
# 2-core CI box they must never run concurrently with each other (4 child
# compiles + 2 xdist workers blows the children's wall budget). The
# xdist_group + --dist loadgroup (pyproject.toml) pins them to one worker,
# serialized.
pytestmark = pytest.mark.xdist_group("jax_distributed_subprocess")

HERE = os.path.dirname(os.path.abspath(__file__))


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run_workers(nproc, B, mode):
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    coordinator = f"localhost:{_free_port()}"

    workers = [
        subprocess.Popen(
            [sys.executable, os.path.join(HERE, "dist_worker.py"),
             "--coordinator", coordinator, "--nproc", str(nproc),
             "--pid", str(pid), "--batch", str(B), "--mode", mode],
            env=env, cwd=os.path.dirname(HERE),
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for pid in range(nproc)
    ]
    outs = []
    try:
        for w in workers:
            out, _ = w.communicate(timeout=900)
            outs.append(out)
    finally:
        for w in workers:
            if w.poll() is None:
                w.kill()
    for w, out in zip(workers, outs):
        assert w.returncode == 0, out

    lines = [l for l in outs[0].splitlines() if l.startswith("STATS ")]
    assert lines, "\n".join(outs)
    return json.loads(lines[-1][len("STATS "):])


def test_two_process_distributed_solve_matches_single_process():
    nproc = 2
    B = 16
    stats = _run_workers(nproc, B, "solve")
    assert stats["n_processes"] == nproc
    assert stats["n_devices"] == 8  # 2 processes x 4 virtual devices

    # single-process reference on the identical batch (this test process
    # runs on 8 virtual devices too, but unsharded here)
    import jax.numpy as jnp

    from __graft_entry__ import _synthetic_problem
    from cilqr_tpu.batch import device_metrics, solve_batch

    cfg, goals, starts, cons = _synthetic_problem(
        batch=B, n_knots=21, dtype=jnp.float32)
    res = solve_batch(goals, starts, cons, cfg.ilqr, cfg.vehicle,
                      cfg.delta_t)
    want = {k: float(v) for k, v in device_metrics(res).items()}

    assert stats["n"] == want["n"] == B
    assert stats["converged"] == want["converged"]
    assert stats["iters_sum"] == want["iters_sum"]
    np.testing.assert_allclose(stats["cost_sum"], want["cost_sum"],
                               rtol=1e-4)


def test_two_process_distributed_pipeline_matches_single_process():
    """The headline-metric program — the FULL replan pipeline (DP ->
    corridor -> prep -> blast solve, real pedestrian_test scenarios, 81
    knots) — executed across a real 2-process jax.distributed mesh, each
    process contributing its own scenario shard; the psum-reduced global
    stats must match a single-process plan_batch of the identical batch
    (f64: per-lane decisions are width-independent there, see
    test_batch_dist.py's single-process sharded-vs-unsharded gate).

    B=64 (8 scenarios per device, round 4): wide enough that the blast
    solver's converged-lane compaction cascade actually engages on each
    device shard (at the old B=8 every shard ran one lane and the
    cascade degenerated); the full production width (64/device = 512) is
    exercised by __graft_entry__.dryrun_multichip, which this suite's
    2-core box cannot afford per run at f64."""
    nproc = 2
    B = 64
    stats = _run_workers(nproc, B, "pipeline")
    assert stats["n_processes"] == nproc
    assert stats["n_devices"] == 8

    import jax
    import jax.numpy as jnp

    from cilqr_tpu import pipeline, scenario
    from cilqr_tpu.batch import device_metrics
    from cilqr_tpu.config import PlannerConfig

    cfg = PlannerConfig()
    scns = scenario.make_scenario_batch(range(B), dtype=jnp.float64)
    scn0 = jax.tree.map(lambda a: a[0], scns)
    lane = pipeline.make_lane_tuple(scn0.left_barrier_xy,
                                    scn0.right_barrier_xy, cfg)
    spec = scenario.analytic_road_spec()
    starts = jnp.tile(jnp.asarray([0.0, 0.0, 0.0, 10.0], jnp.float64),
                      (B, 1))
    out = pipeline.plan_batch(scns, starts, cfg, None, lane, spec=spec)
    want = {k: float(v) for k, v in device_metrics(out.solve).items()}
    want["dp_ok"] = float(out.dp_ok.sum())
    want["ok"] = float(out.ok.sum())

    assert stats["n"] == want["n"] == B
    assert stats["converged"] == want["converged"] == B
    assert stats["ok"] == want["ok"] == B
    assert stats["dp_ok"] == want["dp_ok"] == B
    # per-lane decisions are width-independent in POSITION but not WIDTH:
    # the 2-process mesh solves at per-device width 8 vs the reference's
    # width 64, and threshold-chaotic lanes can fork (docs/PERF.md "fp
    # sensitivity"; cf. test_batch_dist's 2-lane allowance). Bound the
    # aggregate drift rather than pinning bitwise sums (scaled from the
    # B=8 test's 30-iteration allowance).
    # a width-forked REPAIRED lane also swings the sum by its repair
    # solve's iterations (cold rounds run ~80, pipeline._repair_batch)
    assert abs(stats["iters_sum"] - want["iters_sum"]) <= 300, (
        stats["iters_sum"], want["iters_sum"])
    # cost_sum is a 64-lane aggregate dominated by whether any
    # CATASTROPHIC-basin lane got repaired: a width-forked chaotic lane
    # can land in a ~250k-cost basin on one width while the other
    # width's repair clears it to a normal ~3k (measured round 5: 35%
    # swing of the sum from ONE such lane — the repair sub-batch also
    # solves at different widths sharded vs unsharded). Bound at 2x:
    # a wiring bug (stale shard, wrong corridor times) still blows the
    # sum by an order of magnitude.
    np.testing.assert_allclose(stats["cost_sum"], want["cost_sum"],
                               rtol=1.0)

    # the deployment loop across the same 2-process mesh (round 5): one
    # warm MPC replan cycle ran under shard_map seeded from the
    # pipeline's plans — every cycle converged against freshly-built
    # corridors, no lane-window clips, and the executed-horizon repair
    # accounting holds (dist.sharded_mpc_step)
    assert stats["mpc_cycles"] == B
    # warm cycles whose shifted plan is already optimal exit via lambda
    # overflow (the reference's kUnsolved-but-emit path, measured 6/64 at
    # f64 — see dist.sharded_mpc_step); every cycle must be one or the
    # other, with the lambda exits a bounded minority
    assert (stats["mpc_converged_cycles"]
            + stats["mpc_lambda_fail_cycles"]) == B, stats
    assert stats["mpc_lambda_fail_cycles"] <= 10, stats
    assert stats["mpc_corridor_ok_cycles"] == B
    # the lane-window drift guard fires on ~0.2% of cycles at bench
    # scale (a characterized chaotic-lane phenomenon surfaced per cycle,
    # not suppressed) — bound it rather than pinning zero
    assert stats["mpc_lane_clipped"] <= 2, stats
    assert stats["mpc_near_hit_cycles"] <= 3, stats
    assert (stats["mpc_repaired_cycles"] + stats["mpc_still_dirty_cycles"]
            >= stats["mpc_near_hit_cycles"]), stats
    assert stats["mpc_still_dirty_cycles"] <= 1, stats
