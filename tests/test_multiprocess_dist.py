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

HERE = os.path.dirname(os.path.abspath(__file__))


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_solve_matches_single_process():
    nproc = 2
    B = 16
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    coordinator = f"localhost:{_free_port()}"

    workers = [
        subprocess.Popen(
            [sys.executable, os.path.join(HERE, "dist_worker.py"),
             "--coordinator", coordinator, "--nproc", str(nproc),
             "--pid", str(pid), "--batch", str(B)],
            env=env, cwd=os.path.dirname(HERE),
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for pid in range(nproc)
    ]
    outs = []
    try:
        for w in workers:
            out, _ = w.communicate(timeout=600)
            outs.append(out)
    finally:
        for w in workers:
            if w.poll() is None:
                w.kill()
    for w, out in zip(workers, outs):
        assert w.returncode == 0, out

    lines = [l for l in outs[0].splitlines() if l.startswith("STATS ")]
    assert lines, "\n".join(outs)
    stats = json.loads(lines[-1][len("STATS "):])
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
