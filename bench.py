"""Benchmark: batched CILQR solves/s on one chip, on real pedestrian_test
problems.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is measured against the driver-set target of 1000 solves/s/chip
(BASELINE.md; the reference publishes no numbers — it is a single-threaded
C++ planner with an implied 0.1 s/cycle real-time budget).

Problem data: benchdata/problems.npz — 256 random pedestrian_test scenarios
taken through the DP coarse planner + corridor construction + constraint
prep (regenerate with `python -m cilqr_tpu.bench_prep`). The timed region
is the batched barrier-CILQR solve (vmapped while_loop solver), the
dominant stage. Falls back to a synthetic wide-corridor problem if the
fixture is missing (easier problems; labeled accordingly).
"""

import json
import os
import time

import numpy as np

FIXTURE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "benchdata", "problems.npz")


def _load_fixture(dtype):
    import jax.numpy as jnp

    from cilqr_tpu.costs import ConstraintSet, trim_constraints

    d = np.load(FIXTURE)
    goals = jnp.asarray(d["goals"], dtype)
    starts = jnp.asarray(d["starts"], dtype)
    cons = ConstraintSet(
        corridor_planes=jnp.asarray(d["corridor_planes"], dtype),
        corridor_mask=jnp.asarray(d["corridor_mask"]),
        left_planes=jnp.asarray(d["left_planes"], dtype),
        left_segs=jnp.asarray(d["left_segs"], dtype),
        left_mask=jnp.asarray(d["left_mask"]),
        right_planes=jnp.asarray(d["right_planes"], dtype),
        right_segs=jnp.asarray(d["right_segs"], dtype),
        right_mask=jnp.asarray(d["right_mask"]))
    # drop all-invalid padded slots (exact; fixture uses <=12 of 24
    # corridor planes and <=39 of 64 lane segments)
    return goals, starts, trim_constraints(cons)


def _pipeline_bench(latency: bool):
    """BENCH_MODE=pipeline / pipeline_latency: the FULL replan cycle on
    device — batched DP coarse search -> corridor construction ->
    constraint prep -> CILQR solve (pipeline.plan_batch), the reference's
    per-cycle stage sequence (trajectory_planner.cpp:28-94). Each inner
    rep perturbs the start state, which changes the DP projection, the
    corridors, and the solve — every replan is a distinct full problem.

    BENCH_STAGES=1 additionally times each stage's own jit and prints the
    split to stderr (per-dispatch timing: on the tunneled backend each
    figure carries the ~50 ms RPC constant, so the split is for locating
    the wall, not for summing)."""
    import sys

    import jax
    import jax.numpy as jnp

    from cilqr_tpu import pipeline, scenario, world
    from cilqr_tpu.config import PlannerConfig

    import dataclasses

    cfg = PlannerConfig()
    # DP road-barrier mode: 'frenet' (the config default — with the
    # RoadSpec below it runs the finite-extent per-segment test,
    # conservative-complete on every road family) or 'grid' (dilated
    # occupancy tables; its per-probe int8 gather was 160 of the 220 ms
    # DP stage at B=32). Qualified vs 'exact' winning cells over 16
    # seeds x {f64, f32} x two road families
    # (tests/test_dp_qualification.py).
    DP_MODE = os.environ.get("BENCH_DP_MODE", "frenet")
    cfg = dataclasses.replace(cfg, dp=dataclasses.replace(
        cfg.dp, collision_mode=DP_MODE))
    cs_backend = os.environ.get("BENCH_COST_STACK")
    if cs_backend:
        cfg = dataclasses.replace(cfg, ilqr=dataclasses.replace(
            cfg.ilqr, cost_stack_backend=cs_backend))
    k_alpha = os.environ.get("BENCH_ALPHAS_PER_TRIP")
    if k_alpha:
        cfg = dataclasses.replace(cfg, ilqr=dataclasses.replace(
            cfg.ilqr, line_search=dataclasses.replace(
                cfg.ilqr.line_search, alphas_per_trip=int(k_alpha))))
    if os.environ.get("BENCH_REPAIR") == "0":
        cfg = dataclasses.replace(cfg, repair=dataclasses.replace(
            cfg.repair, enabled=False))
    rm = os.environ.get("BENCH_REPAIR_MARGINS")
    if rm:
        cfg = dataclasses.replace(cfg, repair=dataclasses.replace(
            cfg.repair, margins=tuple(float(x) for x in rm.split(","))))
    rci = os.environ.get("BENCH_REPAIR_COLD_ITER")
    if rci:
        cfg = dataclasses.replace(cfg, repair=dataclasses.replace(
            cfg.repair, cold_max_iter=int(rci)))
    rbk = os.environ.get("BENCH_REPAIR_BRAKE")
    if rbk is not None:
        cfg = dataclasses.replace(cfg, repair=dataclasses.replace(
            cfg.repair, brake_factor=float(rbk)))
    # B=1024 measured best after the round-3 DP flop cuts: 2129 (256) /
    # 2219 (512) / 2068 (768) / 2335 (1024) replans/s
    B = int(os.environ.get("BENCH_BATCH", "1024"))
    INNER = int(os.environ.get("BENCH_INNER", "2"))
    REPS = int(os.environ.get("BENCH_REPS", "30" if latency else "4"))
    BACKEND = os.environ.get("BENCH_BACKEND", "blast")
    dtype = jnp.float32

    cl = scenario.make_centerline()
    barriers = scenario.build_road_barriers(cl)
    grid = (world.build_barrier_grid(barriers[0], cfg.dp.grid_cell,
                                     half=cfg.vehicle.radius)
            if DP_MODE == "grid" else None)
    lane = pipeline.make_lane_tuple(barriers[1], barriers[2], cfg,
                                    np.float32)
    # gather-free DP station evaluation + finite road test from the road
    # recipe (dp.plan spec; decision-identical to exact mode on the
    # qualification seeds, tests/test_dp_qualification.py);
    # BENCH_DP_ANALYTIC=0 falls back to packed-row table gathers and the
    # spec-less frenet stand-in
    spec = (scenario.analytic_road_spec(dtype=np.float32)
            if os.environ.get("BENCH_DP_ANALYTIC", "1") != "0" else None)
    scns = scenario.make_scenario_batch(range(B), dtype=dtype)
    starts = jnp.tile(jnp.asarray([0.0, 0.0, 0.0, 10.0], dtype), (B, 1))
    rng = np.random.default_rng(1)

    if latency:
        @jax.jit
        def step_once(scns, starts, d):
            out = pipeline.plan_batch(scns, starts.at[:, 1].add(d), cfg,
                                      grid, lane, backend=BACKEND, spec=spec)
            return out.solve.us.sum(), out.solve.iters.sum(), out.ok.sum()

        jax.block_until_ready(step_once(
            scns, starts, jnp.asarray(rng.uniform(-0.2, 0.2, B), dtype)))
        lat = []
        for _ in range(REPS):
            d = jnp.asarray(rng.uniform(-0.2, 0.2, B), dtype)
            jax.block_until_ready(d)
            t0 = time.perf_counter()
            out = step_once(scns, starts, d)
            _ = float(out[0])
            lat.append((time.perf_counter() - t0) * 1e3)
        p99 = float(np.percentile(lat, 99))
        print(json.dumps({
            "metric": f"batch{B}_full_replan_p99_ms",
            "value": round(p99, 2),
            "unit": "ms",
            "vs_baseline": round(100.0 / p99, 3),
        }))
        return

    @jax.jit
    def step_many(scns, starts, deltas):
        def one(d):
            out = pipeline.plan_batch(scns, starts.at[:, 1].add(d), cfg,
                                      grid, lane, backend=BACKEND, spec=spec)
            near = pipeline.NEAR_TERM_KNOTS
            return (out.solve.us.sum(), out.solve.iters.sum(), out.ok.sum(),
                    out.pre_hits[..., :near].any(-1).sum(),
                    out.repaired.sum(), out.still_dirty.sum())

        us_sum, it_sum, ok_sum, bad, rep, still = jax.lax.map(one, deltas)
        return (us_sum.sum(), it_sum.sum(), ok_sum.sum(), bad.sum(),
                rep.sum(), still.sum())

    def mk_deltas():
        return jnp.asarray(rng.uniform(-0.2, 0.2, (INNER, B)), dtype)

    out = step_many(scns, starts, mk_deltas())
    jax.block_until_ready(out)
    ok_frac = float(out[2]) / (B * INNER)
    bad_lanes = int(out[3])
    repaired_lanes = int(out[4])
    still_dirty_lanes = int(out[5])

    times = []
    for _ in range(REPS):
        d = mk_deltas()
        jax.block_until_ready(d)
        t0 = time.perf_counter()
        out = step_many(scns, starts, d)
        _ = float(out[0])
        times.append(time.perf_counter() - t0)
    best = min(times)
    rate = B * INNER / best

    if os.environ.get("BENCH_STAGES"):
        from cilqr_tpu import corridor as corridor_mod
        from cilqr_tpu import costs as costs_mod
        from cilqr_tpu import dp as dp_mod
        from cilqr_tpu.batch import solve_batch as _sb

        def dp_stage(scns, starts):
            return jax.vmap(lambda s, st: dp_mod.plan(
                s, st[0], st[1], st[2], cfg, grid, spec=spec))(scns, starts)

        def cor_stage(scns, trajs):
            return jax.vmap(lambda s, tr: corridor_mod.plan_corridors(
                s, tr, cfg.corridor, lane))(scns, trajs)

        def prep_solve_stage(cors, goals, start6):
            cons = costs_mod.shrink_and_normalize(
                cors.planes, cors.plane_mask,
                cors.left_planes, cors.left_segs, cors.left_mask,
                cors.right_planes, cors.right_segs, cors.right_mask,
                cfg.ilqr, cfg.vehicle)
            return _sb(goals, start6, cons, cfg.ilqr, cfg.vehicle,
                       cfg.delta_t, backend=BACKEND)

        dp_j = jax.jit(dp_stage)
        cor_j = jax.jit(cor_stage)
        ps_j = jax.jit(prep_solve_stage)
        start6 = jnp.concatenate(
            [starts, jnp.zeros((B, 2), dtype)], axis=-1)

        def timed(f, *a):
            out = f(*a)
            jax.block_until_ready(out)
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                out = f(*a)
                jax.block_until_ready(out)
                ts.append(time.perf_counter() - t0)
            return out, min(ts) * 1e3

        dp_res, t_dp = timed(dp_j, scns, starts)
        cors, t_cor = timed(cor_j, scns, dp_res.traj)
        goals = jnp.stack([dp_res.traj.x, dp_res.traj.y, dp_res.traj.theta,
                           dp_res.traj.velocity, dp_res.traj.a,
                           dp_res.traj.delta], axis=-1)
        _, t_solve = timed(ps_j, cors, goals, start6)
        print(f"stage split (ms per batch-{B} dispatch, incl. RPC "
              f"constant): dp={t_dp:.1f} corridor={t_cor:.1f} "
              f"prep+solve={t_solve:.1f}", file=sys.stderr)

    print(f"converged+ok fraction: {ok_frac:.4f}; lanes whose executed "
          f"near-term horizon (25 knots) re-checked dirty PRE-repair: "
          f"{bad_lanes}/{B * INNER}; repaired: {repaired_lanes}; still "
          f"dirty after repair: {still_dirty_lanes}", file=sys.stderr)
    # near_term_dirty_lanes rides the JSON so drift in the safety counter
    # is visible to BENCH_r*.json parsers, not stderr-only; it counts the
    # PRE-repair re-check (the characterized rel-cost-stop phenomenon,
    # comparable to BENCH_r04). repaired/still_dirty expose the round-5
    # repair loop's action INSIDE the timed region (its cost is in the
    # headline). NOT folded into "ok": ok = converged & corridors-built
    # (solver-level health); the re-check is a distinct safety lens
    # whose budget gate F pins separately.
    print(json.dumps({
        "metric": "full_replans_per_s_per_chip",
        "value": round(rate, 2),
        "unit": "replans/s",
        "vs_baseline": round(rate / 1000.0, 3),
        "near_term_dirty_lanes": bad_lanes,
        "repaired_lanes": repaired_lanes,
        "still_dirty_lanes": still_dirty_lanes,
        "total_lanes": B * INNER,
    }))


def _mpc_bench():
    """BENCH_MODE=mpc: batched receding-horizon MPC (BASELINE config 4) —
    B vehicles replanning together, n_cycles warm-started corridor+solve
    cycles per dispatch (mpc.mpc_scan_batch; DP runs once for the initial
    plan, replan cycles shift the previous solution). Reports replan
    cycles/s/chip against the 1000/s target, plus the warm-start
    iteration saving vs the cold first solve on stderr."""
    import sys

    import jax
    import jax.numpy as jnp

    from cilqr_tpu import mpc, pipeline, scenario, world
    from cilqr_tpu.config import PlannerConfig

    cfg = PlannerConfig()
    import dataclasses

    k_alpha = os.environ.get("BENCH_ALPHAS_PER_TRIP")
    if k_alpha:
        cfg = dataclasses.replace(cfg, ilqr=dataclasses.replace(
            cfg.ilqr, line_search=dataclasses.replace(
                cfg.ilqr.line_search, alphas_per_trip=int(k_alpha))))
    if os.environ.get("BENCH_REPAIR") == "0":
        cfg = dataclasses.replace(cfg, repair=dataclasses.replace(
            cfg.repair, enabled=False))
    # Batch sweep history: 3,653 at B=256 / 3,769 at B=512 (round 3);
    # with the round-4 paired line search the warm solve's share shrank
    # and B=1024 edges ahead — 5,990 (B=512) vs 6,141/6,142 (B=1024, two
    # runs, identical safety counters 328/8192 dirty, 29/8192 clipped).
    B = int(os.environ.get("BENCH_BATCH", "1024"))
    CYCLES = int(os.environ.get("BENCH_CYCLES", "8"))
    REPS = int(os.environ.get("BENCH_REPS", "4"))
    BACKEND = os.environ.get("BENCH_BACKEND", "blast")
    dtype = jnp.float32

    cl = scenario.make_centerline()
    barriers = scenario.build_road_barriers(cl)
    grid = (world.build_barrier_grid(barriers[0], cfg.dp.grid_cell,
                                     half=cfg.vehicle.radius)
            if cfg.dp.collision_mode == "grid" else None)
    lane = pipeline.make_lane_tuple(barriers[1], barriers[2], cfg,
                                    np.float32)
    spec = (scenario.analytic_road_spec(dtype=np.float32)
            if cfg.dp.collision_mode == "frenet" else None)
    scns = scenario.make_scenario_batch(range(B), dtype=dtype)
    starts = jnp.tile(jnp.asarray([0.0, 0.0, 0.0, 10.0], dtype), (B, 1))

    out0 = jax.jit(lambda s, st: pipeline.plan_batch(
        s, st, cfg, grid, lane, backend=BACKEND, spec=spec))(scns, starts)
    jax.block_until_ready(out0.solve.xs)
    cold_iters = float(out0.solve.iters.mean())

    @jax.jit
    def roll(scns, xs, us):
        carry = mpc.MpcCarry(xs=xs, us=us,
                             cycle_time=jnp.zeros((xs.shape[0],), dtype))
        final, st = mpc.mpc_scan_batch(scns, carry, cfg, lane, CYCLES,
                                       backend=BACKEND, spec=spec)
        return (final.xs.sum(), st.iters.sum(),
                st.iters.astype(jnp.float32).mean(), st.corridor_ok.all(),
                st.lane_clipped.sum(), st.pre_near_hits.sum(),
                st.repaired.sum(), st.still_dirty.sum())

    out = roll(scns, out0.solve.xs, out0.solve.us)
    jax.block_until_ready(out)
    warm_iters = float(out[2])
    times = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        out = roll(scns, out0.solve.xs, out0.solve.us)
        _ = float(out[0])
        times.append(time.perf_counter() - t0)
    rate = B * CYCLES / min(times)
    near_dirty = int(out[5])
    print(f"warm-start iters/cycle: {warm_iters:.2f} vs cold "
          f"{cold_iters:.2f}; corridors ok: {bool(out[3])}; "
          f"lane windows clipped: {int(out[4])}/{B * CYCLES}; "
          f"executed-horizon re-check dirty cycles PRE-repair: "
          f"{near_dirty}/{B * CYCLES}; repaired: {int(out[6])}; still "
          f"dirty: {int(out[7])}",
          file=sys.stderr)
    print(json.dumps({
        "metric": "mpc_replan_cycles_per_s_per_chip",
        "value": round(rate, 2),
        "unit": "cycles/s",
        "vs_baseline": round(rate / 1000.0, 3),
        "near_term_dirty_cycles": near_dirty,
        "repaired_cycles": int(out[6]),
        "still_dirty_cycles": int(out[7]),
        "total_cycles": B * CYCLES,
        "lane_windows_clipped": int(out[4]),
    }))


def _device_latency_bench():
    """BENCH_MODE=device_latency (VERDICT r4 item 2): MEASURED on-device
    execution time of single un-amortized full-replan dispatches at
    B in BENCH_DEVLAT_BATCHES (default 32,64,128,256), against the 0.1 s
    real-time cycle budget (planner_config.h:94).

    Wall-clock p99 on this rig is floored by the tunnel's RPC dispatch
    tail (~170 ms, docs/PERF.md) — so the real-time envelope claim must
    come from the DEVICE timeline, which jax.profiler captures through
    the tunnel: each batch size runs REPS dispatches under one trace and
    profiling.device_dispatch_times clusters the device events per
    dispatch. The RPC constant is thereby measured OUT explicitly, not
    modeled away."""
    import shutil
    import sys
    import tempfile

    import jax
    import jax.numpy as jnp

    from cilqr_tpu import pipeline, scenario
    from cilqr_tpu.config import PlannerConfig
    from cilqr_tpu.profiling import device_dispatch_times

    cfg = PlannerConfig()
    if os.environ.get("BENCH_REPAIR") == "0":
        import dataclasses

        cfg = dataclasses.replace(cfg, repair=dataclasses.replace(
            cfg.repair, enabled=False))
    batches = [int(b) for b in os.environ.get(
        "BENCH_DEVLAT_BATCHES", "32,64,128,256").split(",")]
    REPS = int(os.environ.get("BENCH_REPS", "12"))
    dtype = jnp.float32

    cl = scenario.make_centerline()
    barriers = scenario.build_road_barriers(cl)
    lane = pipeline.make_lane_tuple(barriers[1], barriers[2], cfg,
                                    np.float32)
    spec = scenario.analytic_road_spec(dtype=np.float32)
    rng = np.random.default_rng(1)
    table = {}
    for B in batches:
        scns = scenario.make_scenario_batch(range(B), dtype=dtype)
        starts = jnp.tile(jnp.asarray([0.0, 0.0, 0.0, 10.0], dtype),
                          (B, 1))

        @jax.jit
        def step_once(scns, starts, d):
            out = pipeline.plan_batch(scns, starts.at[:, 1].add(d), cfg,
                                      None, lane, spec=spec)
            return out.solve.us.sum(), out.ok.sum()

        jax.block_until_ready(step_once(
            scns, starts, jnp.asarray(rng.uniform(-0.2, 0.2, B), dtype)))
        logdir = tempfile.mkdtemp(prefix=f"devlat_b{B}_")
        jax.profiler.start_trace(logdir)
        for _ in range(REPS):
            d = jnp.asarray(rng.uniform(-0.2, 0.2, B), dtype)
            jax.block_until_ready(d)
            out = step_once(scns, starts, d)
            _ = float(out[0])
            # guaranteed device-idle gap between dispatches so the trace
            # parser's gap clustering separates them (back-to-back
            # pipelined dispatches merged at B<=64 otherwise)
            time.sleep(0.25)
        jax.profiler.stop_trace()
        cl_stats = device_dispatch_times(logdir)
        shutil.rmtree(logdir, ignore_errors=True)
        # drop sub-ms clusters (input transfers / stray callbacks)
        spans = sorted(c["span_ms"] for c in cl_stats
                       if c["span_ms"] > 1.0)
        if not spans:
            print(f"B={B}: no device clusters parsed "
                  f"({len(cl_stats)} raw)", file=sys.stderr)
            continue
        # keep the REPS largest clusters (the dispatches)
        spans = spans[-REPS:]
        table[B] = {
            "device_p50_ms": round(float(np.percentile(spans, 50)), 2),
            "device_p99_ms": round(float(np.percentile(spans, 99)), 2),
            "n_dispatches": len(spans),
        }
        print(f"B={B}: device p50 {table[B]['device_p50_ms']} ms, "
              f"p99 {table[B]['device_p99_ms']} ms over "
              f"{len(spans)} dispatches", file=sys.stderr)

    if not table:
        print(json.dumps({"metric": "device_replan_p99_ms", "value": -1,
                          "unit": "ms", "vs_baseline": 0.0,
                          "error": "no device events parsed"}))
        return
    bref = max(b for b in table if table[b]["device_p99_ms"] <= 100.0) \
        if any(t["device_p99_ms"] <= 100.0 for t in table.values()) else 0
    bmax = max(table)
    p99 = table[bmax]["device_p99_ms"]
    print(json.dumps({
        "metric": f"device_replan_p99_ms_b{bmax}",
        "value": p99,
        "unit": "ms",
        # >= 1: the largest measured batch fits the 0.1 s cycle on-device
        "vs_baseline": round(100.0 / p99, 3),
        "largest_batch_inside_budget": bref,
        "table": {str(k): v for k, v in sorted(table.items())},
    }))


def _qualify_coststack():
    """BENCH_MODE=qualify_coststack (VERDICT r4 item 5): a repeatable
    ON-HARDWARE qualification artifact for the Pallas fused cost-stack
    kernel. Runs the 256-problem fixture through cost_stack_backend =
    'pallas' and 'xla' on the real chip and emits ONE JSON line of
    decision-parity counters with pinned thresholds, so a Mosaic/kernel
    codegen regression is caught by a counter diff between rounds — not
    by the headline bench number moving.

    Thresholds (measured round 5 on-chip: match rate 0.734, stable-lane
    median max-|du| 1.7e-4): 100% convergence on BOTH paths; >= 70% of
    lanes decision-identical (status AND iteration count — the
    threshold-chaotic subpopulation forks under any fp perturbation,
    including Mosaic-vs-XLA fusion rounding, so 100% is not expected);
    MEDIAN max-|du| over the decision-stable lanes <= 1e-3 (the BASELINE
    control-parity scale). The stable-lane p99 is REPORTED, not gated:
    (status, iters) equality does not preclude a forked iterate path
    that coincidentally matches the counters (measured p99 ~1.8), so
    only the robust statistics are pinned."""
    import sys

    import dataclasses

    import jax
    import jax.numpy as jnp

    from cilqr_tpu.batch import solve_batch
    from cilqr_tpu.config import PlannerConfig

    cfg = PlannerConfig()
    goals, starts, cons = _load_fixture(jnp.float32)
    B = goals.shape[0]

    def run(backend):
        c = dataclasses.replace(cfg.ilqr, cost_stack_backend=backend)

        @jax.jit
        def f(goals, starts, cons):
            return solve_batch(goals, starts, cons, c, cfg.vehicle,
                               cfg.delta_t)

        res = f(goals, starts, cons)
        jax.block_until_ready(res.us)
        return res

    rp = run("pallas")
    rx = run("xla")
    st_p = np.asarray(rp.status)
    st_x = np.asarray(rx.status)
    it_p = np.asarray(rp.iters)
    it_x = np.asarray(rx.iters)
    conv = lambda s: int(np.isin(s, (1, 2, 3)).sum())
    stable = (st_p == st_x) & (it_p == it_x)
    du = np.abs(np.asarray(rp.us) - np.asarray(rx.us)).max(axis=(1, 2))
    du_stable = du[stable] if stable.any() else np.asarray([np.inf])
    match_rate = float(stable.mean())
    du_med = float(np.median(du_stable))
    ok = (conv(st_p) == B and conv(st_x) == B
          and match_rate >= 0.70 and du_med <= 1e-3)
    print(f"decision-stable lanes: {int(stable.sum())}/{B}; "
          f"max-|du| on stable lanes p50/p99: {du_med:.2e}/"
          f"{float(np.percentile(du_stable, 99)):.2e}; "
          f"converged pallas/xla: {conv(st_p)}/{conv(st_x)}",
          file=sys.stderr)
    print(json.dumps({
        "metric": "coststack_qualify_decision_match_rate",
        "value": round(match_rate, 4),
        "unit": "fraction",
        # >= 1.0 means every pinned threshold held
        "vs_baseline": round(min(match_rate / 0.70,
                                 1e-3 / max(du_med, 1e-30),
                                 conv(st_p) / B, conv(st_x) / B), 3)
        if ok else 0.0,
        "qualified": bool(ok),
        "converged_pallas": conv(st_p),
        "converged_xla": conv(st_x),
        "du_stable_p50": du_med,
        "du_stable_p99": float(np.percentile(du_stable, 99)),
        "lanes": B,
    }))


def _enable_compile_cache():
    """Persistent XLA compile cache: first compilation of the big solver
    programs costs 1-15 min over the tunneled backend (docs/PERF.md);
    warm process restarts of an unchanged program then load in seconds."""
    import jax

    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def main():
    import jax
    import jax.numpy as jnp

    _enable_compile_cache()

    from cilqr_tpu.batch import solve_batch
    from cilqr_tpu.config import PlannerConfig

    # DEFAULT = the FULL replan pipeline (DP -> corridor -> prep -> CILQR
    # solve on device), the reference's complete per-cycle stage sequence
    # (trajectory_planner.cpp:28-94) — the honest headline throughput.
    # BENCH_MODE=solve times the CILQR solve stage alone on precomputed
    # problems (the round-1 metric; ~7100 solves/s/chip).
    mode = os.environ.get("BENCH_MODE", "pipeline")
    if mode.startswith("pipeline"):
        _pipeline_bench(latency=mode == "pipeline_latency")
        return
    if mode == "mpc":
        _mpc_bench()
        return
    if mode == "qualify_coststack":
        _qualify_coststack()
        return
    if mode == "device_latency":
        _device_latency_bench()
        return

    # Default batch 1024: the 256-problem fixture tiled 4x with per-rep
    # perturbed start states (each instance is a distinct problem). The
    # cascading-width compaction amortizes best here — measured 4310 (256)
    # / 6040 (1024) / 5839 (2048) / 5311 (4096) solves/s.
    B_env = os.environ.get("BENCH_BATCH", "1024")
    REPS = int(os.environ.get("BENCH_REPS", 4))
    # Inner replications executed inside ONE jitted call (lax.map over
    # perturbed start states): the tunneled-TPU dispatch adds tens-of-ms
    # noise per call, so per-call timing of a sub-ms batch is dominated by
    # dispatch; amortizing INNER batches per dispatch divides that noise
    # out.
    INNER = int(os.environ.get("BENCH_INNER", 4))
    cfg = PlannerConfig()
    mode = os.environ.get("BENCH_LS_MODE")
    if mode:
        import dataclasses

        cfg = cfg.replace(ilqr=dataclasses.replace(
            cfg.ilqr, line_search=dataclasses.replace(
                cfg.ilqr.line_search, mode=mode)))
    lane_search = os.environ.get("BENCH_LANE_SEARCH")
    if lane_search:
        import dataclasses

        cfg = cfg.replace(ilqr=dataclasses.replace(
            cfg.ilqr, lane_search=lane_search))
    trip_cap = os.environ.get("BENCH_TRIP_CAP")
    if trip_cap is not None:
        import dataclasses

        cfg = cfg.replace(ilqr=dataclasses.replace(
            cfg.ilqr, compaction_phase1_trips=int(trip_cap)))
    cs_backend = os.environ.get("BENCH_COST_STACK")
    if cs_backend:
        import dataclasses

        cfg = cfg.replace(ilqr=dataclasses.replace(
            cfg.ilqr, cost_stack_backend=cs_backend))
    k_alpha = os.environ.get("BENCH_ALPHAS_PER_TRIP")
    if k_alpha:
        import dataclasses

        cfg = cfg.replace(ilqr=dataclasses.replace(
            cfg.ilqr, line_search=dataclasses.replace(
                cfg.ilqr.line_search, alphas_per_trip=int(k_alpha))))
    phase1 = os.environ.get("BENCH_PHASE1")
    if phase1:
        import dataclasses

        cfg = cfg.replace(ilqr=dataclasses.replace(
            cfg.ilqr, compaction_phase1=int(phase1)))
    factor = os.environ.get("BENCH_FACTOR")
    if factor:
        import dataclasses

        cfg = cfg.replace(ilqr=dataclasses.replace(
            cfg.ilqr, compaction_factor=int(factor)))
    ilqr = cfg.ilqr
    veh = cfg.vehicle
    dt = cfg.delta_t

    if os.path.exists(FIXTURE):
        goals, starts, cons = _load_fixture(jnp.float32)
        metric = "cilqr_solves_per_s_per_chip"
    else:
        from __graft_entry__ import _synthetic_problem

        cfg, goals, starts, cons = _synthetic_problem(
            batch=int(B_env or 256), n_knots=81, dtype=jnp.float32)
        ilqr, veh, dt = cfg.ilqr, cfg.vehicle, cfg.delta_t
        metric = "cilqr_solves_per_s_per_chip_synthetic"

    if B_env:
        B = int(B_env)
        rep = -(-B // goals.shape[0])  # tile fixture up to requested batch
        goals, starts, cons = jax.tree.map(
            lambda a: jnp.concatenate([a] * rep, axis=0)[:B],
            (goals, starts, cons))
    B = goals.shape[0]

    BACKEND = os.environ.get("BENCH_BACKEND", "blast")

    if os.environ.get("BENCH_MODE") == "latency":
        # Per-dispatch replan latency for one batch of B problems — the
        # BASELINE.md real-time target (p99 within the 0.1 s planning
        # cycle). Each rep is one un-amortized dispatch + forced
        # device->host sync, so on the tunneled backend the figure
        # includes the ~tens-of-ms RPC round trip and is an UPPER BOUND
        # on directly-attached-hardware latency.
        @jax.jit
        def step_once(goals, starts, cons, d):
            res = solve_batch(goals, starts.at[:, 1].add(d), cons,
                              ilqr, veh, dt, backend=BACKEND)
            return res.us.sum(), res.iters.sum(), (res.status != 0).all()

        rng = np.random.default_rng(1)
        reps = int(os.environ.get("BENCH_REPS", 30))
        d0 = jnp.asarray(rng.uniform(-0.2, 0.2, B), starts.dtype)
        jax.block_until_ready(step_once(goals, starts, cons, d0))
        lat = []
        for _ in range(reps):
            d = jnp.asarray(rng.uniform(-0.2, 0.2, B), starts.dtype)
            jax.block_until_ready(d)
            t0 = time.perf_counter()
            out = step_once(goals, starts, cons, d)
            _ = float(out[0])
            lat.append((time.perf_counter() - t0) * 1e3)
        p99 = float(np.percentile(lat, 99))
        print(json.dumps({
            "metric": f"batch{B}_replan_p99_ms",
            "value": round(p99, 2),
            "unit": "ms",
            # target: within the 0.1 s replan budget -> ratio >= 1 is good
            "vs_baseline": round(100.0 / p99, 3),
        }))
        return

    @jax.jit
    def step_many(goals, starts, cons, deltas):
        """INNER perturbed batch solves in one dispatch; outputs reduced to
        scalars so device->host transfer stays off the timed path."""

        def one(d):
            res = solve_batch(goals, starts.at[:, 1].add(d), cons,
                              ilqr, veh, dt, backend=BACKEND)
            return (res.us.sum(), res.iters.sum(),
                    (res.status != 0).all())

        us_sum, it_sum, done = jax.lax.map(one, deltas)
        return us_sum.sum(), it_sum.sum(), done.all()

    rng = np.random.default_rng(1)

    def mk_deltas():
        return jnp.asarray(rng.uniform(-0.2, 0.2, (INNER, B)), starts.dtype)

    out = step_many(goals, starts, cons, mk_deltas())
    jax.block_until_ready(out)

    times = []
    for _ in range(REPS):
        d = mk_deltas()
        jax.block_until_ready(d)
        t0 = time.perf_counter()
        out = step_many(goals, starts, cons, d)
        # float() forces a device->host transfer of the scalar result: on
        # the tunneled backend this is the only sync guaranteed to wait for
        # the computation itself, not just the dispatch.
        _ = float(out[0])
        times.append(time.perf_counter() - t0)

    best = min(times)
    solves_per_s = B * INNER / best
    print(json.dumps({
        "metric": metric,
        "value": round(solves_per_s, 2),
        "unit": "solves/s",
        "vs_baseline": round(solves_per_s / 1000.0, 3),
    }))


if __name__ == "__main__":
    main()
