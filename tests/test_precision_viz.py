"""float32 qualification (SURVEY.md §7.11) + viz/run smoke tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cilqr_tpu import costs as C
from cilqr_tpu import solver as S
from cilqr_tpu.config import IlqrConfig, VehicleParam
from cilqr_tpu.types import SolverStatus

from test_solver import CFG, DT, VEH, N, straight_goals, wide_constraints


def test_f32_controls_close_to_f64():
    """The bench runs float32; qualify it against the f64 golden within the
    1e-3 control gate on the synthetic problem."""
    goals = straight_goals()
    cons = wide_constraints(goals)
    start = jnp.asarray([0.0, 0.6, 0.08, 10.0, 0.0, 0.0])

    res64 = S.solve(goals, start, cons, CFG, VEH, DT)

    to32 = lambda t: jax.tree.map(
        lambda a: a.astype(jnp.float32) if a.dtype == jnp.float64 else a, t)
    res32 = S.solve(to32(goals), to32(start), to32(cons), CFG, VEH, DT)

    assert int(res32.status) != SolverStatus.RUNNING
    dev = np.max(np.abs(np.asarray(res32.us, np.float64) - np.asarray(res64.us)))
    assert dev < 1e-3, f"f32 control deviation {dev}"
    pos_dev = np.max(np.abs(np.asarray(res32.xs[:, :2], np.float64)
                            - np.asarray(res64.xs[:, :2])))
    assert pos_dev < 5e-3, f"f32 position deviation {pos_dev}"


def test_viz_smoke(tmp_path):
    from cilqr_tpu import pipeline, scenario, viz
    from cilqr_tpu.config import PlannerConfig

    cfg = PlannerConfig()
    scn = scenario.make_scenario(seed=2, dtype=jnp.float64)
    fig = viz.plot_scenario(scn)
    fig.savefig(tmp_path / "scn.png")
    # dashboard from a trivial trajectory
    from cilqr_tpu.types import Traj

    t = jnp.arange(81) * 0.1
    tr = Traj.zeros(81, jnp.float64).replace(time=t, velocity=t * 0 + 5)
    fig2 = viz.plot_states_dashboard(tr, cfg.vehicle)
    fig2.savefig(tmp_path / "dash.png")
    assert (tmp_path / "scn.png").exists()


def test_cost_history_plot(tmp_path):
    from cilqr_tpu import viz

    goals = straight_goals()
    cons = wide_constraints(goals)
    start = jnp.asarray([0.0, 0.5, 0.0, 10.0, 0.0, 0.0])
    _, hist = S.solve_with_history(goals, start, cons, CFG, VEH, DT,
                                   num_iters=10)
    fig = viz.plot_cost_history(hist)
    fig.savefig(tmp_path / "cost.png")
    assert (tmp_path / "cost.png").exists()


def test_config_from_dict_roundtrip():
    from cilqr_tpu.config import PlannerConfig, from_dict

    cfg = from_dict({"ilqr": {"max_iter_num": 50,
                              "weights": {"jerk": 2.0}},
                     "vehicle": {"wheel_base": 2.0}})
    assert cfg.ilqr.max_iter_num == 50
    assert cfg.ilqr.weights.jerk == 2.0
    assert cfg.vehicle.wheel_base == 2.0
    # unknown keys rejected
    with pytest.raises(KeyError):
        from_dict({"nonsense": 1})


def test_iteration_overlays_plot(tmp_path):
    """record_trajs history + per-iteration overlay figure
    (figure_plot.h:267-453 analog)."""
    import matplotlib

    matplotlib.use("Agg")
    from cilqr_tpu import viz
    from test_solver import CFG_PAR

    goals = straight_goals()
    cons = wide_constraints(goals)
    start = jnp.asarray([0.0, 0.5, 0.05, 10.0, 0.0, 0.0])
    res, hist, xs_hist = S.solve_with_history(
        goals, start, cons, CFG_PAR, VEH, 0.1, num_iters=8,
        record_trajs=True)
    assert xs_hist.shape == (9, 81, 6)
    # iterate 0 is the init guess
    np.testing.assert_allclose(np.asarray(xs_hist[0]),
                               np.asarray(res.init_xs), atol=1e-12)
    fig = viz.plot_iteration_overlays(xs_hist, res.iters)
    out = tmp_path / "iters.png"
    fig.savefig(out)
    assert out.stat().st_size > 0


def test_animate_plan_writes_gif(tmp_path):
    """Animated playback (planning_node.cc:82-112 analog) renders frames
    on a tiny synthetic plan."""
    import jax.numpy as jnp
    from types import SimpleNamespace

    from cilqr_tpu import viz
    from cilqr_tpu.config import PlannerConfig
    from cilqr_tpu.scenario import make_scenario

    cfg = PlannerConfig()
    scn = make_scenario(seed=0, dtype="float32")
    N = 6
    xs = np.zeros((N, 6), np.float32)
    xs[:, 0] = np.linspace(0, 5, N)
    xs[:, 3] = 10.0
    KC = 4
    polys = np.zeros((N, KC, 2), np.float32)
    polys[:, :, 0] = np.array([[-1, 1, 1, -1]]) + xs[:, :1]
    polys[:, :, 1] = np.array([[-1.0, -1, 1, 1]])
    out = SimpleNamespace(
        solve=SimpleNamespace(xs=jnp.asarray(xs)),
        corridors=SimpleNamespace(polygons=jnp.asarray(polys),
                                  poly_mask=jnp.ones((N, KC), bool)))
    path = str(tmp_path / "anim.gif")
    viz.animate_plan(scn, out, cfg, path, every=2, dpi=40)
    from PIL import Image

    im = Image.open(path)
    assert im.n_frames == 3
