"""Solver observability tests (ref tube_trajopt.py generate_col_names,
compute/segment_constraint_violation, SolverCallback CSV)."""
import numpy as np
import pytest

from legged_gym_dev_tpu.core import make_rom
from legged_gym_dev_tpu.solver import (
    ALConfig,
    PROBLEM_DICT,
    TrajOptParams,
    compute_constraint_violation,
    generate_col_names,
    get_tube_dynamics,
    segment_constraint_violation,
    solve_tube,
    trace_to_csv,
)

N, H_REV = 10, 4


@pytest.fixture(scope="module")
def problem():
    prob = PROBLEM_DICT["gap"]
    pm = make_rom(
        "SingleInt2D", prob["dt"],
        [-prob["pos_max"]] * 2, [prob["pos_max"]] * 2,
        [-prob["vel_max"]] * 2, [prob["vel_max"]] * 2,
    )
    p = TrajOptParams.create(
        pm, N, H_REV, 10 * np.eye(2), 10 * np.eye(2),
        prob["start"], prob["goal"], prob["obs"]["c"], prob["obs"]["r"],
        Qw=0.0, w_max=1.0,
    )
    tube_fn = get_tube_dynamics("l1", N, scaling=0.5)
    return p, tube_fn


def test_col_names_cover_every_column(problem):
    p, tube_fn = problem
    x_cols, h_cols, g_cols, p_cols = generate_col_names(
        2, 2, N, 2, with_tube=True, H_rev=H_REV)
    # Decision layout: (N+1)*n z + N*m v + (N+1) w.
    assert len(x_cols) == (N + 1) * 2 + N * 2 + (N + 1)
    assert x_cols[0] == "z_0_0" and x_cols[-1] == f"w_{N}"
    # h = dynamics + ic + tube, g = obstacles.
    assert len(h_cols) == N * 2 + 2 + N
    assert len(g_cols) == (N + 1) * 2
    # Column counts must equal the residual sizes produced by the NLP fns.
    sol, trace = solve_tube(p, tube_fn, N, H_REV,
                            cfg=ALConfig(outer_iters=3, inner_iters=3),
                            warm_start="interpolate", tube_ws="evaluate",
                            return_trace=True)
    viol_h, viol_g = compute_constraint_violation(
        p, sol.z, sol.v, sol.w, N, tube_fn=tube_fn)
    assert viol_h.shape == (len(h_cols),)
    assert viol_g.shape == (len(g_cols),)


def test_violation_segmentation_and_trace(problem, tmp_path):
    p, tube_fn = problem
    cfg = ALConfig()
    sol, trace = solve_tube(p, tube_fn, N, H_REV, cfg=cfg,
                            warm_start="interpolate", tube_ws="evaluate",
                            return_trace=True)
    _, h_cols, g_cols, _ = generate_col_names(2, 2, N, 2, with_tube=True,
                                              H_rev=H_REV)
    viol_h, viol_g = compute_constraint_violation(
        p, sol.z, sol.v, sol.w, N, tube_fn=tube_fn)
    seg = segment_constraint_violation(viol_h, viol_g, h_cols, g_cols)
    assert set(seg) == {"Dynamics", "Obstacle 0", "Obstacle 1",
                        "Initial Condition", "Tube Dynamics"}
    assert seg["Dynamics"].shape == (N * 2,)
    assert seg["Obstacle 0"].shape == (N + 1,)
    # A converged solve is feasible in every segment.
    for name, v in seg.items():
        assert float(v.max()) < 1e-3, (name, v.max())

    # Iteration trace: violation decreases to convergence; CSV written.
    assert trace["viol"].shape == (cfg.outer_iters,)
    assert float(trace["viol"][-1]) < 1e-3
    assert bool(trace["converged"][-1])
    path = trace_to_csv(trace, str(tmp_path / "trace.csv"))
    rows = open(path).read().strip().split("\n")
    assert rows[0].startswith("iter,")
    assert len(rows) == 1 + cfg.outer_iters


# Per-problem tube settings: the `right` corridor is tight (clearance
# 0.125 between the straight path and the lower obstacle) — the l1 tube's
# steady-state width at vel_max=1 exceeds it, and the first-order AL stalls
# at ~1e-2 on the resulting tube-dynamics equality (docs/PERF.md "penalty
# sweeps"); the quadratic l2 tube solves it to <1e-5.
# goal_tol: the gap problem's goal is 1.7 m away at vel_max 0.2 — N=50
# covers at most 1.0 m, so the optimum approaches rather than reaches it
# (the goal is a tracking objective, not a constraint).
@pytest.mark.parametrize("name,tube,N,goal_tol", [
    ("gap", "l1", 50, 0.8),
    ("right", "l2", 50, 0.2),
    ("right_wide", "l2", 50, 0.2),
])
def test_problem_library_all_solve(name, tube, N, goal_tol):
    """Every problem in the library (ref tube_trajopt.py:11-21
    problem_dict) solves feasibly with the tube solver."""
    prob = PROBLEM_DICT[name]
    pm = make_rom(
        "SingleInt2D", prob["dt"],
        [-prob["pos_max"]] * 2, [prob["pos_max"]] * 2,
        [-prob["vel_max"]] * 2, [prob["vel_max"]] * 2,
    )
    p = TrajOptParams.create(
        pm, N, 4, 10 * np.eye(2), 10 * np.eye(2),
        prob["start"], prob["goal"], prob["obs"]["c"], prob["obs"]["r"],
        Qw=0.0, w_max=1.0,
    )
    tube_fn = get_tube_dynamics(tube, N, scaling=0.25 if tube == "l2"
                                else 0.5)
    sol = solve_tube(p, tube_fn, N, 4, cfg=ALConfig(),
                     warm_start="interpolate", tube_ws="evaluate")
    assert float(sol.sol.viol) < 1e-3, name
    # Endpoint approaches the goal and obstacles (tube-inflated) respected.
    assert float(np.linalg.norm(np.asarray(sol.z[-1])
                                - prob["goal"])) < goal_tol, name
    d = np.linalg.norm(
        np.asarray(sol.z)[:, None, :] - prob["obs"]["c"][None], axis=-1)
    margin = d - (prob["obs"]["r"][None] + np.asarray(sol.w)[:, None])
    assert margin.min() > -1e-3, name


def test_infeasible_point_is_segmented(problem):
    p, tube_fn = problem
    # A straight line through the obstacles with zero tube width: obstacle
    # violations must show up in their segments, dynamics in theirs.
    import jax.numpy as jnp

    z = jnp.linspace(p.z0, p.zf, N + 1)
    v = jnp.zeros((N, 2))  # inconsistent with the motion -> dynamics viol
    # A 0.5-wide tube inflates the obstacle radii to 1.0; the straight line
    # (which threads the gap at ~0.7 clearance) now collides.
    w = jnp.full(N + 1, 0.5)
    viol_h, viol_g = compute_constraint_violation(p, z, v, w, N,
                                                  tube_fn=tube_fn)
    _, h_cols, g_cols, _ = generate_col_names(2, 2, N, 2, with_tube=True,
                                              H_rev=H_REV)
    seg = segment_constraint_violation(viol_h, viol_g, h_cols, g_cols)
    assert float(seg["Dynamics"].max()) > 1e-3
    assert float(seg["Obstacle 0"].max()) > 0.0 \
        or float(seg["Obstacle 1"].max()) > 0.0
    assert float(seg["Initial Condition"].max()) < 1e-6
