"""Closed-loop receding-horizon tube MPC tests
(ref behavior: trajopt/tube_planning_closed_loop.py)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from legged_gym_dev_tpu.core import DoubleInt2D, make_rom
from legged_gym_dev_tpu.solver import (
    ALConfig,
    PROBLEM_DICT,
    TrajOptParams,
    get_tube_dynamics,
)
from legged_gym_dev_tpu.solver.mpc import (
    MPCConfig,
    closed_loop_tube_mpc,
    closed_loop_tube_mpc_batched,
)

N, H_REV, H = 20, 10, 75


def setup(prob_name="gap"):
    prob = PROBLEM_DICT[prob_name]
    pm = make_rom(
        "SingleInt2D", prob["dt"],
        [-prob["pos_max"]] * 2, [prob["pos_max"]] * 2,
        [-prob["vel_max"]] * 2, [prob["vel_max"]] * 2,
    )
    robot = DoubleInt2D.create(
        prob["dt"], [-np.inf, -np.inf, -0.3, -0.3],
        [np.inf, np.inf, 0.3, 0.3], [-0.5, -0.5], [0.5, 0.5],
    )
    Q = 10 * np.eye(2)
    R = 10 * np.eye(2)
    p = TrajOptParams.create(
        pm, N, H_REV, Q, R, prob["start"], prob["goal"],
        prob["obs"]["c"], prob["obs"]["r"], Qw=0.0, w_max=1.0,
    )
    return prob, p, robot


@pytest.fixture(scope="module")
def gap_trace():
    prob, p, robot = setup()
    tube_fn = get_tube_dynamics("l1", N, scaling=0.5)
    mpc = MPCConfig(H=H, N=N, H_rev=H_REV)
    run = jax.jit(
        lambda p: closed_loop_tube_mpc(
            p, tube_fn, robot, mpc,
            al_loop=ALConfig(outer_iters=6, inner_iters=6),
        )
    )
    return prob, run(p)


def test_reaches_goal(gap_trace):
    prob, trace = gap_trace
    z = np.asarray(trace.z)
    # vel_max*dt*H = 0.02*75 = 1.5 > ||goal-start|| ~ 1.7 around obstacles;
    # the loop should close most of the distance (ref runs the same H).
    assert np.linalg.norm(z[-1] - prob["goal"]) < 0.15
    assert np.all(np.isfinite(z))


def test_obstacles_respected_along_executed_path(gap_trace):
    prob, trace = gap_trace
    z, w = np.asarray(trace.z), np.asarray(trace.w)
    d = z[:, None, :] - prob["obs"]["c"][None]
    dist = np.sqrt((d * d).sum(-1))
    margin = dist - (prob["obs"]["r"][None] + w[:, None])
    assert margin.min() > -0.05, margin.min()


def test_resolves_stay_feasible(gap_trace):
    _, trace = gap_trace
    viol = np.asarray(trace.viol)
    assert np.median(viol) < 1e-4
    assert viol.max() < 0.05


def test_tracking_robot_follows_plan(gap_trace):
    _, trace = gap_trace
    err = np.linalg.norm(np.asarray(trace.z) - np.asarray(trace.pz_x), axis=-1)
    assert err.max() < 0.2


def test_batched_closed_loop():
    prob, p, robot = setup()
    tube_fn = get_tube_dynamics("l1", N, scaling=0.5)
    B = 4
    pb = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape), p)
    pb = pb.replace(
        z0=pb.z0 + jnp.linspace(-0.05, 0.05, B)[:, None]
    )
    mpc = MPCConfig(H=20, N=N, H_rev=H_REV)
    trace = closed_loop_tube_mpc_batched(
        pb, tube_fn, robot, mpc, al_loop=ALConfig(outer_iters=4, inner_iters=5)
    )
    assert trace.z.shape == (B, 21, 2)
    assert np.all(np.isfinite(np.asarray(trace.z)))
    # Different starts -> different executed paths.
    assert np.std(np.asarray(trace.z[:, 5, 0])) > 1e-4

def test_fast_closed_loop_matches_goal_and_feasibility():
    """Structured-path receding horizon (solver/fast_tube.py) reaches the
    gap goal with feasible re-solves, like the generic path above."""
    from legged_gym_dev_tpu.solver.fast_tube import closed_loop_tube_mpc_fast

    prob, p, robot = setup()
    run = jax.jit(
        lambda p: closed_loop_tube_mpc_fast(
            p, robot, tube_kind="l1", scaling=0.5, H=H, N=N, H_rev=H_REV,
            warm_start="nominal",
        )
    )
    z, v, w, pz_x, viol, adopted = run(p)
    z, w, pz_x, viol = map(np.asarray, (z, w, pz_x, viol))
    assert np.all(np.isfinite(z))
    assert np.linalg.norm(z[-1] - prob["goal"]) < 0.15
    # Obstacles respected with the tube inflation along the executed path.
    d = z[:, None, :] - prob["obs"]["c"][None]
    dist = np.sqrt((d * d).sum(-1))
    margin = dist - (prob["obs"]["r"][None] + w[:, None])
    assert margin.min() > -0.05, margin.min()
    assert np.median(viol) < 1e-4 and viol.max() < 0.05
    # Tracking robot follows the plan.
    err = np.linalg.norm(z - pz_x, axis=-1)
    assert err.max() < 0.2
