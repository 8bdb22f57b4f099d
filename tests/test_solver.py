"""Solver tests: AL-GN NLP vs analytic and scipy golden solutions.

The BASELINE.json requirement is control trajectories within 1e-3 of the
CasADi/IPOPT reference; IPOPT is not available in this image, so scipy SLSQP
(same exact-KKT family) provides the golden interior-point-quality solutions.
"""
import numpy as np
import pytest
from scipy.optimize import minimize

import jax
import jax.numpy as jnp

from legged_gym_dev_tpu.core import make_rom
from legged_gym_dev_tpu.solver.al_solver import ALConfig, solve_al
from legged_gym_dev_tpu.solver.trajopt import (
    PROBLEM_DICT,
    TrajOptParams,
    solve_nominal,
    solve_tube,
    solve_tube_batched,
    warm_start_interpolate,
)
from legged_gym_dev_tpu.solver.tube_dynamics import get_tube_dynamics
from legged_gym_dev_tpu.tube.models import MLP

N = 20
H_REV = 10
Q = 10 * np.eye(2)
R = 10 * np.eye(2)


def gap_params(**kw):
    prob = PROBLEM_DICT["gap"]
    pm = make_rom(
        "SingleInt2D", prob["dt"],
        [-prob["pos_max"]] * 2, [prob["pos_max"]] * 2,
        [-prob["vel_max"]] * 2, [prob["vel_max"]] * 2,
    )
    return prob, TrajOptParams.create(
        pm, N, H_REV, Q, R, prob["start"], prob["goal"],
        prob["obs"]["c"], prob["obs"]["r"], **kw,
    )


def test_al_solver_simplex_projection():
    a = jnp.asarray([0.8, 0.6, -0.4])
    sol = solve_al(
        lambda x, p: x - p,
        lambda x, p: jnp.asarray([jnp.sum(x) - 1.0]),
        lambda x, p: x,
        jnp.zeros(3), a, -10 * jnp.ones(3), 10 * jnp.ones(3),
    )
    np.testing.assert_allclose(np.asarray(sol.x), [0.6, 0.4, 0.0], atol=1e-4)
    assert bool(sol.converged)


def scipy_nominal_golden(prob, z_init, v_init):
    n = m = 2
    dt = prob["dt"]

    def unpack(x):
        return x[: (N + 1) * n].reshape(N + 1, n), x[(N + 1) * n:].reshape(N, m)

    def obj(x):
        z, v = unpack(x)
        d = z - prob["goal"]
        return np.sum(d @ Q * d) + np.sum(v @ R * v)

    def eq(x):
        z, v = unpack(x)
        return np.concatenate(
            [(z[:-1] + dt * v - z[1:]).ravel(), z[0] - prob["start"]]
        )

    def ineq(x):
        z, _ = unpack(x)
        d = z[:, None, :] - prob["obs"]["c"][None]
        return (np.sum(d * d, -1) - prob["obs"]["r"][None] ** 2).ravel()

    x0 = np.concatenate([np.asarray(z_init).ravel(), np.asarray(v_init).ravel()])
    vmax = prob["vel_max"]
    bounds = [(-10, 10)] * ((N + 1) * n) + [(-vmax, vmax)] * (N * m)
    res = minimize(
        obj, x0, method="SLSQP", bounds=bounds,
        constraints=[{"type": "eq", "fun": eq}, {"type": "ineq", "fun": ineq}],
        options={"maxiter": 300, "ftol": 1e-10},
    )
    assert res.status == 0
    return unpack(res.x)


def test_nominal_matches_scipy_within_1e3():
    prob, p = gap_params()
    z, v, sol = solve_nominal(p, N, ALConfig(), warm_start="interpolate")
    assert float(sol.viol) < 1e-5
    z_init, v_init = warm_start_interpolate(p.z0, p.zf, N, p.rom.dt)
    z_ref, v_ref = scipy_nominal_golden(prob, z_init, v_init)
    assert np.max(np.abs(np.asarray(z) - z_ref)) < 1e-3
    assert np.max(np.abs(np.asarray(v) - v_ref)) < 1e-3


def test_tube_l1_feasible_and_tube_dynamics_hold():
    prob, p = gap_params()
    tube_fn = get_tube_dynamics("l1", N, scaling=0.5)
    out = solve_tube(p, tube_fn, N, H_REV, warm_start="nominal",
                     tube_ws="evaluate")
    assert float(out.sol.viol) < 1e-5
    z, v, w = map(np.asarray, (out.z, out.v, out.w))
    # Tube dynamics equality: w_{k+1} = 0.5 * ||v_k||_1.
    np.testing.assert_allclose(w[1:], 0.5 * np.abs(v).sum(-1), atol=1e-5)
    # Tube-inflated obstacles respected.
    d = z[:, None, :] - prob["obs"]["c"][None]
    dist = np.sqrt((d * d).sum(-1))
    assert (dist - (prob["obs"]["r"][None] + w[:, None])).min() > -1e-4
    # Tube widths within [0, w_max].
    assert w.min() >= -1e-6 and w.max() <= 1.0 + 1e-6


def test_tube_rolling_l2():
    prob, p = gap_params()
    tube_fn = get_tube_dynamics("l2_rolling", N, scaling=0.5, window_size=5)
    out = solve_tube(p, tube_fn, N, H_REV, warm_start="nominal", tube_ws=0.0)
    assert float(out.sol.viol) < 1e-4
    v, w = np.asarray(out.v), np.asarray(out.w)
    l2 = 0.5 * (v * v).sum(-1)
    fw = [l2[max(i - 4, 0): i + 1].mean() for i in range(N)]
    np.testing.assert_allclose(w[1:], fw, atol=1e-4)


def make_tube_nn(key=0):
    nn = MLP.create(
        jax.random.PRNGKey(key), H_REV + (H_REV + N) * 2, N,
        num_units=32, num_layers=2, final_activation="softplus",
    )
    ws, bs = list(nn.weights), list(nn.biases)
    ws[-1] = ws[-1] * 0.5
    bs[-1] = bs[-1] * 0.0 - 2.0  # widths ~ softplus(-2) ≈ 0.12
    return nn.replace(weights=tuple(ws), biases=tuple(bs))


def test_tube_nn_oneshot():
    prob, p = gap_params(tube_params=make_tube_nn())
    tube_fn = get_tube_dynamics("NN_oneshot", N)
    out = solve_tube(p, tube_fn, N, H_REV, ALConfig(outer_iters=15),
                     warm_start="nominal", tube_ws="evaluate")
    assert float(out.sol.viol) < 1e-5
    fw = np.asarray(
        tube_fn(out.z, out.v, out.w, p.e_hist, p.v_prev, p.tube_params)
    )
    np.testing.assert_allclose(np.asarray(out.w)[1:], fw, atol=1e-5)


def test_batched_scenarios_all_converge():
    prob, p = gap_params()
    tube_fn = get_tube_dynamics("l1", N, scaling=0.5)
    B = 8
    # Vary starts and obstacle radii across the batch.
    starts = jnp.asarray(prob["start"])[None, :] + jnp.linspace(
        -0.1, 0.1, B
    )[:, None]
    p_batch = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape), p)
    p_batch = p_batch.replace(
        z0=starts,
        obs_r=p_batch.obs_r * jnp.linspace(0.8, 1.0, B)[:, None],
    )
    out = solve_tube_batched(p_batch, tube_fn, N, H_REV,
                             warm_start="nominal", tube_ws=0.0)
    assert out.z.shape == (B, N + 1, 2)
    viol = np.asarray(out.sol.viol)
    assert np.all(viol < 1e-4), viol
    # Distinct scenarios produce distinct solutions.
    assert np.std(np.asarray(out.z[:, 0, 0])) > 0.01
