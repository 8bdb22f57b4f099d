"""Per-outer Woodbury-basis refresh for the NN-oneshot tube
(ALConfig.nn_basis_refresh='outer'): parity against the exact per-inner
path and the VJP used for its gradients."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from legged_gym_dev_tpu.core import make_rom
from legged_gym_dev_tpu.solver import ALConfig, PROBLEM_DICT, TrajOptParams
from legged_gym_dev_tpu.solver.fast_tube import solve_tube_fast
from legged_gym_dev_tpu.tube.models import MLP

N, H_REV = 20, 5


def test_value_and_vjp_matches_jacobian():
    nn = MLP.create(jax.random.PRNGKey(0), 30, 12, num_units=32,
                    num_layers=2, final_activation="softplus")
    x = jax.random.normal(jax.random.PRNGKey(1), (7, 30))
    ct = jax.random.normal(jax.random.PRNGKey(2), (7, 12))
    out_j, J = nn.value_and_jacobian(x)
    out_v, g = nn.value_and_vjp(x, ct)
    np.testing.assert_allclose(np.asarray(out_j), np.asarray(out_v),
                               rtol=1e-6)
    ref = np.einsum("boi,bo->bi", np.asarray(J), np.asarray(ct))
    np.testing.assert_allclose(np.asarray(g), ref, rtol=1e-4, atol=1e-6)
    # And against jax.vjp ground truth.
    gt = jax.vmap(lambda xi, ci: jax.vjp(nn, xi)[1](ci)[0])(x, ct)
    np.testing.assert_allclose(np.asarray(g), np.asarray(gt), rtol=1e-4,
                               atol=1e-6)


def _nn_problem():
    prob = PROBLEM_DICT["gap"]
    pm = make_rom("SingleInt2D", prob["dt"], [-prob["pos_max"]] * 2,
                  [prob["pos_max"]] * 2, [-prob["vel_max"]] * 2,
                  [prob["vel_max"]] * 2)
    nn = MLP.create(jax.random.PRNGKey(3), H_REV + (H_REV + N) * 2, N,
                    num_units=32, num_layers=2, final_activation="softplus")
    ws, bs = list(nn.weights), list(nn.biases)
    ws[-1] = ws[-1] * 0.1
    bs[-1] = bs[-1] * 0.0 - 2.5
    nn = nn.replace(weights=tuple(ws), biases=tuple(bs))
    return TrajOptParams.create(
        pm, N, H_REV, 10 * np.eye(2), 10 * np.eye(2), prob["start"],
        prob["goal"], prob["obs"]["c"], prob["obs"]["r"], Qw=0.1,
        w_max=1.0, tube_params=nn,
    )


def test_outer_basis_matches_inner_exact():
    p = _nn_problem()
    kw = dict(tube_kind="NN_oneshot", warm_start="interpolate",
              tube_ws="evaluate")
    out_in = solve_tube_fast(p, N, H_REV,
                             cfg=ALConfig(nn_basis_refresh="inner"), **kw)
    out_out = solve_tube_fast(p, N, H_REV,
                              cfg=ALConfig(nn_basis_refresh=3), **kw)
    assert float(out_in.sol.viol) < 1e-3
    assert float(out_out.sol.viol) < 1e-3
    np.testing.assert_allclose(np.asarray(out_out.z), np.asarray(out_in.z),
                               atol=2e-3)
    np.testing.assert_allclose(np.asarray(out_out.w), np.asarray(out_in.w),
                               atol=2e-3)


def test_outer_basis_batched_feasibility():
    p = _nn_problem()
    B = 16
    rng = np.random.default_rng(0)
    pb = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape), p)
    pb = pb.replace(
        z0=pb.z0 + jnp.asarray(rng.uniform(-0.1, 0.1, (B, 2)), jnp.float32))
    from legged_gym_dev_tpu.solver.fast_tube import solve_tube_fast_batched

    out = solve_tube_fast_batched(
        pb, N, H_REV, tube_kind="NN_oneshot",
        cfg=ALConfig(nn_basis_refresh=3),
        warm_start="interpolate", tube_ws="evaluate")
    viol = np.asarray(out.sol.viol)
    assert (viol < 1e-3).mean() >= 0.9


def test_chunk1_equals_inner():
    """Chunk size 1 rebuilds the basis at every iterate — directions are
    exact, so it must match the fused per-inner path tightly."""
    p = _nn_problem()
    kw = dict(tube_kind="NN_oneshot", warm_start="interpolate",
              tube_ws="evaluate")
    out_in = solve_tube_fast(p, N, H_REV,
                             cfg=ALConfig(nn_basis_refresh="inner"), **kw)
    out_1 = solve_tube_fast(p, N, H_REV,
                            cfg=ALConfig(nn_basis_refresh=1), **kw)
    np.testing.assert_allclose(np.asarray(out_1.z), np.asarray(out_in.z),
                               atol=1e-4)
