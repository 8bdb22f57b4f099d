"""Blocked batched Cholesky (ops/blocked_chol.py) and the analytic MLP
Jacobian (tube/models.py value_and_jacobian) vs autodiff/scipy references."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from legged_gym_dev_tpu.ops.blocked_chol import (
    blocked_cho_solve,
    blocked_cholesky,
)
from legged_gym_dev_tpu.tube.models import MLP


@pytest.mark.parametrize("B,n,p", [(4, 50, 10), (1, 20, 10), (3, 30, 6),
                                   (2, 10, 10)])
def test_blocked_cholesky_matches_scipy(B, n, p):
    rng = np.random.default_rng(n * 10 + p)
    A = rng.normal(size=(B, n, n)).astype(np.float32) * 0.3
    C = jnp.asarray(A @ np.swapaxes(A, -1, -2) + 2.0 * np.eye(n, dtype=np.float32))
    rhs = jnp.asarray(rng.normal(size=(B, n)).astype(np.float32))

    L = blocked_cholesky(C, p=p)
    L_ref = np.linalg.cholesky(np.asarray(C, np.float64))
    assert np.abs(np.asarray(L) - L_ref).max() < 1e-3

    x = blocked_cho_solve(L, rhs, p=p)
    x_ref = np.linalg.solve(np.asarray(C, np.float64),
                            np.asarray(rhs, np.float64)[..., None])[..., 0]
    assert np.abs(np.asarray(x) - x_ref).max() < 1e-3


def test_blocked_cho_solve_multi_rhs():
    rng = np.random.default_rng(0)
    A = rng.normal(size=(2, 20, 20)).astype(np.float32) * 0.3
    C = jnp.asarray(A @ np.swapaxes(A, -1, -2) + 2.0 * np.eye(20, dtype=np.float32))
    rhs = jnp.asarray(rng.normal(size=(2, 20, 7)).astype(np.float32))
    L = blocked_cholesky(C, p=10)
    x = blocked_cho_solve(L, rhs, p=10)
    x_ref = np.linalg.solve(np.asarray(C, np.float64), np.asarray(rhs, np.float64))
    assert x.shape == (2, 20, 7)
    assert np.abs(np.asarray(x) - x_ref).max() < 1e-3


@pytest.mark.parametrize("act,final", [("softplus_b5", "softplus"),
                                       ("tanh", "none"),
                                       ("elu", "none")])
def test_mlp_value_and_jacobian_matches_jacfwd(act, final):
    nn = MLP.create(jax.random.PRNGKey(1), 13, 7, num_units=16,
                    num_layers=2, activation=act, final_activation=final)
    x = jax.random.normal(jax.random.PRNGKey(2), (13,))
    out, J = nn.value_and_jacobian(x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(nn(x)), atol=1e-6)
    J_ref = jax.jacfwd(nn)(x)
    np.testing.assert_allclose(np.asarray(J), np.asarray(J_ref), atol=1e-5)


def test_mlp_value_and_jacobian_batched():
    nn = MLP.create(jax.random.PRNGKey(1), 9, 5, num_units=8, num_layers=3)
    x = jax.random.normal(jax.random.PRNGKey(2), (4, 9))
    out, J = nn.value_and_jacobian(x)
    assert out.shape == (4, 5) and J.shape == (4, 5, 9)
    J_ref = jax.vmap(jax.jacfwd(nn))(x)
    np.testing.assert_allclose(np.asarray(J), np.asarray(J_ref), atol=1e-5)
