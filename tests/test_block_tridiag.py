"""Block-tridiagonal factorization vs dense reference."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from legged_gym_dev_tpu.solver.block_tridiag import (
    block_tridiag_factor,
    block_tridiag_matvec,
    block_tridiag_solve,
    woodbury_solve,
)


def random_spd_btd(S, b, seed=0):
    rng = np.random.default_rng(seed)
    L = rng.normal(size=(S - 1, b, b)).astype(np.float32) * 0.3
    D = []
    for k in range(S):
        A = rng.normal(size=(b, b)).astype(np.float32)
        D.append(A @ A.T + (2.0 + b) * np.eye(b, dtype=np.float32))
    D = np.stack(D)
    return jnp.asarray(D), jnp.asarray(L)


def dense_from_blocks(D, L):
    S, b, _ = D.shape
    T = np.zeros((S * b, S * b), np.float32)
    for k in range(S):
        T[k * b:(k + 1) * b, k * b:(k + 1) * b] = D[k]
    for k in range(S - 1):
        T[(k + 1) * b:(k + 2) * b, k * b:(k + 1) * b] = L[k]
        T[k * b:(k + 1) * b, (k + 1) * b:(k + 2) * b] = L[k].T
    return T


@pytest.mark.parametrize("S,b", [(8, 3), (51, 5), (20, 7)])
def test_solve_matches_dense(S, b):
    D, L = random_spd_btd(S, b)
    rhs = jnp.asarray(
        np.random.default_rng(1).normal(size=(S, b)).astype(np.float32)
    )
    fac = block_tridiag_factor(D, L)
    x = np.asarray(block_tridiag_solve(fac, rhs))
    T = dense_from_blocks(np.asarray(D), np.asarray(L))
    x_ref = np.linalg.solve(T, np.asarray(rhs).reshape(-1)).reshape(S, b)
    np.testing.assert_allclose(x, x_ref, rtol=2e-4, atol=2e-4)


def test_matvec_roundtrip():
    D, L = random_spd_btd(12, 4, seed=2)
    rhs = jnp.asarray(
        np.random.default_rng(3).normal(size=(12, 4)).astype(np.float32)
    )
    fac = block_tridiag_factor(D, L)
    x = block_tridiag_solve(fac, rhs)
    rhs2 = block_tridiag_matvec(D, L, x)
    np.testing.assert_allclose(np.asarray(rhs2), np.asarray(rhs), atol=2e-4)


def test_batched_vmap():
    B = 16
    Ds, Ls, rhss = [], [], []
    for i in range(B):
        D, L = random_spd_btd(10, 5, seed=i)
        Ds.append(D); Ls.append(L)
        rhss.append(np.random.default_rng(100 + i).normal(size=(10, 5)))
    D = jnp.stack(Ds); L = jnp.stack(Ls)
    rhs = jnp.asarray(np.stack(rhss).astype(np.float32))
    x = jax.vmap(
        lambda d, l, r: block_tridiag_solve(block_tridiag_factor(d, l), r)
    )(D, L, rhs)
    for i in range(B):
        T = dense_from_blocks(np.asarray(D[i]), np.asarray(L[i]))
        x_ref = np.linalg.solve(T, np.asarray(rhs[i]).reshape(-1)).reshape(10, 5)
        np.testing.assert_allclose(np.asarray(x[i]), x_ref, rtol=3e-4,
                                   atol=3e-4)


def test_woodbury_low_rank_correction():
    S, b, r = 12, 5, 6
    D, L = random_spd_btd(S, b, seed=5)
    rng = np.random.default_rng(6)
    U = jnp.asarray(rng.normal(size=(S, b, r)).astype(np.float32) * 0.3)
    rhs = jnp.asarray(rng.normal(size=(S, b)).astype(np.float32))
    fac = block_tridiag_factor(D, L)
    x = np.asarray(woodbury_solve(fac, U, rhs))
    T = dense_from_blocks(np.asarray(D), np.asarray(L))
    Uf = np.asarray(U).reshape(S * b, r)
    T_full = T + Uf @ Uf.T
    x_ref = np.linalg.solve(T_full, np.asarray(rhs).reshape(-1)).reshape(S, b)
    np.testing.assert_allclose(x, x_ref, rtol=3e-4, atol=3e-4)
