"""Pallas kernel parity tests (interpret mode on CPU)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from legged_gym_dev_tpu.ops.pallas_block_tridiag import (
    block_tridiag_solve_pallas,
)
from legged_gym_dev_tpu.solver.block_tridiag import (
    block_tridiag_factor,
    block_tridiag_solve,
)


def make_systems(B, S, b, seed=0):
    rng = np.random.default_rng(seed)
    L = jnp.asarray(rng.normal(size=(B, S - 1, b, b)).astype(np.float32) * 0.3)
    A = rng.normal(size=(B, S, b, b)).astype(np.float32)
    D = jnp.asarray(
        np.einsum("bsij,bskj->bsik", A, A)
        + (2.0 + b) * np.eye(b, dtype=np.float32)
    )
    rhs = jnp.asarray(rng.normal(size=(B, S, b)).astype(np.float32))
    return D, L, rhs


@pytest.mark.parametrize("B,S,b,tile", [(8, 12, 5, 4), (16, 51, 5, 8),
                                        (4, 6, 3, 2)])
def test_pallas_matches_xla(B, S, b, tile):
    D, L, rhs = make_systems(B, S, b, seed=B)
    x_ref = jax.vmap(
        lambda d, l, r: block_tridiag_solve(block_tridiag_factor(d, l), r)
    )(D, L, rhs)
    x_pl = block_tridiag_solve_pallas(D, L, rhs, tile_b=tile, interpret=True)
    np.testing.assert_allclose(np.asarray(x_pl), np.asarray(x_ref), atol=2e-5)


@pytest.mark.parametrize("B,S,b,R,Rc", [(8, 12, 5, 7, 4), (16, 20, 5, 11, 4),
                                        (4, 6, 3, 4, 2)])
def test_multirhs_pallas_matches_xla(B, S, b, R, Rc):
    """Factor-once + chunked-column substitution (round-4 multi-RHS path)
    vs the per-column XLA reference, including non-divisible R padding."""
    from legged_gym_dev_tpu.ops.pallas_block_tridiag import (
        block_tridiag_multirhs_pallas_entries,
    )

    D, L, rhs0 = make_systems(B, S, b, seed=B + 100)
    rng = np.random.default_rng(B)
    rhs = jnp.asarray(rng.normal(size=(B, S, b, R)).astype(np.float32))

    fac = jax.vmap(block_tridiag_factor)(D, L)
    x_ref = jnp.stack(
        [jax.vmap(block_tridiag_solve)(fac, rhs[..., c])
         for c in range(R)], axis=-1)                      # (B, S, b, R)

    D_full = [[D[:, :, i, j] for j in range(b)] for i in range(b)]
    L_full = [[L[:, :, i, j] for j in range(b)] for i in range(b)]
    rhs_cols = [rhs[:, :, i, :] for i in range(b)]         # b x (B, S, R)
    x_pl = block_tridiag_multirhs_pallas_entries(
        D_full, L_full, rhs_cols, b, rhs_chunk=Rc, tile_b=4, interpret=True)
    for i in range(b):
        np.testing.assert_allclose(
            np.asarray(x_pl[i]), np.asarray(x_ref[:, :, i, :]), atol=3e-5,
            err_msg=f"entry {i}")
