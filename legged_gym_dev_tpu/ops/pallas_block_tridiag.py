"""Pallas TPU kernel: batched block-tridiagonal SPD factor+solve.

The structured tube-MPC solver's hot linear-algebra op (solver/block_tridiag
.py) as a single fused TPU kernel: for a tile of scenarios, the entire
stage recursion — Schur-complement sweep, forward and backward substitution
— runs with all blocks resident in VMEM, eliminating the per-stage HBM
round-trips and op-dispatch overhead of the XLA scan formulation.

Layout: the batch axis is tiled over the grid; within a tile the b x b
blocks are laid out as (TILE_B, S, b, b) arrays whose last two axes are
small and static, so every per-stage op is a (TILE_B, b, b) elementwise/
broadcast computation on the VPU (b <= 8; no MXU shapes at this size).

The algorithm mirrors block_tridiag.py exactly (same unrolled Cholesky /
triangular solves), so the XLA path serves as the golden reference in tests
(interpret mode on CPU, compiled on TPU).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu only resolves on TPU-capable installs
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    _HAS_PLTPU = False


def _chol_tile(M):
    """Unrolled Cholesky over a (TB, b, b) tile (see
    solver/block_tridiag.small_cholesky)."""
    b = M.shape[-1]
    cols = []
    for j in range(b):
        acc = M[..., :, j]
        for k in range(j):
            acc = acc - cols[k] * cols[k][..., j:j + 1]
        d = jnp.sqrt(jnp.clip(acc[..., j], 1e-12))
        col = acc / d[..., None]
        mask = (jnp.arange(b) >= j).astype(M.dtype)
        cols.append(col * mask)
    return jnp.stack(cols, axis=-1)


def _tri_lower_tile(L, rhs):
    b = L.shape[-1]
    vec = rhs.ndim == L.ndim - 1
    if vec:
        rhs = rhs[..., None]
    ys = []
    for i in range(b):
        acc = rhs[..., i, :]
        for k in range(i):
            acc = acc - L[..., i, k][..., None] * ys[k]
        ys.append(acc / L[..., i, i][..., None])
    y = jnp.stack(ys, axis=-2)
    return y[..., 0] if vec else y


def _tri_upper_t_tile(L, rhs):
    b = L.shape[-1]
    vec = rhs.ndim == L.ndim - 1
    if vec:
        rhs = rhs[..., None]
    xs = [None] * b
    for i in reversed(range(b)):
        acc = rhs[..., i, :]
        for k in range(i + 1, b):
            acc = acc - L[..., k, i][..., None] * xs[k]
        xs[i] = acc / L[..., i, i][..., None]
    x = jnp.stack(xs, axis=-2)
    return x[..., 0] if vec else x


def _chol_solve_tile(c, rhs):
    return _tri_upper_t_tile(c, _tri_lower_tile(c, rhs))


def _bt_kernel(D_ref, L_ref, rhs_ref, x_ref, *, S: int, b: int):
    """Factor + solve for one batch tile, fully VMEM-resident."""
    D = D_ref[...]
    L = L_ref[...]
    rhs = rhs_ref[...]

    # Forward Schur sweep + forward substitution fused per stage.
    chol_prev = _chol_tile(D[:, 0])
    y_prev = _chol_solve_tile(chol_prev, rhs[:, 0])
    chols = [chol_prev]
    ys = [y_prev]
    for k in range(1, S):
        Lk = L[:, k - 1]
        W = _chol_solve_tile(chol_prev, jnp.swapaxes(Lk, -1, -2))
        Sk = D[:, k] - Lk @ W
        chol_prev = _chol_tile(Sk)
        y_prev = _chol_solve_tile(
            chol_prev, rhs[:, k] - jnp.einsum("tij,tj->ti", Lk, y_prev)
        )
        chols.append(chol_prev)
        ys.append(y_prev)

    # Backward substitution.
    x_next = ys[-1]
    xs = [x_next]
    for k in range(S - 2, -1, -1):
        Lk = L[:, k]
        x_next = ys[k] - _chol_solve_tile(
            chols[k], jnp.einsum("tji,tj->ti", Lk, x_next)
        )
        xs.append(x_next)
    xs.reverse()
    x_ref[...] = jnp.stack(xs, axis=1)


def block_tridiag_solve_pallas(D: jax.Array, L: jax.Array, rhs: jax.Array,
                               tile_b: int = 128,
                               interpret: bool = False) -> jax.Array:
    """Solve T x = rhs for a batch of block-tridiagonal SPD systems.

    D: (B, S, b, b); L: (B, S-1, b, b); rhs: (B, S, b) -> x (B, S, b).
    """
    B, S, b, _ = D.shape
    tile_b = min(tile_b, B)
    assert B % tile_b == 0, (B, tile_b)
    grid = (B // tile_b,)
    kernel = functools.partial(_bt_kernel, S=S, b=b)
    kw = {}
    if _HAS_PLTPU and not interpret:
        kw["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=int(1.2 * 4 * tile_b * S * (2 * b * b + 2 * b))
            + (1 << 20),
        )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, S, b), D.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_b, S, b, b), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((tile_b, S - 1, b, b), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((tile_b, S, b), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((tile_b, S, b), lambda i: (i, 0, 0)),
        interpret=interpret,
        **kw,
    )(D, L, rhs)
