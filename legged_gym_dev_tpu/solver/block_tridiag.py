"""Batched block-tridiagonal SPD factorization and solves.

The tube-MPC Gauss-Newton system, ordered stage-wise
([z_k, w_k, v_k] per horizon stage), is block-tridiagonal: objective and
obstacle terms are block-diagonal, dynamics and (l1/l2) tube-dynamics terms
couple adjacent stages only. A dense 253x253 Cholesky was the dominant cost
of the batched solve (~60ms/iteration at B=1024 on a v5e chip, XLA's batched
Cholesky being panel-sequential); the block-Thomas factorization below does
~200x fewer FLOPs with N sequential steps of tiny batched matmuls inside one
jit (GATO/Riccati-style stage-wise elimination, cf. PAPERS.md).

API (single instance; vmap over a leading batch axis):
    fac = block_tridiag_factor(D, L)    # D: (S, b, b), L: (S-1, b, b)
    x  = block_tridiag_solve(fac, rhs)  # rhs: (S, b)

where the system matrix is
    T[k, k] = D[k];  T[k+1, k] = L[k];  T[k, k+1] = L[k]^T.

Dense NN-tube rows (one-shot network couples all stages) are handled by the
caller via a Woodbury low-rank correction on top of this banded solve.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class BTFactorization(NamedTuple):
    chol: jax.Array     # (S, b, b) lower Cholesky factors of Schur blocks
    L: jax.Array        # (S-1, b, b) original sub-diagonal blocks


def small_cholesky(M: jax.Array) -> jax.Array:
    """Unrolled Cholesky for small static b (..., b, b).

    XLA's batched `cholesky` custom call is pathologically slow for tiny
    blocks on TPU (it dominated the whole tube solve); the unrolled
    elementwise form fuses into a handful of VPU kernels instead.
    """
    b = M.shape[-1]
    cols = []
    for j in range(b):
        acc = M[..., :, j]
        for k in range(j):
            acc = acc - cols[k] * cols[k][..., j:j + 1]
        d = jnp.sqrt(jnp.clip(acc[..., j], 1e-12))
        col = acc / d[..., None]
        # zero the strictly-upper part of this column
        mask = jnp.arange(b) >= j
        cols.append(col * mask)
    return jnp.stack(cols, axis=-1)


def _tri_solve_lower(Lm: jax.Array, rhs: jax.Array) -> jax.Array:
    """Solve L y = rhs with lower-triangular L (..., b, b), rhs (..., b[, k]).
    Unrolled over the static block size for fusion."""
    b = Lm.shape[-1]
    vec = rhs.ndim == Lm.ndim - 1
    if vec:
        rhs = rhs[..., None]
    ys = []
    for i in range(b):
        acc = rhs[..., i, :]
        for k in range(i):
            acc = acc - Lm[..., i, k][..., None] * ys[k]
        ys.append(acc / Lm[..., i, i][..., None])
    y = jnp.stack(ys, axis=-2)
    return y[..., 0] if vec else y


def _tri_solve_upper_t(Lm: jax.Array, rhs: jax.Array) -> jax.Array:
    """Solve L^T x = rhs (L lower-triangular), unrolled."""
    b = Lm.shape[-1]
    vec = rhs.ndim == Lm.ndim - 1
    if vec:
        rhs = rhs[..., None]
    xs = [None] * b
    for i in reversed(range(b)):
        acc = rhs[..., i, :]
        for k in range(i + 1, b):
            acc = acc - Lm[..., k, i][..., None] * xs[k]
        xs[i] = acc / Lm[..., i, i][..., None]
    x = jnp.stack(xs, axis=-2)
    return x[..., 0] if vec else x


def _chol_solve(c, rhs):
    """Solve with a precomputed lower-triangular Cholesky factor."""
    return _tri_solve_upper_t(c, _tri_solve_lower(c, rhs))


def block_tridiag_factor(D: jax.Array, L: jax.Array) -> BTFactorization:
    """Block-Cholesky (Thomas) forward sweep.

    S_0 = D_0;  S_k = D_k - L_{k-1} S_{k-1}^{-1} L_{k-1}^T.
    Returns the Cholesky factors of every Schur block.
    """
    S = D.shape[0]

    def body(carry, inp):
        prev_chol = carry
        Dk, Lk_1 = inp
        # W = S_{k-1}^{-1} L_{k-1}^T  via two triangular solves.
        W = _chol_solve(prev_chol, jnp.swapaxes(Lk_1, -1, -2))
        Sk = Dk - Lk_1 @ W
        ck = small_cholesky(Sk)
        return ck, ck

    c0 = small_cholesky(D[0])
    _, chol_rest = jax.lax.scan(body, c0, (D[1:], L))
    chol = jnp.concatenate([c0[None], chol_rest], axis=0)
    return BTFactorization(chol=chol, L=L)


def block_tridiag_solve(fac: BTFactorization, rhs: jax.Array) -> jax.Array:
    """Forward then backward substitution with the factored system."""
    chol, L = fac

    def fwd(carry, inp):
        y_prev = carry
        ck, Lk_1, rk = inp
        y = _chol_solve(ck, rk - Lk_1 @ y_prev)
        return y, y

    y0 = _chol_solve(chol[0], rhs[0])
    _, y_rest = jax.lax.scan(fwd, y0, (chol[1:], L, rhs[1:]))
    y = jnp.concatenate([y0[None], y_rest], axis=0)

    def bwd(carry, inp):
        x_next = carry
        ck, Lk, yk = inp
        x = yk - _chol_solve(ck, jnp.swapaxes(Lk, -1, -2) @ x_next)
        return x, x

    xN = y[-1]
    _, x_rest = jax.lax.scan(
        bwd, xN, (chol[:-1], L, y[:-1]), reverse=True
    )
    return jnp.concatenate([x_rest, xN[None]], axis=0)


def block_tridiag_matvec(D, L, x):
    """T x for testing/refinement."""
    out = jnp.einsum("sij,sj->si", D, x)
    out = out.at[1:].add(jnp.einsum("sij,sj->si", L, x[:-1]))
    out = out.at[:-1].add(jnp.einsum("sji,sj->si", L, x[1:]))
    return out


def woodbury_solve(fac: BTFactorization, U: jax.Array, rhs: jax.Array):
    """Solve (T + U U^T) x = rhs with T banded-factored and U (S, b, r).

    Woodbury: x = T^{-1}rhs - T^{-1}U (I + U^T T^{-1} U)^{-1} U^T T^{-1}rhs.
    Used for the one-shot NN tube rows, whose Jacobian couples every stage
    (rank r = N tube rows).
    """
    S, b, r = U.shape
    # T^{-1} [rhs, U] via banded solves (treat U columns as extra RHS).
    Tinv_rhs = block_tridiag_solve(fac, rhs)

    def solve_col(col):
        return block_tridiag_solve(fac, col)

    Tinv_U = jax.vmap(solve_col, in_axes=2, out_axes=2)(U)   # (S, b, r)
    G = jnp.eye(r) + jnp.einsum("sbr,sbq->rq", U, Tinv_U)
    w = jnp.einsum("sbr,sb->r", U, Tinv_rhs)
    y = jnp.linalg.solve(G, w)
    return Tinv_rhs - jnp.einsum("sbr,r->sb", Tinv_U, y)
