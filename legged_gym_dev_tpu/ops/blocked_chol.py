"""Blocked batched Cholesky for medium dense SPD systems on TPU.

XLA's batched ``cholesky``/``triangular_solve`` custom calls are
panel-sequential with large per-panel overhead; at the NN-tube solver's
capacitance shape (B, 50, 50) they cost ~6 ms/call — the single largest
component of the NN-oneshot solve (measured, docs/PERF.md). This blocked
form does the same factorization as ~n/p static panel steps, each:

- an UNROLLED scalar-entry p x p Cholesky (the ``small_cholesky`` trick
  from the staged solver: entries are (B,) lanes, everything fuses on the
  VPU — no (8, 128)-tile padding of tiny minor dims),
- an unrolled right-triangular solve for the panel's trailing rows,
- one dense (B, n-k, p) @ (B, p, n-k) SYRK update on the MXU.

Replaces IPOPT+MUMPS' dense-block factorization role for the Woodbury
capacitance system (ref solver being replaced: trajopt/tube_trajopt.py:
256-277). Parity vs jax.scipy cho_solve asserted in tests/test_blocked_chol.py.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _chol_panel(P):
    """Unrolled Cholesky of (..., p, p) SPD block via scalar entries."""
    p = P.shape[-1]
    c = [[None] * p for _ in range(p)]
    for j in range(p):
        acc = P[..., j, j]
        for k in range(j):
            acc = acc - c[j][k] * c[j][k]
        d = jnp.sqrt(jnp.maximum(acc, 1e-30))
        c[j][j] = d
        inv = 1.0 / d
        for i in range(j + 1, p):
            a = P[..., i, j]
            for k in range(j):
                a = a - c[i][k] * c[j][k]
            c[i][j] = a * inv
    rows = [jnp.stack([c[i][j] if j <= i else jnp.zeros_like(c[i][i])
                       for j in range(p)], axis=-1) for i in range(p)]
    return jnp.stack(rows, axis=-2)          # (..., p, p) lower


def _solve_right_lowerT(T, Lp):
    """X = T @ Lp^{-T} for (..., r, p) T and (..., p, p) lower Lp,
    unrolled over the p columns (forward substitution on columns)."""
    p = Lp.shape[-1]
    cols = []
    for j in range(p):
        acc = T[..., :, j]
        for k in range(j):
            acc = acc - cols[k] * Lp[..., j, k][..., None]
        cols.append(acc / Lp[..., j, j][..., None])
    return jnp.stack(cols, axis=-1)          # (..., r, p)


def blocked_cholesky(C, p: int = 10):
    """Lower Cholesky factor of (..., n, n) SPD C with panel size p.

    n must be a multiple of p (pad the system if not; the capacitance
    matrices this serves are (N, N) with N a config constant).
    """
    n = C.shape[-1]
    assert n % p == 0, (n, p)
    L_cols = []
    done = jnp.zeros(C.shape[:-2] + (n, 0), C.dtype)
    for k0 in range(0, n, p):
        k1 = k0 + p
        Lrow_prev = done[..., k0:k1, :]                    # (..., p, k0)
        P = C[..., k0:k1, k0:k1] - Lrow_prev @ jnp.swapaxes(Lrow_prev, -1, -2)
        Lp = _chol_panel(P)
        if k1 < n:
            Ltr_prev = done[..., k1:, :]                   # (..., n-k1, k0)
            T = (C[..., k1:, k0:k1]
                 - Ltr_prev @ jnp.swapaxes(Lrow_prev, -1, -2))
            X = _solve_right_lowerT(T, Lp)                 # (..., n-k1, p)
        else:
            X = jnp.zeros(C.shape[:-2] + (0, p), C.dtype)
        col = jnp.concatenate([
            jnp.zeros(C.shape[:-2] + (k0, p), C.dtype), Lp, X], axis=-2)
        L_cols.append(col)
        done = jnp.concatenate([done, col], axis=-1)
    return done


def blocked_cho_solve(L, rhs, p: int = 10):
    """Solve L L^T x = rhs for (..., n, n) lower L, rhs (..., n) or
    (..., n, k); unrolled block forward/backward substitution."""
    n = L.shape[-1]
    vec = rhs.ndim == L.ndim - 1
    b = rhs[..., None] if vec else rhs
    # forward: L y = b
    ys = []
    for k0 in range(0, n, p):
        k1 = k0 + p
        acc = b[..., k0:k1, :]
        if k0:
            y_prev = jnp.concatenate(ys, axis=-2)
            acc = acc - L[..., k0:k1, :k0] @ y_prev
        Lp = L[..., k0:k1, k0:k1]
        rows = []
        for i in range(p):
            a = acc[..., i, :]
            for j in range(i):
                a = a - rows[j] * Lp[..., i, j][..., None]
            rows.append(a / Lp[..., i, i][..., None])
        ys.append(jnp.stack(rows, axis=-2))
    y = jnp.concatenate(ys, axis=-2)
    # backward: L^T x = y (blocks processed bottom-up)
    xs_rev = []
    for bi in range(n // p - 1, -1, -1):
        k0, k1 = bi * p, bi * p + p
        acc = y[..., k0:k1, :]
        if k1 < n:
            x_below = jnp.concatenate(list(reversed(xs_rev)), axis=-2)
            acc = acc - jnp.swapaxes(L[..., k1:, k0:k1], -1, -2) @ x_below
        Lp = L[..., k0:k1, k0:k1]
        rows = [None] * p
        for i in reversed(range(p)):
            a = acc[..., i, :]
            for j in range(i + 1, p):
                a = a - rows[j] * Lp[..., j, i][..., None]
            rows[i] = a / Lp[..., i, i][..., None]
        xs_rev.append(jnp.stack(rows, axis=-2))
    x = jnp.concatenate(list(reversed(xs_rev)), axis=-2)
    return x[..., 0] if vec else x
