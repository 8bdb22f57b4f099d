"""Pallas TPU kernel: batched block-tridiagonal SPD factor+solve.

The structured tube-MPC solver's hot linear-algebra op (solver/block_tridiag
.py) as a single fused TPU kernel: for a tile of scenarios, the entire
stage recursion — Schur-complement sweep, forward and backward substitution
— runs with all blocks resident in VMEM, eliminating the per-stage HBM
round-trips and op-dispatch overhead of the XLA scan formulation.

Layout (the part that matters on TPU): arrays are stored lane-major as
(S, b, b, B) with the scenario batch in the 128-wide lane dimension and the
tiny b x b block indices as leading (sublane-free) axes. Every block
operation then becomes a handful of elementwise multiply-adds over (TILE_B,)
lane vectors — the natural VPU shape. The naive (B, S, b, b) layout pads
each 5x5 block to an (8, 128) tile, an ~80x VMEM blowup that does not fit.

The stage recursion runs as fori_loops over VMEM scratch (full unrolling of
51 stages exceeds Mosaic's compile budget). The XLA path in
solver/block_tridiag.py is the golden reference in tests (interpret mode on
CPU, compiled on TPU).
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


# ---- lane-major block primitives: arrays are (b, b, TB) / (b, TB) ---------

def _tri_lower_lane(L, rhs, b: int):
    """Solve L y = rhs; L as list-of-lists lanes, rhs list of (TB,)."""
    y = [None] * b
    for i in range(b):
        acc = rhs[i]
        for k in range(i):
            acc = acc - L[i][k] * y[k]
        y[i] = acc / L[i][i]
    return y


def _tri_upper_t_lane(L, rhs, b: int):
    x = [None] * b
    for i in reversed(range(b)):
        acc = rhs[i]
        for k in range(i + 1, b):
            acc = acc - L[k][i] * x[k]
        x[i] = acc / L[i][i]
    return x


def _chol_solve_lane(L, rhs, b: int):
    return _tri_upper_t_lane(L, _tri_lower_lane(L, rhs, b), b)


def _bt_kernel(D_ref, L_ref, rhs_ref, x_ref, chol_ref, y_ref, *, S: int,
               b: int):
    """Factor + solve for one lane tile. Refs are (S, b, b, TB) / (S, b, TB);
    scratch chol (S, b, b, TB), y (S, b, TB)."""

    def load_block(ref, k):
        return [[ref[k, i, j] for j in range(b)] for i in range(b)]

    def store_block(ref, k, Lm):
        for i in range(b):
            for j in range(b):
                ref[k, i, j] = Lm[i][j]

    def load_vec(ref, k):
        return [ref[k, i] for i in range(b)]

    def store_vec(ref, k, v):
        for i in range(b):
            ref[k, i] = v[i]

    c0 = _chol_lane_from_ref(D_ref, 0, b)
    store_block(chol_ref, 0, c0)
    store_vec(y_ref, 0, _chol_solve_lane(c0, load_vec(rhs_ref, 0), b))

    def fwd(k, _):
        Lk = load_block(L_ref, k - 1)
        chol_prev = load_block(chol_ref, k - 1)
        # W = S_{k-1}^{-1} L_k^T, column by column.
        W = [[None] * b for _ in range(b)]
        for c in range(b):
            col = _chol_solve_lane(chol_prev, [Lk[c][i] for i in range(b)], b)
            for r in range(b):
                W[r][c] = col[r]
        # S_k = D_k - L_k W
        Sk = [[D_ref[k, i, j] for j in range(b)] for i in range(b)]
        for i in range(b):
            for j in range(b):
                acc = Sk[i][j]
                for t in range(b):
                    acc = acc - Lk[i][t] * W[t][j]
                Sk[i][j] = acc
        ck = _chol_lane_from_rows(Sk, b)
        store_block(chol_ref, k, ck)
        # y_k = S_k^{-1} (rhs_k - L_k y_{k-1})
        y_prev = load_vec(y_ref, k - 1)
        r = []
        for i in range(b):
            acc = rhs_ref[k, i]
            for t in range(b):
                acc = acc - Lk[i][t] * y_prev[t]
            r.append(acc)
        store_vec(y_ref, k, _chol_solve_lane(ck, r, b))
        return 0

    jax.lax.fori_loop(1, S, fwd, 0)

    store_vec(x_ref, S - 1, load_vec(y_ref, S - 1))

    def bwd(idx, _):
        k = S - 2 - idx
        Lk = load_block(L_ref, k)
        x_next = load_vec(x_ref, k + 1)
        # rhs = L_k^T x_{k+1}
        r = []
        for i in range(b):
            acc = Lk[0][i] * x_next[0]
            for t in range(1, b):
                acc = acc + Lk[t][i] * x_next[t]
            r.append(acc)
        corr = _chol_solve_lane(load_block(chol_ref, k), r, b)
        yk = load_vec(y_ref, k)
        store_vec(x_ref, k, [yk[i] - corr[i] for i in range(b)])
        return 0

    jax.lax.fori_loop(0, S - 1, bwd, 0)


def _chol_lane_from_ref(ref, k, b: int):
    return _chol_lane_from_rows(
        [[ref[k, i, j] for j in range(b)] for i in range(b)], b
    )


def _chol_lane_from_rows(M, b: int):
    L = [[None] * b for _ in range(b)]
    for j in range(b):
        acc = [M[i][j] for i in range(b)]
        for k in range(j):
            for i in range(j, b):
                acc[i] = acc[i] - L[i][k] * L[j][k]
        d = jnp.sqrt(jnp.clip(acc[j], 1e-12))
        inv_d = 1.0 / d
        for i in range(b):
            L[i][j] = (acc[i] * inv_d) if i >= j else jnp.zeros_like(d)
    return L


def _pallas_call_lane_major(Dt, Lt, rt, S: int, b: int, rows_total: int,
                            LANES: int, tile_rows: int,
                            interpret: bool) -> jax.Array:
    """Invoke the kernel on prebuilt lane-major tensors.

    Dt (S, b, b, rows, LANES); Lt (S-1, b, b, rows, LANES);
    rt (S, b, rows, LANES) -> x (S, b, rows, LANES).
    """
    grid = (rows_total // tile_rows,)
    kernel = functools.partial(_bt_kernel, S=S, b=b)
    kw = {}
    scratch = []
    if _HAS_PLTPU:
        scratch = [
            pltpu.VMEM((S, b, b, tile_rows, LANES), Dt.dtype),
            pltpu.VMEM((S, b, tile_rows, LANES), Dt.dtype),
        ]
        if not interpret:
            kw["compiler_params"] = pltpu.CompilerParams(
                vmem_limit_bytes=(32 << 20),
            )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((S, b, rows_total, LANES), Dt.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((S, b, b, tile_rows, LANES),
                         lambda i: (0, 0, 0, i, 0)),
            pl.BlockSpec((S - 1, b, b, tile_rows, LANES),
                         lambda i: (0, 0, 0, i, 0)),
            pl.BlockSpec((S, b, tile_rows, LANES), lambda i: (0, 0, i, 0)),
        ],
        out_specs=pl.BlockSpec((S, b, tile_rows, LANES),
                               lambda i: (0, 0, i, 0)),
        scratch_shapes=scratch,
        interpret=interpret,
        **kw,
    )(Dt, Lt, rt)


def _lane_layout(B: int, tile_b: int):
    tile_b = min(tile_b, B)
    LANES = 128 if B % 128 == 0 else 1
    rows_total = B // LANES
    tile_rows = max(1, tile_b // LANES)
    if rows_total % tile_rows != 0:
        tile_rows = rows_total
    return LANES, rows_total, tile_rows


def block_tridiag_solve_pallas_entries(D_full, L_full, rhs, b: int,
                                       tile_b: int = 1024,
                                       interpret: bool = False):
    """Batched solve from ENTRY-form inputs (the staged solver's native
    representation): build the lane-major layout directly from per-entry
    (B, S)/(B, S-1) arrays — no (B, S, b, b) intermediate whose tiny minor
    dims would pad to (8, 128) tiles.

    D_full: b x b nested list of (B, S) arrays (full symmetric blocks);
    L_full: b x b nested list of (B, S-1); rhs: list b of (B, S).
    Returns list b of (B, S).
    """
    B, S = rhs[0].shape
    LANES, rows_total, tile_rows = _lane_layout(B, tile_b)

    def lane(x, s):
        # (B, s) -> (s, rows, LANES)
        return jnp.moveaxis(x, 0, -1).reshape(s, rows_total, LANES)

    Dt = jnp.stack(
        [jnp.stack([lane(D_full[i][j], S) for j in range(b)], axis=1)
         for i in range(b)], axis=1)                   # (S, b, b, rows, L)
    Lt = jnp.stack(
        [jnp.stack([lane(L_full[i][j], S - 1) for j in range(b)], axis=1)
         for i in range(b)], axis=1)                   # (S-1, b, b, rows, L)
    rt = jnp.stack([lane(r, S) for r in rhs], axis=1)  # (S, b, rows, L)

    xt = _pallas_call_lane_major(Dt, Lt, rt, S, b, rows_total, LANES,
                                 tile_rows, interpret)
    xt = xt.reshape(S, b, B)
    return [jnp.moveaxis(xt[:, i], -1, 0) for i in range(b)]


def block_tridiag_solve_pallas(D: jax.Array, L: jax.Array, rhs: jax.Array,
                               tile_b: int = 128,
                               interpret: bool = False) -> jax.Array:
    """Solve T x = rhs for a batch of block-tridiagonal SPD systems.

    D: (B, S, b, b); L: (B, S-1, b, b); rhs: (B, S, b) -> x (B, S, b).
    Internally transposed to lane-major (S, b, b, B).
    """
    B, S, b, _ = D.shape
    tile_b = min(tile_b, B)
    assert B % tile_b == 0, (B, tile_b)
    # 2D lane layout: batch -> (rows, 128) so each per-block-scalar op is a
    # (rows, 128) register tile (full sublane+lane utilization); a flat (TB,)
    # layout would occupy a single sublane per op.
    LANES = 128 if B % 128 == 0 else 1
    rows_total = B // LANES
    tile_rows = max(1, tile_b // LANES)
    if rows_total % tile_rows != 0:
        tile_rows = rows_total
    grid = (rows_total // tile_rows,)

    def to_lane(x, trailing):
        # (B, S, ...) -> (S, ..., rows, 128)
        xt = jnp.moveaxis(x, 0, -1)
        return xt.reshape(xt.shape[:-1] + (rows_total, LANES))

    Dt = to_lane(D, 2)
    Lt = to_lane(L, 2)
    rt = to_lane(rhs, 1)
    kernel = functools.partial(_bt_kernel, S=S, b=b)
    kw = {}
    scratch = []
    if _HAS_PLTPU:
        scratch = [
            pltpu.VMEM((S, b, b, tile_rows, LANES), D.dtype),
            pltpu.VMEM((S, b, tile_rows, LANES), D.dtype),
        ]
        if not interpret:
            kw["compiler_params"] = pltpu.CompilerParams(
                vmem_limit_bytes=(32 << 20),
            )
    xt = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((S, b, rows_total, LANES), D.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((S, b, b, tile_rows, LANES),
                         lambda i: (0, 0, 0, i, 0)),
            pl.BlockSpec((S - 1, b, b, tile_rows, LANES),
                         lambda i: (0, 0, 0, i, 0)),
            pl.BlockSpec((S, b, tile_rows, LANES), lambda i: (0, 0, i, 0)),
        ],
        out_specs=pl.BlockSpec((S, b, tile_rows, LANES),
                               lambda i: (0, 0, i, 0)),
        scratch_shapes=scratch,
        interpret=interpret,
        **kw,
    )(Dt, Lt, rt)
    xt = xt.reshape(S, b, B)
    return jnp.moveaxis(xt, -1, 0)


# ---------------------------------------------------------------------------
# Multi-RHS path: factor once, stream RHS columns in VMEM-sized chunks
# (round 4 — the NN-tube Woodbury basis rebuild's (S, 1+N) solve, the
# single biggest chunk of the NN solve after the MLP Jacobian;
# docs/PERF.md "NN-solve component attribution")
# ---------------------------------------------------------------------------

def _bt_factor_kernel(D_ref, L_ref, chol_ref, *, S: int, b: int):
    """Schur-complement sweep only: writes the per-stage Cholesky factors
    of S_k = D_k - L_k S_{k-1}^{-1} L_k^T (the shared factor for any
    number of right-hand sides)."""

    def load_block(ref, k):
        return [[ref[k, i, j] for j in range(b)] for i in range(b)]

    def store_block(ref, k, Lm):
        for i in range(b):
            for j in range(b):
                ref[k, i, j] = Lm[i][j]

    store_block(chol_ref, 0, _chol_lane_from_ref(D_ref, 0, b))

    def fwd(k, _):
        Lk = load_block(L_ref, k - 1)
        chol_prev = load_block(chol_ref, k - 1)
        W = [[None] * b for _ in range(b)]
        for c in range(b):
            col = _chol_solve_lane(chol_prev, [Lk[c][i] for i in range(b)], b)
            for r in range(b):
                W[r][c] = col[r]
        Sk = [[D_ref[k, i, j] for j in range(b)] for i in range(b)]
        for i in range(b):
            for j in range(b):
                acc = Sk[i][j]
                for t in range(b):
                    acc = acc - Lk[i][t] * W[t][j]
                Sk[i][j] = acc
        store_block(chol_ref, k, _chol_lane_from_rows(Sk, b))
        return 0

    jax.lax.fori_loop(1, S, fwd, 0)


def _bt_msolve_kernel(chol_ref, L_ref, rhs_ref, x_ref, y_ref, *, S: int,
                      b: int, Rc: int):
    """Forward/backward substitution for an Rc-column RHS chunk against a
    prebuilt factor. Refs: chol (S, b, b, TR, LANES), L (S-1, b, b, ...),
    rhs/x/y (S, b, Rc, TR, LANES)."""

    def load_block(ref, k):
        return [[ref[k, i, j] for j in range(b)] for i in range(b)]

    def load_vec(ref, k, c):
        return [ref[k, i, c] for i in range(b)]

    def store_vec(ref, k, c, v):
        for i in range(b):
            ref[k, i, c] = v[i]

    c0 = load_block(chol_ref, 0)
    for c in range(Rc):
        store_vec(y_ref, 0, c, _chol_solve_lane(c0, load_vec(rhs_ref, 0, c),
                                                b))

    def fwd(k, _):
        Lk = load_block(L_ref, k - 1)
        ck = load_block(chol_ref, k)
        for c in range(Rc):
            y_prev = load_vec(y_ref, k - 1, c)
            r = []
            for i in range(b):
                acc = rhs_ref[k, i, c]
                for t in range(b):
                    acc = acc - Lk[i][t] * y_prev[t]
                r.append(acc)
            store_vec(y_ref, k, c, _chol_solve_lane(ck, r, b))
        return 0

    jax.lax.fori_loop(1, S, fwd, 0)

    for c in range(Rc):
        store_vec(x_ref, S - 1, c, load_vec(y_ref, S - 1, c))

    def bwd(idx, _):
        k = S - 2 - idx
        Lk = load_block(L_ref, k)
        ck = load_block(chol_ref, k)
        for c in range(Rc):
            x_next = load_vec(x_ref, k + 1, c)
            r = []
            for i in range(b):
                acc = Lk[0][i] * x_next[0]
                for t in range(1, b):
                    acc = acc + Lk[t][i] * x_next[t]
                r.append(acc)
            corr = _chol_solve_lane(ck, r, b)
            yk = load_vec(y_ref, k, c)
            store_vec(x_ref, k, c, [yk[i] - corr[i] for i in range(b)])
        return 0

    jax.lax.fori_loop(0, S - 1, bwd, 0)


def block_tridiag_multirhs_pallas_entries(D_full, L_full, rhs_cols, b: int,
                                          rhs_chunk: int = 4,
                                          tile_b: int = 1024,
                                          interpret: bool = False):
    """Batched multi-RHS solve from entry-form inputs.

    D_full/L_full as in ``block_tridiag_solve_pallas_entries``;
    rhs_cols: list b of (B, S, R). Returns list b of (B, S, R).

    Two kernels: the factor runs ONCE per lane tile (its cost is ~b/2R of
    the whole solve at R~50, so sharing it matters less than keeping the
    substitution in VMEM); the substitution streams the R columns in
    ``rhs_chunk``-sized chunks so the (S, b, Rc, TR, 128) working set
    (~23 MB at the bench shapes with Rc=4) fits VMEM. The XLA multi-RHS
    entry-scan pays per-stage dispatch + HBM round trips on every one of
    the S stages x R columns; here each chunk's whole recursion is
    VMEM-resident.
    """
    B, S, R = rhs_cols[0].shape
    LANES, rows_total, tile_rows = _lane_layout(B, tile_b)
    Rc = min(rhs_chunk, R)
    R_pad = ((R + Rc - 1) // Rc) * Rc
    n_chunks = R_pad // Rc

    def lane(x, s):
        return jnp.moveaxis(x, 0, -1).reshape(s, rows_total, LANES)

    Dt = jnp.stack(
        [jnp.stack([lane(D_full[i][j], S) for j in range(b)], axis=1)
         for i in range(b)], axis=1)                   # (S, b, b, rows, L)
    Lt = jnp.stack(
        [jnp.stack([lane(L_full[i][j], S - 1) for j in range(b)], axis=1)
         for i in range(b)], axis=1)                   # (S-1, b, b, rows, L)

    def lane_cols(x):
        # (B, S, R) -> (S, R_pad, rows, LANES)
        x = jnp.moveaxis(x, 0, -1)                     # (S, R, B)
        if R_pad != R:
            x = jnp.concatenate(
                [x, jnp.zeros((S, R_pad - R, B), x.dtype)], axis=1)
        return x.reshape(S, R_pad, rows_total, LANES)

    rt = jnp.stack([lane_cols(r) for r in rhs_cols], axis=1)
    # (S, b, R_pad, rows, LANES)

    kw = {}
    scratch_f, scratch_s = [], []
    if _HAS_PLTPU:
        scratch_s = [pltpu.VMEM((S, b, Rc, tile_rows, LANES), Dt.dtype)]
        if not interpret:
            kw["compiler_params"] = pltpu.CompilerParams(
                vmem_limit_bytes=(64 << 20),
            )

    chol = pl.pallas_call(
        functools.partial(_bt_factor_kernel, S=S, b=b),
        out_shape=jax.ShapeDtypeStruct((S, b, b, rows_total, LANES),
                                       Dt.dtype),
        grid=(rows_total // tile_rows,),
        in_specs=[
            pl.BlockSpec((S, b, b, tile_rows, LANES),
                         lambda i: (0, 0, 0, i, 0)),
            pl.BlockSpec((S - 1, b, b, tile_rows, LANES),
                         lambda i: (0, 0, 0, i, 0)),
        ],
        out_specs=pl.BlockSpec((S, b, b, tile_rows, LANES),
                               lambda i: (0, 0, 0, i, 0)),
        scratch_shapes=scratch_f,
        interpret=interpret,
        **kw,
    )(Dt, Lt)

    xt = pl.pallas_call(
        functools.partial(_bt_msolve_kernel, S=S, b=b, Rc=Rc),
        out_shape=jax.ShapeDtypeStruct((S, b, R_pad, rows_total, LANES),
                                       Dt.dtype),
        grid=(rows_total // tile_rows, n_chunks),
        in_specs=[
            pl.BlockSpec((S, b, b, tile_rows, LANES),
                         lambda i, j: (0, 0, 0, i, 0)),
            pl.BlockSpec((S - 1, b, b, tile_rows, LANES),
                         lambda i, j: (0, 0, 0, i, 0)),
            pl.BlockSpec((S, b, Rc, tile_rows, LANES),
                         lambda i, j: (0, 0, j, i, 0)),
        ],
        out_specs=pl.BlockSpec((S, b, Rc, tile_rows, LANES),
                               lambda i, j: (0, 0, j, i, 0)),
        scratch_shapes=scratch_s,
        interpret=interpret,
        **kw,
    )(chol, Lt, rt)

    xt = xt.reshape(S, b, R_pad, B)[:, :, :R]          # drop pad columns
    return [jnp.moveaxis(xt[:, i], -1, 0) for i in range(b)]  # (B, S, R)
