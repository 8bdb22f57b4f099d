"""Scalar-entry ("lane-major") staged tube solve: the TPU-fast path.

Same AL Gauss-Newton algorithm and block-Thomas factorization as
``fast_tube`` / ``block_tridiag``, but every per-stage object — gradient,
GN diagonal/sub-diagonal blocks, Cholesky factors, residuals — is kept as
Python lists of flat ``(S,)`` arrays (one per matrix ENTRY) instead of
``(S, b, b)`` arrays. Rationale (measured, see docs/PERF.md): arrays whose
two minor dims are the tiny block size b≈5 pad to (8, 128) TPU tiles, a
~35x HBM-traffic blowup; the assemble step's ~20 scatter ops on such
arrays dominated the whole batched solve. In entry form XLA sees only
elementwise ops on (S,)/(B, S) arrays that fuse on the VPU — the same
"scalar graph" technique as ``sim/kinematics.py``.

Zero entries are represented as Python float ``0.0`` (``None`` inside scan
pytrees) and skipped at trace time, so the sparsity of the staged blocks
(dynamics rows touch only (z, v), the tube row only (w, v)) is exploited
exactly.

Replaces IPOPT+MUMPS' sparse factorization (ref: trajopt/tube_trajopt.py:
256-277) for the full tube family, including the reference's flagship
``NN_oneshot`` mode (ref: tube_trajopt.py:543-570, where the learned tube
MLP is embedded in the NLP via l4casadi C++ codegen): the dense NN tube
rows couple all stages, so they ride as a rank-N Woodbury correction on
the banded factorization. Two refresh policies (ALConfig.nn_basis_refresh):

- "inner" (exact): per inner iteration, the MLP Jacobian (analytic matmul
  chain, MLP.value_and_jacobian), one (1+N)-multi-RHS banded scan for
  ``[grad, U]`` (factor shared), and a blocked (N, N) capacitance
  Cholesky.
- "outer": the basis (U, Hb^{-1}U, chol C) is refreshed once per OUTER
  iteration — multipliers and rho only change at outer boundaries — and
  inner steps solve just the fresh gradient column, correcting through
  the frozen basis (inexact Newton, guarded by the line search); the
  per-inner gradient stays exact via one VJP (MLP.value_and_vjp).

Verified against the generic dense solver and the array-form staged path
in tests/test_fast_tube.py; outer-vs-inner parity in
tests/test_nn_outer_basis.py.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.blocked_chol import blocked_cho_solve, blocked_cholesky
from .al_solver import ALConfig, ALSolution


# ---------------------------------------------------------------------------
# symbolic-zero helpers
# ---------------------------------------------------------------------------

def _is0(x) -> bool:
    return isinstance(x, (int, float)) and x == 0.0


def _mul(a, b):
    if _is0(a) or _is0(b):
        return 0.0
    return a * b


def _add(a, b):
    if _is0(a):
        return b
    if _is0(b):
        return a
    return a + b


def _sub(a, b):
    if _is0(b):
        return a
    if _is0(a):
        return -b
    return a - b


def _none_to_zero(t):
    return jax.tree.map(lambda x: x, t) if t is not None else 0.0


# ---------------------------------------------------------------------------
# entry-form residual pieces
# ---------------------------------------------------------------------------

def _split_e(u_e, sp):
    n, m = sp.n, sp.m
    z_e = list(u_e[:n])                               # each (..., S)
    w = u_e[n]                                        # (..., S)
    v_e = [u_e[n + 1 + j][..., :-1] for j in range(m)]  # each (..., N)
    return z_e, w, v_e


def _tube_fw_e(sp, z_e, v_e, p):
    if sp.tube_kind == "l1":
        fw = 0.0
        for vj in v_e:
            fw = _add(fw, sp.scaling * jnp.abs(vj))
        return fw
    if sp.tube_kind == "l2":
        fw = 0.0
        for vj in v_e:
            fw = _add(fw, sp.scaling * vj * vj)
        return fw
    # NN one-shot (input layout parity with tube_dynamics.nn_oneshot_tube,
    # ref: trajopt/tube_trajopt.py:543-570): x = [e_hist, z0[2:],
    # column-major vec([v_prev; v])]. Entries may carry extra leading axes
    # (parallel line search) — the MLP applies over the last axis.
    lead = jnp.broadcast_shapes(*[jnp.shape(vj)[:-1] for vj in v_e])
    parts = [jnp.broadcast_to(p.e_hist, lead + p.e_hist.shape)]
    for i in range(2, sp.n):
        parts.append(jnp.broadcast_to(z_e[i][..., 0:1],
                                      lead + (1,)))
    for j in range(sp.m):
        vp = jnp.broadcast_to(p.v_prev[:, j], lead + (p.v_prev.shape[0],))
        vj = jnp.broadcast_to(v_e[j], lead + jnp.shape(v_e[j])[-1:])
        parts.append(jnp.concatenate([vp, vj], axis=-1))
    x = jnp.concatenate(parts, axis=-1)
    return p.tube_params(x)


def _h_entries(sp, z_e, w, v_e, p):
    """(h_dyn list n of (..., N), h_ic list 2 of (...,), h_tube (..., N))."""
    zk = [z[..., :-1] for z in z_e]
    f_e = p.rom.f_entries(zk, v_e)
    h_dyn = [f_e[i] - z_e[i][..., 1:] for i in range(sp.n)]
    h_ic = [z_e[0][..., 0] - p.z0[0], z_e[1][..., 0] - p.z0[1]]
    h_tube = _tube_fw_e(sp, z_e, v_e, p) - w[..., 1:]
    return h_dyn, h_ic, h_tube


def _g_entries(z_e, w, p, K):
    gs = []
    for k in range(K):
        d0 = z_e[0] - p.obs_c[k, 0]
        d1 = z_e[1] - p.obs_c[k, 1]
        rw = p.obs_r[k] + w
        gs.append(d0 * d0 + d1 * d1 - rw * rw)        # (..., S)
    return gs


def _objective_r2(sp, z_e, w, v_e, p):
    """sum(r^2); supports extra leading axes on the entries."""
    n, m = sp.n, sp.m
    if sp.track_ref:
        zg = [p.z_ref[:, i] for i in range(n)]
        vg = [p.v_ref[:, j] for j in range(m)]
    else:
        zg = [p.zf[i] for i in range(n)]
        vg = [0.0 for _ in range(m)]
    dz = [z_e[i] - zg[i] for i in range(n)]
    dv = [_sub(v_e[j], vg[j]) for j in range(m)]

    r2 = 0.0
    for i in range(n):
        row = 0.0
        rowf = 0.0
        for j in range(n):
            row = _add(row, _mul(dz[j], p.Lq[j, i]))
            rowf = _add(rowf, _mul(dz[j][..., -1], p.Lqf[j, i]))
        if not _is0(row):
            r2 = _add(r2, jnp.sum(row[..., :-1] ** 2, axis=-1))
        if not _is0(rowf):
            r2 = _add(r2, rowf ** 2)
    for i in range(m):
        row = 0.0
        for j in range(m):
            row = _add(row, _mul(dv[j], p.Lr[j, i]))
        if not _is0(row):
            r2 = _add(r2, jnp.sum(row ** 2, axis=-1))
    r2 = _add(r2, p.sqrt_qw ** 2 * jnp.sum(w * w, axis=-1))
    return r2


def _merit_e(sp, u_e, p, lam, mu, rho):
    """PHR augmented-Lagrangian merit; identical value to fast_tube._merit.
    Entries may carry extra leading axes (parallel line search)."""
    n, N, K = sp.n, sp.N, sp.K
    z_e, w, v_e = _split_e(u_e, sp)
    r2 = _objective_r2(sp, z_e, w, v_e, p)
    h_dyn, h_ic, h_tube = _h_entries(sp, z_e, w, v_e, p)

    lam_dyn = lam[: N * n].reshape(N, n)
    lam_ic = lam[N * n: N * n + 2]
    lam_tube = lam[N * n + 2:]

    lin = 0.0
    quad = 0.0
    for i in range(n):
        lin = _add(lin, jnp.sum(lam_dyn[:, i] * h_dyn[i], axis=-1))
        quad = _add(quad, jnp.sum(h_dyn[i] ** 2, axis=-1))
    for i in range(2):
        lin = _add(lin, lam_ic[i] * h_ic[i])
        quad = _add(quad, h_ic[i] ** 2)
    lin = _add(lin, jnp.sum(lam_tube * h_tube, axis=-1))
    quad = _add(quad, jnp.sum(h_tube ** 2, axis=-1))

    g_list = _g_entries(z_e, w, p, K)
    mu_sk = mu.reshape(sp.N + 1, K)
    ineq = 0.0
    for k in range(K):
        mu_k = mu_sk[:, k]
        act = jnp.maximum(0.0, mu_k - rho * g_list[k])
        ineq = _add(ineq, jnp.sum(act * act - mu_k * mu_k, axis=-1))

    return 0.5 * r2 + lin + 0.5 * rho * quad + (0.5 / rho) * ineq


# ---------------------------------------------------------------------------
# entry-form GN assembly
# ---------------------------------------------------------------------------

def _assemble_e(sp, u_e, p, lam, mu, rho, grad_rho=None, nn_need_U=True):
    """Entry-form twin of fast_tube._assemble (all tube kinds).

    Returns:
      grad_e: list b of (S,),
      D_e:    b x b nested list, lower triangle populated ((S,) or 0.0),
      L_e:    b x b nested list of ((S-1,) or 0.0), rows = stage k+1 vars,
      U_e:    None (l1/l2) or list b of ((S, N) or 0.0) — the sqrt(rho)-
              scaled dense tube-row Jacobian for the Woodbury correction
              (rows of Jt live entirely in U; D/L carry no tube terms).

    ``nn_need_U=False`` (NN tube only) skips the full tube-net Jacobian and
    computes the exact gradient through one VJP instead — used by the
    per-outer Woodbury-basis mode where U is refreshed outside the inner
    loop (ALConfig.nn_basis_refresh='outer').
    """
    if grad_rho is None:
        grad_rho = rho
    n, m, N, K = sp.n, sp.m, sp.N, sp.K
    b = n + 1 + m
    S = N + 1
    iw = n

    z_e, w, v_e = _split_e(u_e, sp)
    zk = [z[..., :-1] for z in z_e]
    h_dyn, h_ic, h_tube = _h_entries(sp, z_e, w, v_e, p)
    g_list = _g_entries(z_e, w, p, K)

    lam_dyn = lam[: N * n].reshape(N, n)
    lam_ic = lam[N * n: N * n + 2]
    lam_tube = lam[N * n + 2:]

    if sp.track_ref:
        zg = [p.z_ref[:, i] for i in range(n)]
        vg = [p.v_ref[:, j] for j in range(m)]
    else:
        zg = [p.zf[i] for i in range(n)]
        vg = [0.0 for _ in range(m)]

    zeros_S = jnp.zeros((S,))
    one_head = jnp.concatenate([jnp.ones((N,)), jnp.zeros((1,))])
    one_tail = jnp.concatenate([jnp.zeros((N,)), jnp.ones((1,))])
    one_s1 = jnp.concatenate([jnp.zeros((1,)), jnp.ones((N,))])
    e0 = zeros_S.at[0].set(1.0)

    def pad_head(x):
        """(N,)-or-scalar stage-k<N term -> (S,) with 0 at stage N."""
        if _is0(x):
            return 0.0
        x = jnp.asarray(x, jnp.float32)
        if x.ndim == 0:
            return x * one_head
        return jnp.concatenate([x, jnp.zeros((1,))])

    def shift1(x):
        """(N,)-or-scalar stage-(k+1) term -> (S,) with 0 at stage 0."""
        if _is0(x):
            return 0.0
        x = jnp.asarray(x, jnp.float32)
        if x.ndim == 0:
            return x * one_s1
        return jnp.concatenate([jnp.zeros((1,)), x])

    grad = [0.0] * b
    D = [[0.0] * b for _ in range(b)]      # lower triangle (i >= j)
    L = [[0.0] * b for _ in range(b)]

    # ---- objective --------------------------------------------------------
    Qz = p.Lq @ p.Lq.T
    Qzf = p.Lqf @ p.Lqf.T
    Rv = p.Lr @ p.Lr.T
    dz = [z_e[i] - zg[i] for i in range(n)]
    dv = [_sub(v_e[j], vg[j]) for j in range(m)]
    for i in range(n):
        for j in range(i + 1):
            D[i][j] = _add(D[i][j], Qz[i, j] * one_head + Qzf[i, j] * one_tail)
        gz = 0.0
        for j in range(n):
            gz = _add(gz, dz[j] * Qz[j, i])
        gzf = 0.0
        for j in range(n):
            gzf = _add(gzf, dz[j][..., -1] * Qzf[j, i])
        grad[i] = _add(grad[i], _add(gz * one_head, gzf * one_tail))
    for i in range(m):
        for j in range(i + 1):
            D[n + 1 + i][n + 1 + j] = _add(
                D[n + 1 + i][n + 1 + j], Rv[i, j] * one_head)
        gv = 0.0
        for j in range(m):
            gv = _add(gv, _mul(dv[j], Rv[j, i]))
        grad[n + 1 + i] = _add(grad[n + 1 + i], pad_head(gv))
    D[iw][iw] = _add(D[iw][iw], p.sqrt_qw ** 2 * jnp.ones((S,)))
    grad[iw] = _add(grad[iw], p.sqrt_qw ** 2 * w)

    # ---- dynamics ---------------------------------------------------------
    A, Bj = p.rom.f_jac_entries(zk, v_e)
    lh = [lam_dyn[:, i] + grad_rho * h_dyn[i] for i in range(n)]
    for i in range(n):
        for j in range(i + 1):
            acc = 0.0
            for l in range(n):
                acc = _add(acc, _mul(A[l][i], A[l][j]))
            D[i][j] = _add(D[i][j], rho * pad_head(acc))
        # identity on next-stage z_i
        D[i][i] = _add(D[i][i], rho * one_s1)
    for i in range(m):
        for j in range(i + 1):
            acc = 0.0
            for l in range(n):
                acc = _add(acc, _mul(Bj[l][i], Bj[l][j]))
            D[n + 1 + i][n + 1 + j] = _add(
                D[n + 1 + i][n + 1 + j], rho * pad_head(acc))
    for i in range(m):          # cross (v_i, z_j): row v (later), col z
        for j in range(n):
            acc = 0.0
            for l in range(n):
                acc = _add(acc, _mul(A[l][j], Bj[l][i]))
            D[n + 1 + i][j] = _add(D[n + 1 + i][j], rho * pad_head(acc))
    for i in range(n):
        for j in range(n):
            L[i][j] = _sub(L[i][j], _mul(rho, _bcast_N(A[i][j], N)))
        for j in range(m):
            L[i][n + 1 + j] = _sub(
                L[i][n + 1 + j], _mul(rho, _bcast_N(Bj[i][j], N)))
    for j in range(n):
        acc = 0.0
        for i in range(n):
            acc = _add(acc, _mul(A[i][j], lh[i]))
        grad[j] = _add(grad[j], pad_head(acc))
        grad[j] = _add(grad[j], shift1(-lh[j]))
    for j in range(m):
        acc = 0.0
        for i in range(n):
            acc = _add(acc, _mul(Bj[i][j], lh[i]))
        grad[n + 1 + j] = _add(grad[n + 1 + j], pad_head(acc))

    # ---- initial condition ------------------------------------------------
    for i in range(2):
        D[i][i] = _add(D[i][i], rho * e0)
        lh_ic = lam_ic[i] + grad_rho * h_ic[i]
        grad[i] = _add(grad[i], lh_ic * e0)

    # ---- obstacles ---------------------------------------------------------
    mu_sk = mu.reshape(S, K)
    for k in range(K):
        g_k = g_list[k]
        act = jnp.maximum(0.0, mu_sk[:, k] - rho * g_k)
        act_grad = jnp.maximum(0.0, mu_sk[:, k] - grad_rho * g_k)
        arow = (act > 0.0).astype(jnp.float32)
        dzc = [2.0 * (z_e[0] - p.obs_c[k, 0]), 2.0 * (z_e[1] - p.obs_c[k, 1])]
        dwc = -2.0 * (p.obs_r[k] + w)
        for a in range(2):
            for c in range(a + 1):
                D[a][c] = _add(D[a][c], rho * arow * dzc[a] * dzc[c])
            D[iw][a] = _add(D[iw][a], rho * arow * dzc[a] * dwc)
            grad[a] = _sub(grad[a], dzc[a] * act_grad)
        D[iw][iw] = _add(D[iw][iw], rho * arow * dwc * dwc)
        grad[iw] = _sub(grad[iw], dwc * act_grad)

    # ---- tube dynamics ------------------------------------------------------
    lh_t = lam_tube + grad_rho * h_tube
    U_e = None
    if sp.tube_kind in ("l1", "l2"):
        t_e = []
        for j in range(m):
            if sp.tube_kind == "l1":
                t_e.append(sp.scaling * jnp.sign(v_e[j]))
            else:
                t_e.append(2.0 * sp.scaling * v_e[j])
        for i in range(m):
            for j in range(i + 1):
                D[n + 1 + i][n + 1 + j] = _add(
                    D[n + 1 + i][n + 1 + j], rho * pad_head(t_e[i] * t_e[j]))
        D[iw][iw] = _add(D[iw][iw], rho * one_s1)
        for j in range(m):
            L[iw][n + 1 + j] = _sub(L[iw][n + 1 + j], rho * t_e[j])
            grad[n + 1 + j] = _add(grad[n + 1 + j], pad_head(t_e[j] * lh_t))
        grad[iw] = _add(grad[iw], shift1(-lh_t))
    else:
        # NN one-shot: the tube rows Jt = [dfw/d(z0_rest, v), -I on w[1:]]
        # are dense across stages. GN keeps the banded D/L tube-free and
        # carries rho * Jt^T Jt as the Woodbury factor U = sqrt(rho) Jt^T.
        # The tube-net Jacobian is computed ANALYTICALLY once per inner
        # iteration (MLP.value_and_jacobian — an explicit matmul chain,
        # ~10x cheaper on TPU than jacfwd's n_in tangent passes); generic
        # callables fall back to jacfwd.
        H_rev = p.e_hist.shape[0]
        if not nn_need_U:
            # Gradient-only NN contribution: one VJP (J^T lh_t) — the
            # Woodbury basis U is managed by the caller per outer.
            if hasattr(p.tube_params, "value_and_vjp"):
                parts = [p.e_hist]
                for i in range(2, n):
                    parts.append(z_e[i][..., 0:1])
                for j in range(m):
                    parts.append(jnp.concatenate([p.v_prev[:, j], v_e[j]],
                                                 axis=-1))
                x_in = jnp.concatenate(parts, axis=-1)
                _, gvec = p.tube_params.value_and_vjp(x_in, lh_t)
            else:
                def fw_of_full(zv):
                    z0r = zv[: n - 2]
                    vs = [zv[n - 2 + j * N: n - 2 + (j + 1) * N]
                          for j in range(m)]
                    z_mod = list(z_e)
                    for i in range(2, n):
                        z_mod[i] = z_e[i].at[0].set(z0r[i - 2])
                    return _tube_fw_e(sp, z_mod, vs, p)

                z0r0 = [z_e[i][0] for i in range(2, n)]
                zv0 = jnp.concatenate(
                    ([jnp.stack(z0r0)] if n > 2 else [jnp.zeros((0,))])
                    + [v_e[j] for j in range(m)])
                _, pullback = jax.vjp(fw_of_full, zv0)
                gsm = pullback(lh_t)[0]
                # Re-layout to the value_and_vjp input convention.
                gvec = jnp.concatenate(
                    [jnp.zeros((H_rev,)), gsm[: n - 2]]
                    + [jnp.concatenate([jnp.zeros((H_rev,)),
                                        gsm[n - 2 + j * N:
                                            n - 2 + (j + 1) * N]])
                       for j in range(m)])
            off = H_rev
            for i in range(2, n):
                grad[i] = _add(grad[i], gvec[off + i - 2] * e0)
            off += n - 2
            for j in range(m):
                gv_j = gvec[off + H_rev: off + H_rev + N]
                grad[n + 1 + j] = _add(grad[n + 1 + j], pad_head(gv_j))
                off += H_rev + N
            grad[iw] = _add(grad[iw], shift1(-lh_t))
            grad = [g if not _is0(g) else zeros_S for g in grad]
            return grad, D, L, None
        if hasattr(p.tube_params, "value_and_jacobian"):
            parts = [p.e_hist]
            for i in range(2, n):
                parts.append(z_e[i][..., 0:1])
            for j in range(m):
                parts.append(jnp.concatenate([p.v_prev[:, j], v_e[j]],
                                             axis=-1))
            x_in = jnp.concatenate(parts, axis=-1)
            _, J_full = p.tube_params.value_and_jacobian(x_in)
            off = H_rev
            Jz = J_full[:, off: off + (n - 2)]
            off += n - 2
            Jv_list = []
            for j in range(m):
                Jv_list.append(J_full[:, off + H_rev: off + H_rev + N])
                off += H_rev + N
        else:
            def fw_of(zv):
                z0r = zv[: n - 2]
                vs = [zv[n - 2 + j * N: n - 2 + (j + 1) * N]
                      for j in range(m)]
                z_mod = list(z_e)
                for i in range(2, n):
                    z_mod[i] = z_e[i].at[0].set(z0r[i - 2])
                return _tube_fw_e(sp, z_mod, vs, p)

            z0r0 = ([z_e[i][0] for i in range(2, n)])
            zv0 = jnp.concatenate(
                ([jnp.stack(z0r0)] if n > 2 else [jnp.zeros((0,))])
                + [v_e[j] for j in range(m)])
            J = jax.jacfwd(fw_of)(zv0)                 # (N, (n-2) + N*m)
            Jz = J[:, : n - 2]
            Jv_list = [J[:, n - 2 + j * N: n - 2 + (j + 1) * N]
                       for j in range(m)]
        sq = jnp.sqrt(rho)
        U_e = [0.0] * b
        for i in range(2, n):
            U_e[i] = sq * jnp.zeros((S, N)).at[0].set(Jz[:, i - 2])
            grad[i] = _add(grad[i], (Jz[:, i - 2] @ lh_t) * e0)
        for j in range(m):
            Jv = Jv_list[j]                            # (rows N, stages N)
            U_e[n + 1 + j] = sq * jnp.pad(Jv.T, ((0, 1), (0, 0)))
            grad[n + 1 + j] = _add(grad[n + 1 + j], pad_head(Jv.T @ lh_t))
        U_e[iw] = -sq * jnp.eye(S, N, k=-1)
        grad[iw] = _add(grad[iw], shift1(-lh_t))

    grad = [g if not _is0(g) else zeros_S for g in grad]
    return grad, D, L, U_e


def _cap_psize(N):
    """Panel size for the blocked capacitance Cholesky (None -> XLA)."""
    return next((c for c in (10, 8, 6, 5, 4) if N % c == 0), None)


def _bcast_N(x, N):
    if _is0(x):
        return 0.0
    x = jnp.asarray(x, jnp.float32)
    return jnp.broadcast_to(x, (N,) + x.shape[1:]) if x.ndim <= 1 else x


# ---------------------------------------------------------------------------
# entry-form block-Thomas factor + solve
# ---------------------------------------------------------------------------

def _chol_e(Sij, b):
    """Scalar Cholesky of a symmetric block given as lower-entry lists."""
    c = [[None] * b for _ in range(b)]
    for j in range(b):
        acc = Sij[j][j]
        for k in range(j):
            acc = _sub(acc, _mul(c[j][k], c[j][k]))
        d = jnp.sqrt(jnp.maximum(acc, 1e-12))
        c[j][j] = d
        inv = 1.0 / d
        for i in range(j + 1, b):
            acc2 = Sij[i][j] if i >= j else Sij[j][i]
            for k in range(j):
                acc2 = _sub(acc2, _mul(c[i][k], c[j][k]))
            c[i][j] = _mul(acc2, inv)
    return c


def _chol_solve_e(c, r, b):
    """Solve (L L^T) x = r with scalar entries; r entries may be 0.0."""
    y = [None] * b
    for i in range(b):
        acc = r[i]
        for k in range(i):
            acc = _sub(acc, _mul(c[i][k], y[k]))
        y[i] = 0.0 if _is0(acc) else acc / c[i][i]
    x = [None] * b
    for i in reversed(range(b)):
        acc = y[i]
        for k in range(i + 1, b):
            acc = _sub(acc, _mul(c[k][i], x[k]))
        x[i] = 0.0 if _is0(acc) else acc / c[i][i]
    return x


def _pack_lower(c, b):
    """Lower-entry nested list -> flat tuple (for scan carries/outputs)."""
    return tuple(c[i][j] for i in range(b) for j in range(i + 1))


def _unpack_lower(flat, b):
    c = [[None] * b for _ in range(b)]
    it = iter(flat)
    for i in range(b):
        for j in range(i + 1):
            c[i][j] = next(it)
    return c


def _materialize(t, like):
    """None/0.0 pytree leaves -> concrete zeros matching `like` shape."""
    return jnp.zeros_like(like) if t is None or _is0(t) else t


def factor_solve_entries(D_e, L_e, rhs_e, b, unroll=2):
    """Block-Thomas factor + forward/backward substitution, scalar entries.

    D_e: b x b lower lists of (S,); L_e: b x b lists of ((S-1,) or 0.0);
    rhs_e: list b of (S,) — or (S, R) for R simultaneous right-hand sides
    (stage axis LEADING; the factor is shared, the substitution broadcasts
    over the trailing RHS axis — used by the NN-tube Woodbury correction).
    Returns list b of solutions matching the rhs shape.
    """
    S = rhs_e[0].shape[0]
    Lmask = [[not _is0(L_e[i][j]) for j in range(b)] for i in range(b)]

    # stage-0 factor + forward value
    D0 = [[D_e[i][j][0] for j in range(i + 1)] for i in range(b)]
    c0 = _chol_e(D0, b)
    y0 = _chol_solve_e(c0, [r[0] for r in rhs_e], b)
    y0 = [jnp.asarray(v, jnp.float32) + 0.0 * rhs_e[0][0] if _is0(v) else v
          for v in y0]

    # scan inputs: per-stage D (stages 1:), L (stages 0..S-2), rhs (1:)
    xs = (
        tuple(tuple(D_e[i][j][1:] for j in range(i + 1)) for i in range(b)),
        tuple(tuple(L_e[i][j] if Lmask[i][j] else None for j in range(b))
              for i in range(b)),
        tuple(r[1:] for r in rhs_e),
    )

    def fwd_body(carry, inp):
        c_prev_flat, y_prev = carry
        Dk, Lk, rk = inp
        c_prev = _unpack_lower(c_prev_flat, b)
        Lm = [[Lk[i][j] if Lmask[i][j] else 0.0 for j in range(b)]
              for i in range(b)]
        # W = S_prev^{-1} L^T, column j solves rhs[l] = L[j][l]
        W = [[None] * b for _ in range(b)]
        for j in range(b):
            if not any(Lmask[j][l] for l in range(b)):
                for l in range(b):
                    W[l][j] = 0.0
                continue
            col = _chol_solve_e(c_prev, [Lm[j][l] for l in range(b)], b)
            for l in range(b):
                W[l][j] = col[l]
        Sk = [[None] * (i + 1) for i in range(b)]
        for i in range(b):
            for j in range(i + 1):
                acc = Dk[i][j]
                for l in range(b):
                    acc = _sub(acc, _mul(Lm[i][l], W[l][j]))
                Sk[i][j] = acc
        ck = _chol_e(Sk, b)
        # y = chol_solve(ck, r - L y_prev)
        ry = []
        for i in range(b):
            acc = rk[i]
            for l in range(b):
                acc = _sub(acc, _mul(Lm[i][l], y_prev[l]))
            ry.append(acc)
        y = _chol_solve_e(ck, ry, b)
        y = [jnp.zeros_like(rk[0]) if _is0(v) else v for v in y]
        ck_flat = _pack_lower(ck, b)
        return (ck_flat, tuple(y)), (ck_flat, tuple(y))

    c0_flat = _pack_lower(c0, b)
    (_, _), (chol_rest, y_rest) = jax.lax.scan(
        fwd_body, (c0_flat, tuple(y0)), xs, unroll=unroll)

    # stack stage-0 values onto the scan outputs
    chol_all = tuple(
        jnp.concatenate([jnp.broadcast_to(c0_flat[e], (1,)), chol_rest[e]])
        for e in range(len(c0_flat)))
    y_all = tuple(
        jnp.concatenate([jnp.asarray(y0[i])[None], y_rest[i]])
        for i in range(b))

    # backward: x_k = y_k - chol_solve(ck, L_k^T x_{k+1})
    xs_b = (
        tuple(e[:-1] for e in chol_all),
        tuple(tuple(L_e[i][j] if Lmask[i][j] else None for j in range(b))
              for i in range(b)),
        tuple(y[:-1] for y in y_all),
    )

    def bwd_body(carry, inp):
        x_next = carry
        ck_flat, Lk, yk = inp
        ck = _unpack_lower(ck_flat, b)
        Lm = [[Lk[i][j] if Lmask[i][j] else 0.0 for j in range(b)]
              for i in range(b)]
        # rhs_i = (L^T x_next)_i = sum_l L[l][i] * x_next[l]
        rhs = []
        for i in range(b):
            acc = 0.0
            for l in range(b):
                acc = _add(acc, _mul(Lm[l][i], x_next[l]))
            rhs.append(acc)
        corr = _chol_solve_e(ck, rhs, b)
        x = tuple(yk[i] - corr[i] if not _is0(corr[i]) else yk[i]
                  for i in range(b))
        return x, x

    xN = tuple(y[-1] for y in y_all)
    _, x_rest = jax.lax.scan(bwd_body, xN, xs_b, reverse=True, unroll=unroll)
    return [jnp.concatenate([x_rest[i], xN[i][None]]) for i in range(b)]


# ---------------------------------------------------------------------------
# Pallas-kernel dispatch (batch-major routing via custom_vmap)
# ---------------------------------------------------------------------------
#
# The staged solver is written per-scenario and vmapped over the batch; the
# Pallas block-tridiagonal kernel (ops/pallas_block_tridiag.py) wants the
# WHOLE batch in its lane dimension — measured 4.7x (B=1024) / 2.5x
# (B=4096) faster than the XLA entry-scan at the bench shapes
# (docs/PERF.md). ``custom_vmap`` bridges the two: the unbatched base falls
# back to the entry-scan (single solves, nested transforms), and the vmap
# rule receives the batched (B, S) entries and hands them to the kernel in
# lane-major layout with no (B, S, b, b) intermediate. Replaces IPOPT+
# MUMPS' sparse factorization (ref: trajopt/tube_trajopt.py:256-277) as
# the production factor when ALConfig.linsolve="pallas".
#
# NOTE: the kernel path is per-chip — under a sharded jit (multi-chip dp
# mesh) keep linsolve="thomas"/"cr"/"auto", or wrap the solve in shard_map
# so each device runs its own kernel instance on its local shard.

from jax.custom_batching import custom_vmap

# Escape hatch for same-session A/B of the round-4 multi-RHS kernel path
# (scripts/bench_nn_tube.py): LGDT_PALLAS_MULTIRHS=0 keeps linsolve="pallas"
# for the single-RHS factor but routes the Woodbury multi-RHS solves
# through the XLA entry-scan (the round-3 behavior).
import os as _os

_PALLAS_MULTIRHS = _os.environ.get("LGDT_PALLAS_MULTIRHS", "1") == "1"



def _unflatten_lower_full(flat, b):
    """b*(b+1)/2 lower entries -> (lower-list, full-symmetric-list)."""
    lower = _unpack_lower(flat, b)
    full = [[lower[i][j] if i >= j else lower[j][i] for j in range(b)]
            for i in range(b)]
    return lower, full


@custom_vmap
def _bt_solve_dispatch(D_lo, L_flat, rhs):
    """Unbatched base: entry-scan block-Thomas (same as factor_solve_entries).

    D_lo: tuple of b*(b+1)/2 lower D entries, each (S,);
    L_flat: tuple of b*b subdiagonal entries, each (S-1,);
    rhs: tuple of b entries, each (S,). Returns tuple b of (S,).
    """
    b = len(rhs)
    D_e, _ = _unflatten_lower_full(D_lo, b)
    L_e = [list(L_flat[i * b:(i + 1) * b]) for i in range(b)]
    return tuple(factor_solve_entries(D_e, L_e, list(rhs), b))


@_bt_solve_dispatch.def_vmap
def _bt_solve_dispatch_vmap(axis_size, in_batched, D_lo, L_flat, rhs):
    from ..ops.pallas_block_tridiag import block_tridiag_solve_pallas_entries

    b = len(rhs)
    B = axis_size

    def bc(x, batched):
        return x if batched else jnp.broadcast_to(x, (B,) + x.shape)

    D_lo = tuple(bc(x, f) for x, f in zip(D_lo, in_batched[0]))
    L_flat = tuple(bc(x, f) for x, f in zip(L_flat, in_batched[1]))
    rhs = tuple(bc(x, f) for x, f in zip(rhs, in_batched[2]))

    _, D_full = _unflatten_lower_full(D_lo, b)
    L_full = [list(L_flat[i * b:(i + 1) * b]) for i in range(b)]
    interpret = jax.default_backend() == "cpu"
    x = block_tridiag_solve_pallas_entries(D_full, L_full, list(rhs), b,
                                           tile_b=1024, interpret=interpret)
    return tuple(x), tuple(True for _ in range(b))


def _pallas_bt_solve(Dm, Lm, rhs, b, S):
    """Route one banded solve through the kernel dispatch (materializing
    the masked system's symbolic zeros — the kernel wants dense blocks)."""
    D_lo = tuple(
        jnp.broadcast_to(jnp.asarray(Dm[i][j], jnp.float32), (S,))
        if not _is0(Dm[i][j]) else jnp.zeros((S,))
        for i in range(b) for j in range(i + 1))
    L_flat = tuple(
        jnp.broadcast_to(jnp.asarray(Lm[i][j], jnp.float32), (S - 1,))
        if not _is0(Lm[i][j]) else jnp.zeros((S - 1,))
        for i in range(b) for j in range(b))
    rhs_t = tuple(
        jnp.broadcast_to(jnp.asarray(r, jnp.float32), (S,))
        if not _is0(r) else jnp.zeros((S,)) for r in rhs)
    return list(_bt_solve_dispatch(D_lo, L_flat, rhs_t))


@custom_vmap
def _bt_msolve_dispatch(D_lo, L_flat, rhs):
    """Multi-RHS variant of ``_bt_solve_dispatch``: rhs entries are (S, R)
    column blocks (the NN-tube Woodbury basis / exact-path solves).
    Unbatched base: the entry-scan handles trailing-RHS broadcasting."""
    b = len(rhs)
    D_e, _ = _unflatten_lower_full(D_lo, b)
    L_e = [list(L_flat[i * b:(i + 1) * b]) for i in range(b)]
    return tuple(factor_solve_entries(D_e, L_e, list(rhs), b))


@_bt_msolve_dispatch.def_vmap
def _bt_msolve_dispatch_vmap(axis_size, in_batched, D_lo, L_flat, rhs):
    from ..ops.pallas_block_tridiag import (
        block_tridiag_multirhs_pallas_entries,
    )

    b = len(rhs)
    B = axis_size

    def bc(x, batched):
        return x if batched else jnp.broadcast_to(x, (B,) + x.shape)

    D_lo = tuple(bc(x, f) for x, f in zip(D_lo, in_batched[0]))
    L_flat = tuple(bc(x, f) for x, f in zip(L_flat, in_batched[1]))
    rhs = tuple(bc(x, f) for x, f in zip(rhs, in_batched[2]))

    _, D_full = _unflatten_lower_full(D_lo, b)
    L_full = [list(L_flat[i * b:(i + 1) * b]) for i in range(b)]
    interpret = jax.default_backend() == "cpu"
    x = block_tridiag_multirhs_pallas_entries(
        D_full, L_full, list(rhs), b, rhs_chunk=4, tile_b=1024,
        interpret=interpret)
    return tuple(x), tuple(True for _ in range(b))


def _pallas_bt_msolve(Dm, Lm, rhs_cols, b, S, R):
    """Multi-RHS banded solve through the kernel dispatch; ``rhs_cols``
    entries are (S, R) or symbolic zero."""
    D_lo = tuple(
        jnp.broadcast_to(jnp.asarray(Dm[i][j], jnp.float32), (S,))
        if not _is0(Dm[i][j]) else jnp.zeros((S,))
        for i in range(b) for j in range(i + 1))
    L_flat = tuple(
        jnp.broadcast_to(jnp.asarray(Lm[i][j], jnp.float32), (S - 1,))
        if not _is0(Lm[i][j]) else jnp.zeros((S - 1,))
        for i in range(b) for j in range(b))
    rhs_t = tuple(
        jnp.broadcast_to(jnp.asarray(r, jnp.float32), (S, R))
        if not _is0(r) else jnp.zeros((S, R)) for r in rhs_cols)
    return list(_bt_msolve_dispatch(D_lo, L_flat, rhs_t))


# ---------------------------------------------------------------------------
# entry-form block cyclic reduction (scan-free factor+solve)
# ---------------------------------------------------------------------------
#
# Block-Thomas above runs 2(S-1) sequential lax.scan steps per solve; at
# B=4096 each fused step is tiny, so the factor is dominated by per-step
# sequencing overhead (~150 ms of a 520 ms solve, docs/PERF.md). Cyclic
# reduction eliminates the odd-indexed stages level by level —
# ceil(log2(S)) fully-parallel levels, each a few elementwise ops over a
# halved stage axis — so the whole factor+solve is ONE fused graph with no
# scan at all, at ~2-3x the FLOPs (a good trade: the op was
# sequencing-bound, not FLOP-bound). Stable for the SPD systems the
# freeze-masked GN assemble produces. Replaces IPOPT+MUMPS' sparse
# factorization (ref: trajopt/tube_trajopt.py:256-277) together with the
# Thomas path; parity asserted in tests/test_fast_tube.py.


# "auto" linsolve switches to cyclic reduction at this stage count.
# Measured crossover (docs/PERF.md): thomas wins at N<=100 small-batch,
# parity ~N=100 at B=4096, cr wins 1.09x at N=150 and 1.35x at N=200.
_CR_AUTO_MIN_S = 128


def _slc(x, sl):
    return 0.0 if _is0(x) else x[..., sl]


def _pad_last(x, front, back):
    if _is0(x) or (front == 0 and back == 0):
        return x
    return jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(front, back)])


def _solve_cols_e(c, M, b):
    """B^{-1} M for full entry matrix M (columns solved independently)."""
    R = [[None] * b for _ in range(b)]
    for j in range(b):
        col = _chol_solve_e(c, [M[l][j] for l in range(b)], b)
        for l in range(b):
            R[l][j] = col[l]
    return R


def _matmul_e(A, B, b):
    C = [[0.0] * b for _ in range(b)]
    for i in range(b):
        for j in range(b):
            acc = 0.0
            for l in range(b):
                acc = _add(acc, _mul(A[i][l], B[l][j]))
            C[i][j] = acc
    return C


def _matvec_e(A, x, b):
    out = []
    for i in range(b):
        acc = 0.0
        for l in range(b):
            acc = _add(acc, _mul(A[i][l], x[l]))
        out.append(acc)
    return out


def _transpose_e(A, b):
    return [[A[j][i] for j in range(b)] for i in range(b)]


def _lower_of(M, b):
    return [[M[i][j] for j in range(i + 1)] for i in range(b)]


def _full_of_lower(Ml, b):
    return [[Ml[i][j] if i >= j else Ml[j][i] for j in range(b)]
            for i in range(b)]


def cr_solve_entries(D_e, L_e, rhs_e, b):
    """Solve the symmetric block-tridiagonal system by cyclic reduction.

    Same interface/semantics as ``factor_solve_entries``: ``D_e`` is the
    b x b lower-entry lists of (..., S) diagonal blocks, ``L_e[i][j]`` entry
    (i, j) of the subdiagonal block A_{k+1} coupling stage k+1 to stage k
    ((..., S-1) or symbolic 0.0), ``rhs_e`` list b of (..., S). Returns the
    solution as a list b of (..., S).
    """
    S = rhs_e[0].shape[-1]
    if S == 1:
        c = _chol_e([[D_e[i][j] for j in range(i + 1)] for i in range(b)], b)
        x = _chol_solve_e(c, list(rhs_e), b)
        return [jnp.zeros_like(rhs_e[0]) if _is0(v) else v for v in x]

    S_o, S_e = S // 2, (S + 1) // 2     # odd-stage / even-stage counts
    n_lo = (S - 1) // 2                 # number of L_odd blocks

    B_ol = [[_slc(D_e[i][j], slice(1, None, 2)) for j in range(i + 1)]
            for i in range(b)]
    B_el = [[_slc(D_e[i][j], slice(0, None, 2)) for j in range(i + 1)]
            for i in range(b)]
    # A_{2j+1} (odd row 2j+1 <- even col 2j) and A_{2j+2} (even <- odd)
    A_ev = [[_slc(L_e[i][j], slice(0, None, 2)) for j in range(b)]
            for i in range(b)]
    A_od = [[_slc(L_e[i][j], slice(1, None, 2)) for j in range(b)]
            for i in range(b)]
    r_o = [_slc(r, slice(1, None, 2)) for r in rhs_e]
    r_ev = [_slc(r, slice(0, None, 2)) for r in rhs_e]

    c_o = _chol_e(B_ol, b)
    V = _solve_cols_e(c_o, A_ev, b)                 # B_o^{-1} A_{2j+1}
    y = _chol_solve_e(c_o, r_o, b)                  # B_o^{-1} r_odd
    y = [jnp.zeros_like(r_o[0]) if _is0(v) else v for v in y]

    c_ot = [[_slc(c_o[i][j], slice(0, n_lo)) for j in range(i + 1)]
            for i in range(b)]
    A_odT = _transpose_e(A_od, b)
    U = _solve_cols_e(c_ot, A_odT, b)               # B_o^{-1} A_{2j+2}^T

    # Schur terms onto the even stages
    T_r = _matmul_e(_transpose_e(A_ev, b), V, b)    # A^T B^{-1} A  at i=j
    A_odt = [[_slc(A_od[i][j], slice(0, n_lo)) for j in range(b)]
             for i in range(b)]
    T_l = _matmul_e(A_odt, U, b)                    # A B^{-1} A^T at i=j+1
    V_t = [[_slc(V[i][j], slice(0, n_lo)) for j in range(b)]
           for i in range(b)]
    A_new = _matmul_e(A_odt, V_t, b)                # couples even i, i-1
    A_new = [[0.0 if _is0(A_new[i][j]) else -A_new[i][j] for j in range(b)]
             for i in range(b)]

    D_new = [[None] * (i + 1) for i in range(b)]
    for i in range(b):
        for j in range(i + 1):
            acc = B_el[i][j]
            acc = _sub(acc, _pad_last(T_r[i][j], 0, S_e - S_o))
            acc = _sub(acc, _pad_last(T_l[i][j], 1, S_e - 1 - n_lo))
            D_new[i][j] = (jnp.zeros_like(r_ev[0]) if _is0(acc)
                           else jnp.broadcast_to(acc, r_ev[0].shape))

    t1 = _matvec_e(A_odt, [_slc(v, slice(0, n_lo)) for v in y], b)
    t2 = _matvec_e(_transpose_e(A_ev, b), y, b)
    r_new = []
    for i in range(b):
        acc = r_ev[i]
        acc = _sub(acc, _pad_last(t1[i], 1, S_e - 1 - n_lo))
        acc = _sub(acc, _pad_last(t2[i], 0, S_e - S_o))
        r_new.append(jnp.broadcast_to(acc, r_ev[0].shape))

    x_even = cr_solve_entries(D_new, A_new, r_new, b)

    # back-substitute the odd stages
    xe_a = [x[..., :S_o] for x in x_even]
    xe_b = [_pad_last(x[..., 1:1 + n_lo], 0, S_o - n_lo) for x in x_even]
    corr_a = _matvec_e(V, xe_a, b)
    U_p = [[_pad_last(U[i][j], 0, S_o - n_lo) for j in range(b)]
           for i in range(b)]
    corr_b = _matvec_e(U_p, xe_b, b)
    x_odd = [jnp.broadcast_to(_sub(_sub(y[i], corr_a[i]), corr_b[i]),
                              r_o[0].shape)
             for i in range(b)]

    # interleave even/odd back to stage order
    out = []
    for i in range(b):
        pair = jnp.stack([x_even[i][..., :S_o], x_odd[i]], axis=-1)
        flat = pair.reshape(pair.shape[:-2] + (2 * S_o,))
        if S_e > S_o:
            flat = jnp.concatenate([flat, x_even[i][..., -1:]], axis=-1)
        out.append(flat)
    return out


# ---------------------------------------------------------------------------
# AL loop in entry form
# ---------------------------------------------------------------------------

def solve_staged_scalar(sp, p, u0, lb_u, ub_u, cfg: ALConfig = ALConfig(),
                        lam0=None, mu0=None, rho_init=None) -> ALSolution:
    """Entry-form twin of fast_tube.solve_tube_fast_single (all tube kinds).

    Single scenario; vmap to batch. Matches the array path to solver
    tolerance (asserted in tests/test_fast_tube.py).

    Runs under full-f32 matmul precision: the l1/l2 path is purely
    elementwise, but the NN tube's MLP residuals, Jacobians, and Woodbury
    products are matmuls whose bf16 default would destroy the feasibility
    targets (same policy as al_solver / the array path).
    """
    with jax.default_matmul_precision("highest"):
        return _solve_staged_scalar_impl(sp, p, u0, lb_u, ub_u, cfg,
                                         lam0, mu0, rho_init)


def _solve_staged_scalar_impl(sp, p, u0, lb_u, ub_u, cfg, lam0, mu0,
                              rho_init) -> ALSolution:
    n, m, N, K = sp.n, sp.m, sp.N, sp.K
    b = n + 1 + m
    S = N + 1
    E = N * n + 2 + N
    I = S * K

    u0_e = tuple(u0[:, i] for i in range(b))
    lb_e = tuple(lb_u[:, i] for i in range(b))
    ub_e = tuple(ub_u[:, i] for i in range(b))
    eps_e = tuple(1e-9 + 1e-6 * (ub_e[i] - lb_e[i]) for i in range(b))

    lam = jnp.zeros((E,)) if lam0 is None else lam0
    mu = jnp.zeros((I,)) if mu0 is None else mu0
    rho = jnp.asarray(cfg.rho0 if rho_init is None else rho_init, jnp.float32)

    def residuals_of(u_e):
        z_e, w, v_e = _split_e(u_e, sp)
        h_dyn, h_ic, h_tube = _h_entries(sp, z_e, w, v_e, p)
        g_list = _g_entries(z_e, w, p, K)
        return z_e, w, v_e, h_dyn, h_ic, h_tube, g_list

    def flat_h(h_dyn, h_ic, h_tube):
        return jnp.concatenate([
            jnp.stack(h_dyn, axis=-1).reshape(-1),
            jnp.stack(h_ic, axis=-1),
            h_tube,
        ])

    def flat_g(g_list):
        return jnp.stack(g_list, axis=-1).reshape(-1)

    def pg_norm(u_e, grad_e):
        gn = 0.0
        for i in range(b):
            pg = u_e[i] - jnp.clip(u_e[i] - grad_e[i], lb_e[i], ub_e[i])
            gn = jnp.maximum(gn, jnp.max(jnp.abs(pg)))
        return gn

    nn_refresh = cfg.nn_basis_refresh
    if isinstance(nn_refresh, str):
        if nn_refresh not in ("inner", "outer"):
            raise ValueError(
                "ALConfig.nn_basis_refresh must be 'inner', 'outer', or an "
                f"int >= 1; got {nn_refresh!r}")
    else:
        nn_refresh = int(nn_refresh)
        if nn_refresh < 1:
            # k <= 0 would make the chunked refresh loop below never
            # advance — an infinite Python loop at trace time.
            raise ValueError(
                "ALConfig.nn_basis_refresh int value must be >= 1; got "
                f"{nn_refresh}")
    nn_frozen_basis = sp.tube_kind == "nn" and nn_refresh != "inner"
    # chunk size between basis refreshes: whole inner loop for "outer",
    # else the given k.
    nn_chunk = (cfg.inner_iters if nn_refresh == "outer"
                else nn_refresh if nn_frozen_basis else 0)

    def masked_system(u_e, grad_e, D_e, L_e, rho):
        """Bound-freeze mask + masked GN system (shared by the inner step
        and the per-outer Woodbury basis build)."""
        fm = []
        for i in range(b):
            at_lb = (u_e[i] <= lb_e[i] + eps_e[i]) & (grad_e[i] > 0.0)
            at_ub = (u_e[i] >= ub_e[i] - eps_e[i]) & (grad_e[i] < 0.0)
            fm.append((~(at_lb | at_ub)).astype(jnp.float32))
        reg = cfg.reg + 1e-6 * rho
        Dm = [[0.0] * b for _ in range(b)]
        for i in range(b):
            for j in range(i + 1):
                if _is0(D_e[i][j]) and i != j:
                    Dm[i][j] = jnp.zeros((S,))
                    continue
                v = _mul(D_e[i][j], fm[i] * fm[j])
                if i == j:
                    v = _add(v, (1.0 - fm[i]) + reg)
                Dm[i][j] = v if not _is0(v) else jnp.zeros((S,))
        Lm = [[0.0] * b for _ in range(b)]
        for i in range(b):
            for j in range(b):
                Lm[i][j] = _mul(L_e[i][j], fm[i][1:] * fm[j][:-1])
        gf = [grad_e[i] * fm[i] for i in range(b)]
        return fm, Dm, Lm, gf

    def woodbury_basis(u_e, lam, mu, rho):
        """Per-outer frozen Woodbury basis (Um, Ru = Hb^{-1} U, chol of
        C = I + U^T Hb^{-1} U) for the NN tube rows."""
        grad_e, D_e, L_e, U_e = _assemble_e(sp, u_e, p, lam, mu, rho)
        fm, Dm, Lm, _ = masked_system(u_e, grad_e, D_e, L_e, rho)
        Um = [0.0 if _is0(U_e[i]) else U_e[i] * fm[i][:, None]
              for i in range(b)]
        rhs_m = [jnp.zeros((S, N)) if _is0(Um[i]) else Um[i]
                 for i in range(b)]
        if cfg.linsolve == "pallas" and _PALLAS_MULTIRHS:
            # Factor-once + VMEM-chunked column substitution (round 4):
            # the XLA multi-RHS entry-scan was ~47% of the chunk3 NN solve
            # together with the capacitance products (docs/PERF.md
            # attribution); the kernel keeps each column chunk's whole
            # recursion VMEM-resident.
            Ru = _pallas_bt_msolve(Dm, Lm, rhs_m, b, S, N)
        else:
            Ru = factor_solve_entries(Dm, Lm, rhs_m, b)
        C = jnp.eye(N)
        for i in range(b):
            if _is0(Um[i]):
                continue
            C = C + Um[i].T @ Ru[i]
        psize = _cap_psize(N)
        if psize is not None:
            cholC = blocked_cholesky(C, p=psize)
        else:
            cholC = jnp.linalg.cholesky(C)
        return Um, Ru, cholC

    def inner_step(u_e, merit, lam, mu, rho, wb=None):
        # `merit` is carried through the inner scan: it equals
        # _merit_e(u_e) exactly (the selected line-search candidate's value,
        # or unchanged on a failed search), saving one standalone merit
        # evaluation per inner iteration.
        # ``wb``: frozen per-outer Woodbury basis (Um, Ru, cholC) — see
        # outer_body; when given, the assemble skips the tube-net Jacobian
        # (gradient via VJP) and the correction reuses the basis.
        grad_e, D_e, L_e, U_e = _assemble_e(sp, u_e, p, lam, mu, rho,
                                            nn_need_U=wb is None)
        fm, Dm, Lm, gf = masked_system(u_e, grad_e, D_e, L_e, rho)

        if wb is not None:
            # Frozen per-outer Woodbury basis: fresh banded solve for the
            # gradient column only, correction through the basis computed
            # at the start of this outer (inexact Newton; the line search
            # guards descent, multipliers/rho are outer-constant so the
            # basis scaling is consistent).
            Um, Ru, cholC = wb
            # Rg = -Hb^{-1} gf (fresh factor);  d = Rg + Ru C^{-1} U^T (-Rg)
            if cfg.linsolve == "pallas":
                Rg = _pallas_bt_solve(Dm, Lm, [-g for g in gf], b, S)
            else:
                Rg = factor_solve_entries(Dm, Lm, [-g for g in gf], b)
            crhs = jnp.zeros((N,))
            for i in range(b):
                if _is0(Um[i]):
                    continue
                crhs = crhs - Um[i].T @ Rg[i]
            psize = _cap_psize(N)
            if psize is not None:
                y_c = blocked_cho_solve(cholC, crhs, p=psize)
            else:
                y_c = jax.scipy.linalg.cho_solve((cholC, True), crhs)
            d_e = [Rg[i] + Ru[i] @ y_c for i in range(b)]
        elif U_e is not None:
            # NN tube: rank-N Woodbury on the banded factorization.
            #   d = -(Hb + U U^T)^{-1} gf
            #     = -(Rg - Ru (I + U^T Ru)^{-1} U^T Rg),  R* = Hb^{-1} [gf, U]
            # One multi-RHS banded scan (factor shared across the N+1
            # columns) + a small (N, N) Cholesky per scenario.
            Um = [0.0 if _is0(U_e[i]) else U_e[i] * fm[i][:, None]
                  for i in range(b)]
            rhs_m = [jnp.concatenate(
                [gf[i][:, None],
                 jnp.zeros((S, N)) if _is0(Um[i]) else Um[i]], axis=1)
                for i in range(b)]
            if cfg.linsolve == "pallas" and _PALLAS_MULTIRHS:
                sol_m = _pallas_bt_msolve(Dm, Lm, rhs_m, b, S, N + 1)
            else:
                sol_m = factor_solve_entries(Dm, Lm, rhs_m, b)
            Rg = [s[:, 0] for s in sol_m]
            Ru = [s[:, 1:] for s in sol_m]
            C = jnp.eye(N)
            crhs = jnp.zeros((N,))
            for i in range(b):
                if _is0(Um[i]):
                    continue
                C = C + Um[i].T @ Ru[i]
                crhs = crhs + Um[i].T @ Rg[i]
            # Capacitance solve: XLA's batched cholesky custom call costs
            # ~6 ms at (B, 50, 50) — the measured hot spot of the NN
            # solve; the blocked scalar-panel factorization is ~an order
            # of magnitude cheaper (ops/blocked_chol.py, docs/PERF.md).
            psize = _cap_psize(N)
            if psize is not None:
                Lc = blocked_cholesky(C, p=psize)
                y_c = blocked_cho_solve(Lc, crhs, p=psize)
            else:
                cf = jax.scipy.linalg.cho_factor(C, lower=True)
                y_c = jax.scipy.linalg.cho_solve(cf, crhs)
            d_e = [-(Rg[i] - Ru[i] @ y_c) for i in range(b)]
        else:
            linsolve = cfg.linsolve
            if linsolve == "auto":
                # measured crossover between N=50 (thomas) and N=200 (cr);
                # see docs/PERF.md "Cyclic reduction vs block-Thomas"
                linsolve = "cr" if S >= _CR_AUTO_MIN_S else "thomas"
            if linsolve == "pallas":
                d_e = _pallas_bt_solve(Dm, Lm, [-g for g in gf], b, S)
            elif linsolve == "cr":
                d_e = cr_solve_entries(Dm, Lm, [-g for g in gf], b)
            else:
                d_e = factor_solve_entries(Dm, Lm, [-g for g in gf], b)
        d_e = [jnp.where(fm[i] > 0.0, d_e[i], 0.0) for i in range(b)]

        dir_deriv = 0.0
        for i in range(b):
            dir_deriv = dir_deriv + jnp.sum(grad_e[i] * d_e[i])

        # parallel Armijo backtracking over all candidate steps at once
        alphas = cfg.ls_backtrack ** jnp.arange(cfg.ls_iters,
                                                dtype=jnp.float32)
        u_try = tuple(
            jnp.clip(u_e[i][None] + alphas[:, None] * d_e[i][None],
                     lb_e[i], ub_e[i])
            for i in range(b))
        m_trys = _merit_e(sp, u_try, p, lam, mu, rho)        # (ls_iters,)
        ok = m_trys <= merit + cfg.armijo * alphas * dir_deriv
        idx = jnp.argmax(ok)
        any_ok = jnp.any(ok)
        u_new = tuple(jnp.where(any_ok, u_try[i][idx], u_e[i])
                      for i in range(b))
        merit_new = jnp.where(any_ok, m_trys[idx], merit)
        return u_new, merit_new, pg_norm(u_e, grad_e)

    def outer_body(carry, _):
        u_e, lam, mu, rho, prev_viol, converged, outer_used = carry

        def inner_body_wb(wb):
            def inner_body(carry2, _):
                u2, m2, frozen = carry2
                u3, m3, gnorm = inner_step(u2, m2, lam, mu, rho, wb=wb)
                frozen2 = frozen | (gnorm < cfg.tol_grad * 0.1)
                u4 = tuple(jnp.where(frozen, u2[i], u3[i])
                           for i in range(b))
                m4 = jnp.where(frozen, m2, m3)
                return (u4, m4, frozen2), None
            return inner_body

        # One merit eval per outer seeds the carried value (multipliers and
        # penalty change only at outer boundaries).
        merit0 = _merit_e(sp, u_e, p, lam, mu, rho)
        carry2 = (u_e, merit0, jnp.asarray(False))
        if nn_frozen_basis:
            # Chunked inner loop: rebuild the Woodbury basis every
            # nn_chunk steps at the current iterate, run the chunk with it
            # frozen.
            done = 0
            while done < cfg.inner_iters:
                step = min(nn_chunk, cfg.inner_iters - done)
                wb = woodbury_basis(carry2[0], lam, mu, rho)
                carry2, _ = jax.lax.scan(inner_body_wb(wb), carry2, None,
                                         length=step)
                done += step
        else:
            carry2, _ = jax.lax.scan(inner_body_wb(None), carry2, None,
                                     length=cfg.inner_iters)
        u_new = carry2[0]
        u_new = tuple(jnp.where(converged, u_e[i], u_new[i])
                      for i in range(b))

        z_e, w, v_e, h_dyn, h_ic, h_tube, g_list = residuals_of(u_new)
        h = flat_h(h_dyn, h_ic, h_tube)
        g = flat_g(g_list)
        viol = jnp.maximum(jnp.max(jnp.abs(h)),
                           jnp.max(jnp.maximum(-g, 0.0)))
        if cfg.penalty_only:
            lam_new, mu_new = lam, mu
        else:
            lam_new = jnp.where(converged, lam, lam + rho * h)
            mu_new = jnp.where(converged, mu,
                               jnp.maximum(0.0, mu - rho * g))
        grow = viol > cfg.viol_reduction * prev_viol
        rho_new = jnp.where(
            converged | ~grow, rho,
            jnp.minimum(rho * cfg.rho_growth, cfg.rho_max))
        grad_e, _, _, _ = _assemble_e(sp, u_new, p, lam_new, mu_new, rho,
                                      grad_rho=0.0, nn_need_U=False)
        gnorm = pg_norm(u_new, grad_e)
        r2 = _objective_r2(sp, z_e, w, v_e, p)
        obj_scale = 1.0 + jnp.sqrt(r2)
        now_conv = (viol < cfg.tol_feas) & (gnorm < cfg.tol_grad * obj_scale)
        outer_used = jnp.where(converged, outer_used, outer_used + 1)
        converged = converged | now_conv
        return (u_new, lam_new, mu_new, rho_new, viol, converged,
                outer_used), None

    u_init = tuple(jnp.clip(u0_e[i], lb_e[i], ub_e[i]) for i in range(b))
    init = (u_init, lam, mu, rho, jnp.asarray(jnp.inf, jnp.float32),
            jnp.asarray(False), jnp.asarray(0, jnp.int32))
    (u_e, lam, mu, rho, viol, converged, outer_used), _ = jax.lax.scan(
        outer_body, init, None, length=cfg.outer_iters)

    z_e, w, v_e, h_dyn, h_ic, h_tube, g_list = residuals_of(u_e)
    grad_e, _, _, _ = _assemble_e(sp, u_e, p, lam, mu, rho, grad_rho=0.0,
                                  nn_need_U=False)
    r2 = _objective_r2(sp, z_e, w, v_e, p)
    x = jnp.stack(u_e, axis=-1).reshape(-1)
    return ALSolution(
        x=x, lam=lam, mu=mu, viol=viol,
        grad_norm=pg_norm(u_e, grad_e), obj=0.5 * r2,
        rho=rho, converged=converged, outer_used=outer_used,
    )
