"""Analytic batched kinematics/dynamics for the rigid-body engine hot path.

Replaces the autodiff-of-Lagrangian forms in ``dynamics.py`` (kept there as
cross-check references) with closed-form recursions — the standard
Newton-Euler/CRBA quantities — written as a **scalar graph over (B,)-shaped
arrays** ("lane-major"): every tiny geometric object (3-vector, 3x3 matrix,
Jacobian column) is a Python list of (B,) arrays, and all tiny-dimension
contractions are unrolled at trace time.

Why this layout: the per-env matrices are tiny (nv <= ~20) and the hot loop
is bound by layout/padding, not FLOPs. Materializing (B, nc, 3, nv) arrays
pads the minor dims to TPU (8, 128) tiles — a 30-40x memory blowup — and
`dot_general` on 3-wide contractions forces those layouts (measured: adding
one tiny einsum tripled the substep cost; docs/PERF.md). With the batch as
the only array axis, XLA sees a few thousand (B,)-elementwise ops that fuse
into a handful of VPU kernels with perfect lane utilization. The same trick
as the tube solver's unrolled `small_cholesky` (solver/block_tridiag.py).

Costs are further cut statically at trace time:
- ancestor pruning: a Jacobian column only exists for the dofs on the path
  base->body (mass-matrix work becomes ~linear in tree depth);
- base translation columns are identity: handled symbolically (python 0/1).

Conventions match ``dynamics.py`` exactly (ref: SURVEY.md §2.3 Isaac Gym
root-state mapping): generalized velocity v = [v_world, omega_body, qdot],
base rotation perturbed on the right (R <- R exp(dphi^)), so the base
angular Jacobian block is R0 and the translational block is
-skew(x - p0) @ R0. Validated against MuJoCo and the autodiff forms in
tests/test_sim_dynamics.py.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .dynamics import PRISMATIC, REVOLUTE, RobotModel, RobotState

# ----------------------------------------------------------------------
# Scalar-graph helpers: vectors are list[3] of (B,) arrays (or python
# floats for structural constants), matrices list[3][3].

def _vadd(a, b):
    return [a[i] + b[i] for i in range(3)]


def _vsub(a, b):
    return [a[i] - b[i] for i in range(3)]


def _vscale(a, s):
    return [a[i] * s for i in range(3)]


def _vcross(a, b):
    return [
        a[1] * b[2] - a[2] * b[1],
        a[2] * b[0] - a[0] * b[2],
        a[0] * b[1] - a[1] * b[0],
    ]


def _vdot(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def _mv(A, v):
    """A (3x3 list) @ v."""
    return [sum(A[i][j] * v[j] for j in range(3)) for i in range(3)]


def _mtv(A, v):
    """A^T @ v."""
    return [sum(A[j][i] * v[j] for j in range(3)) for i in range(3)]


def _mm(A, B):
    return [[sum(A[i][k] * B[k][j] for k in range(3)) for j in range(3)]
            for i in range(3)]


def _quat_to_R(q):
    """q = [x, y, z, w] of (B,) -> 3x3 list. Matches core.maths
    quat_to_rotmat (normalizes first)."""
    x, y, z, w = q
    n = jnp.sqrt(x * x + y * y + z * z + w * w)
    x, y, z, w = x / n, y / n, z / n, w / n
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    return [
        [1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)],
        [2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)],
        [2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)],
    ]


def _axis_rot(axis, theta):
    """Rodrigues about a constant numpy unit axis; theta (B,) -> 3x3 list."""
    s, c = jnp.sin(theta), jnp.cos(theta)
    a0, a1, a2 = (float(axis[0]), float(axis[1]), float(axis[2]))
    one_c = 1.0 - c
    return [
        [c + a0 * a0 * one_c, a0 * a1 * one_c - a2 * s,
         a0 * a2 * one_c + a1 * s],
        [a1 * a0 * one_c + a2 * s, c + a1 * a1 * one_c,
         a1 * a2 * one_c - a0 * s],
        [a2 * a0 * one_c - a1 * s, a2 * a1 * one_c + a0 * s,
         c + a2 * a2 * one_c],
    ]


def _const_mat(M):
    M = np.asarray(M, np.float64)
    return [[float(M[i, j]) for j in range(3)] for i in range(3)]


def _const_vec(v):
    v = np.asarray(v, np.float64)
    return [float(v[0]), float(v[1]), float(v[2])]


def _ancestor_dofs(parent: tuple, nj: int):
    """Per body: list of joint indices on the path base -> body."""
    out = [[] for _ in range(nj + 1)]
    for b in range(1, nj + 1):
        j, path = b - 1, []
        while True:
            path.append(j)
            pb = parent[j]
            if pb == 0:
                break
            j = pb - 1
        out[b] = sorted(path)
    return out


# ----------------------------------------------------------------------
class ChainLM:
    """Per-body world-frame kinematics, scalar-graph form.

    Lists indexed by body: R (3x3), p/w/vo/dw/ao (3,) of (B,) arrays; and by
    joint: ax_w (world axes), pj_w (joint origins). dw/ao are the
    accelerations with qdd = 0 (the Newton-Euler "bias" accelerations).
    """

    __slots__ = ("R", "p", "w", "vo", "dw", "ao", "ax_w", "pj_w")

    def __init__(self, R, p, w, vo, dw, ao, ax_w, pj_w):
        self.R, self.p, self.w, self.vo = R, p, w, vo
        self.dw, self.ao, self.ax_w, self.pj_w = dw, ao, ax_w, pj_w


def _state_lm(state: RobotState):
    """Batch-major RobotState -> per-scalar (B,) lists."""
    p0 = [state.base_pos[:, i] for i in range(3)]
    quat = [state.base_quat[:, i] for i in range(4)]
    q = [state.q[:, j] for j in range(state.q.shape[1])]
    v = [state.v[:, k] for k in range(state.v.shape[1])]
    return p0, quat, q, v


def fk_chain_lm(model: RobotModel, p0, quat, q, v) -> ChainLM:
    """One pass down the tree: pose + velocity + bias acceleration.

    The nj-iteration loop unrolls at trace time; every iteration is a
    handful of (B,) ops.
    """
    R0 = _quat_to_R(quat)
    w0 = _mv(R0, v[3:6])
    zero3 = [0.0, 0.0, 0.0]

    Rs, ps = [R0], [p0]
    ws, vos = [w0], [v[0:3]]
    dws, aos = [zero3], [zero3]
    axs, pjs = [], []

    origin_pos = np.asarray(model.origin_pos)
    origin_rot = np.asarray(model.origin_rot)
    axis_np = np.asarray(model.axis)

    for j in range(model.nj):
        pb = model.parent[j]
        Rp, pp = Rs[pb], ps[pb]
        wp, vop, dwp, aop = ws[pb], vos[pb], dws[pb], aos[pb]

        Oj = _const_mat(origin_rot[j])
        Rj = _mm(Rp, Oj)
        pj = _vadd(pp, _mv(Rp, _const_vec(origin_pos[j])))
        a_w = _mv(Rj, _const_vec(axis_np[j]))
        qj, qdj = q[j], v[6 + j]

        # Velocity/acceleration of the joint-origin point (fixed in parent).
        r = _vsub(pj, pp)
        v_j = _vadd(vop, _vcross(wp, r))
        a_j = _vadd(aop, _vadd(_vcross(dwp, r),
                               _vcross(wp, _vcross(wp, r))))

        if model.jtype[j] == REVOLUTE:
            Rc = _mm(Rj, _axis_rot(axis_np[j], qj))
            ps.append(pj)
            ws.append(_vadd(wp, _vscale(a_w, qdj)))
            vos.append(v_j)
            dws.append(_vadd(dwp, _vscale(_vcross(wp, a_w), qdj)))
            aos.append(a_j)
        else:  # PRISMATIC
            Rc = Rj
            off = _vscale(a_w, qj)
            v_rel = _vscale(a_w, qdj)
            ps.append(_vadd(pj, off))
            ws.append(wp)
            vos.append(_vadd(v_j, _vadd(_vcross(wp, off), v_rel)))
            dws.append(dwp)
            aos.append(_vadd(a_j, _vadd(
                _vadd(_vcross(dwp, off), _vcross(wp, _vcross(wp, off))),
                _vscale(_vcross(wp, v_rel), 2.0))))
        Rs.append(Rc)
        axs.append(a_w)
        pjs.append(pj)

    return ChainLM(Rs, ps, ws, vos, dws, aos, axs, pjs)


def _point_jac_cols(model, chain: ChainLM, body: int, x):
    """Translational Jacobian columns of world point x on `body`.

    Returns {dof_index: 3-list}. Base translation columns (identity) are
    NOT included — callers handle k<3 symbolically. Base rotation columns
    3..5 are dx = -skew(x - p0) R0 dphi; joint columns only for ancestors.
    """
    R0, p0 = chain.R[0], chain.p[0]
    rel = _vsub(x, p0)
    cols = {}
    # -skew(rel) @ R0: column k is -rel x R0[:, k].
    for k in range(3):
        r0col = [R0[0][k], R0[1][k], R0[2][k]]
        cols[3 + k] = _vcross(r0col, rel)   # = -(rel x r0col)
    for j in _ancestor_dofs(model.parent, model.nj)[body]:
        a = chain.ax_w[j]
        if model.jtype[j] == REVOLUTE:
            cols[6 + j] = _vcross(a, _vsub(x, chain.pj_w[j]))
        else:
            cols[6 + j] = a
    return cols


def _rot_jac_cols(model, chain: ChainLM, body: int):
    """Rotational Jacobian columns {dof: 3-list}; k<3 are zero (omitted)."""
    R0 = chain.R[0]
    cols = {}
    for k in range(3):
        cols[3 + k] = [R0[0][k], R0[1][k], R0[2][k]]
    for j in _ancestor_dofs(model.parent, model.nj)[body]:
        if model.jtype[j] == REVOLUTE:
            cols[6 + j] = chain.ax_w[j]
    return cols


def _com_chain(model, chain: ChainLM):
    """Per body: COM position c, COM bias acceleration a_c, world inertia
    I_w (3x3 list)."""
    cs, acs, Iws = [], [], []
    com_np = np.asarray(model.com)
    inertia_np = np.asarray(model.inertia)
    for n in range(model.nb):
        R, p = chain.R[n], chain.p[n]
        r_c = _mv(R, _const_vec(com_np[n]))
        cs.append(_vadd(p, r_c))
        acs.append(_vadd(chain.ao[n], _vadd(
            _vcross(chain.dw[n], r_c),
            _vcross(chain.w[n], _vcross(chain.w[n], r_c)))))
        # I_w = R I R^T with I a constant 3x3.
        I = _const_mat(inertia_np[n])
        RI = _mm(R, I)
        Iws.append([[sum(RI[i][k] * R[j][k] for k in range(3))
                     for j in range(3)] for i in range(3)])
    return cs, acs, Iws


def _assemble_M(model, chain, cs, Iws, base_mass_delta=None):
    """Mass matrix as nv x nv nested list of (B,)/float entries.

    M = sum_n m_n Jp_n^T Jp_n + Jr_n^T I_n Jr_n with structural zeros
    skipped; base-translation columns handled symbolically (Jp[:, :3] = I,
    Jr[:, :3] = 0).

    ``base_mass_delta``: optional (B,) payload mass added to the base body
    (domain randomization, ref legged_robot.py _process_rigid_body_props:
    props[0].mass += rand). Point-mass payload at the base origin: inertia
    unchanged, exactly like the reference.
    """
    nv = 6 + model.nj
    mass_np = np.asarray(model.mass)
    M = [[0.0] * nv for _ in range(nv)]
    total_mass = float(mass_np.sum())
    if base_mass_delta is not None:
        total_mass = total_mass + base_mass_delta
    for i in range(3):
        M[i][i] = M[i][i] + total_mass

    for n in range(model.nb):
        m_n = float(mass_np[n])
        if n == 0 and base_mass_delta is not None:
            m_n = m_n + base_mass_delta
        jp = _point_jac_cols(model, chain, n, cs[n])
        jr = _rot_jac_cols(model, chain, n)
        dofs = sorted(jp.keys())
        # Cross terms with base translation: M[i][k] += m_n * jp[k][i].
        # (Structural-zero check on the NOMINAL mass: a randomized payload
        # never turns a zero-mass body massive.)
        if not (isinstance(m_n, float) and m_n == 0.0):
            for k in dofs:
                col = jp[k]
                for i in range(3):
                    M[i][k] = M[i][k] + m_n * col[i]
            for ka in range(len(dofs)):
                k = dofs[ka]
                for la in range(ka, len(dofs)):
                    l = dofs[la]
                    M[k][l] = M[k][l] + m_n * _vdot(jp[k], jp[l])
        # Rotational part: (I_w jr_l) . jr_k.
        rdofs = sorted(jr.keys())
        Ijr = {l: _mv(Iws[n], jr[l]) for l in rdofs}
        for ka in range(len(rdofs)):
            k = rdofs[ka]
            for la in range(ka, len(rdofs)):
                l = rdofs[la]
                M[k][l] = M[k][l] + _vdot(jr[k], Ijr[l])
    # Mirror the upper triangle.
    for k in range(nv):
        for l in range(k + 1, nv):
            M[l][k] = M[k][l]
    return M


def _assemble_bias(model, chain, cs, acs, Iws, base_mass_delta=None):
    """Generalized bias c(q, v) = sum_n Jp^T m(a_c - g) + Jr^T (I dw + w x I w)
    as an nv list of (B,) entries (gravity folded in)."""
    nv = 6 + model.nj
    mass_np = np.asarray(model.mass)
    g = _const_vec(np.asarray(model.gravity))
    out = [0.0] * nv
    for n in range(model.nb):
        m_n = float(mass_np[n])
        if n == 0 and base_mass_delta is not None:
            m_n = m_n + base_mass_delta
        f = [m_n * (acs[n][i] - g[i]) for i in range(3)]
        Iw, w, dw = Iws[n], chain.w[n], chain.dw[n]
        tq = _vadd(_mv(Iw, dw), _vcross(w, _mv(Iw, w)))
        # Base translation rows: sum of f.
        for i in range(3):
            out[i] = out[i] + f[i]
        jp = _point_jac_cols(model, chain, n, cs[n])
        for k, col in jp.items():
            out[k] = out[k] + _vdot(col, f)
        jr = _rot_jac_cols(model, chain, n)
        for k, col in jr.items():
            out[k] = out[k] + _vdot(col, tq)
    return out


def _contact_points_lm(model, chain: ChainLM):
    """Per contact sphere: world position, velocity (3-lists)."""
    pos, vel = [], []
    off_np = np.asarray(model.contact_offset)
    for c, b in enumerate(model.contact_body):
        R, p = chain.R[b], chain.p[b]
        off = _mv(R, _const_vec(off_np[c]))
        pos.append(_vadd(p, off))
        vel.append(_vadd(chain.vo[b], _vcross(chain.w[b], off)))
    return pos, vel


def _chol_solve_lm(M, rhs, nv):
    """Solve M x = rhs for nested-list SPD M (entries (B,)/float), rhs an
    nv list. Unrolled Cholesky — same trick as solver/block_tridiag.py
    small_cholesky, in scalar-graph form, with scale-relative
    regularization (see dynamics.solve_qdd)."""
    diag_min = M[0][0]
    for i in range(1, nv):
        diag_min = jnp.minimum(diag_min, M[i][i])
    reg = 1e-6 * diag_min
    L = [[None] * nv for _ in range(nv)]
    for j in range(nv):
        acc = M[j][j] + reg
        for k in range(j):
            acc = acc - L[j][k] * L[j][k]
        d = jnp.sqrt(jnp.maximum(acc, 1e-12))
        L[j][j] = d
        inv_d = 1.0 / d
        for i in range(j + 1, nv):
            s = M[i][j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            L[i][j] = s * inv_d
    # Forward/back substitution.
    y = [None] * nv
    for i in range(nv):
        s = rhs[i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]
    x = [None] * nv
    for i in reversed(range(nv)):
        s = y[i]
        for k in range(i + 1, nv):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return x


# ----------------------------------------------------------------------
# Public batched entry points (batch-major array API, lane-major inside).

def _bcast(cols, B):
    """Materialize a list of (B,)-traced / python-float entries as (B, n)."""
    arrs = [jnp.full((B,), float(c), jnp.float32)
            if isinstance(c, (int, float)) else c for c in cols]
    return jnp.stack(arrs, axis=-1)


def mass_matrix(model: RobotModel, state: RobotState,
                base_mass_delta=None) -> jax.Array:
    """Batched M(q): (B, nv, nv)."""
    B = state.base_pos.shape[0]
    p0, quat, q, v = _state_lm(state)
    chain = fk_chain_lm(model, p0, quat, q, v)
    cs, _, Iws = _com_chain(model, chain)
    M = _assemble_M(model, chain, cs, Iws, base_mass_delta)
    return jnp.stack([_bcast(row, B) for row in M], axis=-2)


def bias_forces(model: RobotModel, state: RobotState) -> jax.Array:
    """Batched Coriolis/centrifugal + gravity bias c(q, v): (B, nv)."""
    B = state.base_pos.shape[0]
    p0, quat, q, v = _state_lm(state)
    chain = fk_chain_lm(model, p0, quat, q, v)
    cs, acs, Iws = _com_chain(model, chain)
    return _bcast(_assemble_bias(model, chain, cs, acs, Iws), B)


def contact_kinematics(model: RobotModel, state: RobotState):
    """(pos (B,nc,3), vel (B,nc,3), Jc (B,nc,3,nv)). The Jc array is only
    materialized here for API/test parity — the substep hot path never
    builds it (see substep_core)."""
    B = state.base_pos.shape[0]
    nv = 6 + model.nj
    p0, quat, q, v = _state_lm(state)
    chain = fk_chain_lm(model, p0, quat, q, v)
    pos, vel = _contact_points_lm(model, chain)
    nc = len(pos)
    pos_a = jnp.stack([_bcast(p, B) for p in pos], axis=1) \
        if nc else jnp.zeros((B, 0, 3))
    vel_a = jnp.stack([_bcast(vl, B) for vl in vel], axis=1) \
        if nc else jnp.zeros((B, 0, 3))
    Js = []
    for c in range(nc):
        cols = _point_jac_cols(model, chain, model.contact_body[c], pos[c])
        full = []
        for k in range(nv):
            if k < 3:
                col = [1.0 if i == k else 0.0 for i in range(3)]
            else:
                col = cols.get(k, [0.0, 0.0, 0.0])
            full.append(_bcast(col, B))        # (B, 3)
        Js.append(jnp.stack(full, axis=-1))    # (B, 3, nv)
    Jc = (jnp.stack(Js, axis=1) if Js
          else jnp.zeros((B, 0, 3, nv)))
    return pos_a, vel_a, Jc


def dynamics_terms(model: RobotModel, state: RobotState):
    """(M, bias, contact pos/vel/Jc) from one chain — array API for
    observation/reward code and tests."""
    M = mass_matrix(model, state)
    c = bias_forces(model, state)
    pos, vel, Jc = contact_kinematics(model, state)
    return M, c, pos, vel, Jc


def _barrier_lists(*trees):
    """jax.lax.optimization_barrier over nested lists of (B,)/float leaves.

    Materializes the shared FK/COM producers ONCE: without it XLA's
    producer-consumer fusion re-derives the chain inside every consumer
    fusion of the substep (measured 9x instruction duplication: the 8.4k-
    multiply jaxpr compiles to 77k multiplies across 163 fusions at nj=12;
    docs/PERF.md). The materialized leaves are only (B,) f32 buffers, so
    the extra HBM traffic is trivial next to the duplicated compute.
    """
    leaves, treedef = jax.tree.flatten(trees)
    is_arr = [hasattr(l, "dtype") for l in leaves]
    arrs = [l for l, a in zip(leaves, is_arr) if a]
    arrs = list(jax.lax.optimization_barrier(tuple(arrs)))
    out = [arrs.pop(0) if a else l for l, a in zip(leaves, is_arr)]
    return jax.tree.unflatten(treedef, out)


def substep_core(model: RobotModel, state: RobotState, tau: jax.Array,
                 contact_force_fn, base_mass_delta=None,
                 fusion_barriers="auto") -> jax.Array:
    """The fused hot path: qdd (B, nv) from one scalar-graph pass.

    contact_force_fn(pos (B,nc,3), vel (B,nc,3)) -> forces (B,nc,3) — the
    compliant terrain model (sim/contact.py); its inputs/outputs are small
    and batch-major, everything else stays lane-major.

    ``fusion_barriers`` materializes the shared FK-chain/COM intermediates
    (and at level "all" the assembled M/rhs) so XLA consumer fusions reuse
    instead of recompute them (see _barrier_lists). "auto" (default)
    enables level "all" for big trees and disables for small ones —
    measured on chip (docs/PERF.md): nj=12 substep 2.2 -> 1.02 ms at
    B=4096 with barriers, while the nj=4 hopper's already-compact graph is
    neutral-to-slower with them.
    """
    if fusion_barriers == "auto":
        fusion_barriers = "all" if model.nj >= 8 else False
    B = state.base_pos.shape[0]
    nv = 6 + model.nj
    p0, quat, q, v = _state_lm(state)
    chain = fk_chain_lm(model, p0, quat, q, v)
    cs, acs, Iws = _com_chain(model, chain)
    if fusion_barriers:
        (chain.R, chain.p, chain.w, chain.vo, chain.dw, chain.ao,
         chain.ax_w, chain.pj_w, cs, acs, Iws) = _barrier_lists(
            chain.R, chain.p, chain.w, chain.vo, chain.dw, chain.ao,
            chain.ax_w, chain.pj_w, cs, acs, Iws)
    barrier_mb = fusion_barriers == "all"
    M = _assemble_M(model, chain, cs, Iws, base_mass_delta)
    bias = _assemble_bias(model, chain, cs, acs, Iws, base_mass_delta)

    # Contact forces through the (batch-major) terrain model.
    pos, vel = _contact_points_lm(model, chain)
    nc = len(pos)
    rhs = [-bias[k] for k in range(nv)]
    if nc:
        pos_a = jnp.stack([_bcast(p, B) for p in pos], axis=1)
        vel_a = jnp.stack([_bcast(vl, B) for vl in vel], axis=1)
        f = contact_force_fn(pos_a, vel_a)      # (B, nc, 3)
        for c in range(nc):
            fc = [f[:, c, 0], f[:, c, 1], f[:, c, 2]]
            cols = _point_jac_cols(model, chain, model.contact_body[c],
                                   pos[c])
            for i in range(3):                  # base translation rows
                rhs[i] = rhs[i] + fc[i]
            for k, col in cols.items():
                rhs[k] = rhs[k] + _vdot(col, fc)
    for j in range(model.nj):
        rhs[6 + j] = rhs[6 + j] + tau[:, j]

    if barrier_mb:
        # Second barrier level: materialize the assembled (M, rhs) so the
        # unrolled Cholesky's fusions don't re-derive assembly terms.
        M, rhs = _barrier_lists(M, rhs)
    qdd = _chol_solve_lm(M, rhs, nv)
    return _bcast(qdd, B)
