"""Batched articulated rigid-body dynamics in generalized coordinates.

TPU-native replacement for Isaac Gym/PhysX (ref: SURVEY.md §2.3 — "the
single largest build item"): a floating-base kinematic-tree engine whose
mass matrix and bias forces are derived by automatic differentiation of the
Lagrangian in a local tangent parameterization (an "MJX-style" formulation
chosen for JAX):

- Configuration: base position, base rotation (quaternion, xyzw), joint
  coordinates. Velocity: world-frame base linear velocity, body-frame base
  angular velocity, joint rates (matches Isaac root-state conventions for
  the linear part; angular is body-frame for clean Lie-group integration).
- A perturbation ``d in R^nv`` acts as (dp, dphi, dq) with the rotation
  perturbed on the right: R <- R exp(dphi^). Body Jacobians are
  ``jacfwd(fk)`` at d=0; the mass matrix is the Gauss sum of J^T M J; the
  Coriolis/centrifugal+gravity bias comes from the Lagrangian identity
  c = (d(Mv)/dq) v - 1/2 d(v^T M v)/dq + dV/dq, all evaluated by nested
  autodiff. Exact for the tree, no hand-derived recursions to get wrong —
  verified against MuJoCo in tests.
- Everything is a pure function of (model, state) and fully vmap/jit-able;
  the per-env matrices are tiny (nv<=20), so batched assembly and the
  batched Cholesky solve map onto the MXU.

Joint ordering follows the URDF topological order; body i>=1 is the child
of joint i-1, body 0 the floating base.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..core.maths import quat_mul, quat_normalize, quat_to_rotmat, so3_exp
from .urdf import RobotSpec

REVOLUTE, PRISMATIC = 0, 1


@struct.dataclass
class RobotModel:
    """Static tree description + per-body parameters (leaves vmappable for
    domain randomization)."""

    # static topology
    nj: int = struct.field(pytree_node=False)
    parent: tuple = struct.field(pytree_node=False)   # body index per joint
    jtype: tuple = struct.field(pytree_node=False)    # REVOLUTE/PRISMATIC
    contact_body: tuple = struct.field(pytree_node=False)
    dof_names: tuple = struct.field(pytree_node=False)

    # leaves
    origin_pos: jax.Array    # (nj, 3)
    origin_rot: jax.Array    # (nj, 3, 3)
    axis: jax.Array          # (nj, 3)
    mass: jax.Array          # (nb,)
    com: jax.Array           # (nb, 3)
    inertia: jax.Array       # (nb, 3, 3) about COM in link frame
    q_lower: jax.Array       # (nj,)
    q_upper: jax.Array       # (nj,)
    effort_limit: jax.Array  # (nj,)
    vel_limit: jax.Array     # (nj,)
    contact_offset: jax.Array  # (nc, 3)
    contact_radius: jax.Array  # (nc,)
    gravity: jax.Array       # (3,)
    body_names: tuple = struct.field(pytree_node=False, default=())
    contact_link_names: tuple = struct.field(pytree_node=False, default=())

    @property
    def nb(self) -> int:
        return self.nj + 1

    @property
    def nv(self) -> int:
        return 6 + self.nj

    @classmethod
    def from_spec(cls, spec: RobotSpec, gravity=(0.0, 0.0, -9.81)):
        """Build the articulated model, merging fixed-joint subtrees.

        Links attached via fixed joints (common in real-robot URDFs: imu
        frames, hip/foot dummy links) are merged into their parent movable
        body: masses/inertias are composed with the parallel-axis theorem
        and collision spheres are transformed into the body frame — the same
        collapse Isaac Gym's asset importer performs.
        """
        from .urdf import _rpy_to_mat

        # Per link: (body index it belongs to, rotation/translation of the
        # link frame expressed in that body's frame).
        frame = {spec.root: (0, np.eye(3), np.zeros(3))}
        bodies = [[]]          # list of (link, R_link_in_body, p_link_in_body)
        body_names = [spec.root]
        bodies[0].append((spec.links[spec.root], np.eye(3), np.zeros(3)))

        joints = []
        parent, jtype = [], []
        origin_pos, origin_rot, axis = [], [], []
        lo, up, eff, vel = [], [], [], []
        for j in spec.joints:
            pb, Rp, pp = frame[j.parent]
            Rj = Rp @ _rpy_to_mat(j.origin_rpy)
            pj = pp + Rp @ j.origin_pos
            if j.joint_type == "fixed":
                frame[j.child] = (pb, Rj, pj)
                bodies[pb].append((spec.links[j.child], Rj, pj))
            else:
                bi = len(bodies)
                frame[j.child] = (bi, np.eye(3), np.zeros(3))
                bodies.append([(spec.links[j.child], np.eye(3), np.zeros(3))])
                body_names.append(j.child)
                joints.append(j)
                parent.append(pb)
                jtype.append(
                    REVOLUTE if j.joint_type == "revolute" else PRISMATIC
                )
                origin_pos.append(pj)
                origin_rot.append(Rj)
                axis.append(j.axis / max(np.linalg.norm(j.axis), 1e-9))
                lo.append(j.lower)
                up.append(j.upper)
                eff.append(j.effort)
                vel.append(j.velocity)

        # Compose each body's inertial properties and collision spheres.
        masses, coms, inertias = [], [], []
        contact_body, contact_offset, contact_radius, contact_link = \
            [], [], [], []
        for bi, parts in enumerate(bodies):
            m_tot = sum(l.mass for l, _, _ in parts)
            if m_tot > 0:
                com = sum(l.mass * (p + R @ l.com)
                          for l, R, p in parts) / m_tot
            else:
                com = np.zeros(3)
            I_tot = np.zeros((3, 3))
            for l, R, p in parts:
                I_l = R @ l.inertia @ R.T
                d = (p + R @ l.com) - com
                I_tot += I_l + l.mass * (
                    np.dot(d, d) * np.eye(3) - np.outer(d, d)
                )
                for center, radius in l.collision_spheres:
                    contact_body.append(bi)
                    contact_offset.append(p + R @ center)
                    contact_radius.append(radius)
                    contact_link.append(l.name)
            masses.append(m_tot)
            coms.append(com)
            inertias.append(I_tot)

        f32 = lambda x: jnp.asarray(np.asarray(x), jnp.float32)
        return cls(
            nj=len(joints),
            parent=tuple(parent),
            jtype=tuple(jtype),
            contact_body=tuple(contact_body),
            dof_names=tuple(j.name for j in joints),
            body_names=tuple(body_names),
            contact_link_names=tuple(contact_link),
            origin_pos=f32(origin_pos) if joints else jnp.zeros((0, 3)),
            origin_rot=f32(origin_rot) if joints else jnp.zeros((0, 3, 3)),
            axis=f32(axis) if joints else jnp.zeros((0, 3)),
            mass=f32(masses),
            com=f32(coms),
            inertia=f32(inertias),
            q_lower=f32(lo), q_upper=f32(up),
            effort_limit=f32(eff), vel_limit=f32(vel),
            contact_offset=f32(contact_offset) if contact_offset
            else jnp.zeros((0, 3)),
            contact_radius=f32(contact_radius) if contact_radius
            else jnp.zeros((0,)),
            gravity=f32(gravity),
        )


@struct.dataclass
class RobotState:
    """Batched state: leading axis B."""

    base_pos: jax.Array    # (B, 3)
    base_quat: jax.Array   # (B, 4) xyzw
    q: jax.Array           # (B, nj)
    v: jax.Array           # (B, 6+nj): [v_world, omega_body, qdot]

    @property
    def root_states(self) -> jax.Array:
        """Isaac-Gym-style 13-dim root state [p, quat, v_world, w_world]."""
        R = quat_to_rotmat(self.base_quat)
        w_world = jnp.einsum("...ij,...j->...i", R, self.v[..., 3:6])
        return jnp.concatenate(
            [self.base_pos, self.base_quat, self.v[..., :3], w_world], axis=-1
        )


def _skew(v):
    z = jnp.zeros_like(v[..., 0])
    return jnp.stack([
        jnp.stack([z, -v[..., 2], v[..., 1]], axis=-1),
        jnp.stack([v[..., 2], z, -v[..., 0]], axis=-1),
        jnp.stack([-v[..., 1], v[..., 0], z], axis=-1),
    ], axis=-2)


def _exp_mat_small(phi):
    """SO(3) exp to 2nd order: exact value AND 1st/2nd derivatives at phi=0.

    The tangent perturbation is always evaluated at phi=0 (Jacobians/Hessians
    by autodiff); a norm-based Rodrigues formula has a non-differentiable
    sqrt at 0 which NaNs jacfwd, so the truncated series is both safe and
    exact for this use.
    """
    K = _skew(phi)
    return jnp.eye(3) + K + 0.5 * (K @ K)


def _exp_mat_axis(axis, theta):
    """Exact Rodrigues rotation about a constant unit axis (joints): no norm,
    smooth in theta everywhere."""
    K = _skew(axis)
    s, c = jnp.sin(theta), jnp.cos(theta)
    return jnp.eye(3) + s * K + (1.0 - c) * (K @ K)


def fk_perturbed(model: RobotModel, base_pos, base_R, q, d):
    """World rotations/positions of all body frames under tangent
    perturbation d = [dp, dphi, dq] (single env)."""
    dp, dphi, dq = d[:3], d[3:6], d[6:]
    Rs = [base_R @ _exp_mat_small(dphi)]
    ps = [base_pos + dp]
    for j in range(model.nj):
        Rp, pp = Rs[model.parent[j]], ps[model.parent[j]]
        Rj = Rp @ model.origin_rot[j]
        pj = pp + Rp @ model.origin_pos[j]
        theta = q[j] + dq[j]
        if model.jtype[j] == REVOLUTE:
            Rc = Rj @ _exp_mat_axis(model.axis[j], theta)
            pc = pj
        else:
            Rc = Rj
            pc = pj + Rj @ (model.axis[j] * theta)
        Rs.append(Rc)
        ps.append(pc)
    return jnp.stack(Rs), jnp.stack(ps)


def fk(model: RobotModel, state_pos, state_quat, q):
    base_R = quat_to_rotmat(state_quat)
    return fk_perturbed(model, state_pos, base_R, q,
                        jnp.zeros(6 + model.nj))


def _body_jacobians(model, base_pos, base_R, q):
    """COM translational Jacobians Jp (nb,3,nv), rotational Jacobians
    Jr (nb,3,nv) (world frame), plus world rotations/COM positions."""
    nv = 6 + model.nj

    def coms(d):
        Rs, ps = fk_perturbed(model, base_pos, base_R, q, d)
        c = ps + jnp.einsum("bij,bj->bi", Rs, model.com)
        return c, Rs

    zero = jnp.zeros(nv)
    Jp_fn = jax.jacfwd(lambda d: coms(d)[0])
    dR_fn = jax.jacfwd(lambda d: coms(d)[1])
    c0, Rs0 = coms(zero)
    Jp = Jp_fn(zero)                     # (nb, 3, nv)
    dRs = dR_fn(zero)                    # (nb, 3, 3, nv)
    # omega^ = dR R^T per tangent direction -> Jr[:, :, k] = vee(dR_k R^T)
    W = jnp.einsum("bimk,bjm->bijk", dRs, Rs0)   # (nb,3,3,nv)
    Jr = jnp.stack(
        [W[:, 2, 1, :], W[:, 0, 2, :], W[:, 1, 0, :]], axis=1
    )  # (nb, 3, nv)
    return c0, Rs0, Jp, Jr


def mass_matrix_at(model, base_pos, base_R, q, d):
    """M(q ⊕ d): Gauss sum of body Jacobian quadratic forms."""

    def coms(dd):
        Rs, ps = fk_perturbed(model, base_pos, base_R, q, dd)
        return ps + jnp.einsum("bij,bj->bi", Rs, model.com), Rs

    Jp = jax.jacfwd(lambda dd: coms(dd)[0])(d)
    dRs = jax.jacfwd(lambda dd: coms(dd)[1])(d)
    _, Rs0 = coms(d)
    W = jnp.einsum("bimk,bjm->bijk", dRs, Rs0)
    Jr = jnp.stack([W[:, 2, 1, :], W[:, 0, 2, :], W[:, 1, 0, :]], axis=1)
    I_world = jnp.einsum("bij,bjk,blk->bil", Rs0, model.inertia, Rs0)
    M = (
        jnp.einsum("b,bik,bil->kl", model.mass, Jp, Jp)
        + jnp.einsum("bik,bij,bjl->kl", Jr, I_world, Jr)
    )
    return M


def mass_matrix_autodiff(model, state: "RobotState"):
    """Batched M(q): (B, nv, nv). Autodiff reference form (see kinematics.py
    for the analytic hot path; cross-checked in tests/test_sim_dynamics.py)."""

    def single(base_pos, base_quat, q):
        base_R = quat_to_rotmat(base_quat)
        return mass_matrix_at(model, base_pos, base_R, q,
                              jnp.zeros(6 + model.nj))

    return jax.vmap(single)(state.base_pos, state.base_quat, state.q)


def bias_forces_autodiff(model, state: "RobotState"):
    """Batched Coriolis/centrifugal + gravity bias c(q, v): (B, nv).

    Lagrangian identity in tangent coordinates:
      c = (d(M v)/dd) v - 1/2 d(v^T M v)/dd + dV/dd   at d = 0.

    Cost note: the first term is a single directional derivative
    (jvp along v) and the second a single reverse-mode gradient of a scalar
    — NOT a full Jacobian of d -> M(d) v, which would nest jacfwd inside
    jacfwd and pay nv^2 kinematics passes (it dominated env stepping).
    """
    nv = 6 + model.nj

    def single(base_pos, base_quat, q, v):
        base_R = quat_to_rotmat(base_quat)

        def Mv(d):
            return mass_matrix_at(model, base_pos, base_R, q, d) @ v

        def vMv(d):
            return 0.5 * (v @ Mv(d))

        def V(d):
            Rs, ps = fk_perturbed(model, base_pos, base_R, q, d)
            c = ps + jnp.einsum("bij,bj->bi", Rs, model.com)
            return -jnp.sum(model.mass * (c @ model.gravity))

        zero = jnp.zeros(nv)
        _, dMv_v = jax.jvp(Mv, (zero,), (v,))    # (d(Mv)/dd) v
        c_cor = dMv_v - jax.grad(vMv)(zero)      # - 1/2 d(v^T M v)/dd
        c_grav = jax.grad(V)(zero)
        return c_cor + c_grav

    return jax.vmap(single)(state.base_pos, state.base_quat, state.q, state.v)


def contact_kinematics_autodiff(model, state: "RobotState"):
    """World positions, velocities, and Jacobians of contact spheres.

    Returns (pos (B,nc,3), vel (B,nc,3), Jc (B,nc,3,nv))."""
    nv = 6 + model.nj
    cb = jnp.asarray(model.contact_body, jnp.int32)

    def single(base_pos, base_quat, q, v):
        base_R = quat_to_rotmat(base_quat)

        def points(d):
            Rs, ps = fk_perturbed(model, base_pos, base_R, q, d)
            return (ps[cb] + jnp.einsum("cij,cj->ci", Rs[cb],
                                        model.contact_offset))

        zero = jnp.zeros(nv)
        p = points(zero)
        Jc = jax.jacfwd(points)(zero)           # (nc, 3, nv)
        return p, jnp.einsum("cik,k->ci", Jc, v), Jc

    return jax.vmap(single)(state.base_pos, state.base_quat, state.q, state.v)


# Public entry points delegate to the analytic hot path (kinematics.py);
# the autodiff forms above remain as independent references for tests.
def mass_matrix(model, state: "RobotState"):
    """Batched M(q): (B, nv, nv)."""
    from .kinematics import mass_matrix as _mm
    return _mm(model, state)


def bias_forces(model, state: "RobotState"):
    """Batched Coriolis/centrifugal + gravity bias c(q, v): (B, nv)."""
    from .kinematics import bias_forces as _bf
    return _bf(model, state)


def contact_kinematics(model, state: "RobotState"):
    """World positions, velocities, Jacobians of contact spheres:
    (pos (B,nc,3), vel (B,nc,3), Jc (B,nc,3,nv))."""
    from .kinematics import contact_kinematics as _ck
    return _ck(model, state)


def solve_qdd(M: jax.Array, rhs: jax.Array) -> jax.Array:
    """qdd = M^{-1} rhs via batched Cholesky with scale-relative
    regularization: small robots have joint inertias ~1e-3, so an absolute
    epsilon would visibly perturb their accelerations.

    Uses the solver's unrolled elementwise Cholesky: XLA's tiny-block
    `cholesky`/`triangular_solve` custom calls are pathologically slow on
    TPU (docs/PERF.md), while the unrolled form fuses on the VPU."""
    from ..solver.block_tridiag import _chol_solve, small_cholesky

    diag_min = jnp.min(jnp.diagonal(M, axis1=-2, axis2=-1), axis=-1)
    M = M + (1e-6 * diag_min)[..., None, None] * jnp.eye(M.shape[-1])
    return _chol_solve(small_cholesky(M), rhs)


def forward_dynamics(model, state: "RobotState", tau: jax.Array,
                     f_ext_generalized: jax.Array) -> jax.Array:
    """qdd = M^{-1} (S tau + f_ext - c); tau is (B, nj) joint torques."""
    M = mass_matrix(model, state)
    c = bias_forces(model, state)
    rhs = f_ext_generalized - c
    rhs = rhs.at[..., 6:].add(tau)
    return solve_qdd(M, rhs)


def integrate(model, state: "RobotState", qdd: jax.Array,
              dt: float) -> "RobotState":
    """Semi-implicit Euler with Lie-group quaternion update."""
    v_new = state.v + dt * qdd
    base_pos = state.base_pos + dt * v_new[..., :3]
    dq_quat = so3_exp(dt * v_new[..., 3:6])
    base_quat = quat_normalize(quat_mul(state.base_quat, dq_quat))
    q = state.q + dt * v_new[..., 6:]
    return RobotState(base_pos=base_pos, base_quat=base_quat, q=q, v=v_new)
