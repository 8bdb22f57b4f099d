"""Single-kernel Pallas substep: the whole rigid-body physics substep
(FK chain, mass matrix, bias, flat-plane contact, unrolled Cholesky solve,
semi-implicit integration) as ONE TPU kernel.

Motivation (measured, docs/PERF.md): the XLA path compiles the nj=12
substep's ~17k-op scalar graph into ~163 fusion kernels with ~9x
instruction duplication at fusion boundaries; per-kernel launch overhead
and HBM round-trips between fusions dominate (substep throughput doubles
from B=4096 to B=16384 at near-constant wall time). Inside one Pallas
kernel every intermediate lives in vector registers / VMEM, there is one
launch, and nothing is recomputed.

The kernel body REUSES the lane-major scalar-graph code from
``sim.kinematics`` (fk_chain_lm, _com_chain, _assemble_M, _assemble_bias,
_point_jac_cols, _chol_solve_lm): those functions are shape-agnostic
elementwise jnp programs over lists of (1, blk) rows, which is exactly the
Mosaic-friendly form.

Supported fast-path conditions (wrapper falls back to the XLA path
otherwise — sim/robot_sim.py):
- flat terrain (``contact.flat_terrain``) — heightfield tasks keep XLA;
- B divisible by the block size (training batches are powers of two);
- spring/limit parameters static (per-env DR of contact params and base
  payload mass IS supported: they ride in as extra value rows).

Replaces the role of Isaac Gym's CUDA PhysX step (ref: SURVEY.md §2.3)
on the hot path.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..sim import kinematics as K
from ..sim.dynamics import RobotState

_EPS = 1e-12


def _row(ref, i):
    return ref[i:i + 1, :]                    # (1, blk)


def _substep_rows(model, xs, dr_rows, *, nc_dr: bool, has_bmd: bool,
                  springs_np, limits_np, dt: float):
    """Lane-major substep on (1, blk) rows. Returns output row list.

    xs: list of input rows [pos(3), quat(4), q(nj), v(nv), tau(nj)].
    dr_rows: list of DR rows ([bmd] + per-contact k/d/mu + [slip]).
    """
    nj, nv = model.nj, 6 + model.nj
    nc = len(model.contact_body)
    it = iter(xs)
    p0 = [next(it) for _ in range(3)]
    quat = [next(it) for _ in range(4)]
    q = [next(it) for _ in range(nj)]
    v = [next(it) for _ in range(nv)]
    tau_cmd = [next(it) for _ in range(nj)]

    di = iter(dr_rows)
    bmd = next(di) if has_bmd else None
    k_c = [next(di) for _ in range(nc)]
    d_c = [next(di) for _ in range(nc)]
    mu_c = [next(di) for _ in range(nc)]
    slip = next(di)

    (spring_k, spring_d, spring_set) = springs_np
    (eff, vel_lim, q_lo, q_hi, jl_k, jl_d, base_vl) = limits_np

    # --- torques: effort clip + passive springs + soft joint limits
    # (mirrors robot_sim.substep/_passive_tau exactly) -----------------------
    tau = []
    for j in range(nj):
        t = jnp.clip(tau_cmd[j], -eff[j], eff[j])
        t = t + spring_k[j] * (spring_set[j] - q[j]) - spring_d[j] * v[6 + j]
        below = jnp.maximum(q_lo[j] - q[j], 0.0)
        above = jnp.maximum(q[j] - q_hi[j], 0.0)
        lim = jl_k * (below - above)
        lim = lim - jnp.where((below > 0) | (above > 0), jl_d * v[6 + j], 0.0)
        tau.append(t + lim)

    # --- one FK pass shared by everything ----------------------------------
    chain = K.fk_chain_lm(model, p0, quat, q, v)
    cs, acs, Iws = K._com_chain(model, chain)
    M = K._assemble_M(model, chain, cs, Iws, bmd)
    bias = K._assemble_bias(model, chain, cs, acs, Iws, bmd)
    rhs = [-bias[k] for k in range(nv)]

    # --- flat-plane compliant contact, lane-major (sim/contact.py with
    # n = (0,0,1), h = 0) ----------------------------------------------------
    pos_c, vel_c = K._contact_points_lm(model, chain)
    radius = np.asarray(model.contact_radius, np.float64)
    for c in range(nc):
        pc, vc = pos_c[c], vel_c[c]
        depth = float(radius[c]) - pc[2]
        v_n = vc[2]
        fn = k_c[c] * jnp.maximum(depth, 0.0) - d_c[c] * v_n
        fn = jnp.where(depth > 0.0, jnp.maximum(fn, 0.0), 0.0)
        vt_norm = jnp.sqrt(vc[0] * vc[0] + vc[1] * vc[1])
        scale = -mu_c[c] * fn / (vt_norm + slip)
        fc = [scale * vc[0], scale * vc[1], fn]
        cols = K._point_jac_cols(model, chain, model.contact_body[c], pc)
        for i in range(3):
            rhs[i] = rhs[i] + fc[i]
        for k, col in cols.items():
            rhs[k] = rhs[k] + K._vdot(col, fc)
    for j in range(nj):
        rhs[6 + j] = rhs[6 + j] + tau[j]

    qdd = K._chol_solve_lm(M, rhs, nv)

    # --- semi-implicit Euler + Lie-group quaternion update (dynamics.
    # integrate) + velocity clamp (robot_sim.substep) ------------------------
    v_new = [v[k] + dt * qdd[k] for k in range(nv)]
    # Velocity caps BEFORE the position update (robot_sim.substep order;
    # unclamped integration overflows to inf within one decimated step).
    for k in range(6):
        v_new[k] = jnp.clip(v_new[k], -base_vl, base_vl)
    for j in range(nj):
        v_new[6 + j] = jnp.clip(v_new[6 + j], -vel_lim[j], vel_lim[j])
    pos_new = [p0[i] + dt * v_new[i] for i in range(3)]
    phi = [dt * v_new[3 + i] for i in range(3)]
    ang2 = phi[0] * phi[0] + phi[1] * phi[1] + phi[2] * phi[2]
    angle = jnp.sqrt(ang2)
    half = 0.5 * angle
    small = angle < 1e-6
    kfac = jnp.where(small, 0.5 - ang2 / 48.0,
                     jnp.sin(half) / jnp.where(small, 1.0, angle))
    bx, by, bz, bw = (phi[0] * kfac, phi[1] * kfac, phi[2] * kfac,
                      jnp.cos(half))
    ax, ay, az, aw = quat
    qx = aw * bx + ax * bw + ay * bz - az * by
    qy = aw * by - ax * bz + ay * bw + az * bx
    qz = aw * bz + ax * by - ay * bx + az * bw
    qw = aw * bw - ax * bx - ay * by - az * bz
    qn = jnp.maximum(jnp.sqrt(qx * qx + qy * qy + qz * qz + qw * qw), _EPS)
    quat_new = [qx / qn, qy / qn, qz / qn, qw / qn]
    q_new = [q[j] + dt * v_new[6 + j] for j in range(nj)]
    return pos_new + quat_new + q_new + v_new


def _kernel(xs_ref, dr_ref, out_ref, *, model, n_in, n_dr, nc_dr, has_bmd,
            springs_np, limits_np, dt):
    xs = [_row(xs_ref, i) for i in range(n_in)]
    dr = [_row(dr_ref, i) for i in range(n_dr)]
    rows = _substep_rows(model, xs, dr, nc_dr=nc_dr, has_bmd=has_bmd,
                         springs_np=springs_np, limits_np=limits_np, dt=dt)
    for i, r in enumerate(rows):
        out_ref[i:i + 1, :] = jnp.broadcast_to(r, out_ref[i:i + 1, :].shape)


def _concrete(x) -> bool:
    return not isinstance(x, jax.core.Tracer)


def supports_pallas(sim) -> bool:
    """Static eligibility of the sim for the Pallas substep path."""
    from ..sim.contact import flat_terrain

    if sim.terrain_fn is not flat_terrain:
        return False
    s = sim.springs
    return all(_concrete(x) and jnp.ndim(x) <= 1
               for x in (s.stiffness, s.damping, s.setpoint))


def pallas_substep(sim, state: RobotState, tau: jax.Array,
                   block: int = 1024,
                   interpret: Optional[bool] = None) -> RobotState:
    """One physics substep via the single Pallas kernel.

    Numerics match robot_sim.substep exactly (same op order); parity is
    asserted in tests/test_pallas_substep.py and at runtime by the A/B
    script scripts/profile_quadruped.py. ``interpret=None`` auto-selects
    interpret mode on CPU (same policy as the production linsolve,
    solver/staged_scalar._bt_solve_dispatch).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    model = sim.model
    B = state.base_pos.shape[0]
    nj, nv = model.nj, 6 + model.nj
    nc = len(model.contact_body)
    blk = min(block, B)

    # --- static parameter folding -------------------------------------------
    s = sim.springs
    springs_np = tuple(
        np.broadcast_to(np.asarray(x, np.float64), (nj,)).copy()
        for x in (s.stiffness, s.damping, s.setpoint))
    limits_np = (
        np.broadcast_to(np.asarray(model.effort_limit, np.float64), (nj,)),
        np.broadcast_to(np.asarray(model.vel_limit, np.float64), (nj,)),
        np.asarray(model.q_lower, np.float64),
        np.asarray(model.q_upper, np.float64),
        float(sim.joint_limit_stiffness), float(sim.joint_limit_damping),
        float(sim.base_vel_limit),
    )

    # --- value rows ----------------------------------------------------------
    xs = jnp.concatenate(
        [state.base_pos, state.base_quat, state.q, state.v, tau], axis=1
    ).T.astype(jnp.float32)                          # (n_in, B)
    n_in = 3 + 4 + nj + nv + nj

    c = sim.contact
    ones = jnp.ones((B, nc), jnp.float32)

    def rows_of(p):
        # broadcastable-to-(B, nc) or (B,1,1) contact param -> (nc, B)
        p = jnp.asarray(p, jnp.float32)
        p = p.reshape(p.shape[0], -1) if p.ndim == 3 else p
        return (p * ones).T

    dr_list = []
    has_bmd = sim.base_mass_delta is not None
    if has_bmd:
        dr_list.append(jnp.broadcast_to(
            jnp.asarray(sim.base_mass_delta, jnp.float32), (B,))[None, :])
    dr_list += [rows_of(c.stiffness), rows_of(c.damping), rows_of(c.friction)]
    dr_list.append(jnp.broadcast_to(
        jnp.asarray(c.slip_vel, jnp.float32), (B,))[None, :])
    dr = jnp.concatenate(dr_list, axis=0)            # (n_dr, B)
    n_dr = dr.shape[0]

    n_out = 3 + 4 + nj + nv
    kernel = functools.partial(
        _kernel, model=model, n_in=n_in, n_dr=n_dr, nc_dr=True,
        has_bmd=has_bmd, springs_np=springs_np, limits_np=limits_np,
        dt=float(sim.dt))
    out = pl.pallas_call(
        kernel,
        grid=(B // blk,),
        in_specs=[
            pl.BlockSpec((n_in, blk), lambda i: (0, i)),
            pl.BlockSpec((n_dr, blk), lambda i: (0, i)),
        ],
        out_specs=pl.BlockSpec((n_out, blk), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((n_out, B), jnp.float32),
        interpret=interpret,
    )(xs, dr)

    return RobotState(
        base_pos=out[0:3].T,
        base_quat=out[3:7].T,
        q=out[7:7 + nj].T,
        v=out[7 + nj:].T,
    )


def pallas_substep_sharded(sim, state: RobotState, tau: jax.Array,
                           mesh, axis, block: int = 1024,
                           interpret: Optional[bool] = None) -> RobotState:
    """Pallas substep composed with a device mesh via ``shard_map``.

    A bare ``pallas_call`` under a jit whose operands are sharded over a
    multi-device mesh does not partition; wrapping it in ``shard_map``
    runs one kernel instance per device on its local env shard (the same
    treatment the production linsolve got,
    tests/test_parallel.py::test_shard_map_pallas_linsolve). All
    batch-leading operands — the state, the torques, AND the traced
    per-env DR parameters (base payload mass, contact stiffness/damping/
    friction, which envs thread through the state pytree per CLAUDE.md)
    — shard on the ``axis`` mesh axis (a name or tuple of names);
    everything else replicates.
    """
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    B = state.base_pos.shape[0]
    n_shards = int(np.prod([mesh.shape[a] for a in
                            ((axis,) if isinstance(axis, str) else axis)]))
    assert B % n_shards == 0, (
        f"batch {B} not divisible by mesh extent {n_shards}")

    operands = (state, tau, sim.base_mass_delta, sim.contact)

    def spec_of(x):
        if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == B:
            return P(axis)
        return P()

    in_specs = jax.tree.map(spec_of, operands)
    out_specs = jax.tree.map(lambda _: P(axis), state)
    sim_base = sim.replace(base_mass_delta=None, shard_mesh=None)

    def local(st, tau_l, bmd, contact):
        sim_l = sim_base.replace(base_mass_delta=bmd, contact=contact)
        return pallas_substep(sim_l, st, tau_l,
                              block=min(block, B // n_shards),
                              interpret=interpret)

    return shard_map(local, mesh=mesh, in_specs=in_specs,
                     out_specs=out_specs, check_rep=False)(*operands)
