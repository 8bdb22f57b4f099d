"""Assembled batched robot simulator: dynamics + contact + actuation.

The framework's Isaac Gym replacement at the stepping level (ref:
legged_robot.py:125-148 step/decimation structure): a ``RobotSim`` holds the
model + contact/terrain parameters and exposes

    state' = sim.substep(state, tau)        # one physics step (sim dt)
    state' = sim.step(state, torque_fn)     # decimation x substeps with a
                                            # torque callback per substep
                                            # (ref: legged_robot.py:134-140)

Joint-level passive springs/dampers support the hopper's spring-loaded foot
(ref: hopper_config.py:74-78) and actuator armature-free PD control lives in
the env layer, mirroring the reference's _compute_torques split.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import struct

from .contact import ContactParams, contact_forces, flat_terrain
from .dynamics import RobotModel, RobotState, integrate
from .kinematics import substep_core


@struct.dataclass
class JointSprings:
    """Passive per-joint spring/damper to a setpoint (hopper foot spring,
    ref hopper.py:168-237 stance force)."""

    stiffness: jax.Array   # (nj,)
    damping: jax.Array     # (nj,)
    setpoint: jax.Array    # (nj,)

    @classmethod
    def zero(cls, nj: int):
        return cls(stiffness=jnp.zeros(nj), damping=jnp.zeros(nj),
                   setpoint=jnp.zeros(nj))


@struct.dataclass
class RobotSim:
    model: RobotModel
    contact: ContactParams
    springs: JointSprings
    # Optional per-env payload mass on the base body (B,) — domain
    # randomization (ref legged_robot.py _process_rigid_body_props). Envs
    # thread per-reset values via ``sim.replace(base_mass_delta=...)``;
    # per-env friction rides the same way through ``contact.friction``
    # shaped (B, 1, 1).
    base_mass_delta: Optional[jax.Array] = None
    dt: float = struct.field(pytree_node=False, default=0.005)
    decimation: int = struct.field(pytree_node=False, default=4)
    terrain_fn: Callable = struct.field(pytree_node=False,
                                        default=flat_terrain)
    joint_limit_stiffness: float = struct.field(pytree_node=False,
                                                default=1000.0)
    joint_limit_damping: float = struct.field(pytree_node=False, default=10.0)
    # Base linear/angular velocity cap (ref legged_robot_config.py:121-122:
    # Isaac Gym asset options max_linear_velocity/max_angular_velocity =
    # 1000). Load-bearing for stability: with the explicit integrator a
    # contact blow-up can overflow to inf within one decimated step —
    # before the env-level termination can reset the env — and inf-inf
    # NaNs then poison the whole PPO batch (observed: anymal_c_trajectory
    # training NaN'd abruptly at iter ~1759, docs/PERF.md round 4).
    base_vel_limit: float = struct.field(pytree_node=False, default=1000.0)
    # Route substeps through the single-kernel Pallas physics step
    # (ops/pallas_substep.py) — measured 1.2x (hopper) / 1.7x (ANYmal-C)
    # vs the XLA scalar-graph path at B=4096 on chip (docs/PERF.md).
    # Tri-state: None = auto (DEFAULT-ON on TPU backends whenever
    # ``supports_pallas(self)`` holds — flat terrain, static spring params
    # — and the batch divides the block size; always off on CPU, where
    # interpret mode would be pathologically slow), True/False force.
    # Env var LGDT_PALLAS_SUBSTEP=1/0 forces from the environment.
    use_pallas_substep: Optional[bool] = struct.field(pytree_node=False,
                                                      default=None)
    # Optional ``(mesh, axis)`` for multi-chip training: a bare
    # pallas_call does not partition under a sharded jit, so when set the
    # substep wraps the kernel in shard_map over the batch axis (one
    # kernel instance per device on its local env shard — the linsolve's
    # treatment, docs/PERF.md). ``OnPolicyRunner(mesh=...)`` sets this
    # automatically.
    shard_mesh: Optional[tuple] = struct.field(pytree_node=False,
                                               default=None)

    @classmethod
    def create(cls, model, contact=None, springs=None, dt=0.005, decimation=4,
               terrain_fn=flat_terrain, **kw):
        import os

        env_flag = os.environ.get("LGDT_PALLAS_SUBSTEP", "")
        if env_flag in ("0", "1"):
            kw.setdefault("use_pallas_substep", env_flag == "1")
        return cls(
            model=model,
            contact=contact or ContactParams.create(),
            springs=springs or JointSprings.zero(model.nj),
            dt=float(dt), decimation=int(decimation), terrain_fn=terrain_fn,
            **kw,
        )

    # ------------------------------------------------------------------
    def default_state(self, batch: int, base_pos=(0.0, 0.0, 1.0),
                      q: Optional[jax.Array] = None) -> RobotState:
        nj = self.model.nj
        return RobotState(
            base_pos=jnp.broadcast_to(jnp.asarray(base_pos, jnp.float32),
                                      (batch, 3)),
            base_quat=jnp.broadcast_to(
                jnp.asarray([0.0, 0.0, 0.0, 1.0]), (batch, 4)
            ),
            q=(jnp.zeros((batch, nj)) if q is None
               else jnp.broadcast_to(q, (batch, nj))),
            v=jnp.zeros((batch, 6 + nj)),
        )

    def _passive_tau(self, state: RobotState) -> jax.Array:
        """Joint springs/dampers + soft joint-limit forces."""
        tau = (
            self.springs.stiffness * (self.springs.setpoint - state.q)
            - self.springs.damping * state.v[..., 6:]
        )
        # Soft limits (penalty) keep q in [lower, upper].
        below = jnp.maximum(self.model.q_lower - state.q, 0.0)
        above = jnp.maximum(state.q - self.model.q_upper, 0.0)
        lim = self.joint_limit_stiffness * (below - above)
        lim = lim - jnp.where(
            (below > 0) | (above > 0),
            self.joint_limit_damping * state.v[..., 6:], 0.0,
        )
        return tau + lim

    def substep(self, state: RobotState, tau: jax.Array) -> RobotState:
        """One physics step at self.dt with applied joint torques tau."""
        use_pallas = self.use_pallas_substep
        if use_pallas is None:                      # auto: on for real TPUs
            use_pallas = jax.default_backend() != "cpu"
        if use_pallas:
            from ..ops.pallas_substep import (
                pallas_substep,
                pallas_substep_sharded,
                supports_pallas,
            )

            B = state.base_pos.shape[0]
            if supports_pallas(self) and B % min(1024, B) == 0:
                if self.shard_mesh is not None:
                    mesh, axis = self.shard_mesh
                    return pallas_substep_sharded(self, state, tau, mesh,
                                                  axis, block=1024)
                return pallas_substep(self, state, tau, block=1024)
        tau = jnp.clip(tau, -self.model.effort_limit, self.model.effort_limit)
        tau = tau + self._passive_tau(state)

        # Fused scalar-graph pass (kinematics.substep_core): one FK chain
        # traversal shared by M, bias, contact, and the unrolled solve.
        qdd = substep_core(
            self.model, state, tau,
            lambda pos, vel: contact_forces(
                self.contact, pos, vel, self.model.contact_radius,
                self.terrain_fn),
            base_mass_delta=self.base_mass_delta,
        )
        # Velocity caps BEFORE the position update (PhysX enforces URDF
        # velocity limits and max_linear/angular_velocity at the solver
        # level; a penalty force here would be explicit and unstable for
        # gram-scale link inertias). Clamping after integrating positions
        # is not enough: one substep with an unclamped 1e5-scale velocity
        # moves kilometers, the next substep's contact force overflows,
        # and inf arrives within a single decimated step (the a1 NaN,
        # docs/PERF.md round 4) — clamped-velocity integration bounds the
        # per-substep excursion to base_vel_limit * dt. Semi-implicit
        # Euler inlined (dynamics.integrate with the clamp inserted
        # between the velocity and position updates; the Pallas substep
        # kernel mirrors this op order exactly).
        from .dynamics import quat_mul, quat_normalize, so3_exp

        v_cap = jnp.concatenate([
            jnp.broadcast_to(jnp.asarray(self.base_vel_limit, jnp.float32),
                             (6,)),
            jnp.asarray(self.model.vel_limit, jnp.float32),
        ])
        v_new = jnp.clip(state.v + self.dt * qdd, -v_cap, v_cap)
        base_pos = state.base_pos + self.dt * v_new[..., :3]
        dq_quat = so3_exp(self.dt * v_new[..., 3:6])
        base_quat = quat_normalize(quat_mul(state.base_quat, dq_quat))
        q = state.q + self.dt * v_new[..., 6:]
        return RobotState(base_pos=base_pos, base_quat=base_quat, q=q,
                          v=v_new)

    def step(self, state: RobotState,
             torque_fn: Callable[[RobotState], jax.Array]) -> RobotState:
        """Decimated control step: recompute torques each substep
        (ref legged_robot.py:134-140)."""

        def body(s, _):
            return self.substep(s, torque_fn(s)), None

        state, _ = jax.lax.scan(body, state, None, length=self.decimation)
        return state

    def step_with_carry(self, state: RobotState, carry,
                        torque_fn: Callable) -> tuple:
        """Decimated step with a stateful torque controller:
        ``torque_fn(carry, robot) -> (carry, tau)`` — e.g. the LSTM actuator
        network whose hidden state advances every substep
        (ref anymal.py:71-81)."""

        def body(sc, _):
            s, c = sc
            c, tau = torque_fn(c, s)
            return (self.substep(s, tau), c), None

        (state, carry), _ = jax.lax.scan(
            body, (state, carry), None, length=self.decimation
        )
        return state, carry
