"""Reduced-order-model (ROM) dynamics zoo as pure, batched JAX functions.

TPU-native re-design of the reference's triple-backend (casadi/numpy/torch)
``RomDynamics`` hierarchy (ref: trajopt/rom_dynamics.py:10-438 and
trajopt/casadi_rom_dynamics.py). A single JAX implementation serves all three
roles: traced under ``jit`` it is the "symbolic" planning twin (jax.grad /
jacfwd replace CasADi AD), eagerly it is the numpy backend, and batched it is
the torch backend.

Each ROM is a ``flax.struct.dataclass`` pytree: bounds/dt are leaves (so they
can be vmapped / domain-randomized per scenario), while the model family is
encoded in the Python type (static under jit). All methods take a leading
batch axis ``(B, n)`` / ``(B, m)`` and are safe under jit/vmap/grad.

State conventions:
- ``x`` (full-order state) is the 13-dim rigid-body CoM state
  ``[p(3), quat_xyzw(4), lin_vel(3), ang_vel(3)]`` as in Isaac Gym root states.
- ``z`` is the ROM state, ``v`` the ROM input.
"""
from __future__ import annotations

from typing import ClassVar, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from .maths import quat_to_euler_xyz, yaw2rot


@struct.dataclass
class RomDynamics:
    """Base ROM: discrete dynamics + projection + input governance.

    Fields are pytree leaves; subclasses define ``n`` / ``m`` as class vars.
    Ref: trajopt/rom_dynamics.py:10-118.
    """

    n: ClassVar[int]
    m: ClassVar[int]

    dt: jax.Array
    z_min: jax.Array  # (n,)
    z_max: jax.Array  # (n,)
    v_min: jax.Array  # (m,)
    v_max: jax.Array  # (m,)

    @classmethod
    def create(cls, dt, z_min, z_max, v_min, v_max) -> "RomDynamics":
        return cls(
            dt=jnp.asarray(dt, jnp.float32),
            z_min=jnp.asarray(z_min, jnp.float32),
            z_max=jnp.asarray(z_max, jnp.float32),
            v_min=jnp.asarray(v_min, jnp.float32),
            v_max=jnp.asarray(v_max, jnp.float32),
        )

    # ---- interface -------------------------------------------------------
    def f(self, z: jax.Array, v: jax.Array) -> jax.Array:
        """Discrete dynamics z_{k+1} = f(z_k, v_k), batched (B, n)."""
        raise NotImplementedError

    def proj_z(self, x: jax.Array) -> jax.Array:
        """Project the 13-dim rigid-body state onto the ROM state (B, n)."""
        raise NotImplementedError

    def des_pose_vel(self, z, v) -> Tuple[jax.Array, jax.Array]:
        """Desired (x, y, yaw) pose and (vx, vy, yawdot) velocity (B, 3) each."""
        raise NotImplementedError

    @property
    def vel_inds(self) -> jax.Array:
        """Boolean mask over z marking velocity-like states (B-independent)."""
        return jnp.zeros((self.n,), dtype=bool)

    # ---- input governance ------------------------------------------------
    def clip_v(self, v: jax.Array) -> jax.Array:
        return jnp.clip(v, self.v_min, self.v_max)

    def compute_state_dependent_input_bounds(self, z: jax.Array):
        """Input bounds that also respect velocity state bounds at z.

        Default: state-independent (ref: rom_dynamics.py:106-107).
        """
        B = z.shape[0]
        return (
            jnp.broadcast_to(self.v_min, (B, self.m)),
            jnp.broadcast_to(self.v_max, (B, self.m)),
        )

    def clip_v_z(self, z: jax.Array, v: jax.Array) -> jax.Array:
        v_min_z, v_max_z = self.compute_state_dependent_input_bounds(z)
        return jnp.clip(v, v_min_z, v_max_z)

    def weighting_vector(self, w) -> jax.Array:
        """Per-dim reward weights from a RewardWeighting config (ref :178-180)."""
        raise NotImplementedError

    # ---- entry ("scalar graph") form --------------------------------------
    # The staged tube solver keeps every per-stage quantity as a list of
    # flat arrays — one per state/input coordinate — so XLA never sees a
    # tiny minor dimension that would pad to an (8, 128) TPU tile (same
    # trick as sim/kinematics.py). These methods express the dynamics and
    # their exact Jacobians in that form; entries may be Python float 0.0
    # (symbolic zero, skipped at trace time) or broadcastable arrays.

    def f_entries(self, z_e, v_e):
        """Entry-form dynamics: lists of coordinate arrays -> list of n.

        Default falls back to the array form (subclasses override with the
        closed-form scalar graph)."""
        z = jnp.stack(list(z_e), axis=-1)
        v = jnp.stack(list(v_e), axis=-1)
        out = self.f(z, v)
        return [out[..., i] for i in range(self.n)]

    def f_jac_entries(self, z_e, v_e):
        """Exact per-coordinate Jacobians of ``f``: (A, B) nested lists with
        A[i][j] = df_i/dz_j and B[i][j] = df_i/dv_j; entries are arrays
        broadcastable against the inputs, or float 0.0/1.0 constants."""
        raise NotImplementedError


@struct.dataclass
class SingleInt2D(RomDynamics):
    """2D single integrator: z=[x,y], v=[vx,vy]. Ref: rom_dynamics.py:182-211."""

    n: ClassVar[int] = 2
    m: ClassVar[int] = 2

    def f(self, z, v):
        return z + self.dt * v

    def proj_z(self, x):
        return x[..., :2]

    def des_pose_vel(self, z, v):
        yaw = jnp.arctan2(v[:, 1], v[:, 0])
        pose = jnp.concatenate([z, yaw[:, None]], axis=-1)
        vel = jnp.concatenate([v, jnp.zeros_like(v[:, :1])], axis=-1)
        return pose, vel

    def weighting_vector(self, w):
        return jnp.array([w.position, w.position], jnp.float32)

    def f_entries(self, z_e, v_e):
        return [z_e[0] + self.dt * v_e[0], z_e[1] + self.dt * v_e[1]]

    def f_jac_entries(self, z_e, v_e):
        dt = self.dt
        return ([[1.0, 0.0], [0.0, 1.0]], [[dt, 0.0], [0.0, dt]])


@struct.dataclass
class DoubleInt2D(RomDynamics):
    """2D double integrator: z=[x,y,vx,vy], v=[ax,ay]. Ref: rom_dynamics.py:214-260."""

    n: ClassVar[int] = 4
    m: ClassVar[int] = 2

    def f(self, z, v):
        pos = z[..., :2] + self.dt * z[..., 2:]
        vel = z[..., 2:] + self.dt * v
        return jnp.concatenate([pos, vel], axis=-1)

    def proj_z(self, x):
        return jnp.concatenate([x[..., :2], x[..., 7:9]], axis=-1)

    def des_pose_vel(self, z, v):
        yaw = jnp.arctan2(z[:, 3], z[:, 2])
        pose = jnp.concatenate([z[:, :2], yaw[:, None]], axis=-1)
        vel = jnp.concatenate([z[:, 2:], jnp.zeros_like(z[:, :1])], axis=-1)
        return pose, vel

    @property
    def vel_inds(self):
        return jnp.array([False, False, True, True])

    def compute_state_dependent_input_bounds(self, z):
        """Shrink accel bounds so velocities stay inside [z_min, z_max].

        Ref: rom_dynamics.py:234-246.
        """
        v_max_z = jnp.minimum(self.v_max, (self.z_max[2:] - z[:, 2:]) / self.dt)
        v_min_z = jnp.maximum(self.v_min, (self.z_min[2:] - z[:, 2:]) / self.dt)
        return v_min_z, v_max_z

    def weighting_vector(self, w):
        return jnp.array(
            [w.position, w.position, w.velocity, w.velocity], jnp.float32
        )

    def f_entries(self, z_e, v_e):
        dt = self.dt
        return [z_e[0] + dt * z_e[2], z_e[1] + dt * z_e[3],
                z_e[2] + dt * v_e[0], z_e[3] + dt * v_e[1]]

    def f_jac_entries(self, z_e, v_e):
        dt = self.dt
        A = [[1.0, 0.0, dt, 0.0], [0.0, 1.0, 0.0, dt],
             [0.0, 0.0, 1.0, 0.0], [0.0, 0.0, 0.0, 1.0]]
        B = [[0.0, 0.0], [0.0, 0.0], [dt, 0.0], [0.0, dt]]
        return A, B


@struct.dataclass
class Unicycle(RomDynamics):
    """Unicycle: z=[x,y,th], v=[v,om]. Ref: rom_dynamics.py:263-305."""

    n: ClassVar[int] = 3
    m: ClassVar[int] = 2

    def f(self, z, v):
        dx = v[..., 0] * jnp.cos(z[..., 2])
        dy = v[..., 0] * jnp.sin(z[..., 2])
        dth = v[..., 1]
        return z + self.dt * jnp.stack([dx, dy, dth], axis=-1)

    def proj_z(self, x):
        yaw = quat_to_euler_xyz(x[..., 3:7])[..., 2]
        return jnp.concatenate([x[..., :2], yaw[..., None]], axis=-1)

    def des_pose_vel(self, z, v):
        vx = v[:, 0] * jnp.cos(z[:, 2])
        vy = v[:, 0] * jnp.sin(z[:, 2])
        om = v[:, 1]
        return z[:, :3], jnp.stack([vx, vy, om], axis=-1)

    def weighting_vector(self, w):
        return jnp.array([w.position, w.position, w.orientation], jnp.float32)

    def f_entries(self, z_e, v_e):
        dt = self.dt
        c, s = jnp.cos(z_e[2]), jnp.sin(z_e[2])
        return [z_e[0] + dt * v_e[0] * c, z_e[1] + dt * v_e[0] * s,
                z_e[2] + dt * v_e[1]]

    def f_jac_entries(self, z_e, v_e):
        dt = self.dt
        c, s = jnp.cos(z_e[2]), jnp.sin(z_e[2])
        A = [[1.0, 0.0, -dt * v_e[0] * s],
             [0.0, 1.0, dt * v_e[0] * c],
             [0.0, 0.0, 1.0]]
        B = [[dt * c, 0.0], [dt * s, 0.0], [0.0, dt]]
        return A, B


@struct.dataclass
class LateralUnicycle(Unicycle):
    """Unicycle with lateral slip input: v=[v, v_perp, om]. Ref :307-333."""

    n: ClassVar[int] = 3
    m: ClassVar[int] = 3

    def f(self, z, v):
        c, s = jnp.cos(z[..., 2]), jnp.sin(z[..., 2])
        dx = v[..., 0] * c - v[..., 1] * s
        dy = v[..., 0] * s + v[..., 1] * c
        dth = v[..., 2]
        return z + self.dt * jnp.stack([dx, dy, dth], axis=-1)

    def des_pose_vel(self, z, v):
        c, s = jnp.cos(z[:, 2]), jnp.sin(z[:, 2])
        vx = v[:, 0] * c - v[:, 1] * s
        vy = v[:, 0] * s + v[:, 1] * c
        # Ref uses v[:,1] here (rom_dynamics.py:321); keep parity.
        om = v[:, 1]
        return z[:, :3], jnp.stack([vx, vy, om], axis=-1)

    def weighting_vector(self, w):
        return jnp.array(
            [w.position, w.position, w.orientation, w.velocity, w.velocity,
             w.angular_velocity],
            jnp.float32,
        )

    def f_entries(self, z_e, v_e):
        dt = self.dt
        c, s = jnp.cos(z_e[2]), jnp.sin(z_e[2])
        return [z_e[0] + dt * (v_e[0] * c - v_e[1] * s),
                z_e[1] + dt * (v_e[0] * s + v_e[1] * c),
                z_e[2] + dt * v_e[2]]

    def f_jac_entries(self, z_e, v_e):
        dt = self.dt
        c, s = jnp.cos(z_e[2]), jnp.sin(z_e[2])
        A = [[1.0, 0.0, dt * (-v_e[0] * s - v_e[1] * c)],
             [0.0, 1.0, dt * (v_e[0] * c - v_e[1] * s)],
             [0.0, 0.0, 1.0]]
        B = [[dt * c, -dt * s, 0.0], [dt * s, dt * c, 0.0], [0.0, 0.0, dt]]
        return A, B


@struct.dataclass
class ExtendedUnicycle(Unicycle):
    """Unicycle with vel states: z=[x,y,th,v,om], v=[a,al]. Ref :336-394."""

    n: ClassVar[int] = 5
    m: ClassVar[int] = 2

    def f(self, z, v):
        dx = z[..., 3] * jnp.cos(z[..., 2])
        dy = z[..., 3] * jnp.sin(z[..., 2])
        dth = z[..., 4]
        dv = v[..., 0]
        dom = v[..., 1]
        return z + self.dt * jnp.stack([dx, dy, dth, dv, dom], axis=-1)

    def proj_z(self, x):
        eul = quat_to_euler_xyz(x[..., 3:7])
        yaw = eul[..., 2]
        v_world = x[..., 7:9]
        v_local = jnp.einsum("...ij,...j->...i", yaw2rot(yaw), v_world)
        return jnp.concatenate(
            [x[..., :2], yaw[..., None], v_local[..., :1], x[..., 12:13]],
            axis=-1,
        )

    def des_pose_vel(self, z, v):
        vx = z[:, 3] * jnp.cos(z[:, 2])
        vy = z[:, 3] * jnp.sin(z[:, 2])
        om = z[:, 4]
        return z[:, :3], jnp.stack([vx, vy, om], axis=-1)

    @property
    def vel_inds(self):
        return jnp.array([False, False, False, True, True])

    def compute_state_dependent_input_bounds(self, z):
        """Ref: rom_dynamics.py:367-379."""
        v_max_z = jnp.minimum(self.v_max, (self.z_max[3:] - z[:, 3:]) / self.dt)
        v_min_z = jnp.maximum(self.v_min, (self.z_min[3:] - z[:, 3:]) / self.dt)
        return v_min_z, v_max_z

    def clip_v_z(self, z, v):
        v_min_z, v_max_z = self.compute_state_dependent_input_bounds(z)
        return jnp.clip(v, v_min_z, v_max_z)

    def weighting_vector(self, w):
        return jnp.array(
            [w.position, w.position, w.orientation, w.velocity,
             w.angular_velocity],
            jnp.float32,
        )

    def f_entries(self, z_e, v_e):
        dt = self.dt
        c, s = jnp.cos(z_e[2]), jnp.sin(z_e[2])
        return [z_e[0] + dt * z_e[3] * c, z_e[1] + dt * z_e[3] * s,
                z_e[2] + dt * z_e[4], z_e[3] + dt * v_e[0],
                z_e[4] + dt * v_e[1]]

    def f_jac_entries(self, z_e, v_e):
        dt = self.dt
        c, s = jnp.cos(z_e[2]), jnp.sin(z_e[2])
        A = [[1.0, 0.0, -dt * z_e[3] * s, dt * c, 0.0],
             [0.0, 1.0, dt * z_e[3] * c, dt * s, 0.0],
             [0.0, 0.0, 1.0, 0.0, dt],
             [0.0, 0.0, 0.0, 1.0, 0.0],
             [0.0, 0.0, 0.0, 0.0, 1.0]]
        B = [[0.0, 0.0], [0.0, 0.0], [0.0, 0.0], [dt, 0.0], [0.0, dt]]
        return A, B


@struct.dataclass
class ExtendedLateralUnicycle(ExtendedUnicycle):
    """z=[x,y,th,v,v_perp,om], v=[a,a_perp,al]. Ref: rom_dynamics.py:397-438."""

    n: ClassVar[int] = 6
    m: ClassVar[int] = 3

    def f(self, z, v):
        c, s = jnp.cos(z[..., 2]), jnp.sin(z[..., 2])
        dx = z[..., 3] * c - z[..., 4] * s
        dy = z[..., 3] * s + z[..., 4] * c
        dth = z[..., 5]
        return z + self.dt * jnp.concatenate(
            [jnp.stack([dx, dy, dth], axis=-1), v], axis=-1
        )

    def proj_z(self, x):
        eul = quat_to_euler_xyz(x[..., 3:7])
        yaw = eul[..., 2]
        v_world = x[..., 7:9]
        v_local = jnp.einsum("...ij,...j->...i", yaw2rot(yaw), v_world)
        return jnp.concatenate(
            [x[..., :2], yaw[..., None], v_local, x[..., 12:13]], axis=-1
        )

    def des_pose_vel(self, z, v):
        c, s = jnp.cos(z[:, 2]), jnp.sin(z[:, 2])
        vx = z[:, 3] * c - z[:, 4] * s
        vy = z[:, 3] * s + z[:, 4] * c
        om = z[:, 5]
        return z[:, :3], jnp.stack([vx, vy, om], axis=-1)

    @property
    def vel_inds(self):
        return jnp.array([False, False, False, True, True, True])

    def weighting_vector(self, w):
        return jnp.array(
            [w.position, w.position, w.orientation, w.velocity, w.velocity,
             w.angular_velocity],
            jnp.float32,
        )

    def f_entries(self, z_e, v_e):
        dt = self.dt
        c, s = jnp.cos(z_e[2]), jnp.sin(z_e[2])
        return [z_e[0] + dt * (z_e[3] * c - z_e[4] * s),
                z_e[1] + dt * (z_e[3] * s + z_e[4] * c),
                z_e[2] + dt * z_e[5], z_e[3] + dt * v_e[0],
                z_e[4] + dt * v_e[1], z_e[5] + dt * v_e[2]]

    def f_jac_entries(self, z_e, v_e):
        dt = self.dt
        c, s = jnp.cos(z_e[2]), jnp.sin(z_e[2])
        A = [[1.0, 0.0, dt * (-z_e[3] * s - z_e[4] * c), dt * c, -dt * s, 0.0],
             [0.0, 1.0, dt * (z_e[3] * c - z_e[4] * s), dt * s, dt * c, 0.0],
             [0.0, 0.0, 1.0, 0.0, 0.0, dt],
             [0.0, 0.0, 0.0, 1.0, 0.0, 0.0],
             [0.0, 0.0, 0.0, 0.0, 1.0, 0.0],
             [0.0, 0.0, 0.0, 0.0, 0.0, 1.0]]
        B = [[0.0, 0.0, 0.0], [0.0, 0.0, 0.0], [0.0, 0.0, 0.0],
             [dt, 0.0, 0.0], [0.0, dt, 0.0], [0.0, 0.0, dt]]
        return A, B


ROM_REGISTRY = {
    "SingleInt2D": SingleInt2D,
    "DoubleInt2D": DoubleInt2D,
    "Unicycle": Unicycle,
    "LateralUnicycle": LateralUnicycle,
    "ExtendedUnicycle": ExtendedUnicycle,
    "ExtendedLateralUnicycle": ExtendedLateralUnicycle,
}


def make_rom(name: str, dt, z_min, z_max, v_min, v_max) -> RomDynamics:
    """Explicit registry lookup (replaces the reference's ``globals()[cls]``,
    ref: legged_robot_trajectory.py:92)."""
    try:
        cls = ROM_REGISTRY[name]
    except KeyError:
        raise ValueError(
            f"Unknown ROM '{name}'. Known: {sorted(ROM_REGISTRY)}"
        ) from None
    return cls.create(dt, z_min, z_max, v_min, v_max)
