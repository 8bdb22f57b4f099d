"""Hand-designed tracking controllers.

Re-design of the reference controllers (ref: deep_tube_learning/controllers.py)
as pure JAX functions: the Raibert heuristic hopper policy and the
double-integrator-tracking-single-integrator PD law used by data collection
and closed-loop evaluation.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from flax import struct

from .core.maths import quat_to_yaw


def omega_to_quat(omega_pitch, omega_roll, omega_yaw):
    """Euler (pitch, roll, yaw) -> (w,x,y,z) quaternion as the reference
    builds it (ref controllers.py:22-35)."""
    cy, sy = jnp.cos(omega_yaw * 0.5), jnp.sin(omega_yaw * 0.5)
    cp, sp = jnp.cos(omega_pitch * 0.5), jnp.sin(omega_pitch * 0.5)
    cr, sr = jnp.cos(omega_roll * 0.5), jnp.sin(omega_roll * 0.5)
    w = cr * cp * cy + sr * sp * sy
    x = sr * cp * cy - cr * sp * sy
    y = cr * sp * cy + sr * cp * sy
    z = cr * cp * sy - sr * sp * cy
    return jnp.stack((w, x, y, z), axis=-1)


@struct.dataclass
class RaibertHeuristic:
    """Raibert-style hopper orientation policy (ref controllers.py:4-73).

    Maps [pos_err(2), vel(2), des_vel(2), quat_xyzw(4)] observations to a
    desired orientation quaternion (w,x,y,z) action.
    """

    Kp: jax.Array
    Kv: jax.Array
    Kff: jax.Array
    clip_pos: jax.Array
    clip_vel: jax.Array
    clip_ang: jax.Array

    @classmethod
    def create(cls, Kp, Kv, Kff, clip_pos, clip_vel, clip_ang):
        f = lambda v: jnp.asarray(v, jnp.float32)
        return cls(Kp=f(Kp), Kv=f(Kv), Kff=f(Kff), clip_pos=f(clip_pos),
                   clip_vel=f(clip_vel), clip_ang=f(clip_ang))

    def __call__(self, obs: jax.Array) -> jax.Array:
        """Ref controllers.py:38-65 (sign conventions preserved)."""
        pos_error_x = obs[:, 0]
        pos_error_y = -obs[:, 1]
        cur_err_vel_x = -obs[:, 2]
        cur_err_vel_y = obs[:, 3]
        des_vel_x = obs[:, 4]
        des_vel_y = -obs[:, 5]

        pitch_pos = jnp.clip(-self.Kp * pos_error_x, -self.clip_pos, self.clip_pos)
        roll_pos = jnp.clip(-self.Kp * pos_error_y, -self.clip_pos, self.clip_pos)
        vel_x = jnp.clip(-self.Kv * cur_err_vel_x + self.Kff * des_vel_x,
                         -self.clip_vel, self.clip_vel)
        vel_y = jnp.clip(-self.Kv * cur_err_vel_y + self.Kff * des_vel_y,
                         -self.clip_vel, self.clip_vel)
        omega_pitch = jnp.clip(pitch_pos + vel_x, -self.clip_ang, self.clip_ang)
        omega_roll = jnp.clip(roll_pos + vel_y, -self.clip_ang, self.clip_ang)
        yaw = quat_to_yaw(obs[:, 6:10])
        return omega_to_quat(omega_pitch, omega_roll, yaw)


@struct.dataclass
class DoubleSingleTracking:
    """PD law for a double integrator tracking a single-int plan with
    state-dependent input-bound projection (ref controllers.py:80-92).

    Observation layout: [x (4), z_des (2), v_des (2)].
    """

    Kp: jax.Array
    Kd: jax.Array
    clip_v_z: Callable = struct.field(pytree_node=False)

    @classmethod
    def create(cls, Kp, Kd, clip_v_z):
        return cls(Kp=jnp.asarray(Kp, jnp.float32),
                   Kd=jnp.asarray(Kd, jnp.float32), clip_v_z=clip_v_z)

    def __call__(self, obs: jax.Array) -> jax.Array:
        x = obs[:, :4]
        z_des = obs[:, 4:6]
        v_des = obs[:, 6:8]
        u = self.Kp * (z_des - x[:, :2]) + self.Kd * (v_des - x[:, 2:])
        return self.clip_v_z(x, u)
