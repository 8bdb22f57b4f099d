"""Quaternion / SO(3) / angle math in pure JAX.

TPU-native replacement for the reference's pytorch3d + scipy.spatial Rotation
usage (ref: legged_gym/utils/math.py, deep_tube_learning/utils.py:82-106,
legged_gym/envs/hopper/hopper.py:38).

Conventions:
- Quaternions are ``(x, y, z, w)`` (scalar-last), matching Isaac Gym / scipy,
  unless a function name says otherwise.
- All functions are batched over leading axes and safe under jit/vmap/grad.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


def wrap_to_pi(angle: jax.Array) -> jax.Array:
    """Wrap angles to (-pi, pi]. Ref: legged_gym/utils/math.py:47-50."""
    return jnp.mod(angle + jnp.pi, 2.0 * jnp.pi) - jnp.pi


def wrap_angles(angle: jax.Array) -> jax.Array:
    """Wrap angles into [0, 2*pi). Ref: deep_tube_learning/utils.py:99-106."""
    return jnp.mod(angle, 2.0 * jnp.pi)


def quat_normalize(q: jax.Array) -> jax.Array:
    return q / jnp.clip(jnp.linalg.norm(q, axis=-1, keepdims=True), _EPS)


def quat_conjugate(q: jax.Array) -> jax.Array:
    """Conjugate of an (x,y,z,w) quaternion."""
    return jnp.concatenate([-q[..., :3], q[..., 3:4]], axis=-1)


def quat_inverse(q: jax.Array) -> jax.Array:
    """Inverse of an (x,y,z,w) quaternion (conjugate / squared norm)."""
    return quat_conjugate(q) / jnp.clip(
        jnp.sum(q * q, axis=-1, keepdims=True), _EPS
    )


def quat_mul(a: jax.Array, b: jax.Array) -> jax.Array:
    """Hamilton product of (x,y,z,w) quaternions."""
    ax, ay, az, aw = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bx, by, bz, bw = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    x = aw * bx + ax * bw + ay * bz - az * by
    y = aw * by - ax * bz + ay * bw + az * bx
    z = aw * bz + ax * by - ay * bx + az * bw
    w = aw * bw - ax * bx - ay * by - az * bz
    return jnp.stack([x, y, z, w], axis=-1)


def quat_apply(q: jax.Array, v: jax.Array) -> jax.Array:
    """Rotate vector(s) v by quaternion(s) q (x,y,z,w)."""
    u = q[..., :3]
    w = q[..., 3:4]
    t = 2.0 * jnp.cross(u, v)
    return v + w * t + jnp.cross(u, t)


def quat_rotate_inverse(q: jax.Array, v: jax.Array) -> jax.Array:
    """Rotate v by the inverse of unit quaternion q."""
    return quat_apply(quat_conjugate(q), v)


def quat_to_yaw(q: jax.Array) -> jax.Array:
    """Yaw (z euler) of an (x,y,z,w) quaternion.

    Ref: deep_tube_learning/utils.py:82-89 (quat2yaw).
    """
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    siny_cosp = 2.0 * (w * z + x * y)
    cosy_cosp = 1.0 - 2.0 * (y * y + z * z)
    return jnp.arctan2(siny_cosp, cosy_cosp)


def quat_to_euler_xyz(q: jax.Array) -> jax.Array:
    """Extrinsic x-y-z euler angles (roll, pitch, yaw) from (x,y,z,w) quat.

    Matches scipy ``Rotation.from_quat(q).as_euler('xyz')`` used by the
    reference's proj_z implementations (ref: trajopt/rom_dynamics.py:278-282).
    """
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    roll = jnp.arctan2(2.0 * (w * x + y * z), 1.0 - 2.0 * (x * x + y * y))
    pitch = jnp.arcsin(jnp.clip(2.0 * (w * y - z * x), -1.0, 1.0))
    yaw = jnp.arctan2(2.0 * (w * z + x * y), 1.0 - 2.0 * (y * y + z * z))
    return jnp.stack([roll, pitch, yaw], axis=-1)


def euler_xyz_to_quat(rpy: jax.Array) -> jax.Array:
    """(x,y,z,w) quaternion from extrinsic x-y-z euler angles."""
    half = 0.5 * rpy
    cr, cp, cy = jnp.cos(half[..., 0]), jnp.cos(half[..., 1]), jnp.cos(half[..., 2])
    sr, sp, sy = jnp.sin(half[..., 0]), jnp.sin(half[..., 1]), jnp.sin(half[..., 2])
    w = cr * cp * cy + sr * sp * sy
    x = sr * cp * cy - cr * sp * sy
    y = cr * sp * cy + sr * cp * sy
    z = cr * cp * sy - sr * sp * cy
    return jnp.stack([x, y, z, w], axis=-1)


def yaw_to_quat(yaw: jax.Array) -> jax.Array:
    """(x,y,z,w) quaternion for a pure-yaw rotation."""
    zeros = jnp.zeros_like(yaw)
    return jnp.stack(
        [zeros, zeros, jnp.sin(0.5 * yaw), jnp.cos(0.5 * yaw)], axis=-1
    )


def quat_apply_yaw(q: jax.Array, v: jax.Array) -> jax.Array:
    """Apply only the yaw component of q to v. Ref: legged_gym/utils/math.py:38-42."""
    return quat_apply(yaw_to_quat(quat_to_yaw(q)), v)


def yaw2rot(yaw: jax.Array) -> jax.Array:
    """2x2 world->body rotation for given yaw; shape (..., 2, 2).

    Ref: deep_tube_learning/utils.py:92-96 — rotates world-frame planar
    velocity into the yaw frame (R(-yaw) as row-major [[c, s], [-s, c]]).
    """
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    row0 = jnp.stack([c, s], axis=-1)
    row1 = jnp.stack([-s, c], axis=-1)
    return jnp.stack([row0, row1], axis=-2)


def quat_to_rotmat(q: jax.Array) -> jax.Array:
    """3x3 rotation matrix from (x,y,z,w) quaternion; shape (..., 3, 3)."""
    q = quat_normalize(q)
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(m.shape[:-1] + (3, 3))


def so3_log(q: jax.Array) -> jax.Array:
    """Log map of an (x,y,z,w) unit quaternion -> axis-angle vector in R^3.

    TPU-native replacement for pytorch3d ``so3_log_map`` as used by the hopper
    orientation controller (ref: legged_gym/envs/hopper/hopper.py:200-219).
    Safe (first-order expansion) near the identity.
    """
    q = quat_normalize(q)
    # Enforce w >= 0 so we take the short geodesic.
    q = jnp.where(q[..., 3:4] < 0.0, -q, q)
    v = q[..., :3]
    w = q[..., 3]
    sin_half = jnp.linalg.norm(v, axis=-1)
    half_angle = jnp.arctan2(sin_half, w)
    # scale = angle / sin(angle/2); near 0, scale -> 2.
    small = sin_half < 1e-6
    scale = jnp.where(
        small,
        2.0 + (2.0 / 3.0) * half_angle**2,  # series: 2*theta/ (theta - theta^3/6) approx
        2.0 * half_angle / jnp.where(small, 1.0, sin_half),
    )
    return v * scale[..., None]


def so3_exp(phi: jax.Array) -> jax.Array:
    """Exp map: axis-angle vector in R^3 -> (x,y,z,w) unit quaternion."""
    angle = jnp.linalg.norm(phi, axis=-1, keepdims=True)
    half = 0.5 * angle
    small = angle < 1e-6
    k = jnp.where(small, 0.5 - angle**2 / 48.0, jnp.sin(half) / jnp.where(small, 1.0, angle))
    xyz = phi * k
    w = jnp.cos(half)
    return jnp.concatenate([xyz, w], axis=-1)


def torch_rand_sqrt_float(key: jax.Array, lower: float, upper: float, shape) -> jax.Array:
    """Signed-sqrt-shaped random floats in [lower, upper].

    Ref: legged_gym/utils/math.py:53-56 — samples u ~ U(-1,1), maps through
    sign-preserving sqrt, then rescales to [lower, upper]; biases samples
    toward the interval ends (used for velocity resets).
    """
    u = jax.random.uniform(key, shape, minval=-1.0, maxval=1.0)
    r = jnp.where(u < 0.0, -jnp.sqrt(-u), jnp.sqrt(u))
    return (r + 1.0) / 2.0 * (upper - lower) + lower


def masked_update(mask: jax.Array, new: jax.Array, old: jax.Array) -> jax.Array:
    """Batched masked update: where(mask, new, old) with the (B,) mask
    broadcast over trailing dims. The standard per-env update primitive for
    this framework's masked-reset style."""
    m = mask.reshape(mask.shape + (1,) * (new.ndim - mask.ndim))
    return jnp.where(m, new, old)
