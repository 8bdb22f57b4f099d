"""Compliant sphere-vs-terrain contact model.

TPU-native replacement for PhysX contact (ref: legged_robot_config.py:216-233
solver params): a smooth penalty model — spring-damper normal force with a
regularized Coulomb friction cone — evaluated at the robot's collision
spheres against a terrain height function. Smoothness keeps the whole
simulator differentiable and branch-free (jit/vmap-friendly); stiffness and
damping map onto the reference's compliant-contact randomization
(ref: legged_robot.py:271-299).
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class ContactParams:
    stiffness: jax.Array      # () or (nc,) normal spring k
    damping: jax.Array        # () normal damper d
    friction: jax.Array       # () Coulomb mu
    slip_vel: jax.Array       # () friction regularization velocity

    @classmethod
    def create(cls, stiffness=5000.0, damping=50.0, friction=1.0,
               slip_vel=0.1):
        """Stability note (explicit penalty + semi-implicit Euler at dt):
        require damping/m_min * dt < 2 and sqrt(stiffness/m_min) * dt < 2
        for the lightest contacting body, or the contact injects energy.
        Defaults are stable for bodies >= ~0.15 kg at dt = 5 ms."""
        f = lambda v: jnp.asarray(v, jnp.float32)
        return cls(stiffness=f(stiffness), damping=f(damping),
                   friction=f(friction), slip_vel=f(slip_vel))


def flat_terrain(xy: jax.Array) -> jax.Array:
    """Height 0 everywhere (plane). Signature: (..., 2) -> (...)."""
    return jnp.zeros(xy.shape[:-1])


def contact_forces(params: ContactParams, pos: jax.Array, vel: jax.Array,
                   radius: jax.Array,
                   terrain_fn: Callable = flat_terrain) -> jax.Array:
    """World-frame forces on contact spheres.

    pos/vel: (..., nc, 3); radius: (nc,). Returns forces (..., nc, 3).
    Terrain normals are derived from the height function by autodiff, so any
    differentiable heightfield works.
    """
    xy = pos[..., :2]
    # Surface normal from height gradient: n ~ (-dh/dx, -dh/dy, 1).
    # Heightfield samplers attach an analytic fused height+gradient path
    # (utils/terrain.py make_terrain_fn) — one 4-corner gather instead of
    # a second autodiff gather pass per contact point per substep (the
    # round-5 rough-terrain hot spot); arbitrary differentiable height
    # functions fall back to autodiff.
    vag = getattr(terrain_fn, "value_and_grad", None)
    if vag is not None:
        h, g = vag(xy)
    else:
        h = terrain_fn(xy)
        grad_h = jax.grad(lambda p: terrain_fn(p[None, :])[0])
        g = jnp.vectorize(grad_h, signature="(k)->(k)")(xy)
    n = jnp.concatenate([-g, jnp.ones_like(h)[..., None]], axis=-1)
    n = n / jnp.linalg.norm(n, axis=-1, keepdims=True)

    # Penetration depth along z (spheres vs heightfield surface).
    depth = (h + radius) - pos[..., 2]
    in_contact = depth > 0.0

    v_n = jnp.sum(vel * n, axis=-1)
    fn_mag = params.stiffness * jnp.maximum(depth, 0.0) - params.damping * v_n
    fn_mag = jnp.where(in_contact, jnp.maximum(fn_mag, 0.0), 0.0)

    v_t = vel - v_n[..., None] * n
    vt_norm = jnp.linalg.norm(v_t, axis=-1, keepdims=True)
    # Regularized Coulomb: full cone at |v_t| >> slip_vel, linear near 0.
    ft = -params.friction * fn_mag[..., None] * v_t / (
        vt_norm + params.slip_vel
    )
    return fn_mag[..., None] * n + ft
