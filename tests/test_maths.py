"""Golden-value tests for core quaternion/SO(3) math vs scipy."""
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

import jax
import jax.numpy as jnp

from legged_gym_dev_tpu.core import maths


def random_quats(n, seed=0):
    rng = np.random.default_rng(seed)
    q = rng.normal(size=(n, 4))
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def test_quat_to_euler_matches_scipy():
    q = random_quats(64)
    eul = np.asarray(maths.quat_to_euler_xyz(jnp.asarray(q)))
    ref = Rotation.from_quat(q).as_euler("xyz")
    np.testing.assert_allclose(eul, ref, atol=1e-5)


def test_quat_to_yaw_matches_scipy():
    q = random_quats(64, seed=1)
    yaw = np.asarray(maths.quat_to_yaw(jnp.asarray(q)))
    ref = Rotation.from_quat(q).as_euler("xyz")[:, 2]
    np.testing.assert_allclose(yaw, ref, atol=1e-5)


def test_quat_apply_matches_scipy():
    q = random_quats(32, seed=2)
    v = np.random.default_rng(3).normal(size=(32, 3))
    out = np.asarray(maths.quat_apply(jnp.asarray(q), jnp.asarray(v)))
    ref = Rotation.from_quat(q).apply(v)
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_quat_mul_matches_scipy():
    qa, qb = random_quats(16, 4), random_quats(16, 5)
    out = np.asarray(maths.quat_mul(jnp.asarray(qa), jnp.asarray(qb)))
    ref = (Rotation.from_quat(qa) * Rotation.from_quat(qb)).as_quat()
    # Quaternion double-cover: compare up to sign.
    sign = np.sign(np.sum(out * ref, axis=-1, keepdims=True))
    np.testing.assert_allclose(out, sign * ref, atol=1e-5)


def test_quat_inverse_roundtrip():
    q = random_quats(16, 6)
    qi = maths.quat_inverse(jnp.asarray(q))
    ident = np.asarray(maths.quat_mul(jnp.asarray(q), qi))
    np.testing.assert_allclose(ident[:, :3], 0.0, atol=1e-5)
    np.testing.assert_allclose(np.abs(ident[:, 3]), 1.0, atol=1e-5)


def test_so3_log_matches_scipy_rotvec():
    q = random_quats(64, seed=7)
    out = np.asarray(maths.so3_log(jnp.asarray(q)))
    ref = Rotation.from_quat(q).as_rotvec()
    # Compare up to the 2*pi*axis ambiguity by comparing rotations.
    back = Rotation.from_rotvec(out)
    diff = (back * Rotation.from_quat(q).inv()).magnitude()
    np.testing.assert_allclose(diff, 0.0, atol=1e-4)


def test_so3_exp_log_roundtrip():
    rng = np.random.default_rng(8)
    phi = rng.normal(size=(64, 3))
    q = maths.so3_exp(jnp.asarray(phi))
    phi2 = np.asarray(maths.so3_log(q))
    # Roundtrip valid for |phi| < pi
    mask = np.linalg.norm(phi, axis=-1) < np.pi
    np.testing.assert_allclose(phi2[mask], phi[mask], atol=1e-4)


def test_so3_log_near_identity():
    q = jnp.asarray([[1e-9, 0.0, 0.0, 1.0]])
    out = maths.so3_log(q)
    assert np.all(np.isfinite(np.asarray(out)))
    np.testing.assert_allclose(np.asarray(out), [[2e-9, 0, 0]], atol=1e-8)


def test_wrap_to_pi():
    a = jnp.asarray([0.0, np.pi + 0.1, -np.pi - 0.1, 4 * np.pi + 0.5])
    out = np.asarray(maths.wrap_to_pi(a))
    np.testing.assert_allclose(out, [0.0, -np.pi + 0.1, np.pi - 0.1, 0.5], atol=1e-5)


def test_yaw2rot_rotates_world_to_body():
    yaw = jnp.asarray([np.pi / 2])
    v_world = jnp.asarray([[1.0, 0.0]])
    v_body = np.asarray(
        jnp.einsum("...ij,...j->...i", maths.yaw2rot(yaw), v_world)
    )
    # Heading +y in world, moving +x in world => body-frame velocity is -lateral
    np.testing.assert_allclose(v_body, [[0.0, -1.0]], atol=1e-6)


def test_quat_apply_yaw_strips_roll_pitch():
    q = maths.euler_xyz_to_quat(jnp.asarray([[0.3, 0.2, np.pi / 2]]))
    v = jnp.asarray([[1.0, 0.0, 0.0]])
    out = np.asarray(maths.quat_apply_yaw(q, v))
    np.testing.assert_allclose(out, [[0.0, 1.0, 0.0]], atol=1e-5)


def test_torch_rand_sqrt_float_bounds():
    key = jax.random.PRNGKey(0)
    out = np.asarray(maths.torch_rand_sqrt_float(key, -2.0, 3.0, (1000,)))
    assert out.min() >= -2.0 and out.max() <= 3.0
