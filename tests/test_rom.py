"""Analytic-dynamics unit tests for the ROM zoo (SURVEY.md §4 test strategy)."""
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

import jax
import jax.numpy as jnp

from legged_gym_dev_tpu.core import (
    ROM_REGISTRY,
    DoubleInt2D,
    ExtendedLateralUnicycle,
    ExtendedUnicycle,
    LateralUnicycle,
    SingleInt2D,
    Unicycle,
    make_rom,
)

DT = 0.1


def _mk(cls, scale=1.0):
    n, m = cls.n, cls.m
    return cls.create(
        DT, -scale * np.ones(n), scale * np.ones(n),
        -scale * np.ones(m), scale * np.ones(m),
    )


def _full_state(pos, yaw, vel, omega_z):
    """13-dim rigid-body state [p(3), quat_xyzw(4), v(3), w(3)]."""
    q = Rotation.from_euler("xyz", [0.0, 0.0, yaw]).as_quat()
    return np.concatenate([pos, q, vel, [0.0, 0.0, omega_z]])


def test_registry_complete():
    assert set(ROM_REGISTRY) == {
        "SingleInt2D", "DoubleInt2D", "Unicycle", "LateralUnicycle",
        "ExtendedUnicycle", "ExtendedLateralUnicycle",
    }
    rom = make_rom("SingleInt2D", DT, [-1, -1], [1, 1], [-1, -1], [1, 1])
    assert isinstance(rom, SingleInt2D)
    with pytest.raises(ValueError):
        make_rom("NoSuchRom", DT, [0], [0], [0], [0])


def test_single_int_dynamics():
    rom = _mk(SingleInt2D, 10.0)
    z = jnp.asarray([[1.0, 2.0]])
    v = jnp.asarray([[0.5, -0.5]])
    out = np.asarray(rom.f(z, v))
    np.testing.assert_allclose(out, [[1.05, 1.95]], atol=1e-6)


def test_double_int_dynamics():
    rom = _mk(DoubleInt2D, 10.0)
    z = jnp.asarray([[0.0, 0.0, 1.0, -1.0]])
    v = jnp.asarray([[2.0, 2.0]])
    out = np.asarray(rom.f(z, v))
    np.testing.assert_allclose(out, [[0.1, -0.1, 1.2, -0.8]], atol=1e-6)


def test_unicycle_dynamics():
    rom = _mk(Unicycle, 10.0)
    th = np.pi / 4
    z = jnp.asarray([[0.0, 0.0, th]])
    v = jnp.asarray([[1.0, 0.5]])
    out = np.asarray(rom.f(z, v))
    c = np.cos(th) * DT
    np.testing.assert_allclose(out, [[c, c, th + 0.05]], atol=1e-6)


def test_lateral_unicycle_dynamics():
    rom = _mk(LateralUnicycle, 10.0)
    z = jnp.asarray([[0.0, 0.0, 0.0]])
    v = jnp.asarray([[1.0, 0.5, 0.2]])
    out = np.asarray(rom.f(z, v))
    np.testing.assert_allclose(out, [[0.1, 0.05, 0.02]], atol=1e-6)


def test_extended_unicycle_dynamics():
    rom = _mk(ExtendedUnicycle, 10.0)
    z = jnp.asarray([[0.0, 0.0, 0.0, 2.0, 0.1]])
    v = jnp.asarray([[1.0, -1.0]])
    out = np.asarray(rom.f(z, v))
    np.testing.assert_allclose(out, [[0.2, 0.0, 0.01, 2.1, 0.0]], atol=1e-6)


def test_extended_lateral_unicycle_dynamics():
    rom = _mk(ExtendedLateralUnicycle, 10.0)
    z = jnp.asarray([[0.0, 0.0, np.pi / 2, 1.0, 0.5, 0.0]])
    v = jnp.asarray([[0.0, 0.0, 1.0]])
    out = np.asarray(rom.f(z, v))
    # At yaw=pi/2: dx = -v_perp, dy = v.
    np.testing.assert_allclose(
        out, [[-0.05, 0.1, np.pi / 2, 1.0, 0.5, 0.1]], atol=1e-6
    )


def test_proj_z_shapes_and_values():
    x = jnp.asarray(
        [_full_state([1.0, 2.0, 0.5], 0.7, [0.3, 0.4, 0.0], 0.9)],
        dtype=jnp.float32,
    )
    np.testing.assert_allclose(
        np.asarray(_mk(SingleInt2D).proj_z(x)), [[1.0, 2.0]], atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(_mk(DoubleInt2D).proj_z(x)), [[1.0, 2.0, 0.3, 0.4]], atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(_mk(Unicycle).proj_z(x)), [[1.0, 2.0, 0.7]], atol=1e-5
    )
    # Extended: local-frame velocities
    R = np.array(
        [[np.cos(0.7), np.sin(0.7)], [-np.sin(0.7), np.cos(0.7)]]
    )
    v_loc = R @ np.array([0.3, 0.4])
    np.testing.assert_allclose(
        np.asarray(_mk(ExtendedUnicycle).proj_z(x)),
        [[1.0, 2.0, 0.7, v_loc[0], 0.9]],
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(_mk(ExtendedLateralUnicycle).proj_z(x)),
        [[1.0, 2.0, 0.7, v_loc[0], v_loc[1], 0.9]],
        atol=1e-5,
    )


def test_state_dependent_input_bounds_double_int():
    rom = DoubleInt2D.create(
        DT, [-10, -10, -1, -1], [10, 10, 1, 1], [-5, -5], [5, 5]
    )
    # At max x velocity, cannot accelerate further in +x.
    z = jnp.asarray([[0.0, 0.0, 1.0, 0.0]])
    v_min_z, v_max_z = rom.compute_state_dependent_input_bounds(z)
    np.testing.assert_allclose(np.asarray(v_max_z), [[0.0, 5.0]], atol=1e-5)
    np.testing.assert_allclose(np.asarray(v_min_z), [[-5.0, -5.0]], atol=1e-5)
    # clip_v_z clips into those bounds and the applied dynamics stay in bounds.
    v = rom.clip_v_z(z, jnp.asarray([[3.0, 0.0]]))
    z_next = rom.f(z, v)
    assert np.asarray(z_next)[0, 2] <= 1.0 + 1e-6


def test_rom_is_vmappable_and_jittable():
    rom = _mk(DoubleInt2D, 10.0)
    z = jnp.zeros((16, 4))
    v = jnp.ones((16, 2))
    out = jax.jit(lambda z, v: rom.f(z, v))(z, v)
    assert out.shape == (16, 4)
    # ROM pytree itself can be vmapped (per-scenario randomized bounds).
    roms = jax.tree.map(lambda x: jnp.broadcast_to(x, (8,) + x.shape), rom)
    out2 = jax.vmap(lambda r, z, v: r.f(z, v))(roms, jnp.zeros((8, 16, 4)), jnp.ones((8, 16, 2)))
    assert out2.shape == (8, 16, 4)


def test_grad_flows_through_dynamics():
    rom = _mk(Unicycle, 10.0)

    def loss(v):
        z = jnp.asarray([[0.0, 0.0, 0.3]])
        return jnp.sum(rom.f(z, v) ** 2)

    g = jax.grad(loss)(jnp.asarray([[1.0, 0.5]]))
    assert np.all(np.isfinite(np.asarray(g)))
