"""Tests for the functional trajectory generator (ref: rom_dynamics.py:441-699)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from legged_gym_dev_tpu.core import DoubleInt2D, SingleInt2D
from legged_gym_dev_tpu.trajgen import (
    CircleTrajectoryGenerator,
    SquareTrajectoryGenerator,
    TrajectoryGenerator,
    UniformSampleHoldDT,
    UniformWeightSampler,
    ZeroTrajectoryGenerator,
)

B = 8
ROM_DT = 0.1
DT_LOOP = 0.02


def make_gen(cls=TrajectoryGenerator, rom_cls=SingleInt2D, N=4, dN=2,
             prob_stationary=0.0):
    n, m = rom_cls.n, rom_cls.m
    rom = rom_cls.create(
        ROM_DT, -10 * np.ones(n), 10 * np.ones(n), -np.ones(m), np.ones(m)
    )
    if rom_cls is DoubleInt2D:
        rom = rom.replace(
            z_min=jnp.asarray([-10, -10, -1, -1], jnp.float32),
            z_max=jnp.asarray([10, 10, 1, 1], jnp.float32),
        )
    return cls.create(
        rom,
        UniformSampleHoldDT.create(0.5, 2.0),
        UniformWeightSampler(),
        dt_loop=DT_LOOP,
        N=N,
        dN=dN,
        prob_stationary=prob_stationary,
    )


def reset_all(gen, key, z0):
    state = gen.init_state(key, z0.shape[0])
    return gen.reset(state, jnp.ones(z0.shape[0], bool), z0)


def test_reset_builds_full_window():
    gen = make_gen()
    z0 = jnp.zeros((B, 2))
    state = reset_all(gen, jax.random.PRNGKey(0), z0)
    # After reset the ROM has ticked N*dN times: k goes -N*dN -> 0.
    np.testing.assert_allclose(np.asarray(state.k), 0.0)
    np.testing.assert_allclose(np.asarray(state.t), 0.0, atol=1e-6)
    traj = gen.get_trajectory(state)
    assert traj.shape == (B, gen.N, 2)
    assert np.all(np.isfinite(np.asarray(traj)))


def test_two_rate_clock():
    gen = make_gen()
    z0 = jnp.zeros((B, 2))
    state = reset_all(gen, jax.random.PRNGKey(1), z0)
    k0 = np.asarray(state.k).copy()
    # ROM dt / loop dt = 5: exactly one ROM tick in 5 env steps.
    for i in range(5):
        state = gen.step(state)
    assert np.all(np.asarray(state.k) == k0 + 1)
    np.testing.assert_allclose(np.asarray(state.t), 5 * DT_LOOP, atol=1e-6)


def test_window_rolls_and_dynamics_consistent():
    gen = make_gen(N=3, dN=1)
    z0 = jnp.zeros((B, 2))
    state = reset_all(gen, jax.random.PRNGKey(2), z0)
    for _ in range(5):
        state = gen.step(state)
    # Window states satisfy single-integrator dynamics with stored inputs.
    traj = np.asarray(state.trajectory)
    vtraj = np.asarray(state.v_trajectory)
    for k in range(vtraj.shape[1]):
        np.testing.assert_allclose(
            traj[:, k + 1], traj[:, k] + ROM_DT * vtraj[:, k], atol=1e-5
        )


def test_inputs_respect_bounds():
    gen = make_gen()
    z0 = jnp.zeros((B, 2))
    state = reset_all(gen, jax.random.PRNGKey(3), z0)
    for _ in range(50):
        state = gen.step(state)
        v = np.asarray(state.v)
        assert np.all(v <= 1.0 + 1e-5) and np.all(v >= -1.0 - 1e-5)


def test_stationary_envs_do_not_move():
    gen = make_gen(prob_stationary=1.0)
    z0 = jnp.ones((B, 2))
    state = reset_all(gen, jax.random.PRNGKey(4), z0)
    for _ in range(20):
        state = gen.step(state)
    np.testing.assert_allclose(
        np.asarray(state.trajectory), 1.0, atol=1e-6
    )


def test_zero_generator_stays_at_origin():
    gen = make_gen(ZeroTrajectoryGenerator)
    z0 = jnp.zeros((B, 2))
    state = reset_all(gen, jax.random.PRNGKey(5), z0)
    for _ in range(20):
        state = gen.step(state)
    np.testing.assert_allclose(np.asarray(gen.get_trajectory(state)), 0.0, atol=1e-6)


def test_square_generator_traces_unit_square():
    gen = make_gen(SquareTrajectoryGenerator, N=2, dN=1)
    z0 = jnp.zeros((B, 2))
    state = reset_all(gen, jax.random.PRNGKey(6), z0)
    # One full period of the unit square: 2/v + 1/v + 2/v + 1/v = 6 s at v=1.
    n_steps = int(6.0 / DT_LOOP) + 10
    step = jax.jit(gen.step)
    xs = []
    for _ in range(n_steps):
        state = step(state)
        xs.append(np.asarray(state.trajectory[:, -1, :]))
    xs = np.stack(xs)
    # The path traces a ~1x1 square and returns near the origin.
    assert xs[:, 0, 1].max() > 0.9
    assert xs[:, 0, 0].max() > 0.9
    assert abs(xs[-1, 0, 0]) < 0.2 and abs(xs[-1, 0, 1]) < 0.2


def test_circle_generator_orbits_center():
    gen = make_gen(CircleTrajectoryGenerator, N=2, dN=1)
    z0 = jnp.zeros((B, 2))
    state = reset_all(gen, jax.random.PRNGKey(7), z0)
    rs = []
    for _ in range(500):
        state = gen.step(state)
        z = np.asarray(state.trajectory[:, -1, :])
        rs.append(np.linalg.norm(z - np.asarray(state.center), axis=-1))
    rs = np.stack(rs)[100:]
    # Orbits at radius ~0.5 around the center.
    assert abs(rs.mean() - 0.5) < 0.15


def test_whole_rollout_jits_and_scans():
    gen = make_gen()
    z0 = jnp.zeros((B, 2))
    state = reset_all(gen, jax.random.PRNGKey(8), z0)

    @jax.jit
    def rollout(state):
        def body(s, _):
            s = gen.step(s)
            return s, gen.get_trajectory(s)
        return jax.lax.scan(body, state, None, length=100)

    final, trajs = rollout(state)
    assert trajs.shape == (100, B, gen.N, 2)
    assert np.all(np.isfinite(np.asarray(trajs)))


def test_masked_reset_only_touches_masked_envs():
    gen = make_gen()
    z0 = jnp.zeros((B, 2))
    state = reset_all(gen, jax.random.PRNGKey(9), z0)
    for _ in range(25):
        state = gen.step(state)
    mask = jnp.asarray([True] * 4 + [False] * 4)
    before = np.asarray(state.trajectory).copy()
    state2 = gen.reset(state, mask, jnp.ones((B, 2)) * 5.0)
    after = np.asarray(state2.trajectory)
    # Unmasked envs unchanged.
    np.testing.assert_allclose(after[4:], before[4:], atol=1e-6)
    # Masked envs rebuilt near the new start.
    assert np.all(np.abs(after[:4, 0, :] - 5.0) < 2.0)


def test_turn_biased_sampler_mass():
    """UniformWeightSamplerTurnBiased: ramp excluded, sinusoid carries the
    dominant expected simplex mass (~2/3 at the default sin_weight=3)."""
    import jax

    from legged_gym_dev_tpu.trajgen.samplers import (
        SAMPLER_REGISTRY,
        UniformWeightSamplerTurnBiased,
    )

    s = UniformWeightSamplerTurnBiased()
    w = np.asarray(s.sample(jax.random.PRNGKey(0), 4096))
    assert w.shape == (4096, 4)
    np.testing.assert_allclose(w.sum(axis=-1), 1.0, atol=1e-5)
    assert np.all(w[:, 1] == 0.0)                 # ramp excluded
    mean = w.mean(axis=0)
    assert mean[3] > 0.55, mean                   # sinusoid dominates
    assert mean[3] > 2.5 * mean[2], mean          # extreme halved vs x3 sin
    assert SAMPLER_REGISTRY["UniformWeightSamplerTurnBiased"]().mask[3] == 3.0
