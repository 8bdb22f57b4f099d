"""Generic trajectory-tracking env on quadrupeds (ref
legged_robot_trajectory.py + anymal_trajectory.py)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from legged_gym_dev_tpu.envs import task_registry

B = 4


@pytest.fixture(scope="module")
def env():
    return task_registry.make_env("anymal_c_trajectory", num_envs=B,
                                  add_noise=False)


@pytest.fixture(scope="module")
def rolled(env):
    state, obs = env.reset(jax.random.PRNGKey(0))
    step = jax.jit(env.step)
    states = [state]
    for _ in range(30):
        state, tr = step(state, jnp.zeros((B, env.num_actions)))
        states.append(state)
    return env, states, tr


def test_obs_layout(env):
    # 3+3+3 + 2*10 trajectory window + 12 q + 12 qd + 12 actions = 65,
    # matching the reference's num_observations
    # (anymal_c_flat_trajectory_config.py env block).
    assert env.num_obs == 65
    state, obs = env.reset(jax.random.PRNGKey(1))
    assert obs.shape == (B, 65)
    assert np.all(np.isfinite(np.asarray(obs)))


def test_trajectory_window_advances(rolled):
    env, states, tr = rolled
    t0 = np.asarray(states[1].trajectory)
    t1 = np.asarray(states[-1].trajectory)
    assert t0.shape == (B, 10, 2)
    assert np.any(np.abs(t1 - t0) > 1e-6)
    # ROM tick counter advanced with the async clock (rom dt=0.1, env
    # dt=0.02 -> 30 env steps ≈ 6 ROM ticks past the reset window).
    assert np.all(np.asarray(states[-1].traj_gen.k)
                  > np.asarray(states[1].traj_gen.k))


def test_rom_reward_terms(rolled):
    env, states, tr = rolled
    names = [n for n, _ in env.reward_scales]
    assert "tracking_rom" in names and "feet_air_time" in names
    assert "rew_tracking_rom" in tr.info["episode"]
    assert np.all(np.isfinite(np.asarray(tr.reward)))


def test_tracking_rom_reward_is_exp_of_weighted_error(env):
    state, _ = env.reset(jax.random.PRNGKey(2))
    desired = np.asarray(state.trajectory[:, 0, :])
    pz_x = np.asarray(env.rom.proj_z(state.robot.root_states))
    rews = env._rewards(state, state.robot,
                        jnp.zeros((B, len(env.sim.model.contact_link_names),
                                   3)),
                        jnp.zeros((B,), bool), jnp.zeros((B, 4)),
                        jnp.zeros((B, 4)))
    expected = np.exp(-np.square(pz_x - desired).sum(-1)
                      / float(env.tracking_sigma))
    np.testing.assert_allclose(np.asarray(rews["tracking_rom"]), expected,
                               rtol=1e-5)


def test_rom_distance_randomization(env):
    # With zero_rom_dist_llh=0.25, most resets offset the window start from
    # the projected base state by up to max_rom_distance.
    state, _ = env.reset(jax.random.PRNGKey(3))
    pz_x = np.asarray(env.rom.proj_z(state.robot.root_states))
    win_start = np.asarray(state.trajectory[:, 0, :])
    d = np.linalg.norm(win_start - pz_x, axis=-1)
    assert np.all(d < 0.5)  # bounded by max_rom_distance + a few rom steps
    assert np.any(d > 1e-4)


def test_random_interval_pushes(rolled):
    env, states, tr = rolled
    cd = np.asarray(states[-1].time_until_next_push)
    assert cd.shape == (B,)
    assert np.all(cd > 0.0) and np.all(cd <= env.time_between_pushes[1])
