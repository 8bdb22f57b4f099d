"""Velocity-command env tests on the A1 quadruped (ref legged_robot.py)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from legged_gym_dev_tpu.envs import task_registry

B = 8


@pytest.fixture(scope="module")
def env():
    return task_registry.make_env("a1_velocity", num_envs=B, add_noise=False)


@pytest.fixture(scope="module")
def rolled(env):
    state, obs = env.reset(jax.random.PRNGKey(0))
    step = jax.jit(env.step)
    hs, rews, dones = [], [], []
    for _ in range(80):
        state, tr = step(state, jnp.zeros((B, 12)))
        hs.append(np.asarray(state.robot.base_pos[:, 2]))
        rews.append(np.asarray(tr.reward))
        dones.append(np.asarray(tr.done))
    return env, state, tr, np.stack(hs), np.stack(rews), np.stack(dones)


def test_obs_layout(env):
    # 3 lin vel + 3 ang vel + 3 gravity + 3 cmd + 12 q + 12 qd + 12 actions
    assert env.num_obs == 48
    assert env.num_actions == 12
    state, obs = env.reset(jax.random.PRNGKey(1))
    assert obs.shape == (B, 48)
    assert np.all(np.isfinite(np.asarray(obs)))


def test_contact_classification(env):
    # 4 feet, 8 penalized (thigh+calf), base terminates.
    assert len(env.feet_spheres) == 4
    assert len(env.penalized_spheres) == 8
    assert len(env.termination_spheres) >= 1


def test_pd_holds_default_crouch(rolled):
    env, state, tr, hs, rews, dones = rolled
    # With zero actions, PD targets the default pose; base settles near the
    # 0.25m height target (a1_config.py base_height_target).
    assert 0.18 < hs[-10:].mean() < 0.35, hs[-10:].mean()
    assert np.all(np.isfinite(rews))


def test_commands_resample_and_zero_small(env):
    state, _ = env.reset(jax.random.PRNGKey(2))
    cmd = np.asarray(state.commands)
    # Small-norm commands zeroed (ref legged_robot.py:388).
    norms = np.linalg.norm(cmd[:, :2], axis=-1)
    assert np.all((norms == 0.0) | (norms >= 0.2 - 1e-6))


def test_feet_make_contact(rolled):
    env, state, tr, hs, rews, dones = rolled
    f = env._contact_forces(state.robot)
    feet_fz = np.asarray(f)[:, list(env.feet_spheres), 2]
    # Standing robot: feet carry a large share of the weight
    # (12.5kg * 9.81 ~ 123N; calf spheres share load in the deep crouch).
    total = feet_fz.sum(-1)
    assert np.all(total > 15.0), total
    assert np.all(total < 400.0), total


def test_reward_terms_all_computable(env):
    state, _ = env.reset(jax.random.PRNGKey(3))
    state, tr = env.step(state, jnp.zeros((B, 12)))
    for k in dict(env.reward_scales):
        assert f"rew_{k}" in tr.info["episode"], k


def test_cassie_biped_no_fly():
    """Cassie preset builds, steps, and wires the biped no_fly term
    (ref cassie.py:43-46, cassie_config.py:89-100)."""
    env = task_registry.make_env("cassie_velocity", num_envs=2,
                                 add_noise=False)
    assert dict(env.reward_scales)["no_fly"] == 0.25
    assert env.only_positive_rewards is False
    state, obs = env.reset(jax.random.PRNGKey(3))
    assert np.all(np.isfinite(np.asarray(obs)))
    step = jax.jit(env.step)
    for _ in range(5):
        state, tr = step(state, jnp.zeros((2, env.num_actions)))
    assert np.all(np.isfinite(np.asarray(tr.reward)))
    assert "rew_no_fly" in tr.info["episode"]


def test_perceptive_height_scan_obs():
    """measure_heights appends the 187-point scan: obs 48+187=235, matching
    the reference's rough-terrain num_observations
    (ref legged_robot_config.py:37,54-57, _get_heights:877-915)."""
    from legged_gym_dev_tpu.utils.terrain import Terrain, TerrainCfg

    terrain = Terrain(TerrainCfg(num_rows=2, num_cols=2), num_robots=2,
                      seed=0)
    env = task_registry.make_env("a1_velocity", num_envs=2, add_noise=False,
                                 measure_heights=True, terrain=terrain)
    assert env.num_height_points == 187
    assert env.num_obs == 235
    state, obs = env.reset(jax.random.PRNGKey(0))
    assert obs.shape == (2, 235)
    h_obs = np.asarray(obs[:, 48:])
    assert np.all(np.isfinite(h_obs)) and np.all(np.abs(h_obs) <= 5.0)
    # On the terrain the scan must not be constant across points for at
    # least one env (cells are sloped/stepped).
    assert np.std(h_obs) > 0.0


def test_guard_flags_velocity_explosions():
    """Finite-but-exploded envs (ringing at the velocity cap without ever
    going inf) must be flagged and sanitized like non-finite ones — a
    single such env poisons the whole PPO batch's mean reward/value
    targets (the a1 round-5 divergence)."""
    from legged_gym_dev_tpu.envs.base import guard_finite_state
    from legged_gym_dev_tpu.sim.dynamics import RobotState

    B, nj = 4, 3
    robot = RobotState(
        base_pos=jnp.zeros((B, 3)),
        base_quat=jnp.tile(jnp.asarray([0.0, 0, 0, 1.0]), (B, 1)),
        q=jnp.zeros((B, nj)),
        v=jnp.zeros((B, 6 + nj)).at[1, 2].set(900.0)   # exploded, finite
                                .at[2, 0].set(jnp.nan),  # non-finite
    )
    safe = RobotState(
        base_pos=jnp.ones((B, 3)),
        base_quat=jnp.tile(jnp.asarray([0.0, 0, 0, 1.0]), (B, 1)),
        q=jnp.zeros((B, nj)),
        v=jnp.zeros((B, 6 + nj)),
    )
    fixed, bad = guard_finite_state(robot, safe)
    assert list(np.asarray(bad)) == [False, True, True, False]
    assert np.all(np.asarray(fixed.v[1]) == 0)
    assert np.all(np.isfinite(np.asarray(fixed.v)))
    # Fast joints (wheels at 600 rad/s) are NOT base velocity — unflagged.
    robot2 = robot.replace(v=jnp.zeros((B, 6 + nj)).at[0, 7].set(600.0))
    _, bad2 = guard_finite_state(robot2, safe)
    assert not np.asarray(bad2).any()
