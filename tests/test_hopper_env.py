"""Hopper trajectory env tests (ref: hopper.py + hopper_trajectory.py)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

import legged_gym_dev_tpu.envs.presets as presets
from legged_gym_dev_tpu.envs import task_registry

B = 16


@pytest.fixture(scope="module")
def env():
    return task_registry.make_env("hopper_trajectory", num_envs=B,
                                  add_noise=False)


@pytest.fixture(scope="module")
def stepped(env):
    state, obs = env.reset(jax.random.PRNGKey(0))
    step = jax.jit(env.step)
    a = jnp.tile(jnp.asarray([1.0, 0, 0, 0]), (B, 1))
    traces = {"h": [], "done": [], "rew": []}
    for _ in range(100):
        state, tr = step(state, a)
        traces["h"].append(np.asarray(state.robot.base_pos[:, 2]))
        traces["done"].append(np.asarray(tr.done))
        traces["rew"].append(np.asarray(tr.reward))
    return env, state, tr, {k: np.stack(v) for k, v in traces.items()}


def test_obs_layout(env):
    assert env.num_obs == 38  # ref hopper_trajectory_config.py:6
    assert env.num_actions == 4
    state, obs = env.reset(jax.random.PRNGKey(1))
    assert obs.shape == (B, 38)
    assert np.all(np.isfinite(np.asarray(obs)))
    # Action block (last 4) is the normalized identity quat with qw>0.
    np.testing.assert_allclose(np.asarray(obs[:, -4:])[:, 0], 1.0, atol=1e-5)


def test_hopper_stays_up_with_identity_action(stepped):
    env, state, tr, traces = stepped
    # The orientation PD at identity quat keeps most envs upright and the
    # spring keeps the body around 0.3-0.45m.
    h = traces["h"][-20:]
    assert 0.2 < h.mean() < 0.6, h.mean()
    assert np.all(np.isfinite(traces["rew"]))


def test_terminations_reset_envs(stepped):
    env, state, tr, traces = stepped
    # Some envs fall (random yaw/noise, no feedback on xy) and auto-reset.
    assert traces["done"].sum() >= 1
    assert np.all(np.asarray(state.episode_step) <= 100)


def test_torque_limits_respected(stepped):
    env, state, tr, traces = stepped
    tau = np.asarray(state.torques)
    lim = np.asarray(env.torque_limits) * 1.06  # DR torque multiplier max
    assert np.all(np.abs(tau) <= lim + 1e-4)


def test_contact_gated_controller(env):
    """In flight the foot joint is PD-servoed to foot_pos_des; in stance the
    spring force dominates (ref hopper.py:195-200)."""
    state, _ = env.reset(jax.random.PRNGKey(2))
    # Put robot high in the air -> flight mode.
    robot = state.robot.replace(
        base_pos=state.robot.base_pos.at[:, 2].set(2.0)
    )
    tau_flight = env._compute_torques(state.replace(robot=robot), robot)
    # foot torque magnitude bounded by PD gains (no 11732-stiffness spring)
    assert np.all(np.abs(np.asarray(tau_flight)[:, 0]) < 400 * 0.2 + 40 * 2)
    # Push the robot into the ground -> stance: spring force is large.
    robot2 = state.robot.replace(
        # foot sphere center = z - 0.36 + q = -0.03 -> 5cm penetration
        base_pos=state.robot.base_pos.at[:, 2].set(0.25),
        q=state.robot.q.at[:, 0].set(0.08),
    )
    tau_stance = env._compute_torques(state.replace(robot=robot2), robot2)
    assert np.abs(np.asarray(tau_stance)[:, 0]).max() > 300.0


def test_registry_and_factory():
    assert "hopper_trajectory" in task_registry.list_tasks()
    env = task_registry.make_env("hopper_trajectory", num_envs=4)
    assert env.num_envs == 4
