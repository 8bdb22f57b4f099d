"""Headless rollout video rendering (ref play.py:88-110 frame capture)."""
import os

import numpy as np
import pytest

import jax

mujoco = pytest.importorskip("mujoco")


def test_visual_mjcf_loads_and_renders(tmp_path):
    from legged_gym_dev_tpu.sim.mjcf import build_mjcf_from_model
    from legged_gym_dev_tpu.sim.urdf import parse_urdf
    from legged_gym_dev_tpu.sim.dynamics import RobotModel

    spec = parse_urdf(
        "/root/reference/resources/robots/hopper/urdf/hopper.urdf")
    model = RobotModel.from_spec(spec)
    xml = build_mjcf_from_model(model, visual=True)
    m = mujoco.MjModel.from_xml_string(xml)
    assert m.ngeom > model.nj  # skeleton geoms present
    # Visual variant must not perturb the physics export: same masses.
    m_plain = mujoco.MjModel.from_xml_string(build_mjcf_from_model(model))
    np.testing.assert_allclose(m.body_mass[1:], m_plain.body_mass[1:],
                               atol=1e-8)


@pytest.mark.parametrize("task", ["hopper_trajectory", "a1_velocity"])
def test_record_rollout_video(tmp_path, task):
    from legged_gym_dev_tpu import envs  # noqa: F401
    from legged_gym_dev_tpu.envs import task_registry
    from legged_gym_dev_tpu.utils.video import record_rollout_video

    env = task_registry.make_env(task, num_envs=2)
    n_act = env.num_actions

    out = record_rollout_video(
        env, lambda obs: np.zeros((2, n_act), np.float32),
        jax.random.PRNGKey(0), steps=5,
        out_path=str(tmp_path / "roll.gif"), width=160, height=120,
    )
    assert os.path.exists(out) and os.path.getsize(out) > 0


def test_rom_env_rejects_video(tmp_path):
    from legged_gym_dev_tpu.envs.presets import make_rom_tracking_env
    from legged_gym_dev_tpu.utils.video import record_rollout_video

    env = make_rom_tracking_env(num_envs=2)
    with pytest.raises(ValueError, match="rigid-body"):
        record_rollout_video(env, lambda o: np.zeros((2, 2)),
                             jax.random.PRNGKey(0), 2,
                             str(tmp_path / "x.gif"))
