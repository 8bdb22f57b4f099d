"""YAML config overlay for tasks and training.

The reference composes three config tiers — nested Python classes, CLI
flags, and Hydra YAML overlays (SURVEY.md §5). Here the base tier is the
preset factories; this module supplies the YAML overlay tier:

    # config.yaml
    task: hopper_trajectory
    env:
      num_envs: 8192
      episode_length_s: 20
    train:
      learning_rate: 5.0e-4
      num_steps: 24
    run:
      max_iterations: 1500
      seed: 1

    python -m legged_gym_dev_tpu.cli train --config config.yaml

CLI flags override YAML, which overrides preset defaults (same precedence
as the reference's update_cfgs_from_hydra + update_cfg_from_args).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import yaml

from ..rl.ppo import PPOConfig


def load_config(path: str) -> Dict[str, Any]:
    with open(path) as f:
        cfg = yaml.safe_load(f) or {}
    for key in cfg:
        if key not in ("task", "env", "train", "run"):
            raise ValueError(
                f"unknown config section '{key}' "
                "(expected task/env/train/run)"
            )
    return cfg


def apply_train_overrides(base: PPOConfig, overrides: Dict) -> PPOConfig:
    valid = {f.name for f in dataclasses.fields(PPOConfig)}
    bad = set(overrides) - valid
    if bad:
        raise ValueError(f"unknown PPOConfig fields: {sorted(bad)}")
    return base.replace(**overrides)
