"""On-policy training runner: iteration loop, metrics, checkpoints.

Re-design of the reference's rsl_rl ``OnPolicyRunner`` + the fork's wandb
callback and checkpoint manager (ref: task_registry.py:105-156,
deep_tube_learning/utils.py:264-344): drives the fused PPO iteration, logs
JSON-line metrics, and keeps filesystem checkpoints with ``latest`` /
``best{stage}`` alias semantics (best resets when the curriculum stage
changes, ref utils.py:314-344). Orbax handles (de)serialization.
"""
from __future__ import annotations

import json
import os
import time
from typing import Callable, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from .networks import ActorCritic
from .ppo import PPOConfig, TrainState, init_train_state, make_learn_iteration


class CheckpointManager:
    """latest/best-per-stage checkpoint aliases (ref utils.py:314-344)."""

    def __init__(self, log_dir: str):
        self.log_dir = os.path.abspath(log_dir)
        os.makedirs(self.log_dir, exist_ok=True)
        self._ckpt = ocp.StandardCheckpointer()
        self.best_metric = -np.inf
        self.best_stage = -1

    def _save(self, name: str, params) -> None:
        path = os.path.join(self.log_dir, name)
        self._ckpt.save(path, params, force=True)

    def save(self, params, it: int, metric: float, stage: int = 0) -> None:
        self._save(f"model_{it}", params)
        self._save("latest", params)
        if stage != self.best_stage:
            # Best resets on curriculum-stage change (ref utils.py:330-338).
            self.best_metric, self.best_stage = -np.inf, stage
        if metric >= self.best_metric:
            self.best_metric = metric
            self._save(f"best{stage}", params)

    def load(self, name: str, template):
        path = os.path.join(self.log_dir, name)
        return self._ckpt.restore(path, target=template)


class OnPolicyRunner:
    """Iterate fused PPO learn steps over a vectorized env."""

    def __init__(self, env, model: Optional[ActorCritic] = None,
                 cfg: PPOConfig = PPOConfig(), log_dir: Optional[str] = None,
                 seed: int = 0,
                 metrics_callback: Optional[Callable[[Dict], None]] = None):
        self.env = env
        self.cfg = cfg
        self.model = model or ActorCritic(num_actions=env.num_actions)
        key = jax.random.PRNGKey(seed)
        self.train_state = init_train_state(
            self.model, env.num_obs, cfg, key
        )
        self.env_state, _ = env.reset(jax.random.fold_in(key, 1))
        self._learn = make_learn_iteration(env, self.model, cfg)
        self.log_dir = log_dir
        self.ckpt = CheckpointManager(log_dir) if log_dir else None
        self.metrics_callback = metrics_callback
        self.history = []
        self.it = 0

    def learn(self, num_iterations: int, save_interval: int = 50,
              curriculum_stage_fn: Optional[Callable[[int], int]] = None):
        metrics_path = (os.path.join(self.log_dir, "metrics.jsonl")
                        if self.log_dir else None)
        for _ in range(num_iterations):
            t0 = time.perf_counter()
            self.train_state, self.env_state, metrics = self._learn(
                self.train_state, self.env_state
            )
            metrics = jax.tree.map(lambda x: float(np.asarray(x)), metrics)
            metrics["it"] = self.it
            metrics["iter_time_s"] = time.perf_counter() - t0
            metrics["steps_per_s"] = (
                self.cfg.num_steps * self.env.num_envs
                / metrics["iter_time_s"]
            )
            self.history.append(metrics)
            if self.metrics_callback:
                self.metrics_callback(metrics)
            if metrics_path:
                with open(metrics_path, "a") as f:
                    f.write(json.dumps(metrics) + "\n")
            if self.ckpt and (self.it % save_interval == 0
                              or self.it == num_iterations - 1):
                stage = (curriculum_stage_fn(self.it)
                         if curriculum_stage_fn else 0)
                self.ckpt.save(
                    self.train_state.params, self.it,
                    metrics.get("mean_reward", 0.0), stage,
                )
            self.it += 1
        return self.history

    def get_inference_policy(self):
        """Deterministic policy fn (rsl_rl get_inference_policy parity)."""
        params = self.train_state.params
        model = self.model

        @jax.jit
        def policy(obs):
            mean, _, _ = model.apply(params, obs)
            return mean

        return policy

    def load(self, name: str = "latest"):
        assert self.ckpt is not None
        self.train_state = self.train_state._replace(
            params=self.ckpt.load(name, self.train_state.params)
        )
