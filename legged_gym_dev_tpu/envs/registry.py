"""Task registry: explicit name -> (env factory, config) mapping.

Re-design of the reference ``TaskRegistry`` (ref:
legged_gym/utils/task_registry.py:45-159): ``register`` stores a factory and
default configs; ``make_env`` constructs the env (with overrides applied);
``make_alg_runner`` builds the PPO runner with log-dir layout
``<root>/logs/<experiment>/<date>_<run>`` (ref :139-145). Replaces the
reference's ``globals()[name]`` class lookups with explicit registration
(SURVEY.md §5 config-system note).
"""
from __future__ import annotations

import dataclasses
import os
from datetime import datetime
from typing import Any, Callable, Dict, Optional

from ..rl.ppo import PPOConfig
from ..rl.runner import OnPolicyRunner


@dataclasses.dataclass
class TaskEntry:
    env_factory: Callable[..., Any]       # (**overrides) -> env
    train_cfg: PPOConfig
    runner_kwargs: Dict[str, Any]


class TaskRegistry:
    def __init__(self):
        self._tasks: Dict[str, TaskEntry] = {}

    def register(self, name: str, env_factory: Callable[..., Any],
                 train_cfg: PPOConfig = PPOConfig(), **runner_kwargs) -> None:
        self._tasks[name] = TaskEntry(env_factory, train_cfg, runner_kwargs)

    def list_tasks(self):
        return sorted(self._tasks)

    def get(self, name: str) -> TaskEntry:
        try:
            return self._tasks[name]
        except KeyError:
            raise ValueError(
                f"Task '{name}' not registered. Known: {self.list_tasks()}"
            ) from None

    def make_env(self, name: str, **overrides):
        """Construct the task's env (ref task_registry.py:66-103)."""
        return self.get(name).env_factory(**overrides)

    def make_alg_runner(self, env, name: str, log_root: str = "logs",
                        run_name: str = "", seed: int = 0,
                        resume: bool = False, load_run: str = "latest",
                        load_dir: str = "", model=None,
                        metrics_callback=None, mesh=None) -> OnPolicyRunner:
        """Build the PPO runner with the reference's log-dir layout
        (ref task_registry.py:105-156). ``resume`` restores ``load_run``
        from ``load_dir`` (or the most recent run under the task's log
        root, matching the reference's get_load_path default)."""
        entry = self.get(name)
        stamp = datetime.now().strftime("%b%d_%H-%M-%S")
        log_dir = os.path.join(log_root, name, f"{stamp}_{run_name}")
        if resume:
            if not load_dir:
                # Most recent previous run directory by mtime
                # (ref helpers.py:183-205; lexicographic sort of the
                # "%b%d_..." stamps is wrong across month boundaries).
                task_root = os.path.join(log_root, name)
                runs = sorted(
                    (d for d in os.listdir(task_root)
                     if os.path.isdir(os.path.join(task_root, d))
                     and d != os.path.basename(log_dir)),
                    key=lambda d: os.path.getmtime(
                        os.path.join(task_root, d)),
                )
                if not runs:
                    raise FileNotFoundError(
                        f"no previous runs to resume under {task_root}"
                    )
                load_dir = os.path.join(task_root, runs[-1])
            if model is None:
                # Rebuild the trained network exactly as recorded
                # (hidden-dim mismatch breaks the orbax restore).
                from ..rl.runner import load_model_arch

                model = load_model_arch(load_dir)
        runner = OnPolicyRunner(
            env, model=model, cfg=entry.train_cfg, log_dir=log_dir,
            seed=seed, metrics_callback=metrics_callback, mesh=mesh,
            **entry.runner_kwargs
        )
        if resume:
            from ..rl.runner import CheckpointManager

            src = CheckpointManager(load_dir)
            runner.train_state = runner.train_state._replace(
                params=src.load(load_run, runner.train_state.params)
            )
        return runner


task_registry = TaskRegistry()
