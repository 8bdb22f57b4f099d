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

_ARCH_FIELDS = ("num_actions", "actor_hidden_dims", "critic_hidden_dims",
                "activation", "init_noise_std", "rnn_hidden_size")


def save_model_arch(model, log_dir: str) -> None:
    """Record the network architecture next to the checkpoints, so a later
    resume/play can rebuild the exact module without the caller having to
    re-specify hidden dims (a mismatch makes orbax restore fail on
    shape)."""
    arch = {"cls": type(model).__name__}
    for f in _ARCH_FIELDS:
        if hasattr(model, f):
            v = getattr(model, f)
            arch[f] = list(v) if isinstance(v, (tuple, list)) else v
    os.makedirs(log_dir, exist_ok=True)
    with open(os.path.join(log_dir, "arch.json"), "w") as f:
        json.dump(arch, f)


def load_model_arch(log_dir: str):
    """Rebuild the network recorded by ``save_model_arch`` (None if the
    run predates arch recording)."""
    path = os.path.join(log_dir, "arch.json")
    if not os.path.exists(path):
        return None
    with open(path) as f:
        arch = json.load(f)
    from . import networks

    cls = getattr(networks, arch.pop("cls"))
    arch = {k: tuple(v) if isinstance(v, list) else v
            for k, v in arch.items()}
    return cls(**arch)


def make_curriculum_stage_fn(curriculum, steps_per_iter: int):
    """Map a learn-iteration index to the env's curriculum stage.

    The env advances ``curriculum_stage`` when its global ``common_step``
    counter (one per env.step call, i.e. ``steps_per_iter`` per learn
    iteration — PPOConfig.num_steps) crosses ``curriculum.steps``
    thresholds (ref legged_robot.py:359-363). This mirrors that mapping on
    the host so ``OnPolicyRunner.learn(curriculum_stage_fn=...)`` tags
    ``best{stage}`` checkpoints with the stage the env is actually in
    (ref utils.py:314-344: best resets per stage)."""
    thresholds = np.asarray(curriculum.steps, np.int64)

    def fn(it: int) -> int:
        return int(np.sum((it + 1) * steps_per_iter >= thresholds))

    return fn


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
        self._ckpt.wait_until_finished()
        path = os.path.join(self.log_dir, name)
        return self._ckpt.restore(path, target=template)

    def best_stages(self):
        """Curriculum stages that have a ``best{stage}`` checkpoint on
        disk (the candidates for post-training stage selection)."""
        import re

        self._ckpt.wait_until_finished()
        out = []
        for d in os.listdir(self.log_dir):
            m = re.fullmatch(r"best(\d+)", d)
            if m and os.path.isdir(os.path.join(self.log_dir, d)):
                out.append(int(m.group(1)))
        return sorted(out)

    def wait_until_finished(self) -> None:
        """Block until async orbax commits land (else a process exiting
        right after save() races the background commit thread against
        interpreter shutdown and corrupts/errors the checkpoint)."""
        self._ckpt.wait_until_finished()


class OnPolicyRunner:
    """Iterate fused PPO learn steps over a vectorized env."""

    def __init__(self, env, model: Optional[ActorCritic] = None,
                 cfg: PPOConfig = PPOConfig(), log_dir: Optional[str] = None,
                 seed: int = 0,
                 metrics_callback: Optional[Callable[[Dict], None]] = None,
                 mesh=None):
        if mesh is not None:
            # Multi-chip: a bare pallas_call does not partition under a
            # sharded jit, so hand the mesh to the sim — its substep then
            # wraps the Pallas physics kernel in shard_map over the env
            # axis (docs/PERF.md "Pallas physics substep"). Must happen
            # BEFORE the learn closures capture env.
            from ..sim.robot_sim import RobotSim

            sim = getattr(env, "sim", None)
            if isinstance(sim, RobotSim):
                axis = tuple(mesh.axis_names)
                axis = axis[0] if len(axis) == 1 else axis
                env = env.replace(sim=sim.replace(shard_mesh=(mesh, axis)))
        self.env = env
        self.cfg = cfg
        self.model = model or ActorCritic(num_actions=env.num_actions)
        key = jax.random.PRNGKey(seed)
        self.recurrent = hasattr(self.model, "initial_carry")
        self.env_state, _ = env.reset(jax.random.fold_in(key, 1))
        if self.recurrent:
            from .ppo_recurrent import (
                init_train_state_recurrent,
                make_learn_iteration_recurrent,
            )

            self.train_state = init_train_state_recurrent(
                self.model, env.num_obs, cfg, key
            )
            self.carry = self.model.initial_carry(env.num_envs)
            rec_learn = make_learn_iteration_recurrent(env, self.model, cfg)

            def _learn(train_state, env_state):
                train_state, env_state, self.carry, metrics = rec_learn(
                    train_state, env_state, self.carry
                )
                return train_state, env_state, metrics

            self._learn = _learn
        else:
            self.train_state = init_train_state(
                self.model, env.num_obs, cfg, key
            )
            self.carry = None
            self._learn = make_learn_iteration(env, self.model, cfg)
        if mesh is not None:
            # Data-parallel training over the device mesh (the reference's
            # dead --horovod flag, done properly): env state sharded on the
            # batch axis, parameters replicated — XLA inserts the gradient
            # all-reduce over ICI (SURVEY §2.2 / §7.6).
            from ..parallel.mesh import replicate, shard_batch

            assert env.num_envs % mesh.devices.size == 0, (
                f"num_envs={env.num_envs} not divisible by mesh size "
                f"{mesh.devices.size}")
            self.env_state = shard_batch(self.env_state, mesh,
                                         batch_size=env.num_envs)
            self.train_state = replicate(self.train_state, mesh)
            if self.carry is not None:
                self.carry = shard_batch(self.carry, mesh,
                                         batch_size=env.num_envs)
        self.mesh = mesh
        self.log_dir = log_dir
        self.ckpt = CheckpointManager(log_dir) if log_dir else None
        if log_dir:
            save_model_arch(self.model, log_dir)
        self.metrics_callback = metrics_callback
        self.history = []
        self.it = 0

    def learn(self, num_iterations: int, save_interval: int = 50,
              curriculum_stage_fn: Optional[Callable[[int], int]] = None,
              log_interval: int = 1):
        """Iterate learn steps; flush metrics every ``log_interval`` iters.

        Iterations chain device-resident state, so they pipeline without
        host round-trips; a synchronous metric fetch EVERY iteration
        de-pipelines the remote-TPU backend catastrophically (measured
        5.4 s vs 65 ms per iteration at 4096 envs, docs/PERF.md). Metrics
        are buffered as device arrays and converted in windows; pass
        log_interval=1 (default) for local/debug use, 10+ on the remote
        backend.
        """
        metrics_path = (os.path.join(self.log_dir, "metrics.jsonl")
                        if self.log_dir else None)
        pending = []          # (it, device-metrics) awaiting conversion
        t_window = time.perf_counter()

        def flush():
            nonlocal t_window
            if not pending:
                return
            dt = (time.perf_counter() - t_window) / len(pending)
            steps = self.cfg.num_steps * self.env.num_envs
            # ONE host transfer for the whole window: the remote backend
            # pays RPC latency PER FETCH, and a 50-iteration window holds
            # ~750 tiny metric scalars — fetching them one by one costs
            # hundreds of ms per iteration (measured 649 ms/iter on the
            # flagship run vs 47 ms for the same program with metric
            # fetches batched).
            import jax.numpy as jnp

            treedef = jax.tree.structure(pending[0][1])
            dev = jnp.stack([
                jnp.stack([jnp.asarray(leaf, jnp.float32)
                           for leaf in jax.tree.leaves(dev_m)])
                for _, dev_m in pending
            ])
            host = np.asarray(dev)
            for row, (it, _) in zip(host, pending):
                m = jax.tree.unflatten(treedef,
                                       [float(v) for v in row])
                m["it"] = it
                m["iter_time_s"] = dt
                m["steps_per_s"] = steps / dt
                self.history.append(m)
                if self.metrics_callback:
                    self.metrics_callback(m)
                if metrics_path:
                    with open(metrics_path, "a") as f:
                        f.write(json.dumps(m) + "\n")
            pending.clear()
            t_window = time.perf_counter()

        for _ in range(num_iterations):
            self.train_state, self.env_state, metrics = self._learn(
                self.train_state, self.env_state
            )
            pending.append((self.it, metrics))
            last = self.it == num_iterations - 1
            if len(pending) >= log_interval or last:
                flush()
            if self.ckpt and (self.it % save_interval == 0 or last):
                stage = (curriculum_stage_fn(self.it)
                         if curriculum_stage_fn else 0)
                self.ckpt.save(
                    self.train_state.params, self.it,
                    self.history[-1].get("mean_reward", 0.0)
                    if self.history else 0.0, stage,
                )
            self.it += 1
        flush()
        if self.ckpt:
            self.ckpt.wait_until_finished()
        return self.history

    def get_inference_policy(self):
        """Deterministic policy fn (rsl_rl get_inference_policy parity).

        For a recurrent model the returned closure carries the LSTM state
        across calls (rsl_rl's recurrent policy also holds its hidden
        state internally); call ``policy.reset()`` at episode boundaries.
        """
        params = self.train_state.params
        model = self.model

        if self.recurrent:
            @jax.jit
            def step(obs, carry):
                mean, _, _, carry = model.apply(params, obs, carry)
                return mean, carry

            state = {"carry": None}

            def policy(obs):
                # Under a jax trace (policy export re-traces this closure)
                # the carried LSTM state must neither be read nor written:
                # a stored traced carry would leak out of the trace and
                # poison every later eager call. Traced calls behave as a
                # pure zero-state step (the stateful recurrent export is
                # the TorchScript PolicyExporterLSTM path).
                tracing = isinstance(obs, jax.core.Tracer)
                if tracing or state["carry"] is None:
                    carry = model.initial_carry(obs.shape[0])
                else:
                    carry = state["carry"]
                mean, new_carry = step(obs, carry)
                if not tracing:
                    state["carry"] = new_carry
                return mean

            policy.reset = lambda: state.update(carry=None)
            return policy

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
