"""PPO training throughput on the hopper trajectory task (real chip).

The reference's headline RL capability is massively-parallel PPO on Isaac
Gym — 4096-16384 envs, 24 steps/env/iter, "train in minutes"
(ref: README.md:22-25, legged_robot_config.py:36,257-269). This measures
the fused-jit learn iteration (rollout + GAE + 4x5 minibatch updates under
one jit) on the rigid-body hopper env at training batch size.

Usage: python scripts/bench_ppo.py [num_envs] [iters] [task]
Prints env-steps/s, iteration time, and projected wall-clock for the
reference's 1000-iteration hopper run.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from legged_gym_dev_tpu.utils.runtime import setup_tpu_runtime

setup_tpu_runtime()

import jax

import legged_gym_dev_tpu.envs.presets  # noqa: F401 (registers tasks)
from legged_gym_dev_tpu.envs.registry import task_registry
from legged_gym_dev_tpu.rl import ActorCritic, PPOConfig
from legged_gym_dev_tpu.rl.ppo import init_train_state, make_learn_iteration


def main():
    num_envs = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    task = sys.argv[3] if len(sys.argv) > 3 else "hopper_trajectory"

    env = task_registry.make_env(task, num_envs=num_envs)
    cfg = PPOConfig()  # 24 steps, 4 minibatches x 5 epochs (ref parity)
    model = ActorCritic(num_actions=env.num_actions)
    key = jax.random.PRNGKey(0)
    ts = init_train_state(model, env.num_obs, cfg, key)
    env_state, _ = env.reset(jax.random.fold_in(key, 1))
    learn = make_learn_iteration(env, model, cfg)

    t0 = time.perf_counter()
    ts, env_state, metrics = learn(ts, env_state)
    np.asarray(metrics["mean_reward"])
    print(f"compile+first iter: {time.perf_counter() - t0:.1f}s")
    # One-time remote-backend warmup (~27s executable finalization on the
    # first chained burst — measured constant across 10/20-iter loops);
    # burn it here so the timed loop sees the steady state.
    t0 = time.perf_counter()
    for _ in range(3):
        ts, env_state, metrics = learn(ts, env_state)
    np.asarray(metrics["mean_reward"])
    print(f"warmup burst: {time.perf_counter() - t0:.1f}s")

    # Chained iterations pipeline on-device; metrics are fetched once at
    # the end (a per-iteration synchronous fetch de-pipelines the remote
    # backend ~80x — docs/PERF.md "Metric-fetch pitfall").
    t0 = time.perf_counter()
    for _ in range(iters):
        ts, env_state, metrics = learn(ts, env_state)
    np.asarray(metrics["mean_reward"])
    dt = (time.perf_counter() - t0) / iters

    steps = cfg.num_steps * num_envs
    print(f"envs={num_envs} steps/iter={steps}")
    print(f"iter time:       {dt*1e3:8.1f} ms")
    print(f"env-steps/s:     {steps/dt:12.0f}")
    print(f"1000 iters in:   {1000*dt/60:8.1f} min "
          f"(ref: 'train in minutes' on 1 GPU)")
    print(f"mean_reward after {iters+1} iters: "
          f"{float(np.asarray(metrics['mean_reward'])):.3f}")


if __name__ == "__main__":
    main()
