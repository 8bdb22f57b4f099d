"""Cassie biped training sanity (round-4 VERDICT stretch item): a short
PPO run on `cassie_velocity` so the biped reward set (incl. the shared
`no_fly` single-stance term, ref cassie.py:43-46) has a recorded
training signal. Records reward movement + throughput to stdout."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from legged_gym_dev_tpu.utils.runtime import setup_tpu_runtime

    setup_tpu_runtime()
    from legged_gym_dev_tpu import envs  # noqa: F401
    from legged_gym_dev_tpu.envs import task_registry

    iters = int(os.environ.get("ITERS", "500"))
    n_envs = int(os.environ.get("ENVS", "4096"))
    env = task_registry.make_env("cassie_velocity", num_envs=n_envs)
    runner = task_registry.make_alg_runner(
        env, "cassie_velocity", log_root="/tmp/cassie_logs", seed=0)
    t0 = time.perf_counter()
    hist = runner.learn(iters, save_interval=iters, log_interval=50)
    wall = time.perf_counter() - t0
    r = [h["mean_reward"] for h in hist]
    print(f"cassie_velocity: {iters} iters x {n_envs} envs in {wall:.0f}s "
          f"({iters * n_envs * runner.cfg.num_steps / wall:.0f} steps/s); "
          f"reward first5={np.mean(r[:5]):.4f} last5={np.mean(r[-5:]):.4f} "
          f"finite={np.all(np.isfinite(r))}", flush=True)


if __name__ == "__main__":
    main()
