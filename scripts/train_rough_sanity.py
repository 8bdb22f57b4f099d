"""Rough-terrain perceptive training sanity (round 4): a short PPO run on
`anymal_c_rough` — 235-dim observations with the 187-point height scan,
procedural trimesh-family terrain grid + game-inspired level curriculum
(ref anymal_c_rough_config.py) — so the heightfield training path has a
recorded signal. The Pallas substep auto-falls back to the XLA path here
(non-flat terrain_fn), exercising the fallback in training."""
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

    iters = int(os.environ.get("ITERS", "300"))
    n_envs = int(os.environ.get("ENVS", "2048"))
    env = task_registry.make_env("anymal_c_rough", num_envs=n_envs)
    assert env.num_obs == 235, env.num_obs
    runner = task_registry.make_alg_runner(
        env, "anymal_c_rough", log_root="/tmp/rough_logs", seed=0)
    t0 = time.perf_counter()
    hist = runner.learn(iters, save_interval=iters, log_interval=50)
    wall = time.perf_counter() - t0
    r = [h["mean_reward"] for h in hist]
    print(f"anymal_c_rough: {iters} iters x {n_envs} envs in {wall:.0f}s "
          f"({iters * n_envs * runner.cfg.num_steps / wall:.0f} steps/s); "
          f"obs=235; reward first5={np.mean(r[:5]):.4f} "
          f"last5={np.mean(r[-5:]):.4f} finite={np.all(np.isfinite(r))}",
          flush=True)


if __name__ == "__main__":
    main()
