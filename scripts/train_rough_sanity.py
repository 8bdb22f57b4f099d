"""Rough-terrain perceptive training (round-5 VERDICT item 2): PPO on
`anymal_c_rough` — 235-dim observations with the 187-point height scan,
procedural trimesh-family terrain grid + game-inspired level curriculum
(ref anymal_c_rough_config.py, legged_robot.py:463-477
_update_terrain_curriculum) — trained long enough to show terrain-level
PROMOTION, with the level curve recorded per chunk.

Round-5 perf state: the contact path samples terrain via the pre-quadded
single-slice gather + analytic gradients (utils/terrain.py); stepping
measured 379k steps/s at B=2048 pre-quad-gather, vs 41k TRAINING steps/s
in round 4 (docs/PERF.md)."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from legged_gym_dev_tpu.utils.runtime import setup_tpu_runtime

    setup_tpu_runtime()
    import jax

    from legged_gym_dev_tpu import envs  # noqa: F401
    from legged_gym_dev_tpu.envs import task_registry

    iters = int(os.environ.get("ITERS", "1500"))
    n_envs = int(os.environ.get("ENVS", "2048"))
    chunk = int(os.environ.get("CHUNK", "100"))
    env = task_registry.make_env("anymal_c_rough", num_envs=n_envs)
    assert env.num_obs == 235, env.num_obs
    runner = task_registry.make_alg_runner(
        env, "anymal_c_rough", log_root="/tmp/rough_logs", seed=0)
    t0 = time.perf_counter()
    rewards, level_curve = [], []
    done = 0
    while done < iters:
        n = min(chunk, iters - done)
        hist = runner.learn(n, save_interval=iters, log_interval=chunk)
        done += n
        rewards += [h["mean_reward"] for h in hist]
        lvl = float(np.asarray(runner.env_state.terrain_levels).mean())
        mx = int(np.asarray(runner.env_state.terrain_levels).max())
        level_curve.append((done, round(lvl, 3), mx))
        print(f"  iter {done}: mean_terrain_level={lvl:.3f} max={mx} "
              f"reward={np.mean(rewards[-5:]):.4f}", flush=True)
    wall = time.perf_counter() - t0
    r = rewards
    print(f"anymal_c_rough: {iters} iters x {n_envs} envs in {wall:.0f}s "
          f"({iters * n_envs * runner.cfg.num_steps / wall:.0f} steps/s); "
          f"obs=235; reward first5={np.mean(r[:5]):.4f} "
          f"last5={np.mean(r[-5:]):.4f} finite={np.all(np.isfinite(r))}",
          flush=True)
    print(f"terrain level curve [(iter, mean, max)]: {level_curve}",
          flush=True)


if __name__ == "__main__":
    main()
