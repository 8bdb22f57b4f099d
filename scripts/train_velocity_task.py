"""Generic velocity-task PPO driver: train any registered velocity task,
then run the package tracking eval (evaluation.evaluate_velocity_tracking).

    TASK=a1_velocity ITERS=500 ENVS=4096 python scripts/train_velocity_task.py

Used round 5 to diagnose per-robot task health (VERDICT items 5/6): if a
robot tracks on the velocity task but not the trajectory task, the gap is
task config; if neither, it is physics/gains.
"""
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
    from legged_gym_dev_tpu.evaluation import evaluate_velocity_tracking

    task = os.environ.get("TASK", "a1_velocity")
    iters = int(os.environ.get("ITERS", "500"))
    n_envs = int(os.environ.get("ENVS", "4096"))
    # Factory overrides, e.g. OVERRIDES='{"only_positive_rewards": false,
    # "sim_dt": 0.0025, "sim_decimation": 8}' (diagnosis knobs).
    import json
    overrides = json.loads(os.environ.get("OVERRIDES", "{}"))
    env = task_registry.make_env(task, num_envs=n_envs, **overrides)
    runner = task_registry.make_alg_runner(
        env, task, log_root=f"/tmp/{task}_logs", seed=0)
    t0 = time.perf_counter()
    hist = runner.learn(iters, save_interval=max(iters // 2, 1),
                        log_interval=100)
    wall = time.perf_counter() - t0
    r = [h["mean_reward"] for h in hist]
    print(f"{task}: {iters} iters x {n_envs} envs in {wall:.0f}s "
          f"({iters * n_envs * runner.cfg.num_steps / wall:.0f} steps/s); "
          f"reward first5={np.mean(r[:5]):.4f} last5={np.mean(r[-5:]):.4f} "
          f"max={np.max(r):.4f} finite={np.all(np.isfinite(r))}", flush=True)
    policy = runner.get_inference_policy()
    stats = evaluate_velocity_tracking(env, policy, jax.random.PRNGKey(7))
    print(f"{task} eval: {stats}", flush=True)


if __name__ == "__main__":
    main()
