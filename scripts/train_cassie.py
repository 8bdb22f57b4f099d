"""Cassie biped: converged velocity-command training + tracking eval
(round-5 VERDICT item 5 — "get cassie walking").

The round-4 sanity run (flat 100/3 gains, action_scale 0.25, 500 iters)
only learned to avoid the -200 termination penalty. This run uses the
reference's per-joint PD tables + action_scale 0.5
(ref cassie_config.py control block) and trains long enough to converge,
then evaluates: command-tracking error, single-stance (no_fly) fraction,
and survival over a 500-step rollout of the trained deterministic policy.
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

    iters = int(os.environ.get("ITERS", "2000"))
    n_envs = int(os.environ.get("ENVS", "4096"))
    env = task_registry.make_env("cassie_velocity", num_envs=n_envs)
    runner = task_registry.make_alg_runner(
        env, "cassie_velocity", log_root="/tmp/cassie_logs", seed=0)
    t0 = time.perf_counter()
    hist = runner.learn(iters, save_interval=max(iters // 4, 1),
                        log_interval=100)
    wall = time.perf_counter() - t0
    r = [h["mean_reward"] for h in hist]
    print(f"cassie_velocity: {iters} iters x {n_envs} envs in {wall:.0f}s "
          f"({iters * n_envs * runner.cfg.num_steps / wall:.0f} steps/s); "
          f"reward first5={np.mean(r[:5]):.4f} last5={np.mean(r[-5:]):.4f} "
          f"max={np.max(r):.4f} finite={np.all(np.isfinite(r))}", flush=True)

    from legged_gym_dev_tpu.evaluation import evaluate_velocity_tracking

    policy = runner.get_inference_policy()
    stats = evaluate_velocity_tracking(env, policy, jax.random.PRNGKey(123))
    print(f"cassie eval: {stats}", flush=True)


if __name__ == "__main__":
    main()
