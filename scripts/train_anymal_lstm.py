"""ANYmal-C PPO THROUGH the LSTM actuator network (round-5 VERDICT
item 4).

The reference trains ANYmal with the anydrive_v3 LSTM as the in-loop
actuator (ref anymal.py:71-81, loaded at :52-54). Here the ported net
(TorchScript-parity weights, sim/actuator_net.py) advances its hidden
state EVERY SUBSTEP inside env.step (legged_robot_velocity.py sea_torque
via step_with_carry), with per-reset hidden zeroing. This run records:
  - training stability/reward with the SEA in the loop (never trained
    through before this round);
  - steps/s vs the PD-actuated anymal_c_velocity path, same session;
  - velocity-tracking eval of the trained policy.
Note: PPO does not differentiate through the actuator (the SEA is env
dynamics, like the physics itself); the risks are throughput (an LSTM
eval per substep) and SEA-torque-driven instability, not BPTT.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def train(task, iters, n_envs, seed=0):
    from legged_gym_dev_tpu.envs import task_registry

    env = task_registry.make_env(task, num_envs=n_envs)
    runner = task_registry.make_alg_runner(
        env, task, log_root=f"/tmp/{task}_logs", seed=seed)
    t0 = time.perf_counter()
    hist = runner.learn(iters, save_interval=max(iters // 2, 1),
                        log_interval=100)
    wall = time.perf_counter() - t0
    r = [h["mean_reward"] for h in hist]
    sps = iters * n_envs * runner.cfg.num_steps / wall
    print(f"{task}: {iters} iters x {n_envs} envs in {wall:.0f}s "
          f"({sps:.0f} steps/s); reward first5={np.mean(r[:5]):.4f} "
          f"last5={np.mean(r[-5:]):.4f} max={np.max(r):.4f} "
          f"finite={np.all(np.isfinite(r))}", flush=True)
    return env, runner, sps


def main():
    from legged_gym_dev_tpu.utils.runtime import setup_tpu_runtime

    setup_tpu_runtime()
    import jax

    from legged_gym_dev_tpu import envs  # noqa: F401
    from legged_gym_dev_tpu.evaluation import evaluate_velocity_tracking

    iters = int(os.environ.get("ITERS", "1500"))
    n_envs = int(os.environ.get("ENVS", "4096"))

    env, runner, sps_lstm = train("anymal_c_lstm", iters, n_envs)
    policy = runner.get_inference_policy()
    stats = evaluate_velocity_tracking(env, policy, jax.random.PRNGKey(7))
    print(f"anymal_c_lstm eval: {stats}", flush=True)

    # Same-session PD-path throughput reference (short run; the number of
    # interest is steps/s, not convergence).
    if os.environ.get("SKIP_PD", "") != "1":
        train("anymal_c_velocity", min(iters, 200), n_envs)


if __name__ == "__main__":
    main()
