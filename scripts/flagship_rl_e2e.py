"""Flagship RL pipeline: the reference's ACTUAL workflow, end to end.

train RL policy -> fixture tracking eval -> collect tube data FROM THE
TRAINED POLICY -> one-shot tube training -> batched NN-tube closed-loop
MPC. This is the sequence the reference runs as train_rl.py (wandb best
artifact) -> evaluate_rl_policy.py (zero/square/circle fixtures) ->
data_collection_trajectory.py (policy from wandb) -> train_tube.py ->
tube_planning_closed_loop.py — here as one TPU program flow with the
rigid-body hopper sim instead of Isaac Gym.

Run on the chip:  timeout 5400 python scripts/flagship_rl_e2e.py
Env knobs: TRAIN_ITERS (2000), TRAIN_ENVS (4096), COLLECT_EPOCHS (2),
           COLLECT_ENVS (1024), B (1024), H (75), EPOCHS (40)
"""
import json
import os
import sys
import time
import types

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from legged_gym_dev_tpu.utils.runtime import force_cpu, setup_tpu_runtime

    if os.environ.get("E2E_CPU"):
        force_cpu()  # smoke-test harness; real numbers come from the chip
    else:
        setup_tpu_runtime()

    import jax
    import jax.numpy as jnp

    TRAIN_ITERS = int(os.environ.get("TRAIN_ITERS", "2000"))
    TRAIN_ENVS = int(os.environ.get("TRAIN_ENVS", "4096"))
    COLLECT_EPOCHS = int(os.environ.get("COLLECT_EPOCHS", "2"))
    COLLECT_ENVS = int(os.environ.get("COLLECT_ENVS", "1024"))
    B = int(os.environ.get("B", "1024"))
    H = int(os.environ.get("H", "75"))
    EPOCHS = int(os.environ.get("EPOCHS", "40"))
    N, H_REV = 50, 10
    LINSOLVE = os.environ.get("LINSOLVE", "pallas")
    PROBLEM = os.environ.get("PROBLEM", "gap")

    report = {}

    # ------------------------------------------------------------------
    # 1. Train the hopper trajectory-tracking policy (ref train_rl.py)
    # ------------------------------------------------------------------
    from legged_gym_dev_tpu import envs  # noqa: F401
    from legged_gym_dev_tpu.envs import task_registry

    t0 = time.perf_counter()
    env = task_registry.make_env("hopper_trajectory", num_envs=TRAIN_ENVS)
    runner = task_registry.make_alg_runner(
        env, "hopper_trajectory", log_root="/tmp/flagship_rl_logs",
        run_name="flagship", seed=0)
    hist = runner.learn(TRAIN_ITERS, save_interval=500, log_interval=50)
    t_train_rl = time.perf_counter() - t0
    rewards = [h["mean_reward"] for h in hist]
    report["rl_train"] = {
        "iters": TRAIN_ITERS, "envs": TRAIN_ENVS,
        "wall_s": round(t_train_rl, 1),
        "reward_first": round(float(rewards[0]), 4),
        "reward_last": round(float(np.mean(rewards[-5:])), 4),
        "env_steps_per_s": round(
            TRAIN_ITERS * TRAIN_ENVS * 24 / t_train_rl),
    }
    print(f"[1/5] RL train: {TRAIN_ITERS} iters in {t_train_rl:.0f}s, "
          f"reward {rewards[0]:.3f} -> {np.mean(rewards[-5:]):.3f}",
          flush=True)

    policy = runner.get_inference_policy()

    # ------------------------------------------------------------------
    # 2. Fixture tracking eval (ref evaluate_rl_policy.py:14-174)
    # ------------------------------------------------------------------
    from legged_gym_dev_tpu.evaluation import evaluate_tracking_policy
    from legged_gym_dev_tpu.trajgen.generator import (
        CircleTrajectoryGenerator,
        SquareTrajectoryGenerator,
        ZeroTrajectoryGenerator,
    )

    t0 = time.perf_counter()
    eval_env = task_registry.make_env("hopper_trajectory", num_envs=256,
                                      add_noise=False)
    fixtures = {}
    for name, cls in (("zero", ZeroTrajectoryGenerator),
                      ("square", SquareTrajectoryGenerator),
                      ("circle", CircleTrajectoryGenerator)):
        policy.reset() if hasattr(policy, "reset") else None
        m = evaluate_tracking_policy(eval_env, policy, cls, steps=400)
        fixtures[name] = {k: round(float(v), 4) for k, v in m.items()}
        print(f"   fixture {name}: {fixtures[name]}", flush=True)
    # Raibert-heuristic baseline on the same fixtures (the expert
    # controller the reference's data pipeline can use instead of RL).
    for name, cls in (("zero", ZeroTrajectoryGenerator),
                      ("square", SquareTrajectoryGenerator),
                      ("circle", CircleTrajectoryGenerator)):
        m = evaluate_tracking_policy(eval_env, eval_env.raibert, cls,
                                     steps=400)
        fixtures[f"raibert_{name}"] = {k: round(float(v), 4)
                                       for k, v in m.items()}
    report["fixture_tracking"] = fixtures
    report["fixture_tracking"]["wall_s"] = round(time.perf_counter() - t0, 1)
    print(f"[2/5] fixture tracking eval done (incl. raibert baseline)",
          flush=True)

    # ------------------------------------------------------------------
    # 3. Collect tube data FROM THE TRAINED POLICY (ref
    #    data_collection_trajectory.py:56-149, wandb-policy path)
    # ------------------------------------------------------------------
    from legged_gym_dev_tpu.tube.collect import collect_tracking
    from legged_gym_dev_tpu.tube.datasets import RolloutData

    t0 = time.perf_counter()
    col_env = task_registry.make_env("hopper_trajectory",
                                     num_envs=COLLECT_ENVS, add_noise=False)
    parts = [
        collect_tracking(col_env, policy,
                         jax.random.fold_in(jax.random.PRNGKey(3), e),
                         episode_length_s=10.0)
        for e in range(COLLECT_EPOCHS)
    ]
    data = RolloutData.concatenate(parts)
    t_collect = time.perf_counter() - t0
    err = np.linalg.norm(
        np.asarray(data.pz_x) - np.asarray(data.z), axis=-1)
    report["collect"] = {
        "episodes": int(data.z.shape[0]),
        "rom_steps": int(data.z.shape[0] * data.v.shape[1]),
        "wall_s": round(t_collect, 1),
        "mean_tracking_err": round(float(err.mean()), 4),
        "p95_tracking_err": round(float(np.percentile(err, 95)), 4),
    }
    print(f"[3/5] collected {data.z.shape[0]} episodes from the trained "
          f"policy in {t_collect:.0f}s (mean err {err.mean():.3f})",
          flush=True)

    # ------------------------------------------------------------------
    # 4. One-shot tube training on policy rollouts (ref train_tube.py +
    #    tube_learning_oneshot.yaml: VectorTubeLoss alpha=0.9)
    # ------------------------------------------------------------------
    from legged_gym_dev_tpu.tube.datasets import scalar_horizon_tube_dataset
    from legged_gym_dev_tpu.tube.losses import vector_tube_loss
    from legged_gym_dev_tpu.tube.models import MLP
    from legged_gym_dev_tpu.tube.train import TrainConfig, train_tube

    t0 = time.perf_counter()
    ds = scalar_horizon_tube_dataset(data, H_fwd=N, H_rev=H_REV)
    model = MLP.create(jax.random.PRNGKey(1), ds.input_dim, ds.output_dim,
                       num_units=128, num_layers=2,
                       final_activation="softplus")
    res = train_tube(
        ds, model,
        lambda fw, w, x: vector_tube_loss(fw, w, alpha=0.9),
        TrainConfig(epochs=EPOCHS, batch_size=1024, eval_every=10),
    )
    t_tube = time.perf_counter() - t0
    last_eval = next(r for r in reversed(res.history) if "coverage" in r)
    report["tube_train"] = {
        "epochs": EPOCHS,
        "one_step_coverage": round(last_eval["coverage"], 4),
        "wall_s": round(t_tube, 1),
    }
    print(f"[4/5] tube net: coverage={last_eval['coverage']:.3f} in "
          f"{t_tube:.0f}s", flush=True)

    # ------------------------------------------------------------------
    # 5. Batched NN-tube closed-loop MPC with the policy-data tube
    #    (ref tube_planning_closed_loop.py)
    # ------------------------------------------------------------------
    from legged_gym_dev_tpu.core import DoubleInt2D, make_rom
    from legged_gym_dev_tpu.evaluation import evaluate_tube_on_mpc_trace
    from legged_gym_dev_tpu.solver import ALConfig, PROBLEM_DICT, TrajOptParams
    from legged_gym_dev_tpu.solver.fast_tube import closed_loop_tube_mpc_fast

    prob = PROBLEM_DICT[PROBLEM]
    pm = make_rom("SingleInt2D", prob["dt"], [-prob["pos_max"]] * 2,
                  [prob["pos_max"]] * 2, [-prob["vel_max"]] * 2,
                  [prob["vel_max"]] * 2)
    p = TrajOptParams.create(
        pm, N, H_REV, 10 * np.eye(2), 10 * np.eye(2),
        prob["start"], prob["goal"], prob["obs"]["c"], prob["obs"]["r"],
        Qw=0.1, w_max=1.0, tube_params=res.best_model,
    )
    rng = np.random.default_rng(0)
    p_batch = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape), p)
    p_batch = p_batch.replace(
        z0=p_batch.z0 + jnp.asarray(rng.uniform(-0.15, 0.15, (B, 2)),
                                    jnp.float32),
        zf=p_batch.zf + jnp.asarray(rng.uniform(-0.15, 0.15, (B, 2)),
                                    jnp.float32),
        obs_r=p_batch.obs_r * jnp.asarray(rng.uniform(0.85, 1.0, (B, 2)),
                                          jnp.float32),
    )
    robot = DoubleInt2D.create(
        prob["dt"], [-np.inf, -np.inf, -0.3, -0.3],
        [np.inf, np.inf, 0.3, 0.3], [-0.5, -0.5], [0.5, 0.5],
    )
    run = jax.jit(jax.vmap(lambda pp: closed_loop_tube_mpc_fast(
        pp, robot, tube_kind="NN_oneshot", scaling=0.5, H=H, N=N,
        H_rev=H_REV,
        cfg_first=ALConfig(nn_basis_refresh=3, linsolve=LINSOLVE),
        # 4x6-chunk3 loop schedule: fits the 0.1 s ROM tick at B=1024
        # (83.4 ms/tick) at equal adoption/coverage to 5x6
        # (scripts/tune_loop_schedule.py sweep, docs/PERF.md).
        cfg_loop=ALConfig(outer_iters=4, inner_iters=6, nn_basis_refresh=3,
                          linsolve=LINSOLVE),
        warm_start="nominal", tube_ws="evaluate",
    )))
    t0 = time.perf_counter()
    out = run(p_batch)
    np.asarray(out[0])
    t_first = time.perf_counter() - t0
    for _ in range(2):
        out = run(p_batch)
    np.asarray(out[0])
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = run(p_batch)
        np.asarray(out[0])
        ts.append(time.perf_counter() - t0)
    t_mpc = min(ts)
    z_t, v_t, w_t, pzx_t, viols, adopts = [np.asarray(o) for o in out]
    per_resolve = t_mpc / (H + 1)
    goal_dist = np.linalg.norm(z_t[:, -1] - np.asarray(prob["goal"]),
                               axis=-1)
    trace = types.SimpleNamespace(
        z=z_t.reshape(-1, z_t.shape[-1]), w=w_t.reshape(-1),
        pz_x=pzx_t.reshape(-1, pzx_t.shape[-1]),
        viol=viols, converged=viols < 1e-3,
    )
    cov = evaluate_tube_on_mpc_trace(trace)
    report["mpc"] = {
        "problem": PROBLEM, "scenarios": B, "H": H, "wall_s": round(t_mpc, 3),
        "compile_plus_first_s": round(t_first, 1),
        "per_resolve_batched_s": round(per_resolve, 4),
        "rom_tick_budget_s": prob["dt"],
        "realtime_batched": bool(per_resolve < prob["dt"]),
        "resolves_per_s": round(B * (H + 1) / t_mpc, 1),
        "adopted_frac": float(adopts.mean()),
        "median_goal_dist": float(np.median(goal_dist)),
        "tube_coverage_on_trace": round(cov["coverage"], 4),
        "tube_mean_width": round(cov["mean_width"], 4),
        "tube_mean_error": round(cov["mean_error"], 4),
    }
    print(f"[5/5] NN-tube MPC (policy-data tube): {B}x{H} in {t_mpc:.2f}s "
          f"-> {per_resolve*1000:.1f} ms/re-solve "
          f"({'REAL-TIME' if per_resolve < prob['dt'] else 'OVER BUDGET'}); "
          f"coverage {cov['coverage']:.3f}", flush=True)

    print(json.dumps(report))


if __name__ == "__main__":
    main()
