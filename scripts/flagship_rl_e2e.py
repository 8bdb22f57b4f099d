"""Flagship RL pipeline: the reference's ACTUAL workflow, end to end.

train RL policy -> best{stage} checkpoint selection -> fixture tracking
eval -> collect tube data FROM THE TRAINED POLICY -> one-shot tube training
+ split-conformal calibration -> batched NN-tube closed-loop MPC. This is
the sequence the reference runs as train_rl.py (wandb best artifact) ->
evaluate_rl_policy.py (zero/square/circle fixtures) ->
data_collection_trajectory.py (policy from wandb) -> train_tube.py ->
tube_planning_closed_loop.py — here as one TPU program flow with the
rigid-body sim instead of Isaac Gym, runnable on ANY registered
trajectory task (TASK=hopper_trajectory | anymal_c_trajectory |
a1_trajectory).

Checkpoint selection mirrors the reference's stage-gated ``best{stage}``
aliases (ref deep_tube_learning/utils.py:314-344): the runner stores the
best-reward checkpoint per curriculum stage, and the flagship then
evaluates EVERY best{stage} candidate (plus ``latest``) on the three
tracking fixtures and operates the winner — instead of a hand-picked
iteration count (the round-3 24k-iteration negative result is exactly the
failure this machinery prevents, docs/PERF.md).

Run on the chip:  timeout 5400 python scripts/flagship_rl_e2e.py
Env knobs: TASK (hopper_trajectory), TRAIN_ITERS (2000), TRAIN_ENVS (4096),
           CURRICULUM (single_int for hopper; none disables),
           WEIGHT_SAMPLER (e.g. UniformWeightSamplerTurnBiased),
           COLLECT_EPOCHS (2), COLLECT_ENVS (1024), B (1024), H (75),
           EPOCHS (40), PROBLEM (gap), REPORT (report JSON path)
"""
import json
import os
import sys
import time
import types

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FIXTURE_ENVS = int(os.environ.get("FIXTURE_ENVS", "256"))
FIXTURE_STEPS = int(os.environ.get("FIXTURE_STEPS", "400"))


def main():
    from legged_gym_dev_tpu.utils.runtime import force_cpu, setup_tpu_runtime

    if os.environ.get("E2E_CPU"):
        force_cpu()  # smoke-test harness; real numbers come from the chip
    else:
        setup_tpu_runtime()

    import jax
    import jax.numpy as jnp

    TASK = os.environ.get("TASK", "hopper_trajectory")
    TRAIN_ITERS = int(os.environ.get("TRAIN_ITERS", "2000"))
    TRAIN_ENVS = int(os.environ.get("TRAIN_ENVS", "4096"))
    CURRICULUM = os.environ.get(
        "CURRICULUM", "single_int" if TASK == "hopper_trajectory" else "none")
    WEIGHT_SAMPLER = os.environ.get("WEIGHT_SAMPLER", "")
    COLLECT_EPOCHS = int(os.environ.get("COLLECT_EPOCHS", "2"))
    COLLECT_ENVS = int(os.environ.get("COLLECT_ENVS", "1024"))
    B = int(os.environ.get("B", "1024"))
    H = int(os.environ.get("H", "75"))
    EPOCHS = int(os.environ.get("EPOCHS", "40"))
    N, H_REV = 50, 10
    LINSOLVE = os.environ.get("LINSOLVE", "pallas")
    PROBLEM = os.environ.get("PROBLEM", "gap")
    REPORT = os.environ.get("REPORT", "/tmp/flagship_rl_report.json")
    SAVE_INTERVAL = int(os.environ.get("SAVE_INTERVAL", "200"))

    report = {"task": TASK, "curriculum": CURRICULUM,
              "weight_sampler": WEIGHT_SAMPLER or "default"}

    # ------------------------------------------------------------------
    # 1. Train the trajectory-tracking policy (ref train_rl.py)
    # ------------------------------------------------------------------
    from legged_gym_dev_tpu import envs  # noqa: F401
    from legged_gym_dev_tpu.envs import task_registry
    from legged_gym_dev_tpu.rl.runner import make_curriculum_stage_fn

    env_kw = {"num_envs": TRAIN_ENVS}
    if TASK == "hopper_trajectory":
        if CURRICULUM != "none":
            env_kw["curriculum"] = CURRICULUM
        if WEIGHT_SAMPLER:
            env_kw["weight_sampler"] = WEIGHT_SAMPLER

    t0 = time.perf_counter()
    env = task_registry.make_env(TASK, **env_kw)
    runner = task_registry.make_alg_runner(
        env, TASK, log_root="/tmp/flagship_rl_logs",
        run_name="flagship", seed=0)
    stage_fn = None
    if getattr(env, "curriculum", None) is not None and env.curriculum.enabled:
        stage_fn = make_curriculum_stage_fn(env.curriculum,
                                            runner.cfg.num_steps)
    hist = runner.learn(TRAIN_ITERS, save_interval=SAVE_INTERVAL,
                        log_interval=50, curriculum_stage_fn=stage_fn)
    t_train_rl = time.perf_counter() - t0
    rewards = [h["mean_reward"] for h in hist]
    report["rl_train"] = {
        "iters": TRAIN_ITERS, "envs": TRAIN_ENVS,
        "wall_s": round(t_train_rl, 1),
        "reward_first": round(float(rewards[0]), 4),
        "reward_last": round(float(np.mean(rewards[-5:])), 4),
        "env_steps_per_s": round(
            TRAIN_ITERS * TRAIN_ENVS * runner.cfg.num_steps / t_train_rl),
    }
    print(f"[1/5] RL train {TASK}: {TRAIN_ITERS} iters in {t_train_rl:.0f}s, "
          f"reward {rewards[0]:.3f} -> {np.mean(rewards[-5:]):.3f}",
          flush=True)

    # ------------------------------------------------------------------
    # 2. best{stage} selection + fixture tracking eval (ref
    #    evaluate_rl_policy.py:14-174 + utils.py:314-344)
    # ------------------------------------------------------------------
    from legged_gym_dev_tpu.evaluation import evaluate_tracking_policy
    from legged_gym_dev_tpu.trajgen.generator import (
        CircleTrajectoryGenerator,
        SquareTrajectoryGenerator,
        ZeroTrajectoryGenerator,
    )

    FIXTURES = (("zero", ZeroTrajectoryGenerator),
                ("square", SquareTrajectoryGenerator),
                ("circle", CircleTrajectoryGenerator))

    t0 = time.perf_counter()
    eval_env = task_registry.make_env(TASK, num_envs=FIXTURE_ENVS,
                                      add_noise=False)

    def eval_fixtures(policy):
        out = {}
        for name, cls in FIXTURES:
            policy.reset() if hasattr(policy, "reset") else None
            m = evaluate_tracking_policy(eval_env, policy, cls,
                                         steps=FIXTURE_STEPS)
            out[name] = {k: round(float(v), 4) for k, v in m.items()}
        return out

    candidates = ["latest"] + [f"best{s}" for s in runner.ckpt.best_stages()]
    selection = {}
    best_name, best_err, best_fixtures = None, np.inf, None
    for name in candidates:
        runner.load(name)
        fx = eval_fixtures(runner.get_inference_policy())
        mean_err = float(np.mean([fx[f]["mean_tracking_error"] for f, _ in FIXTURES]))
        selection[name] = {"fixture_mean_err": round(mean_err, 4),
                           **{f: fx[f]["mean_tracking_error"] for f, _ in FIXTURES}}
        print(f"   candidate {name}: mean fixture err {mean_err:.4f} "
              f"({selection[name]})", flush=True)
        if mean_err < best_err:
            best_name, best_err, best_fixtures = name, mean_err, fx
    runner.load(best_name)
    policy = runner.get_inference_policy()
    fixtures = dict(best_fixtures)
    print(f"   SELECTED {best_name} (mean fixture err {best_err:.4f})",
          flush=True)

    # Raibert-heuristic baseline on the same fixtures (hopper only: the
    # expert controller the reference's data pipeline can use instead of
    # RL, ref controllers.py:38-65).
    if hasattr(eval_env, "raibert"):
        for name, cls in FIXTURES:
            m = evaluate_tracking_policy(eval_env, eval_env.raibert, cls,
                                         steps=FIXTURE_STEPS)
            fixtures[f"raibert_{name}"] = {k: round(float(v), 4)
                                           for k, v in m.items()}
    report["checkpoint_selection"] = {"candidates": selection,
                                      "selected": best_name}
    report["fixture_tracking"] = fixtures
    report["fixture_tracking"]["wall_s"] = round(time.perf_counter() - t0, 1)
    print(f"[2/5] best-stage selection + fixture eval done "
          f"({len(candidates)} candidates)", flush=True)

    if os.environ.get("STOP_AFTER") == "2":
        # Ablation mode: training + fixture comparison only (per-item
        # attribution runs skip the tube/MPC phases).
        with open(REPORT, "w") as f:
            json.dump(report, f, indent=1)
        print(json.dumps(report))
        return

    # ------------------------------------------------------------------
    # 3. Collect tube data FROM THE SELECTED POLICY (ref
    #    data_collection_trajectory.py:56-149, wandb-policy path)
    # ------------------------------------------------------------------
    from legged_gym_dev_tpu.tube.collect import collect_tracking
    from legged_gym_dev_tpu.tube.datasets import RolloutData

    t0 = time.perf_counter()
    col_env = task_registry.make_env(TASK, num_envs=COLLECT_ENVS,
                                     add_noise=False)
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
    print(f"[3/5] collected {data.z.shape[0]} episodes from the selected "
          f"policy in {t_collect:.0f}s (mean err {err.mean():.3f})",
          flush=True)

    # ------------------------------------------------------------------
    # 4. One-shot tube training on policy rollouts + split-conformal
    #    calibration (ref train_tube.py + tube_learning_oneshot.yaml:
    #    VectorTubeLoss alpha=0.9; ref datasets.py:281-357 alpha machinery)
    # ------------------------------------------------------------------
    from legged_gym_dev_tpu.tube.datasets import scalar_horizon_tube_dataset
    from legged_gym_dev_tpu.tube.losses import vector_tube_loss
    from legged_gym_dev_tpu.tube.models import MLP
    from legged_gym_dev_tpu.tube.train import (
        TrainConfig,
        conformal_width_scale,
        train_tube,
    )

    t0 = time.perf_counter()
    # Episode-level split: the last 10% of episodes are NEVER seen by
    # training or best-model selection — they are the split-conformal
    # calibration set.
    E = data.z.shape[0]
    n_cal = max(E // 10, 1)
    data_train = RolloutData(z=data.z[:-n_cal], v=data.v[:-n_cal],
                             pz_x=data.pz_x[:-n_cal], done=data.done[:-n_cal])
    data_cal = RolloutData(z=data.z[-n_cal:], v=data.v[-n_cal:],
                           pz_x=data.pz_x[-n_cal:], done=data.done[-n_cal:])
    ds = scalar_horizon_tube_dataset(data_train, H_fwd=N, H_rev=H_REV)
    ds_cal = scalar_horizon_tube_dataset(data_cal, H_fwd=N, H_rev=H_REV)
    model = MLP.create(jax.random.PRNGKey(1), ds.input_dim, ds.output_dim,
                       num_units=128, num_layers=2,
                       final_activation="softplus")
    res = train_tube(
        ds, model,
        lambda fw, w, x: vector_tube_loss(fw, w, alpha=0.9),
        TrainConfig(epochs=EPOCHS, batch_size=1024, eval_every=10),
    )
    # Split-conformal width multiplier targeting the per-step coverage the
    # closed loop reports; attach 1.0 when uncalibrated so BOTH variants
    # share one pytree structure (= one compiled MPC program).
    base_model = res.best_model.replace(out_scale=jnp.asarray(1.0))
    rng_cal = np.random.default_rng(11)
    s = conformal_width_scale(base_model, ds_cal, alpha=0.9,
                              per_step=True, rng=rng_cal)
    cal_model = res.best_model.replace(out_scale=jnp.asarray(s))
    xb, yb = ds_cal.sample_batch(np.random.default_rng(12), 8192)
    cov_pre = float(np.mean(np.asarray(base_model(jnp.asarray(xb))) >= yb))
    cov_post = float(np.mean(np.asarray(cal_model(jnp.asarray(xb))) >= yb))
    t_tube = time.perf_counter() - t0
    last_eval = next(r for r in reversed(res.history) if "coverage" in r)
    report["tube_train"] = {
        "epochs": EPOCHS,
        "one_step_coverage": round(last_eval["coverage"], 4),
        "conformal_scale": round(s, 4),
        "cal_step_coverage_pre": round(cov_pre, 4),
        "cal_step_coverage_post": round(cov_post, 4),
        "wall_s": round(t_tube, 1),
    }
    print(f"[4/5] tube net: window coverage={last_eval['coverage']:.3f}, "
          f"conformal scale={s:.3f} "
          f"(cal per-step coverage {cov_pre:.3f} -> {cov_post:.3f}) "
          f"in {t_tube:.0f}s", flush=True)

    # ------------------------------------------------------------------
    # 5. Batched NN-tube closed-loop MPC with the calibrated policy-data
    #    tube (ref tube_planning_closed_loop.py)
    # ------------------------------------------------------------------
    from legged_gym_dev_tpu.core import DoubleInt2D, make_rom
    from legged_gym_dev_tpu.evaluation import evaluate_tube_on_mpc_trace
    from legged_gym_dev_tpu.solver import ALConfig, PROBLEM_DICT, TrajOptParams
    from legged_gym_dev_tpu.solver.fast_tube import closed_loop_tube_mpc_fast

    prob = PROBLEM_DICT[PROBLEM]
    # The planning ROM's input bound comes from the DATA-COLLECTION env's
    # ROM, not the problem preset: the tube net was trained on inputs
    # |v| <= v_max_data, and querying it at the preset's (possibly much
    # larger) vel_max asks for out-of-distribution widths (the anymal's
    # first run planned at 1.0 m/s on a 0.35 m/s-data tube — trace
    # coverage collapsed to 0.34). The closed-loop surrogate plant's
    # authority scales the same way so its tracking roughness matches the
    # robot the tube was trained for (hopper: 1.5x/2.5x reproduce the
    # round-3 surrogate exactly: vel 0.3, accel 0.5 at v_max_data=0.2).
    v_max_data = float(np.asarray(col_env.rom.v_max).max())
    vel_scale = float(os.environ.get("ROBOT_VEL_SCALE", "1.5"))
    acc_scale = float(os.environ.get("ROBOT_ACC_SCALE", "2.5"))
    v_plan = min(float(prob["vel_max"]), v_max_data)
    report["mpc_env"] = {
        "v_max_data": round(v_max_data, 4), "v_plan": round(v_plan, 4),
        "robot_vel": round(vel_scale * v_max_data, 4),
        "robot_acc": round(acc_scale * v_max_data, 4),
    }
    pm = make_rom("SingleInt2D", prob["dt"], [-prob["pos_max"]] * 2,
                  [prob["pos_max"]] * 2, [-v_plan] * 2, [v_plan] * 2)

    def build_batch(tube_model, seed=0):
        p = TrajOptParams.create(
            pm, N, H_REV, 10 * np.eye(2), 10 * np.eye(2),
            prob["start"], prob["goal"], prob["obs"]["c"], prob["obs"]["r"],
            Qw=0.1, w_max=1.0, tube_params=tube_model,
        )
        rng = np.random.default_rng(seed)
        pb = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape), p)
        return pb.replace(
            z0=pb.z0 + jnp.asarray(rng.uniform(-0.15, 0.15, (B, 2)),
                                   jnp.float32),
            zf=pb.zf + jnp.asarray(rng.uniform(-0.15, 0.15, (B, 2)),
                                   jnp.float32),
            obs_r=pb.obs_r * jnp.asarray(rng.uniform(0.85, 1.0, (B, 2)),
                                         jnp.float32),
        )

    rv = vel_scale * v_max_data
    ra = acc_scale * v_max_data
    robot = DoubleInt2D.create(
        prob["dt"], [-np.inf, -np.inf, -rv, -rv],
        [np.inf, np.inf, rv, rv], [-ra, -ra], [ra, ra],
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

    def run_loop(tube_model, label, seed=0):
        p_batch = build_batch(tube_model, seed=seed)
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
        rec = {
            "problem": PROBLEM, "scenarios": B, "H": H,
            "wall_s": round(t_mpc, 3),
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
        print(f"   {label}: {per_resolve*1000:.1f} ms/re-solve "
              f"({'REAL-TIME' if per_resolve < prob['dt'] else 'OVER BUDGET'})"
              f", adoption {rec['adopted_frac']:.3f}, "
              f"coverage {cov['coverage']:.3f}", flush=True)
        return rec

    report["mpc_uncalibrated"] = run_loop(base_model, "uncalibrated tube")
    report["mpc"] = run_loop(cal_model, "calibrated tube ")

    # 5b. Closed-loop trace-conformal calibration (round-5 VERDICT item
    # 7): the robot-data conformal scale is exact on held-out robot
    # rollouts but the surrogate-plant closed loop shifts the error
    # distribution (quadruped r4: 0.901 held-out vs 0.860 executed).
    # Run the loop once on a DISJOINT calibration scenario batch, take
    # the finite-sample alpha-quantile of realized error/width, and
    # compound it into out_scale; then report coverage on the original
    # eval scenarios with the trace-calibrated tube.
    from legged_gym_dev_tpu.evaluation import trace_conformal_scale

    cal_out = run(build_batch(cal_model, seed=101))
    zc, _, wc, pzc = [np.asarray(o) for o in cal_out[:4]]
    cal_trace = types.SimpleNamespace(
        z=zc.reshape(-1, zc.shape[-1]), w=wc.reshape(-1),
        pz_x=pzc.reshape(-1, pzc.shape[-1]))
    q_tr = trace_conformal_scale(cal_trace, alpha=0.9)
    tc_model = res.best_model.replace(out_scale=jnp.asarray(s * q_tr))
    report["trace_conformal"] = {"scale_q": round(q_tr, 4),
                                 "out_scale": round(s * q_tr, 4)}
    report["mpc_trace_cal"] = run_loop(tc_model, "trace-calibrated")
    print(f"[5/5] NN-tube MPC done (calibrated adoption "
          f"{report['mpc']['adopted_frac']:.3f}, coverage "
          f"{report['mpc']['tube_coverage_on_trace']:.3f}; trace-cal "
          f"q={q_tr:.3f} -> coverage "
          f"{report['mpc_trace_cal']['tube_coverage_on_trace']:.3f} at "
          f"adoption {report['mpc_trace_cal']['adopted_frac']:.3f})",
          flush=True)

    with open(REPORT, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
