"""Command-line entry points: train / play / collect / train-tube / plan / mpc.

Replaces the reference's script zoo (ref: legged_gym/scripts/train.py,
play.py; deep_tube_learning/train_rl.py, data_collection_trajectory.py,
train_tube.py; trajopt/nominal_planning.py, tube_planning.py,
tube_planning_closed_loop.py) and its three-tier class/CLI/Hydra config mix
with one argparse CLI over the task registry.

    python -m legged_gym_dev_tpu.cli train --task hopper_trajectory
    python -m legged_gym_dev_tpu.cli play  --task hopper_trajectory --load logs/...
    python -m legged_gym_dev_tpu.cli collect --epochs 4 --out data/rollouts.npz
    python -m legged_gym_dev_tpu.cli train-tube --data data/rollouts.npz
    python -m legged_gym_dev_tpu.cli plan --problem gap --tube-dyn l1
    python -m legged_gym_dev_tpu.cli mpc  --problem gap --tube-dyn l1 --H 75
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np


def _setup(args):
    from .utils.runtime import force_cpu, setup_tpu_runtime

    if getattr(args, "cpu", False):
        force_cpu()
    else:
        setup_tpu_runtime()


def cmd_train(args):
    _setup(args)
    import jax

    from . import envs  # noqa: F401 (registers presets)
    from .envs import task_registry
    from .utils.config import build_policy, env_kwargs

    env_kw = {}
    task = args.task or "hopper_trajectory"
    max_iterations = args.max_iterations
    seed = args.seed
    policy_cfg = None
    if args.config:
        from .utils.config import apply_train_overrides, load_config

        cfg = load_config(args.config)
        # CLI --task (explicitly passed) overrides the YAML task.
        task = args.task or cfg.get("task") or "hopper_trajectory"
        env_kw.update(env_kwargs(cfg.get("env")))
        policy_cfg = cfg.get("policy")
        run = cfg.get("run", {})
        max_iterations = run.get("max_iterations", max_iterations)
        seed = cfg.get("seed", run.get("seed", seed))
        if cfg.get("train"):
            entry = task_registry.get(task)
            entry.train_cfg = apply_train_overrides(
                entry.train_cfg, cfg["train"]
            )
    # CLI flags override YAML (reference precedence: update_cfg_from_args
    # after update_cfgs_from_hydra, ref helpers.py:208-231).
    if args.num_envs is not None:
        env_kw["num_envs"] = args.num_envs
    env_kw.setdefault("num_envs", 4096)
    args.task, args.max_iterations, args.seed = task, max_iterations, seed

    env = task_registry.make_env(args.task, **env_kw)
    # Policy architecture from the config tree (incl. `recurrent: true`
    # -> ActorCriticRecurrent); default mirrors the reference's hopper
    # dims (ref hopper_single_int.yaml policy block).
    model = build_policy(
        policy_cfg or {"actor_hidden_dims": [128, 64, 32],
                       "critic_hidden_dims": [128, 64, 32]},
        num_actions=env.num_actions,
    )
    mesh = None
    if args.dp_devices:
        from .parallel.mesh import make_mesh

        mesh = make_mesh(args.dp_devices)
    runner = task_registry.make_alg_runner(
        env, args.task, log_root=args.log_root, run_name=args.run_name,
        seed=args.seed, resume=args.resume, load_run=args.load, model=model,
        mesh=mesh,
    )
    hist = runner.learn(args.max_iterations)
    print(json.dumps({"final": hist[-1]}))


def _play_signals(env, state, tr):
    """Env-0 dashboard signals for the Logger's 9 panels (reference panel
    parity: dof pos/vel/torque, base velocities vs commands, contact force
    z, tracking error — ref legged_gym/utils/logger.py:61-126,
    scripts/play.py:112-199). Pure function of (state, transition); jitted
    once per play run."""
    import jax.numpy as jnp

    from .core.maths import quat_rotate_inverse

    sig = {"reward": tr.reward[0]}
    r = getattr(state, "robot", None)
    if r is None:
        # physics-free ROM envs: only obs-derived signals exist
        if env.num_obs > 5:
            sig["base_vel_x"] = tr.obs[0, 5]
        return sig
    lin_b = quat_rotate_inverse(r.base_quat[0:1], r.v[0:1, :3])[0]
    sig.update({
        "dof_pos": r.q[0],
        "dof_vel": r.v[0, 6:],
        "base_vel_x": lin_b[0],
        "base_vel_y": lin_b[1],
        "base_vel_z": lin_b[2],
        "base_vel_yaw": r.v[0, 5],
    })
    if getattr(state, "torques", None) is not None:
        sig["dof_torque"] = state.torques[0]
    if getattr(state, "actions", None) is not None:
        act_scale = getattr(env, "action_scale", 1.0)
        dd = getattr(env, "default_dof_pos", None)
        if dd is not None and state.actions.shape[1] == r.q.shape[1]:
            sig["dof_pos_target"] = act_scale * state.actions[0] + dd
    cmds = getattr(state, "commands", None)
    if cmds is not None:
        sig["command_x"] = cmds[0, 0]
        sig["command_y"] = cmds[0, 1]
        sig["command_yaw"] = cmds[0, 2]
    if getattr(state, "prev_error", None) is not None:
        sig["tracking_error"] = jnp.sqrt(jnp.sum(state.prev_error[0]))
    try:
        from .sim.contact import contact_forces
        from .sim.dynamics import contact_kinematics

        sim = env.sim
        pos, vel, _ = contact_kinematics(sim.model, r)
        f = contact_forces(sim.contact, pos, vel, sim.model.contact_radius,
                           sim.terrain_fn)
        feet = getattr(env, "feet_spheres", None)
        if not feet:
            fs = getattr(env, "foot_sphere", None)
            feet = (fs,) if fs is not None else None
        sig["contact_forces_z"] = (f[0, jnp.asarray(feet), 2] if feet
                                   else jnp.max(f[0, :, 2]))
    except (AttributeError, TypeError):
        pass
    return sig


def cmd_play(args):
    _setup(args)
    import jax
    import jax.numpy as jnp

    from . import envs  # noqa: F401
    from .envs import task_registry
    from .utils.export import (
        export_policy_onnx,
        export_policy_savedmodel,
        export_policy_stablehlo,
        export_policy_torchscript,
    )
    from .utils.logger import Logger

    env = task_registry.make_env(args.task, num_envs=args.num_envs,
                                 add_noise=False)
    # play always resumes a trained policy (ref scripts/play.py:57 sets
    # RESUME=True); --load overrides the run dir, else the most recent
    # run under <log_root>/<task> is used.
    runner = task_registry.make_alg_runner(
        env, args.task, log_root=args.log_root, seed=0,
        resume=True, load_run=args.checkpoint,
        load_dir=args.load,
    )
    policy = runner.get_inference_policy()

    if args.export:
        p = export_policy_stablehlo(policy, env.num_obs,
                                    os.path.join(args.export, "policy.shlo"))
        print(f"exported StableHLO: {p}")
        p2 = export_policy_savedmodel(policy, env.num_obs,
                                      os.path.join(args.export, "savedmodel"))
        print(f"exported SavedModel: {p2}")
        if runner.recurrent:
            # Stateful LSTM TorchScript module — the reference exports
            # recurrent policies through PolicyExporterLSTM
            # (ref: legged_gym/utils/helpers.py:287-313, play.py:74-87).
            from .utils.export import export_policy_lstm_torchscript

            p3 = export_policy_lstm_torchscript(
                runner.train_state.params,
                os.path.join(args.export, "policy_lstm.pt"))
            print(f"exported LSTM TorchScript: {p3}")
        else:
            p3 = export_policy_torchscript(
                runner.train_state.params,
                os.path.join(args.export, "policy.pt"))
            print(f"exported TorchScript: {p3}")
            p4 = export_policy_onnx(
                runner.train_state.params, env.num_obs,
                os.path.join(args.export, "policy.onnx"))
            print(f"exported ONNX: {p4}")

    viewer = None
    if getattr(args, "live", None) is not None:
        # Interactive browser viewer (the reference's Isaac Gym viewer
        # role, ref base_task.py:86-148 / play.py:96-110): frames over
        # HTTP, keyboard commands back (ESC quit, V sync, SPACE pause,
        # arrows/+-/F camera).
        from .utils.live_viewer import LiveViewer

        if not hasattr(env, "sim") or not hasattr(env.sim, "model"):
            raise SystemExit(f"{args.task} has no rigid-body state to view")
        viewer = LiveViewer(env.sim.model, port=args.live)

    logger = Logger(dt=env.dt)
    state, obs = env.reset(jax.random.PRNGKey(0))
    step = jax.jit(env.step)
    probe = jax.jit(lambda s, t: _play_signals(env, s, t))
    trace = []  # (base_pos, base_quat, q) of env 0 — reused for --video
    i = 0
    while i < args.steps:
        if viewer is not None and viewer.paused:
            time.sleep(0.05)
            if any(ev == "quit" for ev in viewer.pop_events()):
                break
            continue
        state, tr = step(state, policy(obs))
        obs = tr.obs
        sig = jax.tree.map(np.asarray, probe(state, tr))
        logger.log_states(sig)
        r = getattr(state, "robot", None)
        if r is not None:
            trace.append((np.asarray(r.base_pos[0]),
                          np.asarray(r.base_quat[0]),
                          np.asarray(r.q[0])))
            if viewer is not None:
                viewer.push_state(r.base_pos, r.base_quat, r.q)
        if viewer is not None and any(
                ev == "quit" for ev in viewer.pop_events()):
            break
        i += 1
    if viewer is not None:
        viewer.close()
    if args.plot:
        logger.plot_states(args.plot)
        print(f"dashboard saved: {args.plot}")
    if args.mat:
        logger.save_mat(args.mat)
        print(f"state log saved: {args.mat}")
    if args.video:
        # Render the SAME rollout that was just logged/plotted (not a fresh
        # reset): replay the recorded state trace of env 0.
        from .utils.video import render_state_trace

        if not trace:
            raise SystemExit(f"{args.task} has no rigid-body state to "
                             "render (physics-free ROM env)")
        n_vid = min(len(trace), args.video_steps or min(args.steps, 250))
        pos, quat, qs = (np.stack([t[k] for t in trace[:n_vid]])
                         for k in range(3))
        path = render_state_trace(env.sim.model, pos, quat, qs, args.video,
                                  fps=1.0 / env.dt)
        print(f"rollout video saved: {path}")


def cmd_collect(args):
    _setup(args)
    import jax

    from .tube.datasets import RolloutData

    if args.config:
        # data-generation config tree (ref configs/data_generation/*).
        from .utils.config import load_config

        col = load_config(args.config).get("collect", {})
        for key in ("task", "num_envs", "epochs", "episode_length_s",
                    "raibert"):
            if key in col:
                setattr(args, key, col[key])

    if args.task == "rom_tracking":
        # Physics-free ROM sim + PD tracker (ref custom_sim.py +
        # simple_data_collection.py).
        from .controllers import DoubleSingleTracking
        from .envs.presets import make_rom_tracking_env
        from .tube.collect import collect_epochs

        env = make_rom_tracking_env(num_envs=args.num_envs)
        sim = env.sim
        policy = DoubleSingleTracking.create(4.0, 4.0, sim.model.clip_v_z)
        data = collect_epochs(sim, policy, jax.random.PRNGKey(args.seed),
                              episode_length_s=args.episode_length_s,
                              epochs=args.epochs)
    else:
        # Rigid-body trajectory env with a trained RL policy, or the
        # Raibert heuristic on the hopper (ref
        # data_collection_trajectory.py:56-92).
        from . import envs  # noqa: F401
        from .envs import task_registry
        from .tube.collect import collect_tracking

        env = task_registry.make_env(args.task, num_envs=args.num_envs,
                                     add_noise=False)
        if args.raibert:
            policy = env.raibert  # hopper tasks carry the heuristic
            raibert_obs = True
        else:
            runner = task_registry.make_alg_runner(
                env, args.task, log_root=args.log_root, seed=args.seed,
                resume=True, load_run=args.checkpoint, load_dir=args.load,
            )
            policy = runner.get_inference_policy()
            raibert_obs = False
        parts = [
            collect_tracking(
                env, policy, jax.random.fold_in(
                    jax.random.PRNGKey(args.seed), e
                ),
                episode_length_s=args.episode_length_s,
                raibert_obs=raibert_obs,
            )
            for e in range(args.epochs)
        ]
        data = RolloutData.concatenate(parts)
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    if args.shards:
        from .tube.shards import write_rollout_shards

        paths = write_rollout_shards(args.out, [data], variant=args.variant)
        print(f"saved {data.z.shape[0]} episodes x {data.v.shape[1]} steps "
              f"-> {len(paths)} shard(s) under {args.out}")
    else:
        np.savez(args.out, z=data.z, v=data.v, pz_x=data.pz_x,
                 done=data.done)
        print(f"saved {data.z.shape[0]} episodes x {data.v.shape[1]} steps "
              f"-> {args.out}")


def _tube_spec_from_args(args):
    """Resolve the tube dataset/loss/model spec from --config or flags
    (ref: configs/tube_learning/* Hydra _target_ choices)."""
    from .utils.config import tube_spec

    if args.config:
        from .utils.config import load_config

        spec = tube_spec(load_config(args.config).get("tube"))
    else:
        spec = tube_spec({
            "dataset": "oneshot" if args.oneshot else "scalar",
            # Reference parity: the oneshot configs train with
            # VectorTubeLoss (per-step pinball summed over H_fwd, then
            # Huber — ref tube_learning_oneshot.yaml, losses.py:29-37);
            # the non-oneshot scalar dataset trains with ScalarTubeLoss
            # (ScalarHorizonTubeLoss is the same function, losses.py:17-26).
            "loss": "vector" if args.oneshot else "scalar",
            "alpha": args.alpha, "epochs": args.epochs,
            "window": args.window, "H_fwd": args.H_fwd,
            "H_rev": args.H_rev,
        })
    return spec


def _build_tube_dataset(spec, data):
    from .tube import datasets as D

    name = spec["dataset"]
    if name == "oneshot":
        return D.scalar_horizon_tube_dataset(data, H_fwd=spec["H_fwd"],
                                             H_rev=spec["H_rev"])
    builders = {
        "scalar": lambda: D.scalar_tube_dataset(data, N=spec["window"], dN=1),
        "vector": lambda: D.vector_tube_dataset(data, N=spec["window"], dN=1),
        "alpha_scalar": lambda: D.alpha_scalar_tube_dataset(
            data, N=spec["window"], dN=1),
        "alpha_vector": lambda: D.alpha_vector_tube_dataset(
            data, N=spec["window"], dN=1),
        "error": lambda: D.error_dynamics_dataset(data, N=spec["window"],
                                                  dN=1),
    }
    return builders[name]()


def _tube_loss_fn(spec):
    from .tube import losses as L

    a = spec["alpha"]
    return {
        "scalar": lambda fw, w, d: L.scalar_tube_loss(fw, w, d, alpha=a),
        "vector": lambda fw, w, d: L.vector_tube_loss(fw, w, d, alpha=a),
        "alpha_scalar": L.alpha_scalar_tube_loss,
        "alpha_vector": L.alpha_vector_tube_loss,
        "error": L.error_loss,
    }[spec["loss"]]


def cmd_train_tube(args):
    _setup(args)
    import jax

    from .tube.datasets import (
        RolloutData,
        scalar_horizon_tube_dataset,
        scalar_tube_dataset,
    )
    from .tube.losses import scalar_tube_loss
    from .tube.models import MLP
    from .tube.train import TrainConfig, train_tube

    if os.path.isdir(args.data):
        # shard directory -> stream through the native C++ loader
        import glob

        from .tube.shards import make_loader
        from .tube.train import train_tube_streaming

        paths = sorted(glob.glob(os.path.join(args.data, "*.tdl")))
        if not paths:
            raise SystemExit(f"no .tdl shards under {args.data}")
        loader = make_loader(paths, N=args.window, dN=1)
        model = MLP.create(jax.random.PRNGKey(args.seed), loader.input_dim,
                           loader.target_dim, num_units=128, num_layers=2)
        res = train_tube_streaming(
            loader, model,
            lambda fw, w, d: scalar_tube_loss(fw, w, d, alpha=args.alpha),
            TrainConfig(epochs=args.epochs, batch_size=1024),
        )
        final = [h for h in res.history if "coverage" in h][-1]
        print(json.dumps({"final": final, "streaming": True,
                          "loader": type(loader).__name__}))
        if args.out:
            import pickle

            with open(args.out, "wb") as f:
                pickle.dump(jax.tree.map(np.asarray, res.best_model), f)
            print(f"saved tube model -> {args.out}")
        return

    raw = np.load(args.data)
    data = RolloutData(z=raw["z"], v=raw["v"], pz_x=raw["pz_x"],
                       done=raw["done"])
    spec = _tube_spec_from_args(args)
    ds = _build_tube_dataset(spec, data)
    model = MLP.create(jax.random.PRNGKey(args.seed), ds.input_dim,
                       ds.output_dim, num_units=spec["num_units"],
                       num_layers=spec["num_layers"],
                       activation=spec["activation"])
    res = train_tube(
        ds, model, _tube_loss_fn(spec),
        TrainConfig(epochs=spec["epochs"], batch_size=spec["batch_size"],
                    learning_rate=spec["lr"]),
    )
    final = [h for h in res.history if "coverage" in h][-1]
    print(json.dumps({"final": final}))
    if args.out:
        import pickle

        with open(args.out, "wb") as f:
            pickle.dump(jax.tree.map(np.asarray, res.best_model), f)
        print(f"saved tube model -> {args.out}")


def _load_tube_model(args):
    """Load the pickled tube MLP for NN_oneshot and sanity-check its
    horizon against --N/--H-rev (the one-shot net's output IS the width
    horizon; ref tube_trajopt.py:543-570)."""
    import pickle

    import jax

    if not args.tube_model:
        raise SystemExit("--tube-dyn NN_oneshot requires --tube-model "
                         "(train one with `train-tube --oneshot --out ...`)")
    with open(args.tube_model, "rb") as f:
        model = pickle.load(f)
    import jax.numpy as jnp

    model = jax.tree.map(jnp.asarray, model)
    out_dim = model.weights[-1].shape[1]
    if out_dim != args.N:
        raise SystemExit(
            f"tube model predicts H_fwd={out_dim} widths but --N={args.N}; "
            "the one-shot horizon must equal the planning horizon")
    in_dim = model.weights[0].shape[0]
    expect = args.H_rev + (args.H_rev + args.N) * 2   # SingleInt2D: no z_rest
    if in_dim != expect:
        raise SystemExit(
            f"tube model input dim {in_dim} != {expect} expected for "
            f"H_rev={args.H_rev}, N={args.N} (was it trained with "
            "--oneshot and matching --H-rev/--H-fwd?)")
    return model


def _make_problem(args, tube_params=None):
    import jax.numpy as jnp

    from .core import make_rom
    from .solver import PROBLEM_DICT, TrajOptParams

    prob = PROBLEM_DICT[args.problem]
    pm = make_rom("SingleInt2D", prob["dt"], [-prob["pos_max"]] * 2,
                  [prob["pos_max"]] * 2, [-prob["vel_max"]] * 2,
                  [prob["vel_max"]] * 2)
    p = TrajOptParams.create(
        pm, args.N, args.H_rev, 10 * np.eye(2), 10 * np.eye(2),
        prob["start"], prob["goal"], prob["obs"]["c"], prob["obs"]["r"],
        Qw=0.0, w_max=1.0, tube_params=tube_params,
    )
    return prob, p


def _staged_cfg(args, loop: bool = False):
    """Solver config for the CLI's staged fast path (bench defaults:
    chunked Woodbury-basis refresh for the NN tube; the Pallas kernel
    factor on TPU — 1.2-1.25x the Thomas scan, docs/PERF.md)."""
    import jax

    from .solver import ALConfig

    kw = {}
    if args.tube_dyn == "NN_oneshot":
        kw["nn_basis_refresh"] = 3
    if loop:
        # 4x6 warm re-solve schedule (tuned: fits the 0.1 s ROM tick at
        # B=1024 with adoption/coverage parity to 5x6, docs/PERF.md).
        kw.update(outer_iters=4, inner_iters=6)
    if jax.default_backend() != "cpu":
        # interpret-mode pallas on CPU is orders slower than the scan;
        # only the compiled TPU kernel wins.
        kw["linsolve"] = "pallas"
    return ALConfig(**kw)


def cmd_plan(args):
    _setup(args)
    from .solver import get_tube_dynamics, solve_nominal, solve_tube

    tube_params = (_load_tube_model(args)
                   if args.tube_dyn == "NN_oneshot" and not args.nominal
                   else None)
    prob, p = _make_problem(args, tube_params)
    verdict_info = {}
    # The rolling tube modes have no staged (block-tridiagonal) form —
    # they always use the dense generic solver.
    generic = args.generic or args.tube_dyn.endswith("_rolling")
    if args.nominal:
        z, v, sol = solve_nominal(p, args.N, warm_start="interpolate")
        w = None
    elif generic:
        # Dense generic AL solver — debugging reference path.
        tube_fn = get_tube_dynamics(args.tube_dyn, args.N, scaling=0.5)
        out = solve_tube(p, tube_fn, args.N, args.H_rev,
                         warm_start="nominal", tube_ws="evaluate")
        z, v, w, sol = out.z, out.v, out.w, out.sol
    else:
        # DEFAULT: staged block-tridiagonal solver (the benchmarked path —
        # scalar-entry Thomas/CR factor, Woodbury NN tube; solver/
        # staged_scalar.py) + restoration/certification verdict.
        from .solver import VERDICT_NAMES, certify_staged
        from .solver.fast_tube import (
            StagedProblem,
            solve_tube_fast,
            staged_bounds,
        )

        out = solve_tube_fast(p, args.N, args.H_rev,
                              tube_kind=args.tube_dyn, scaling=0.5,
                              cfg=_staged_cfg(args),
                              warm_start="interpolate", tube_ws="evaluate")
        z, v, w, sol = out.z, out.v, out.w, out.sol
        n, m = p.rom.n, p.rom.m
        sp = StagedProblem(
            n=n, m=m, N=args.N, K=p.obs_r.shape[0],
            tube_kind=("nn" if args.tube_dyn == "NN_oneshot"
                       else args.tube_dyn),
            scaling=0.5, track_ref=False)
        lb_u, ub_u = staged_bounds(p, n, m, args.N)
        cert = certify_staged(sp, p, sol.x.reshape(args.N + 1, -1),
                              sol.viol, lb_u, ub_u)
        verdict_info = {
            "verdict": VERDICT_NAMES[int(cert.verdict)],
            "viol_restored": float(cert.viol_restored),
        }
    print(json.dumps({
        "viol": float(sol.viol), "obj": float(sol.obj),
        "converged": bool(sol.converged),
        **verdict_info,
    }))
    if args.out:
        payload = {"z": np.asarray(z), "v": np.asarray(v),
                   "z0": prob["start"], "zf": prob["goal"],
                   "obs_c": prob["obs"]["c"], "obs_r": prob["obs"]["r"]}
        if w is not None:
            payload["w"] = np.asarray(w)
        _save_mat_or_npz(args.out, payload)
        print(f"saved plan -> {args.out}")


def cmd_mpc(args):
    _setup(args)
    import jax

    from .core import DoubleInt2D

    tube_params = (_load_tube_model(args)
                   if args.tube_dyn == "NN_oneshot" else None)
    prob, p = _make_problem(args, tube_params)
    robot = DoubleInt2D.create(
        prob["dt"], [-np.inf, -np.inf, -0.3, -0.3],
        [np.inf, np.inf, 0.3, 0.3], [-0.5, -0.5], [0.5, 0.5],
    )
    if args.generic or args.tube_dyn.endswith("_rolling"):
        # Dense generic AL re-solves — debugging reference path (and the
        # rolling tube modes, which have no staged form).
        from .solver import get_tube_dynamics
        from .solver.mpc import MPCConfig, closed_loop_tube_mpc

        tube_fn = get_tube_dynamics(args.tube_dyn, args.N, scaling=0.5)
        mpc = MPCConfig(H=args.H, N=args.N, H_rev=args.H_rev)
        trace = jax.jit(
            lambda p: closed_loop_tube_mpc(p, tube_fn, robot, mpc)
        )(p)
        z = np.asarray(trace.z)
        result = {
            "goal_dist": float(np.linalg.norm(z[-1] - prob["goal"])),
            "max_resolve_viol": float(np.asarray(trace.viol).max()),
            "tracking_err_max": float(
                np.abs(z - np.asarray(trace.pz_x)).max()),
        }
        payload_extra = {"z_sol": np.asarray(trace.z_sol),
                         "v_sol": np.asarray(trace.v_sol),
                         "w_sol": np.asarray(trace.w_sol)}
        v_t, w_t, pzx_t = (np.asarray(trace.v), np.asarray(trace.w),
                           np.asarray(trace.pz_x))
        adopted = None
    else:
        # DEFAULT: staged block-tridiagonal re-solves with the execution
        # gate (solver/fast_tube.closed_loop_tube_mpc_fast — the 8k+
        # re-solves/s path from the benchmarks) + a certification verdict
        # on the initial plan.
        from .solver import VERDICT_NAMES, certify_staged
        from .solver.fast_tube import (
            StagedProblem,
            closed_loop_tube_mpc_fast,
            solve_tube_fast,
            staged_bounds,
        )

        cfg_first = _staged_cfg(args)
        cfg_loop = _staged_cfg(args, loop=True)
        out0 = solve_tube_fast(p, args.N, args.H_rev,
                               tube_kind=args.tube_dyn, scaling=0.5,
                               cfg=cfg_first, warm_start="interpolate",
                               tube_ws="evaluate")
        n, m = p.rom.n, p.rom.m
        sp = StagedProblem(
            n=n, m=m, N=args.N, K=p.obs_r.shape[0],
            tube_kind=("nn" if args.tube_dyn == "NN_oneshot"
                       else args.tube_dyn),
            scaling=0.5, track_ref=False)
        lb_u, ub_u = staged_bounds(p, n, m, args.N)
        cert = certify_staged(sp, p, out0.sol.x.reshape(args.N + 1, -1),
                              out0.sol.viol, lb_u, ub_u)
        z_t, v_t, w_t, pzx_t, viols, adopts = jax.jit(
            lambda pp: closed_loop_tube_mpc_fast(
                pp, robot, tube_kind=args.tube_dyn, scaling=0.5,
                H=args.H, N=args.N, H_rev=args.H_rev,
                cfg_first=cfg_first, cfg_loop=cfg_loop)
        )(p)
        z = np.asarray(z_t)
        adopted = np.asarray(adopts)
        result = {
            "goal_dist": float(np.linalg.norm(z[-1] - prob["goal"])),
            "max_resolve_viol": float(np.asarray(viols).max()),
            "tracking_err_max": float(np.abs(z - np.asarray(pzx_t)).max()),
            "plan_verdict": VERDICT_NAMES[int(cert.verdict)],
            "verdicts": {VERDICT_NAMES[int(cert.verdict)]: 1},
            "adopted_frac": float(adopted.mean()),
        }
        payload_extra = {}
    print(json.dumps(result))
    if args.out:
        # .mat export parity (ref tube_planning_closed_loop.py:170-188).
        payload = {
            "z": z, "v": np.asarray(v_t), "w": np.asarray(w_t),
            "pz_x": np.asarray(pzx_t),
            "z0": prob["start"], "zf": prob["goal"],
            "obs_x": prob["obs"]["c"][:, 0], "obs_y": prob["obs"]["c"][:, 1],
            "obs_r": prob["obs"]["r"],
            **payload_extra,
        }
        if adopted is not None:
            payload["adopted"] = adopted
        _save_mat_or_npz(args.out, payload)
        print(f"saved closed-loop trace -> {args.out}")


def _save_mat_or_npz(path, payload):
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    if path.endswith(".mat"):
        from scipy.io import savemat

        savemat(path, payload)
    else:
        np.savez(path, **payload)


def build_parser():
    ap = argparse.ArgumentParser(prog="legged_gym_dev_tpu")
    sub = ap.add_subparsers(dest="cmd", required=True)

    def common(p):
        p.add_argument("--cpu", action="store_true",
                       help="force CPU (virtual 8-device mesh)")
        p.add_argument("--seed", type=int, default=0)

    t = sub.add_parser("train")
    common(t)
    t.add_argument("--config", default="",
                   help="YAML overlay (configs/rl/*; sections task/env/"
                        "policy/train/run)")
    t.add_argument("--task", default=None,
                   help="task name (overrides the config's task)")
    t.add_argument("--num-envs", type=int, default=None,
                   help="override the config/default env count")
    t.add_argument("--max-iterations", type=int, default=1500)
    t.add_argument("--log-root", default="logs")
    t.add_argument("--run-name", default="")
    t.add_argument("--resume", action="store_true")
    t.add_argument("--load", default="latest")
    t.add_argument("--dp-devices", type=int, default=0,
                   help="data-parallel training over an N-device mesh "
                        "(envs sharded, params replicated)")
    t.set_defaults(fn=cmd_train)

    pl = sub.add_parser("play")
    common(pl)
    pl.add_argument("--task", default="hopper_trajectory")
    pl.add_argument("--num-envs", type=int, default=1)
    pl.add_argument("--steps", type=int, default=1000)
    pl.add_argument("--load", default="")
    pl.add_argument("--checkpoint", default="latest")
    pl.add_argument("--log-root", default="logs")
    pl.add_argument("--export", default="")
    pl.add_argument("--plot", default="")
    pl.add_argument("--mat", default="",
                    help=".mat state-log export (ref play.py:202-212)")
    pl.add_argument("--video", default="",
                    help="render the rollout to .mp4/.gif via "
                    "mujoco.Renderer (ref play.py:88-110 frame capture)")
    pl.add_argument("--live", type=int, nargs="?", const=0, default=None,
                    metavar="PORT",
                    help="serve an interactive live viewer over HTTP "
                         "(0/omitted port = auto; browser keys: ESC quit, "
                         "V sync, SPACE pause, arrows/+-/F camera)")
    pl.add_argument("--video-steps", type=int, default=0,
                    help="frames to record (default: min(steps, 250))")
    pl.set_defaults(fn=cmd_play)

    c = sub.add_parser("collect")
    c.add_argument("--config", default="",
                   help="data-generation YAML (configs/data_generation/*)")
    c.add_argument("--task", default="rom_tracking",
                   help="rom_tracking (ROM-only sim) or any registered "
                        "trajectory task (hopper_trajectory, "
                        "anymal_c_trajectory, ...)")
    c.add_argument("--raibert", action="store_true",
                   help="use the Raibert heuristic instead of a trained "
                        "policy (hopper tasks)")
    c.add_argument("--load", default="",
                   help="run dir of the trained policy (default: most "
                        "recent run under <log-root>/<task>)")
    c.add_argument("--checkpoint", default="latest")
    c.add_argument("--log-root", default="logs")
    common(c)
    c.add_argument("--num-envs", type=int, default=1024)
    c.add_argument("--epochs", type=int, default=4)
    c.add_argument("--episode-length-s", type=float, default=8.0)
    c.add_argument("--out", default="data/rollouts.npz")
    c.add_argument("--shards", action="store_true",
                   help="write binary .tdl shards (native loader) instead "
                        "of .npz; --out is then a directory")
    c.add_argument("--variant", default="scalar",
                   choices=["scalar", "scalar_recursive", "vector", "error"])
    c.set_defaults(fn=cmd_collect)

    tt = sub.add_parser("train-tube")
    common(tt)
    tt.add_argument("--config", default="",
                   help="tube-learning YAML (configs/tube_learning/*)")
    tt.add_argument("--data", default="data/rollouts.npz")
    tt.add_argument("--epochs", type=int, default=100)
    tt.add_argument("--alpha", type=float, default=0.9)
    tt.add_argument("--window", type=int, default=3)
    tt.add_argument("--oneshot", action="store_true")
    tt.add_argument("--H-fwd", type=int, default=50)
    tt.add_argument("--H-rev", type=int, default=10)
    tt.add_argument("--out", default="")
    tt.set_defaults(fn=cmd_train_tube)

    for name, fn in [("plan", cmd_plan), ("mpc", cmd_mpc)]:
        s = sub.add_parser(name)
        common(s)
        s.add_argument("--problem", default="gap",
                       choices=["gap", "right", "right_wide"])
        s.add_argument("--tube-dyn", default="l1",
                       choices=["l1", "l2", "l1_rolling", "l2_rolling",
                                "NN_oneshot"])
        s.add_argument("--tube-model", default="",
                       help="pickled tube MLP from `train-tube --oneshot "
                            "--out` (required for --tube-dyn NN_oneshot; "
                            "its H_fwd must equal --N and H_rev --H-rev)")
        s.add_argument("--N", type=int, default=50)
        s.add_argument("--H-rev", type=int, default=10)
        s.add_argument("--out", default="")
        s.add_argument("--generic", action="store_true",
                       help="use the dense generic AL solver instead of "
                            "the staged block-tridiagonal fast path "
                            "(debugging; also implied by the rolling tube "
                            "modes, which have no staged form)")
        if name == "plan":
            s.add_argument("--nominal", action="store_true")
        else:
            s.add_argument("--H", type=int, default=75)
        s.set_defaults(fn=fn)
    return ap


def main(argv=None):
    args = build_parser().parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
