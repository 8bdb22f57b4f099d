"""CLI end-to-end smoke tests (collect -> train-tube -> plan -> mpc)."""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cli(args, timeout=240):
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""  # skip remote-TPU registration
    out = subprocess.run(
        [sys.executable, "-m", "legged_gym_dev_tpu.cli", *args, "--cpu"],
        capture_output=True, text=True, timeout=timeout, cwd=REPO, env=env,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    return out.stdout


def test_collect_train_tube(tmp_path):
    data = str(tmp_path / "rollouts.npz")
    out = run_cli(["collect", "--num-envs", "32", "--epochs", "1",
                   "--episode-length-s", "4", "--out", data])
    assert "saved" in out
    raw = np.load(data)
    assert raw["z"].shape[0] == 32

    out = run_cli(["train-tube", "--data", data, "--epochs", "5"])
    final = json.loads([l for l in out.splitlines() if l.startswith("{")][0])
    assert "coverage" in final["final"]


def test_plan_and_mpc(tmp_path):
    out = run_cli(["plan", "--problem", "gap", "--tube-dyn", "l1",
                   "--N", "20", "--out", str(tmp_path / "plan.mat")])
    rec = json.loads([l for l in out.splitlines() if l.startswith("{")][0])
    assert rec["viol"] < 1e-4
    # The staged fast path is the DEFAULT: its JSON carries the
    # restoration/certification verdict (--generic has none).
    assert rec["verdict"] == "feasible"
    assert os.path.exists(tmp_path / "plan.mat")

    out = run_cli(["mpc", "--problem", "gap", "--tube-dyn", "l1",
                   "--N", "20", "--H", "30",
                   "--out", str(tmp_path / "mpc.mat")], timeout=300)
    rec = json.loads([l for l in out.splitlines() if l.startswith("{")][0])
    assert rec["max_resolve_viol"] < 1e-2
    assert rec["plan_verdict"] == "feasible" and "verdicts" in rec
    assert rec["adopted_frac"] > 0.9
    from scipy.io import loadmat

    m = loadmat(tmp_path / "mpc.mat")
    assert m["z"].shape[0] == 31


def test_plan_generic_flag(tmp_path):
    """--generic routes to the dense solver (no verdict in the JSON)."""
    out = run_cli(["plan", "--problem", "gap", "--tube-dyn", "l1",
                   "--N", "20", "--generic"])
    rec = json.loads([l for l in out.splitlines() if l.startswith("{")][0])
    assert rec["viol"] < 1e-4 and "verdict" not in rec


def test_train_play_export(tmp_path):
    log_root = str(tmp_path / "logs")
    # Generous timeouts: under pytest-xdist all workers share the host
    # cores, so subprocess compiles run several times slower than alone.
    run_cli(["train", "--task", "rom_tracking", "--num-envs", "16",
             "--max-iterations", "2", "--log-root", log_root,
             "--run-name", "t"], timeout=900)
    export_dir = str(tmp_path / "export")
    out = run_cli(["play", "--task", "rom_tracking", "--num-envs", "2",
                   "--steps", "10", "--log-root", log_root,
                   "--export", export_dir], timeout=900)
    assert "exported StableHLO" in out
    assert os.path.exists(os.path.join(export_dir, "policy.shlo"))
    # TorchScript always exports; ONNX only when the package is present
    assert os.path.exists(os.path.join(export_dir, "policy.pt"))
    try:
        import onnx  # noqa: F401
        assert os.path.exists(os.path.join(export_dir, "policy.onnx"))
    except ImportError:
        assert "exported ONNX: None" in out


def test_collect_from_rigid_body_env(tmp_path):
    """collect --task <trajectory env> rolls the Raibert heuristic in the
    rigid-body hopper (ref data_collection_trajectory.py Isaac path)."""
    data = str(tmp_path / "hopper.npz")
    out = run_cli(["collect", "--task", "hopper_trajectory", "--raibert",
                   "--num-envs", "2", "--epochs", "1",
                   "--episode-length-s", "2", "--out", data], timeout=900)
    assert "saved" in out
    raw = np.load(data)
    assert raw["z"].shape[0] == 2 and raw["pz_x"].shape == raw["z"].shape
    assert np.isfinite(raw["pz_x"]).all()


def test_plan_nn_oneshot(tmp_path):
    """End-to-end learned-tube CLI path: collect -> train-tube --oneshot ->
    plan/mpc --tube-dyn NN_oneshot (the reference's main tube mode,
    ref tube_planning.py:38-41 + tube_trajopt.py:543-570)."""
    data = str(tmp_path / "rollouts.npz")
    model = str(tmp_path / "tube.pkl")
    run_cli(["collect", "--num-envs", "32", "--epochs", "1",
             "--episode-length-s", "4", "--out", data])
    # 30 epochs: the reference-parity VectorTubeLoss sums pinball over the
    # H_fwd horizon before the Huber, so early-training width predictions
    # shrink slower than the scalar loss — 3 epochs leaves tubes too wide
    # to pass the gap (a certified locally-infeasible plan, not a bug).
    run_cli(["train-tube", "--data", data, "--epochs", "30", "--oneshot",
             "--H-fwd", "8", "--H-rev", "4", "--out", model])
    assert os.path.exists(model)

    out = run_cli(["plan", "--problem", "gap", "--tube-dyn", "NN_oneshot",
                   "--tube-model", model, "--N", "8", "--H-rev", "4",
                   "--out", str(tmp_path / "plan.npz")])
    rec = json.loads([l for l in out.splitlines() if l.startswith("{")][0])
    assert rec["viol"] < 1e-3
    assert "verdict" in rec  # staged Woodbury path is the default
    assert os.path.exists(tmp_path / "plan.npz")
    assert "w" in np.load(tmp_path / "plan.npz")

    # Horizon-mismatch guard: a wrong --N must fail loudly, not mis-plan.
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""
    bad = subprocess.run(
        [sys.executable, "-m", "legged_gym_dev_tpu.cli", "plan",
         "--problem", "gap", "--tube-dyn", "NN_oneshot",
         "--tube-model", model, "--N", "12", "--H-rev", "4", "--cpu"],
        capture_output=True, text=True, timeout=240, cwd=REPO, env=env,
    )
    assert bad.returncode != 0
    assert "H_fwd" in bad.stderr

    out = run_cli(["mpc", "--problem", "gap", "--tube-dyn", "NN_oneshot",
                   "--tube-model", model, "--N", "8", "--H-rev", "4",
                   "--H", "10", "--out", str(tmp_path / "mpc.npz")],
                  timeout=300)
    rec = json.loads([l for l in out.splitlines() if l.startswith("{")][0])
    assert rec["max_resolve_viol"] < 1e-2


def test_play_recurrent_exports_lstm(tmp_path):
    """play on a recurrent run exports the stateful LSTM TorchScript module
    (ref helpers.py:287-313 PolicyExporterLSTM via play.py:74-87)."""
    cfg = tmp_path / "rec.yaml"
    cfg.write_text(
        "task: rom_tracking\n"
        "policy:\n"
        "  recurrent: true\n"
        "  rnn_hidden_size: 16\n"
        "  actor_hidden_dims: [16]\n"
        "  critic_hidden_dims: [16]\n"
        "  activation: elu\n"
    )
    log_root = str(tmp_path / "logs")
    run_cli(["train", "--config", str(cfg), "--num-envs", "8",
             "--max-iterations", "2", "--log-root", log_root,
             "--run-name", "t"], timeout=900)
    export_dir = str(tmp_path / "export")
    out = run_cli(["play", "--task", "rom_tracking", "--num-envs", "2",
                   "--steps", "5", "--log-root", log_root,
                   "--export", export_dir], timeout=900)
    assert "exported LSTM TorchScript" in out
    p = os.path.join(export_dir, "policy_lstm.pt")
    assert os.path.exists(p)
    import torch

    m = torch.jit.load(p)
    m.reset_memory()
    assert m(torch.zeros(1, 14)).shape == (1, 2)


def test_play_signals_fill_dashboard_panels():
    """_play_signals on a rigid-body env produces every measured signal the
    3x3 dashboard plots (ref logger.py:61-126 panel parity)."""
    import jax
    import numpy as np

    jax.config.update("jax_platforms", "cpu")
    from legged_gym_dev_tpu import envs  # noqa: F401
    from legged_gym_dev_tpu.cli import _play_signals
    from legged_gym_dev_tpu.envs import task_registry
    from legged_gym_dev_tpu.utils.logger import Logger

    env = task_registry.make_env("hopper_trajectory", num_envs=2,
                                 add_noise=False)
    state, obs = env.reset(jax.random.PRNGKey(0))
    state, tr = jax.jit(env.step)(state, env.raibert(obs))
    sig = jax.tree.map(np.asarray, _play_signals(env, state, tr))
    for key in ("dof_pos", "dof_vel", "dof_torque", "base_vel_x",
                "base_vel_y", "base_vel_z", "base_vel_yaw",
                "contact_forces_z", "tracking_error"):
        assert key in sig, key
        assert np.isfinite(sig[key]).all(), key
    logger = Logger(dt=env.dt)
    for _ in range(3):
        logger.log_states(sig)
    fig = logger.plot_states()
    populated = sum(1 for ax in fig.axes if ax.lines)
    assert populated == 9, f"only {populated}/9 dashboard panels populated"
