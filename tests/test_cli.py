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
    assert os.path.exists(tmp_path / "plan.mat")

    out = run_cli(["mpc", "--problem", "gap", "--tube-dyn", "l1",
                   "--N", "20", "--H", "30",
                   "--out", str(tmp_path / "mpc.mat")], timeout=300)
    rec = json.loads([l for l in out.splitlines() if l.startswith("{")][0])
    assert rec["max_resolve_viol"] < 1e-2
    from scipy.io import loadmat

    m = loadmat(tmp_path / "mpc.mat")
    assert m["z"].shape[0] == 31


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
    run_cli(["train-tube", "--data", data, "--epochs", "3", "--oneshot",
             "--H-fwd", "8", "--H-rev", "4", "--out", model])
    assert os.path.exists(model)

    out = run_cli(["plan", "--problem", "gap", "--tube-dyn", "NN_oneshot",
                   "--tube-model", model, "--N", "8", "--H-rev", "4",
                   "--out", str(tmp_path / "plan.npz")])
    rec = json.loads([l for l in out.splitlines() if l.startswith("{")][0])
    assert rec["viol"] < 1e-3
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
