"""End-to-end integration: rigid-body hopper -> Raibert tracking data ->
one-shot quantile tube NN -> closed-loop NN-tube MPC.

The complete reference workflow (ref: data_collection_trajectory.py ->
train_tube.py -> tube_planning_closed_loop.py) executed entirely in this
framework, at reduced scale for test time.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from legged_gym_dev_tpu.controllers import RaibertHeuristic
from legged_gym_dev_tpu.core import DoubleInt2D, make_rom
from legged_gym_dev_tpu.envs import task_registry
from legged_gym_dev_tpu.solver import (
    ALConfig,
    PROBLEM_DICT,
    TrajOptParams,
    get_tube_dynamics,
    solve_tube,
)
from legged_gym_dev_tpu.tube.collect import collect_hopper_tracking
from legged_gym_dev_tpu.tube.datasets import scalar_horizon_tube_dataset
from legged_gym_dev_tpu.tube.losses import scalar_tube_loss
from legged_gym_dev_tpu.tube.models import MLP
from legged_gym_dev_tpu.tube.train import TrainConfig, train_tube

H_FWD, H_REV = 20, 5


@pytest.fixture(scope="module")
def hopper_data():
    env = task_registry.make_env(
        "hopper_trajectory", num_envs=32, add_noise=False, domain_rand=False,
        max_push_vel=0.0, push_interval_s=1000.0, episode_length_s=8.0,
    )
    rh = RaibertHeuristic.create(-0.3, -0.9, 0.0, 0.5, 1.0, 0.2)
    return collect_hopper_tracking(env, rh, jax.random.PRNGKey(0),
                                   episode_length_s=8.0, raibert_obs=True)


def test_raibert_tracks_rom(hopper_data):
    err = np.linalg.norm(hopper_data.pz_x - hopper_data.z, axis=-1)
    assert err.mean() < 0.5, err.mean()
    # Stable sim: a usable fraction of steps crash-free.
    assert hopper_data.done[:, :-1].mean() < 0.15


def test_oneshot_dataset_filters_reset_windows(hopper_data):
    ds = scalar_horizon_tube_dataset(hopper_data, H_fwd=H_FWD, H_rev=H_REV)
    assert ds.valid is not None and len(ds.valid) > 100
    rng = np.random.default_rng(0)
    x, y = ds.sample_batch(rng, 512)
    assert x.shape == (512, ds.input_dim)
    # Clean windows: no crash-spiked targets.
    assert y.max() < 2.0


def test_learned_tube_in_mpc_solve(hopper_data):
    ds = scalar_horizon_tube_dataset(hopper_data, H_fwd=H_FWD, H_rev=H_REV)
    model = MLP.create(jax.random.PRNGKey(1), ds.input_dim, ds.output_dim,
                       num_units=64, num_layers=2, activation="softplus_b5")
    res = train_tube(
        ds, model, lambda fw, w, d: scalar_tube_loss(fw, w, d, alpha=0.9),
        TrainConfig(epochs=25, batch_size=512, eval_every=25),
    )
    final = [h for h in res.history if "coverage" in h][-1]
    assert final["coverage"] > 0.5

    prob = PROBLEM_DICT["gap"]
    pm = make_rom("SingleInt2D", prob["dt"], [-10.0] * 2, [10.0] * 2,
                  [-prob["vel_max"]] * 2, [prob["vel_max"]] * 2)
    p = TrajOptParams.create(
        pm, H_FWD, H_REV, 10 * np.eye(2), 10 * np.eye(2), prob["start"],
        prob["goal"], prob["obs"]["c"], prob["obs"]["r"], Qw=0.0, w_max=1.0,
        tube_params=jax.tree.map(jnp.asarray, res.best_model),
    )
    tube_fn = get_tube_dynamics("NN_oneshot", H_FWD)
    out = solve_tube(p, tube_fn, H_FWD, H_REV, ALConfig(),
                     warm_start="nominal", tube_ws="evaluate")
    assert float(out.sol.viol) < 1e-3, float(out.sol.viol)
    w = np.asarray(out.w)
    assert 0.0 <= w.min() and w.max() < 1.0
    # Learned tube actually constrains the plan (nonzero widths).
    assert w[1:].mean() > 0.01
