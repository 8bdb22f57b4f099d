"""End-to-end tube-learning pipeline test (SURVEY.md §7 minimum slice):

ROM-only sim -> PD tracking -> data collection -> dataset -> quantile tube
training -> coverage; mirrors the reference pipeline
simple_data_collection.py / data_collection_trajectory.py -> train_tube.py.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from legged_gym_dev_tpu.controllers import DoubleSingleTracking
from legged_gym_dev_tpu.core import DoubleInt2D, SingleInt2D
from legged_gym_dev_tpu.sim import RomSim
from legged_gym_dev_tpu.trajgen import (
    TrajectoryGenerator,
    UniformSampleHoldDT,
    UniformWeightSampler,
)
from legged_gym_dev_tpu.tube.collect import collect_epochs, collect_rom_tracking
from legged_gym_dev_tpu.tube.datasets import (
    RolloutData,
    alpha_scalar_tube_dataset,
    error_dynamics_dataset,
    scalar_horizon_tube_dataset,
    scalar_tube_dataset,
    sliding_window,
    vector_tube_dataset,
)
from legged_gym_dev_tpu.tube.losses import (
    alpha_scalar_tube_loss,
    error_loss,
    scalar_tube_loss,
)
from legged_gym_dev_tpu.tube.models import MLP
from legged_gym_dev_tpu.tube.train import TrainConfig, train_tube

B = 16
ROM_DT = 0.1
DT_LOOP = 0.05


@pytest.fixture(scope="module")
def sim():
    rom = SingleInt2D.create(ROM_DT, [-10, -10], [10, 10], [-1, -1], [1, 1])
    model = DoubleInt2D.create(
        DT_LOOP, [-20, -20, -2, -2], [20, 20, 2, 2], [-4, -4], [4, 4]
    )
    gen = TrajectoryGenerator.create(
        rom, UniformSampleHoldDT.create(0.5, 2.0), UniformWeightSampler(),
        dt_loop=DT_LOOP, N=4, dN=1, prob_stationary=0.0,
    )
    return RomSim.create(
        model, gen, num_envs=B,
        init_noise_lower=[-0.5, -0.5, -0.1, -0.1],
        init_noise_upper=[0.5, 0.5, 0.1, 0.1],
        max_rom_distance=[0.3, 0.3],
    )


@pytest.fixture(scope="module")
def rollouts(sim):
    policy = DoubleSingleTracking.create(4.0, 4.0, sim.model.clip_v_z)

    def tracking_policy(obs):
        # RomSim obs = [x(4), z_des(2), v_des(2)] matches the controller.
        return policy(obs)

    return collect_epochs(
        sim, tracking_policy, jax.random.PRNGKey(0),
        episode_length_s=8.0, epochs=2,
    )


def test_collection_shapes_and_tracking(sim, rollouts):
    T = int(8.0 / ROM_DT)
    assert rollouts.z.shape == (2 * B, T + 1, 2)
    assert rollouts.v.shape == (2 * B, T, 2)
    assert rollouts.pz_x.shape == (2 * B, T + 1, 2)
    assert rollouts.done.shape == (2 * B, T)
    assert np.all(np.isfinite(rollouts.z))
    # The PD tracker keeps the robot near the ROM trajectory.
    err = np.linalg.norm(rollouts.pz_x - rollouts.z, axis=-1)
    assert err[:, 5:].mean() < 0.5, err.mean()
    # Last step marked done (episode boundary guard).
    assert np.all(rollouts.done[:, -1])


def test_sliding_window_layout():
    # 1 episode, 5 steps, feature = [a, b] with b the "input" dim (m=1).
    data = np.arange(10, dtype=np.float32).reshape(1, 5, 2)
    out = sliding_window(data, N=2, dN=1, m=1)
    assert out.shape == (1, 5, 4)
    # Slice i=1 is shifted back one step, first row padded with start
    # (input zeroed).
    np.testing.assert_allclose(out[0, 0], [0, 1, 0, 0])
    np.testing.assert_allclose(out[0, 1], [2, 3, 0, 1])


def test_dataset_builders(rollouts):
    ds = scalar_tube_dataset(rollouts, N=3, dN=1)
    # input = [w] + 3 stacked windows of (z_rest=0 dims + v=2 dims).
    assert ds.input_dim == 1 + 3 * 2
    assert ds.output_dim == 1
    assert len(ds) > 100
    assert np.all(ds.target >= 0)

    vds = vector_tube_dataset(rollouts, N=2, dN=1)
    assert vds.output_dim == 2

    ads = alpha_scalar_tube_dataset(rollouts, N=1, dN=1)
    a0 = ads.data[:, -1].copy()
    ads.update(np.random.default_rng(1))
    assert not np.allclose(a0, ads.data[:, -1])

    eds = error_dynamics_dataset(rollouts)
    assert eds.output_dim == 2

    hds = scalar_horizon_tube_dataset(rollouts, H_fwd=10, H_rev=5)
    x, y = hds.sample_batch(np.random.default_rng(0), 32)
    assert x.shape == (32, hds.input_dim) and y.shape == (32, 10)


def test_train_scalar_tube_reaches_quantile_coverage(rollouts):
    ds = scalar_tube_dataset(rollouts, N=3, dN=1)
    model = MLP.create(jax.random.PRNGKey(1), ds.input_dim, ds.output_dim,
                       num_units=64, num_layers=2)
    res = train_tube(
        ds, model, lambda fw, w, d: scalar_tube_loss(fw, w, d, alpha=0.9),
        TrainConfig(epochs=30, batch_size=512, eval_every=10),
    )
    final = [h for h in res.history if "coverage" in h][-1]
    # alpha=0.9 quantile regression should over-cover ~90% of samples.
    assert final["coverage"] > 0.7, res.history[-3:]
    assert final["loss"] < res.history[0]["loss"] if "loss" in final else True


def test_train_error_dynamics(rollouts):
    ds = error_dynamics_dataset(rollouts, N=2)
    model = MLP.create(jax.random.PRNGKey(2), ds.input_dim, ds.output_dim,
                       num_units=64, num_layers=2)
    res = train_tube(ds, model, error_loss,
                     TrainConfig(epochs=20, batch_size=512))
    assert res.history[-1]["loss"] < res.history[0]["loss"]
