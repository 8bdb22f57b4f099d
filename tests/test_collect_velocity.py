"""Velocity-pipeline data collection (ref data_collection_velocity.py)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from legged_gym_dev_tpu.core import SingleInt2D
from legged_gym_dev_tpu.envs import task_registry
from legged_gym_dev_tpu.trajgen import (
    TrajectoryGenerator,
    UniformSampleHoldDT,
    UniformWeightSampler,
)
from legged_gym_dev_tpu.tube.collect import collect_velocity_tracking


def test_collect_velocity_tracking_shapes():
    B = 8
    env = task_registry.make_env("a1_velocity", num_envs=B, add_noise=False,
                                 episode_length_s=4.0)
    rom = SingleInt2D.create(0.1, [-10, -10], [10, 10], [-0.5, -0.5],
                             [0.5, 0.5])
    gen = TrajectoryGenerator.create(
        rom, UniformSampleHoldDT.create(1.0, 3.0), UniformWeightSampler(),
        dt_loop=env.dt, N=4, dN=1, prob_stationary=0.0,
    )
    policy = lambda obs: jnp.zeros((B, env.num_actions))
    data = collect_velocity_tracking(env, policy, gen,
                                     jax.random.PRNGKey(0),
                                     episode_length_s=2.0)
    T = int(2.0 / 0.1)
    assert data.z.shape == (B, T + 1, 2)
    assert data.pz_x.shape == (B, T + 1, 2)
    assert data.v.shape == (B, T, 2)
    assert np.all(np.isfinite(data.z))
    assert np.all(np.isfinite(data.pz_x))
