"""Evaluation-suite tests (ref: deep_tube_learning/evaluation/*)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from legged_gym_dev_tpu.evaluation import (
    evaluate_sim2sim_hopper,
    evaluate_tube_one_step,
    evaluate_tube_recursive,
)
from legged_gym_dev_tpu.tube.datasets import RolloutData, scalar_tube_dataset
from legged_gym_dev_tpu.tube.models import MLP
from legged_gym_dev_tpu.utils.grids import (
    add_zero_z_coordinate,
    generate_grid_search_configs_2d,
    generate_robot_grids,
    quaternion_to_direction_vector,
)


def synthetic_rollouts(E=8, T=40, seed=0):
    rng = np.random.default_rng(seed)
    v = rng.uniform(-0.5, 0.5, (E, T, 2)).astype(np.float32)
    z = np.cumsum(np.concatenate([np.zeros((E, 1, 2)), v * 0.1], axis=1),
                  axis=1).astype(np.float32)
    pz_x = z + rng.normal(0, 0.05, z.shape).astype(np.float32)
    done = np.zeros((E, T), bool)
    return RolloutData(z=z, v=v, pz_x=pz_x, done=done)


def test_tube_one_step_eval():
    r = synthetic_rollouts()
    ds = scalar_tube_dataset(r, N=2, dN=1)
    model = MLP.create(jax.random.PRNGKey(0), ds.input_dim, 1, num_units=16,
                       num_layers=1, final_activation="softplus")
    out = evaluate_tube_one_step(model, ds.data, ds.target)
    assert 0.0 <= out["coverage"] <= 1.0
    assert np.isfinite(out["mean_excess"])


def test_tube_recursive_eval():
    r = synthetic_rollouts(E=4, T=20)
    ds = scalar_tube_dataset(r, N=3, dN=1)
    model = MLP.create(jax.random.PRNGKey(1), ds.input_dim, 1, num_units=16,
                       num_layers=1, final_activation="softplus")
    out = evaluate_tube_recursive(model, r, window=3)
    assert 0.0 <= out["recursive_coverage"] <= 1.0


def test_sim2sim_free_space_parity():
    out = evaluate_sim2sim_hopper(steps=60)
    # Free-space trajectories must match MuJoCo closely (BASELINE sim2sim).
    assert out["free_space_pos_err"] < 1e-3, out
    assert out["free_space_q_err"] < 1e-2, out


def test_grid_helpers():
    g = generate_grid_search_configs_2d(-1.0, 1.0, 3)
    assert g.shape == (9, 2)
    np.testing.assert_allclose(g[0], [-1, -1])
    np.testing.assert_allclose(g[-1], [1, 1])
    rg = generate_robot_grids(-1, 1, 3, num_robots=4, deviation=0.01,
                              rng=np.random.default_rng(0))
    assert rg.shape == (4, 9, 2)
    assert np.abs(rg - g[None]).max() < 0.1
    g3 = add_zero_z_coordinate(rg)
    assert g3.shape == (4, 9, 3)
    assert np.all(g3[..., 2] == 0)
    # Identity quat -> +x forward.
    v = quaternion_to_direction_vector([0.0, 0.0, 0.0, 1.0])
    np.testing.assert_allclose(v, [1, 0, 0], atol=1e-6)
