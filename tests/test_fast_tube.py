"""Structured (block-tridiagonal) tube solver vs the generic dense path."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from legged_gym_dev_tpu.core import make_rom
from legged_gym_dev_tpu.solver import (
    ALConfig,
    PROBLEM_DICT,
    TrajOptParams,
    get_tube_dynamics,
    solve_tube,
)
from legged_gym_dev_tpu.solver.fast_tube import (
    solve_tube_fast,
    solve_tube_fast_batched,
)
from tests.test_solver import make_tube_nn

N, H_REV = 20, 10


def gap_params(**kw):
    prob = PROBLEM_DICT["gap"]
    pm = make_rom(
        "SingleInt2D", prob["dt"],
        [-prob["pos_max"]] * 2, [prob["pos_max"]] * 2,
        [-prob["vel_max"]] * 2, [prob["vel_max"]] * 2,
    )
    return prob, TrajOptParams.create(
        pm, N, H_REV, 10 * np.eye(2), 10 * np.eye(2), prob["start"],
        prob["goal"], prob["obs"]["c"], prob["obs"]["r"], **kw,
    )


@pytest.mark.parametrize("tube_kind", ["l1", "l2"])
def test_fast_matches_generic(tube_kind):
    prob, p = gap_params()
    out_fast = solve_tube_fast(p, N, H_REV, tube_kind=tube_kind, scaling=0.5,
                               warm_start="interpolate", tube_ws="evaluate")
    tube_fn = get_tube_dynamics(tube_kind, N, scaling=0.5)
    out_gen = solve_tube(p, tube_fn, N, H_REV, warm_start="interpolate",
                         tube_ws="evaluate")
    assert float(out_fast.sol.viol) < 1e-4
    assert np.abs(np.asarray(out_fast.z) - np.asarray(out_gen.z)).max() < 1e-3
    assert np.abs(np.asarray(out_fast.v) - np.asarray(out_gen.v)).max() < 1e-3
    assert np.abs(np.asarray(out_fast.w) - np.asarray(out_gen.w)).max() < 1e-3


def test_fast_nn_tube_matches_generic():
    nn = make_tube_nn()
    prob, p = gap_params(tube_params=nn)
    out_fast = solve_tube_fast(p, N, H_REV, tube_kind="NN_oneshot",
                               warm_start="nominal", tube_ws="evaluate")
    tube_fn = get_tube_dynamics("NN_oneshot", N)
    out_gen = solve_tube(p, tube_fn, N, H_REV, warm_start="nominal",
                         tube_ws="evaluate")
    assert float(out_fast.sol.viol) < 1e-4, float(out_fast.sol.viol)
    assert np.abs(np.asarray(out_fast.z) - np.asarray(out_gen.z)).max() < 2e-3
    assert np.abs(np.asarray(out_fast.w) - np.asarray(out_gen.w)).max() < 2e-3


def test_fast_batched():
    prob, p = gap_params()
    B = 8
    pb = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape), p)
    pb = pb.replace(z0=pb.z0 + jnp.linspace(-0.1, 0.1, B)[:, None])
    out = solve_tube_fast_batched(pb, N, H_REV, tube_kind="l1", scaling=0.5,
                                  warm_start="interpolate", tube_ws=0.0)
    viol = np.asarray(out.sol.viol)
    assert out.z.shape == (B, N + 1, 2)
    assert np.all(viol < 1e-4), viol
    assert np.std(np.asarray(out.z[:, 0, 0])) > 0.01
