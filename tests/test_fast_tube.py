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


@pytest.mark.parametrize("rom_name,tube_kind", [
    ("SingleInt2D", "l1"), ("DoubleInt2D", "l2"),
    ("Unicycle", "l1"), ("LateralUnicycle", "l2"),
])
def test_scalar_matches_array_path(rom_name, tube_kind):
    """The scalar-entry ('lane-major') staged solver must track the
    array-form staged solver on every ROM family / tube kind (same
    algorithm, different data layout — see solver/staged_scalar.py)."""
    from legged_gym_dev_tpu.solver.fast_tube import (
        StagedProblem,
        pack_staged,
        solve_tube_fast_single_array,
        staged_bounds,
    )
    from legged_gym_dev_tpu.solver.staged_scalar import solve_staged_scalar
    from legged_gym_dev_tpu.solver.trajopt import (
        get_tube_warm_start,
        get_warm_start,
    )

    prob = PROBLEM_DICT["gap"]
    dims = {"SingleInt2D": (2, 2), "DoubleInt2D": (4, 2),
            "Unicycle": (3, 2), "LateralUnicycle": (3, 3)}
    n, m = dims[rom_name]
    pm = make_rom(rom_name, prob["dt"], [-prob["pos_max"]] * n,
                  [prob["pos_max"]] * n, [-prob["vel_max"]] * m,
                  [prob["vel_max"]] * m)
    start = np.zeros(n)
    start[:2] = np.asarray(prob["start"])[:2]
    goal = np.zeros(n)
    goal[:2] = np.asarray(prob["goal"])[:2]
    p = TrajOptParams.create(pm, N, H_REV, 10 * np.eye(n), 10 * np.eye(m),
                             start, goal, prob["obs"]["c"], prob["obs"]["r"],
                             Qw=0.1, w_max=1.0)
    cfg = ALConfig(outer_iters=10, inner_iters=8)
    z0, v0 = get_warm_start("interpolate", p, N, cfg)
    tube_fn = get_tube_dynamics(tube_kind, N, scaling=0.5)
    w0 = get_tube_warm_start("evaluate", tube_fn, z0, v0, p, N)
    u0 = pack_staged(z0, w0, v0, n, m, N)
    lb, ub = staged_bounds(p, n, m, N)
    sp = StagedProblem(n=n, m=m, N=N, K=2, tube_kind=tube_kind,
                       scaling=0.5, track_ref=False)

    sol_arr = solve_tube_fast_single_array(sp, p, u0, lb, ub, cfg)
    sol_sca = solve_staged_scalar(sp, p, u0, lb, ub, cfg)
    dx = float(jnp.max(jnp.abs(sol_arr.x - sol_sca.x)))
    assert dx < 2e-3, (rom_name, tube_kind, dx)
    assert abs(float(sol_arr.viol) - float(sol_sca.viol)) < 1e-3


@pytest.mark.parametrize("rom_name", ["SingleInt2D", "Unicycle"])
def test_scalar_nn_matches_array_path(rom_name):
    """NN_oneshot through the scalar-entry Woodbury path must track the
    array-form staged solver (Unicycle exercises the z0_rest -> tube
    coupling: its n=3 adds a yaw column to the MLP Jacobian)."""
    from legged_gym_dev_tpu.solver.fast_tube import (
        StagedProblem,
        pack_staged,
        solve_tube_fast_single_array,
        staged_bounds,
    )
    from legged_gym_dev_tpu.solver.staged_scalar import solve_staged_scalar
    from legged_gym_dev_tpu.solver.trajopt import (
        get_tube_warm_start,
        get_warm_start,
    )
    from legged_gym_dev_tpu.tube.models import MLP

    prob = PROBLEM_DICT["gap"]
    dims = {"SingleInt2D": (2, 2), "Unicycle": (3, 2)}
    n, m = dims[rom_name]
    pm = make_rom(rom_name, prob["dt"], [-prob["pos_max"]] * n,
                  [prob["pos_max"]] * n, [-prob["vel_max"]] * m,
                  [prob["vel_max"]] * m)
    nn = MLP.create(jax.random.PRNGKey(3), H_REV + (n - 2) + (H_REV + N) * m,
                    N, num_units=32, num_layers=2,
                    final_activation="softplus")
    ws, bs = list(nn.weights), list(nn.biases)
    ws[-1] = ws[-1] * 0.5
    bs[-1] = bs[-1] * 0.0 - 2.0
    nn = nn.replace(weights=tuple(ws), biases=tuple(bs))

    start = np.zeros(n)
    start[:2] = np.asarray(prob["start"])[:2]
    goal = np.zeros(n)
    goal[:2] = np.asarray(prob["goal"])[:2]
    p = TrajOptParams.create(pm, N, H_REV, 10 * np.eye(n), 10 * np.eye(m),
                             start, goal, prob["obs"]["c"], prob["obs"]["r"],
                             Qw=0.1, w_max=1.0, tube_params=nn)
    cfg = ALConfig(outer_iters=10, inner_iters=8)
    z0, v0 = get_warm_start("interpolate", p, N, cfg)
    from legged_gym_dev_tpu.solver import get_tube_dynamics as _gtd
    tube_fn = _gtd("NN_oneshot", N)
    w0 = get_tube_warm_start("evaluate", tube_fn, z0, v0, p, N)
    u0 = pack_staged(z0, w0, v0, n, m, N)
    lb, ub = staged_bounds(p, n, m, N)
    sp = StagedProblem(n=n, m=m, N=N, K=2, tube_kind="nn",
                       scaling=0.5, track_ref=False)

    sol_arr = solve_tube_fast_single_array(sp, p, u0, lb, ub, cfg)
    sol_sca = solve_staged_scalar(sp, p, u0, lb, ub, cfg)
    dx = float(jnp.max(jnp.abs(sol_arr.x - sol_sca.x)))
    assert dx < 2e-3, (rom_name, dx)
    assert abs(float(sol_arr.viol) - float(sol_sca.viol)) < 1e-3


def test_fast_nn_tube_batched():
    nn = make_tube_nn()
    prob, p = gap_params(tube_params=nn)
    B = 6
    pb = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape), p)
    pb = pb.replace(z0=pb.z0 + jnp.linspace(-0.08, 0.08, B)[:, None])
    out = solve_tube_fast_batched(pb, N, H_REV, tube_kind="NN_oneshot",
                                  warm_start="nominal", tube_ws="evaluate")
    viol = np.asarray(out.sol.viol)
    assert out.z.shape == (B, N + 1, 2)
    assert np.all(viol < 1e-3), viol
    assert np.std(np.asarray(out.z[:, 0, 0])) > 0.01


@pytest.mark.parametrize("S,b", [(1, 3), (2, 3), (7, 4), (21, 5), (51, 5)])
def test_cyclic_reduction_matches_thomas(S, b):
    """cr_solve_entries (scan-free cyclic reduction) must solve the same
    SPD block-tridiagonal systems as the block-Thomas scan, including
    odd/even stage counts and symbolic-zero off-diagonal entries."""
    from legged_gym_dev_tpu.solver.staged_scalar import (
        cr_solve_entries,
        factor_solve_entries,
    )

    rng = np.random.default_rng(S * 100 + b)
    # random SPD diagonal blocks (as lower-entry lists) + random subdiag
    D_e = [[None] * (i + 1) for i in range(b)]
    A = rng.normal(size=(S, b, b)).astype(np.float32)
    Dfull = A @ np.swapaxes(A, -1, -2) + 5.0 * b * np.eye(b, dtype=np.float32)
    for i in range(b):
        for j in range(i + 1):
            D_e[i][j] = jnp.asarray(Dfull[:, i, j])
    Lfull = 0.3 * rng.normal(size=(max(S - 1, 0), b, b)).astype(np.float32)
    if S > 1:
        Lfull[:, 0, :] = 0.0  # exercise symbolic-zero entries
    L_e = [[(0.0 if (S == 1 or i == 0)
             else jnp.asarray(Lfull[:, i, j])) for j in range(b)]
           for i in range(b)]
    rhs = rng.normal(size=(S, b)).astype(np.float32)
    rhs_e = [jnp.asarray(rhs[:, i]) for i in range(b)]

    x_cr = cr_solve_entries(D_e, L_e, rhs_e, b)
    x_th = factor_solve_entries(D_e, L_e, rhs_e, b)
    x_cr = np.stack([np.asarray(x) for x in x_cr], -1)
    x_th = np.stack([np.asarray(x) for x in x_th], -1)
    assert np.abs(x_cr - x_th).max() < 1e-4, np.abs(x_cr - x_th).max()

    # and against a dense solve of the assembled system
    K = np.zeros((S * b, S * b), dtype=np.float64)
    for k in range(S):
        K[k * b:(k + 1) * b, k * b:(k + 1) * b] = Dfull[k]
    for k in range(S - 1):
        K[(k + 1) * b:(k + 2) * b, k * b:(k + 1) * b] = Lfull[k]
        K[k * b:(k + 1) * b, (k + 1) * b:(k + 2) * b] = Lfull[k].T
    x_ref = np.linalg.solve(K, rhs.reshape(-1)).reshape(S, b)
    assert np.abs(x_cr - x_ref).max() < 1e-3, np.abs(x_cr - x_ref).max()


@pytest.mark.parametrize("tube_kind", ["l1", "NN_oneshot"])
def test_pallas_linsolve_matches_thomas(tube_kind):
    """ALConfig(linsolve='pallas') routes the banded factor through the
    lane-major Pallas kernel batch-major (custom_vmap dispatch; interpret
    mode on CPU) — iterates must match the Thomas scan to solver tolerance
    on both the l1 path and the NN chunked-Woodbury gradient column."""
    kw = {}
    if tube_kind == "NN_oneshot":
        kw["tube_params"] = make_tube_nn()
        kw["Qw"] = 0.1
    prob, p = gap_params(**kw)
    B = 8
    pb = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape), p)
    pb = pb.replace(z0=pb.z0 + jnp.linspace(-0.1, 0.1, B)[:, None])
    base = dict(outer_iters=8, inner_iters=6)
    if tube_kind == "NN_oneshot":
        base["nn_basis_refresh"] = 3
    out_t = jax.jit(lambda pb: solve_tube_fast_batched(
        pb, N, H_REV, tube_kind=tube_kind, scaling=0.5,
        cfg=ALConfig(linsolve="thomas", **base),
        warm_start="interpolate", tube_ws="evaluate"))(pb)
    out_p = jax.jit(lambda pb: solve_tube_fast_batched(
        pb, N, H_REV, tube_kind=tube_kind, scaling=0.5,
        cfg=ALConfig(linsolve="pallas", **base),
        warm_start="interpolate", tube_ws="evaluate"))(pb)
    dz = float(jnp.max(jnp.abs(out_t.z - out_p.z)))
    dw = float(jnp.max(jnp.abs(out_t.w - out_p.w)))
    assert dz < 2e-3, dz
    assert dw < 2e-3, dw


def test_pallas_linsolve_single_scenario_falls_back():
    """Unbatched (no vmap) solves hit the custom_vmap base — the entry
    scan — and still work with linsolve='pallas'."""
    prob, p = gap_params()
    out = solve_tube_fast(p, N, H_REV, tube_kind="l1", scaling=0.5,
                          cfg=ALConfig(linsolve="pallas"),
                          warm_start="interpolate", tube_ws=0.0)
    assert float(out.sol.viol) < 1e-3


def test_bucketed_solve_matches_single_phase():
    """Two-phase convergence bucketing (solver/bucketed.py) must preserve
    feasibility and match single-phase iterates on co-feasible scenarios
    to solver tolerance."""
    from legged_gym_dev_tpu.solver.bucketed import solve_tube_fast_bucketed

    prob, p = gap_params()
    B = 32
    rng = np.random.default_rng(0)
    pb = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape), p)
    pb = pb.replace(
        z0=pb.z0 + jnp.asarray(rng.uniform(-0.15, 0.15, (B, 2)),
                               jnp.float32),
        obs_r=pb.obs_r * jnp.asarray(rng.uniform(0.85, 1.0, (B, 2)),
                                     jnp.float32))
    cfg = ALConfig()
    out_s = jax.jit(lambda pb: solve_tube_fast_batched(
        pb, N, H_REV, tube_kind="l1", scaling=0.5, cfg=cfg,
        warm_start="interpolate", tube_ws="evaluate"))(pb)
    out_b, stats = solve_tube_fast_bucketed(
        pb, N, H_REV, tube_kind="l1", scaling=0.5, cfg=cfg,
        phase1_outers=14, warm_start="interpolate", tube_ws="evaluate")
    v_s = np.asarray(out_s.sol.viol)
    v_b = np.asarray(out_b.sol.viol)
    assert (v_b < 1e-3).mean() >= (v_s < 1e-3).mean() - 1e-9
    both = (v_s < 1e-3) & (v_b < 1e-3)
    dz = np.abs(np.asarray(out_s.z) - np.asarray(out_b.z))[both].max()
    assert dz < 2e-3, dz
    assert stats["unconverged_after_phase1"] <= B
