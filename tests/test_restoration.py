"""Feasibility restoration + infeasibility certification
(solver/restoration.py — the role IPOPT's restoration phase plays in the
reference stack, ref: trajopt/tube_trajopt.py:256-277)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from legged_gym_dev_tpu.core import make_rom
from legged_gym_dev_tpu.solver import (
    ALConfig,
    PROBLEM_DICT,
    VERDICT_FAILED,
    VERDICT_FEASIBLE,
    VERDICT_INFEASIBLE,
    VERDICT_RESTORED,
    TrajOptParams,
    certify_staged,
    certify_staged_batched,
)
from legged_gym_dev_tpu.solver.fast_tube import (
    StagedProblem,
    solve_tube_fast,
    staged_bounds,
)

N, H_REV = 20, 10


def solve_and_certify(p, tol=1e-3):
    n, m = p.rom.n, p.rom.m
    out = solve_tube_fast(p, N, H_REV, tube_kind="l1", scaling=0.5,
                          warm_start="interpolate", tube_ws="evaluate")
    sp = StagedProblem(n=n, m=m, N=N, K=p.obs_r.shape[0], tube_kind="l1",
                       scaling=0.5, track_ref=False)
    lb_u, ub_u = staged_bounds(p, n, m, N)
    u = out.sol.x.reshape(N + 1, -1)
    cert = certify_staged(sp, p, u, out.sol.viol, lb_u, ub_u, tol=tol)
    return out, cert


def make_params(start, goal, obs_c, obs_r, pos_max=10.0, vel_max=0.2):
    pm = make_rom("SingleInt2D", 0.1, [-pos_max] * 2, [pos_max] * 2,
                  [-vel_max] * 2, [vel_max] * 2)
    return TrajOptParams.create(
        pm, N, H_REV, 10 * np.eye(2), 10 * np.eye(2), start, goal,
        np.asarray(obs_c, np.float32), np.asarray(obs_r, np.float32),
        Qw=0.0, w_max=1.0,
    )


def test_feasible_scenario_certified_feasible():
    prob = PROBLEM_DICT["gap"]
    p = make_params(prob["start"], prob["goal"], prob["obs"]["c"],
                    prob["obs"]["r"])
    out, cert = solve_and_certify(p)
    assert int(cert.verdict) == VERDICT_FEASIBLE
    assert float(out.sol.viol) < 1e-3


def test_impossible_corridor_certified_infeasible():
    """Obstacles inflated past the corridor width until they swallow the
    start point: the IC equality pins z0 inside an obstacle, so NO feasible
    point exists. The verdict must say so instead of silently returning a
    violating plan (VERDICT round-1 weak #1)."""
    p = make_params([0.3, 0.3], [1.5, 1.5],
                    [[0.35, 0.35], [1.0, 1.0]], [0.45, 0.3])
    out, cert = solve_and_certify(p)
    assert float(out.sol.viol) > 1e-3          # solver cannot fix it
    assert int(cert.verdict) == VERDICT_INFEASIBLE, (
        int(cert.verdict), float(cert.theta), float(cert.theta_pg))
    # restoration reached a (Clarke-)stationary point of the violation
    # measure: either the smooth gradient test or the no-descent-direction
    # certificate must hold, with violation remaining.
    assert float(cert.theta) > 0.0
    smooth_ok = float(cert.theta_pg) < 1e-4 + 1e-2 * np.sqrt(
        2.0 * float(cert.theta))
    assert bool(cert.stalled) or smooth_ok


def test_batched_verdicts_mixed():
    prob = PROBLEM_DICT["gap"]
    feas = make_params(prob["start"], prob["goal"], prob["obs"]["c"],
                       prob["obs"]["r"])
    infeas = make_params([0.3, 0.3], [1.5, 1.5],
                         [[0.35, 0.35], [1.0, 1.0]], [0.45, 0.3])
    pb = jax.tree.map(lambda a, b: jnp.stack([a, b]), feas, infeas)
    outs = jax.vmap(lambda pp: solve_tube_fast(
        pp, N, H_REV, tube_kind="l1", scaling=0.5,
        warm_start="interpolate", tube_ws="evaluate"))(pb)
    sp = StagedProblem(n=2, m=2, N=N, K=2, tube_kind="l1", scaling=0.5,
                       track_ref=False)
    lb_u, ub_u = staged_bounds(feas, 2, 2, N)
    u = outs.sol.x.reshape(2, N + 1, -1)
    cert = certify_staged_batched(sp, pb, u, outs.sol.viol, lb_u, ub_u)
    v = np.asarray(cert.verdict)
    assert v[0] == VERDICT_FEASIBLE
    assert v[1] == VERDICT_INFEASIBLE


def test_mpc_gate_falls_back_to_last_plan():
    """With an exec_tol no re-solve can meet, the closed loop must execute
    the FIRST plan open-loop (age advances one stage per step) instead of
    adopting 'violating' re-solves."""
    from legged_gym_dev_tpu.core import DoubleInt2D
    from legged_gym_dev_tpu.solver.fast_tube import (
        closed_loop_tube_mpc_fast,
        solve_tube_fast,
    )

    prob = PROBLEM_DICT["gap"]
    p = make_params(prob["start"], prob["goal"], prob["obs"]["c"],
                    prob["obs"]["r"])
    robot = DoubleInt2D.create(
        0.1, [-np.inf, -np.inf, -0.3, -0.3],
        [np.inf, np.inf, 0.3, 0.3], [-0.5, -0.5], [0.5, 0.5],
    )
    H = 6
    z, v, w, pz_x, viol, adopted = closed_loop_tube_mpc_fast(
        p, robot, tube_kind="l1", scaling=0.5, H=H, N=N, H_rev=H_REV,
        warm_start="interpolate", exec_tol=-1.0,
    )
    assert not np.any(np.asarray(adopted))
    out0 = solve_tube_fast(p, N, H_REV, tube_kind="l1", scaling=0.5,
                           warm_start="interpolate", tube_ws="evaluate")
    # Executed inputs = the first plan's stages 0..H-1, in order.
    assert np.allclose(np.asarray(v), np.asarray(out0.v[:H]), atol=1e-5)


def test_escalation_restores_adversarial_iterate():
    """A deliberately wrecked final iterate on a FEASIBLE problem must end
    'restored', never 'failed': the escalation's second restoration from
    the interpolate warm start provides a fresh basin when the first
    attempt starts from the wreck (VERDICT r2 weak #1 / next #3)."""
    prob = PROBLEM_DICT["gap"]
    p = make_params(prob["start"], prob["goal"], prob["obs"]["c"],
                    prob["obs"]["r"])
    sp = StagedProblem(n=2, m=2, N=N, K=2, tube_kind="l1", scaling=0.5,
                       track_ref=False)
    lb_u, ub_u = staged_bounds(p, 2, 2, N)
    # Wreck: park the whole trajectory inside obstacle 0 with v at the
    # bound (an l1-kink-adjacent corner) and w at w_max.
    u_bad = jnp.zeros((N + 1, 5))
    u_bad = u_bad.at[:, :2].set(jnp.asarray(prob["obs"]["c"][0]))
    u_bad = u_bad.at[:, 2].set(1.0)       # w = w_max
    u_bad = u_bad.at[:-1, 3:].set(0.2)    # v at the bound
    u_bad = jnp.clip(u_bad, lb_u, ub_u)
    from legged_gym_dev_tpu.solver.fast_tube import _residuals

    _, h, g = _residuals(sp, u_bad, p)
    viol_bad = jnp.maximum(jnp.max(jnp.abs(h)),
                           jnp.max(jnp.maximum(-g, 0.0)))
    assert float(viol_bad) > 0.1  # genuinely wrecked
    cert = certify_staged(sp, p, u_bad, viol_bad, lb_u, ub_u)
    assert int(cert.verdict) == VERDICT_RESTORED, (
        int(cert.verdict), float(cert.viol_restored))
    assert float(cert.viol_restored) < 1e-3


def test_escalation_beats_single_restoration():
    """The same wrecked iterate with escalate=False must do no better than
    with escalation (and the verdict may not degrade to 'failed' when
    escalation is on) — covers the failed -> restored|infeasible
    escalation contract."""
    prob = PROBLEM_DICT["gap"]
    p = make_params(prob["start"], prob["goal"], prob["obs"]["c"],
                    prob["obs"]["r"])
    sp = StagedProblem(n=2, m=2, N=N, K=2, tube_kind="l1", scaling=0.5,
                       track_ref=False)
    lb_u, ub_u = staged_bounds(p, 2, 2, N)
    u_bad = jnp.zeros((N + 1, 5))
    u_bad = u_bad.at[:, :2].set(jnp.asarray(prob["obs"]["c"][0]))
    u_bad = u_bad.at[:, 2].set(1.0)
    u_bad = jnp.clip(u_bad, lb_u, ub_u)
    viol_bad = jnp.asarray(1.0)
    c1 = certify_staged(sp, p, u_bad, viol_bad, lb_u, ub_u, escalate=False)
    c2 = certify_staged(sp, p, u_bad, viol_bad, lb_u, ub_u, escalate=True)
    assert float(c2.viol_restored) <= float(c1.viol_restored) + 1e-6
    assert int(c2.verdict) != VERDICT_FAILED


def test_escalation_nn_tube_restores():
    """The escalation (incl. the stay-at-start witness, which must
    evaluate the NN tube at v=0 honestly) also covers the NN_oneshot
    kind: a wrecked iterate on a feasible NN-tube problem may not end
    'failed'."""
    from tests.test_solver import make_tube_nn

    prob = PROBLEM_DICT["gap"]
    pm = make_rom("SingleInt2D", 0.1, [-10] * 2, [10] * 2,
                  [-0.2] * 2, [0.2] * 2)
    p = TrajOptParams.create(
        pm, N, H_REV, 10 * np.eye(2), 10 * np.eye(2), prob["start"],
        prob["goal"], prob["obs"]["c"], prob["obs"]["r"],
        Qw=0.1, w_max=1.0, tube_params=make_tube_nn(),
    )
    sp = StagedProblem(n=2, m=2, N=N, K=2, tube_kind="nn", scaling=0.5,
                       track_ref=False)
    lb_u, ub_u = staged_bounds(p, 2, 2, N)
    u_bad = jnp.zeros((N + 1, 5))
    u_bad = u_bad.at[:, :2].set(jnp.asarray(prob["obs"]["c"][0]))
    u_bad = u_bad.at[:, 2].set(1.0)
    u_bad = jnp.clip(u_bad, lb_u, ub_u)
    cert = certify_staged(sp, p, u_bad, jnp.asarray(1.0), lb_u, ub_u)
    assert int(cert.verdict) in (VERDICT_RESTORED, VERDICT_INFEASIBLE)
    if int(cert.verdict) == VERDICT_RESTORED:
        assert float(cert.viol_restored) < 1e-3
