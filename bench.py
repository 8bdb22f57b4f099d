"""Benchmark: batched tube-MPC solves/s/chip at N=50 horizon.

The BASELINE.json metric: "tube-MPC solves/s/chip at N=50 horizon". The
reference solves ONE such NLP at a time with CasADi+IPOPT on CPU
(ref: trajopt/tube_trajopt.py:277, tube_planning.py:38-41); warm-started
IPOPT re-solves of this problem class take ~100ms (implied by
tube_planning_closed_loop.py's real-time ambitions; the repo publishes no
numbers, see BASELINE.md), i.e. ~10 solves/s serial. ``vs_baseline`` is
measured solves/s/chip divided by that 10/s estimate.

Runs BOTH benchmark modes every time, plus the closed-loop tick budget:
  - l1 analytic tube (headline metric fields), B=2048 (the Pallas-factor
    throughput peak, docs/PERF.md round 3);
  - NN_oneshot learned tube — the reference's flagship mode (ref:
    trajopt/tube_trajopt.py:543-570 via l4casadi) — as ``nn_*`` fields,
    B=1024 (the NN mode is compute-bound and peaks there);
  - ``tick_budget``: the largest whole-batch closed-loop NN re-solve that
    fits the 0.1 s ROM tick, with the plan-adoption quality gate.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""
import json
import os
import time

import numpy as np


def run_mode(tube: str, batch: int, linsolve: str = None):
    """One benchmark batch; returns the stats dict.

    ``linsolve`` overrides ALConfig.linsolve (None keeps the tuned bench
    default; scripts/bench_pallas_production.py A/Bs the options).
    """
    import jax
    import jax.numpy as jnp

    from legged_gym_dev_tpu.core import make_rom
    from legged_gym_dev_tpu.solver import (
        ALConfig,
        PROBLEM_DICT,
        TrajOptParams,
        certify_staged_batched,
    )
    from legged_gym_dev_tpu.solver.fast_tube import (
        StagedProblem,
        solve_tube_fast_batched,
        staged_bounds,
    )

    N, H_REV = 50, 10
    B = batch
    prob = PROBLEM_DICT["gap"]
    pm = make_rom(
        "SingleInt2D", prob["dt"],
        [-prob["pos_max"]] * 2, [prob["pos_max"]] * 2,
        [-prob["vel_max"]] * 2, [prob["vel_max"]] * 2,
    )
    Q = 10 * np.eye(2)
    R = 10 * np.eye(2)
    tube_params = None
    if tube == "NN_oneshot":
        from legged_gym_dev_tpu.tube.models import MLP

        nn = MLP.create(jax.random.PRNGKey(0), H_REV + (H_REV + N) * 2, N,
                        num_units=128, num_layers=2,
                        final_activation="softplus")
        ws, bs = list(nn.weights), list(nn.biases)
        ws[-1] = ws[-1] * 0.1
        bs[-1] = bs[-1] * 0.0 - 2.5
        tube_params = nn.replace(weights=tuple(ws), biases=tuple(bs))
    p = TrajOptParams.create(
        pm, N, H_REV, Q, R, prob["start"], prob["goal"],
        prob["obs"]["c"], prob["obs"]["r"],
        Qw=(0.1 if tube == "NN_oneshot" else 0.0), w_max=1.0,
        tube_params=tube_params,
    )
    # Scenario batch: randomized starts/goals/obstacle layouts.
    rng = np.random.default_rng(0)
    p_batch = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape), p)
    p_batch = p_batch.replace(
        z0=p_batch.z0 + jnp.asarray(rng.uniform(-0.15, 0.15, (B, 2)),
                                    jnp.float32),
        zf=p_batch.zf + jnp.asarray(rng.uniform(-0.15, 0.15, (B, 2)),
                                    jnp.float32),
        obs_c=p_batch.obs_c
        + jnp.asarray(rng.uniform(-0.05, 0.05, (B, 2, 2)), jnp.float32),
        obs_r=p_batch.obs_r
        * jnp.asarray(rng.uniform(0.85, 1.0, (B, 2)), jnp.float32),
    )

    # Defaults tuned for 1e-5 feasibility at N=50. NN mode: chunked
    # Woodbury-basis refresh every 3 inners — identical iterates to the
    # exact per-inner path on the bench batch at 1.25x the throughput and
    # ~10x faster compiles (docs/PERF.md round-2 A/Bs); interpolate warm
    # start (the nominal pre-solve costs ~0.2 s/batch and does not change
    # feasibility here).
    # Production default: the lane-major Pallas kernel factor (same-session
    # A/B vs the Thomas scan, docs/PERF.md round 3: l1 1.25x at B=1024 /
    # 1.06x at B=4096, NN_oneshot 1.2x, feasibility unchanged).
    if linsolve is None:
        linsolve = os.environ.get("BENCH_LINSOLVE", "pallas")
    cfg = (ALConfig(linsolve=linsolve) if tube == "l1"
           else ALConfig(nn_basis_refresh=3, linsolve=linsolve))

    # Structured stage-wise solver: block-tridiagonal KKT factorization
    # (solver/fast_tube.py) — the TPU-native replacement for IPOPT's sparse
    # linear algebra.
    solve = jax.jit(
        lambda pb: solve_tube_fast_batched(
            pb, N, H_REV, tube_kind=tube, scaling=0.5, cfg=cfg,
            warm_start="interpolate",
            tube_ws="evaluate",
        )
    )

    # 3-call chained warmup burst: the remote backend's one-time executable
    # finalization (~27 s) can smear past the first post-compile call, and a
    # single-warmup best-of-3 read 31% low in the round-4 driver capture
    # (VERDICT r4 Weak #1). Burst first, then time.
    out = solve(p_batch)  # compile + first run
    np.asarray(out.z)  # host transfer forces completion (block_until_ready
    #                    is unreliable on the experimental remote backend)
    for _ in range(2):
        out = solve(p_batch)
    np.asarray(out.z)

    n_rep = 5
    times = []
    for _ in range(n_rep):
        t0 = time.perf_counter()
        out = solve(p_batch)
        np.asarray(out.z)
        times.append(time.perf_counter() - t0)
    dt = min(times)

    viol = np.asarray(out.sol.viol)
    solves_per_s = B / dt
    feasible_frac = float(np.mean(viol < 1e-3))

    # Per-scenario verdicts (outside the timed loop): restoration +
    # local-infeasibility certification — the role IPOPT's restoration
    # failure signal plays in the reference. No plan is silently returned
    # as "solved" when it violates constraints.
    sp = StagedProblem(n=2, m=2, N=N, K=2,
                       tube_kind=("nn" if tube == "NN_oneshot" else tube),
                       scaling=0.5, track_ref=False)
    lb_u, ub_u = staged_bounds(p, 2, 2, N)
    u_all = out.sol.x.reshape(B, N + 1, -1)
    cert = jax.jit(
        lambda pb, u, v: certify_staged_batched(sp, pb, u, v, lb_u, ub_u)
    )(p_batch, u_all, out.sol.viol)
    verdicts = np.asarray(cert.verdict)
    counts = {name: int(np.sum(verdicts == i))
              for i, name in enumerate(("feasible", "restored",
                                        "infeasible", "failed"))}
    feas_mask = verdicts == 0
    max_viol_feasible = (float(viol[feas_mask].max()) if feas_mask.any()
                         else 0.0)
    return {
        "value": round(solves_per_s, 1),
        "batch": B,
        "solve_wall_s": round(dt, 4),
        # Load sentinel: rep spread + host load let a reader tell a clean
        # capture from a contended one (host CPU load inflates remote-TPU
        # wall 2x+ via dispatch starvation — the round-4 regression cause).
        "rep_wall_s": [round(t, 4) for t in times],
        "feasible_frac": feasible_frac,
        "max_viol": float(viol.max()),
        "max_viol_feasible": max_viol_feasible,
        "verdicts": counts,
    }


def measure_tick_budget(Bs=(1024, 2048), budget_s: float = 0.1,
                        H: int = 25):
    """Whole-batch closed-loop re-solve tick vs the 0.1 s ROM budget.

    The reference re-solves ONE scenario per tick on CPU (~100 ms
    warm-started, ref tube_planning_closed_loop.py:80,157); here the
    receding-horizon loop re-solves the WHOLE scenario batch between ROM
    ticks. This measures the REAL amortized tick — the jitted
    ``closed_loop_tube_mpc_fast`` scan's wall over H+1 solves (no
    per-call host dispatch, exactly how the loop deploys) — with the
    4x6-chunk3 loop schedule (scripts/tune_loop_schedule.py sweep:
    83.4 ms/tick at B=1024 with 99.7% plan adoption and coverage 1.0;
    5 outers costs 101.6 ms for the same adoption, chunk6/4x4 schedules
    collapse adoption to ~0.7), and the quality gate (adoption) alongside.
    """
    import jax
    import jax.numpy as jnp

    from legged_gym_dev_tpu.core import DoubleInt2D, make_rom
    from legged_gym_dev_tpu.solver import ALConfig, PROBLEM_DICT, TrajOptParams
    from legged_gym_dev_tpu.solver.fast_tube import closed_loop_tube_mpc_fast
    from legged_gym_dev_tpu.tube.models import MLP

    N, H_REV = 50, 10
    prob = PROBLEM_DICT["gap"]
    pm = make_rom(
        "SingleInt2D", prob["dt"],
        [-prob["pos_max"]] * 2, [prob["pos_max"]] * 2,
        [-prob["vel_max"]] * 2, [prob["vel_max"]] * 2,
    )
    nn = MLP.create(jax.random.PRNGKey(0), H_REV + (H_REV + N) * 2, N,
                    num_units=128, num_layers=2, final_activation="softplus")
    ws, bs = list(nn.weights), list(nn.biases)
    ws[-1] = ws[-1] * 0.1
    bs[-1] = bs[-1] * 0.0 - 2.5
    nn = nn.replace(weights=tuple(ws), biases=tuple(bs))
    p = TrajOptParams.create(
        pm, N, H_REV, 10 * np.eye(2), 10 * np.eye(2), prob["start"],
        prob["goal"], prob["obs"]["c"], prob["obs"]["r"], Qw=0.1,
        w_max=1.0, tube_params=nn,
    )
    robot = DoubleInt2D.create(
        prob["dt"], [-np.inf, -np.inf, -0.3, -0.3],
        [np.inf, np.inf, 0.3, 0.3], [-0.5, -0.5], [0.5, 0.5],
    )
    linsolve = os.environ.get("BENCH_LINSOLVE", "pallas")
    cfg_first = ALConfig(nn_basis_refresh=3, linsolve=linsolve)
    cfg_loop = ALConfig(outer_iters=4, inner_iters=6, nn_basis_refresh=3,
                        linsolve=linsolve)
    run = jax.jit(jax.vmap(lambda pp: closed_loop_tube_mpc_fast(
        pp, robot, tube_kind="NN_oneshot", scaling=0.5, H=H, N=N,
        H_rev=H_REV, cfg_first=cfg_first, cfg_loop=cfg_loop,
        warm_start="interpolate", tube_ws="evaluate")))

    rng = np.random.default_rng(1)
    walls, adopted = {}, {}
    for B in sorted(Bs):
        pb = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape), p)
        pb = pb.replace(
            z0=pb.z0 + jnp.asarray(rng.uniform(-0.15, 0.15, (B, 2)),
                                   jnp.float32),
            zf=pb.zf + jnp.asarray(rng.uniform(-0.15, 0.15, (B, 2)),
                                   jnp.float32))
        out = run(pb)
        np.asarray(out[0])
        for _ in range(2):
            out = run(pb)
        np.asarray(out[0])
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = run(pb)
            np.asarray(out[0])
            ts.append(time.perf_counter() - t0)
        walls[B] = round(min(ts) / (H + 1), 4)
        adopted[B] = round(float(np.asarray(out[5]).mean()), 4)
    fits = [B for B in Bs if walls[B] < budget_s]
    return {
        "budget_s": budget_s,
        "tick_wall_s": {str(k): v for k, v in walls.items()},
        "adopted_frac": {str(k): v for k, v in adopted.items()},
        "B_max": max(fits) if fits else 0,
    }


def main():
    from legged_gym_dev_tpu.utils.runtime import setup_tpu_runtime

    setup_tpu_runtime()

    baseline_solves_per_s = 10.0  # serial warm-started IPOPT (see header)
    load_start = os.getloadavg()

    # Headline: l1 analytic tube at its best batch — with the Pallas
    # kernel factor the throughput peak moved from B=4096 (XLA-scan era)
    # to B=2048: quiet-session sweep 10735/s at 2048 vs 10324 at 1024 and
    # 9624 at 4096 (docs/PERF.md round 3).
    l1 = run_mode("l1", int(os.environ.get("BENCH_BATCH", "2048")))
    rec = {
        "metric": "tube_mpc_solves_per_s_per_chip_N50",
        "value": l1["value"],
        "unit": "solves/s",
        "vs_baseline": round(l1["value"] / baseline_solves_per_s, 1),
        **{k: v for k, v in l1.items() if k != "value"},
    }

    # Learned-tube mode (NN_oneshot): always recorded in the same line so
    # the driver artifact carries the north-star config-3 number each
    # round. BENCH_SKIP_NN=1 skips it (debugging only).
    if not os.environ.get("BENCH_SKIP_NN"):
        nn = run_mode("NN_oneshot",
                      int(os.environ.get("BENCH_NN_BATCH", "1024")))
        rec.update({f"nn_{k}": v for k, v in nn.items()})

    # Closed-loop tick budget: largest whole-batch NN re-solve that fits
    # the 0.1 s ROM tick (BASELINE "per-step real-time budget matched").
    if not os.environ.get("BENCH_SKIP_TICK"):
        rec["tick_budget"] = measure_tick_budget()

    # Host-load sentinel (2 cores here): 1-min load >~0.5 at either edge
    # means the capture ran contended and the value reads low.
    rec["loadavg_1m"] = {"start": round(load_start[0], 2),
                         "end": round(os.getloadavg()[0], 2)}
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
