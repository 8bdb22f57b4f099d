"""Closed-loop re-solve schedule tuner: fit B=1024 in the 0.1 s ROM tick.

The receding-horizon loop re-solves the whole scenario batch between ROM
ticks with a short warm schedule (cfg_loop). This sweeps (outer, inner,
nn_chunk) combos on the REAL closed loop (B x H, NN tube) and reports the
per-tick re-solve wall against the 0.1 s budget TOGETHER WITH the quality
gates (adopted fraction, executed-trajectory tube coverage, goal reach) —
a faster schedule only counts if the loop still adopts its plans.

Ref: tube_planning_closed_loop.py:80,157 (the reference's timing loop).
"""
import json
import os
import sys
import time
import types

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from legged_gym_dev_tpu.utils.runtime import setup_tpu_runtime

    setup_tpu_runtime()
    import jax
    import jax.numpy as jnp

    from legged_gym_dev_tpu.core import DoubleInt2D, make_rom
    from legged_gym_dev_tpu.evaluation import evaluate_tube_on_mpc_trace
    from legged_gym_dev_tpu.solver import ALConfig, PROBLEM_DICT, TrajOptParams
    from legged_gym_dev_tpu.solver.fast_tube import closed_loop_tube_mpc_fast
    from legged_gym_dev_tpu.tube.models import MLP

    B = int(os.environ.get("B", "1024"))
    H = int(os.environ.get("H", "75"))
    N, H_REV = 50, 10
    LINSOLVE = os.environ.get("LINSOLVE", "pallas")

    prob = PROBLEM_DICT["gap"]
    pm = make_rom("SingleInt2D", prob["dt"], [-prob["pos_max"]] * 2,
                  [prob["pos_max"]] * 2, [-prob["vel_max"]] * 2,
                  [prob["vel_max"]] * 2)
    nn = MLP.create(jax.random.PRNGKey(0), H_REV + (H_REV + N) * 2, N,
                    num_units=128, num_layers=2, final_activation="softplus")
    ws, bs = list(nn.weights), list(nn.biases)
    ws[-1] = ws[-1] * 0.1
    bs[-1] = bs[-1] * 0.0 - 2.5
    nn = nn.replace(weights=tuple(ws), biases=tuple(bs))
    p = TrajOptParams.create(
        pm, N, H_REV, 10 * np.eye(2), 10 * np.eye(2), prob["start"],
        prob["goal"], prob["obs"]["c"], prob["obs"]["r"], Qw=0.1,
        w_max=1.0, tube_params=nn)
    rng = np.random.default_rng(0)
    pb = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape), p)
    pb = pb.replace(
        z0=pb.z0 + jnp.asarray(rng.uniform(-0.15, 0.15, (B, 2)), jnp.float32),
        zf=pb.zf + jnp.asarray(rng.uniform(-0.15, 0.15, (B, 2)), jnp.float32),
        obs_r=pb.obs_r * jnp.asarray(rng.uniform(0.85, 1.0, (B, 2)),
                                     jnp.float32))
    robot = DoubleInt2D.create(
        prob["dt"], [-np.inf, -np.inf, -0.3, -0.3],
        [np.inf, np.inf, 0.3, 0.3], [-0.5, -0.5], [0.5, 0.5])

    combos = [(5, 6, 3), (5, 6, 6), (4, 6, 3), (3, 6, 3), (4, 4, 4)]
    for outer, inner, chunk in combos:
        run = jax.jit(jax.vmap(lambda pp: closed_loop_tube_mpc_fast(
            pp, robot, tube_kind="NN_oneshot", scaling=0.5, H=H, N=N,
            H_rev=H_REV,
            cfg_first=ALConfig(nn_basis_refresh=3, linsolve=LINSOLVE),
            cfg_loop=ALConfig(outer_iters=outer, inner_iters=inner,
                              nn_basis_refresh=chunk, linsolve=LINSOLVE),
            warm_start="nominal", tube_ws="evaluate")))
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
        t_mpc = min(ts)
        z_t, v_t, w_t, pzx_t, viols, adopts = [np.asarray(o) for o in out]
        per_tick = t_mpc / (H + 1)
        goal = np.linalg.norm(z_t[:, -1] - np.asarray(prob["goal"]), axis=-1)
        trace = types.SimpleNamespace(
            z=z_t.reshape(-1, 2), w=w_t.reshape(-1),
            pz_x=pzx_t.reshape(-1, 2), viol=viols, converged=viols < 1e-3)
        cov = evaluate_tube_on_mpc_trace(trace)
        print(json.dumps({
            "sched": f"{outer}x{inner}c{chunk}", "B": B,
            "per_tick_ms": round(per_tick * 1e3, 1),
            "fits_budget": bool(per_tick < prob["dt"]),
            "adopted_frac": round(float(adopts.mean()), 4),
            "coverage": round(cov["coverage"], 4),
            "goal_reach_10cm": round(float((goal < 0.1).mean()), 4),
            "resolves_per_s": round(B * (H + 1) / t_mpc, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
