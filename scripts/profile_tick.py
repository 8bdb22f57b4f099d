"""Closed-loop tick structure A/B at B=2048 (round-5 item 3 follow-up).

With the round-5 attribution correction (docs/PERF.md), the per-
component GEMMs are sub-ms and the packed-GEMM kernel premise is dead.
This script localizes what the 0.18 s B=2048 tick actually buys by
scaling the loop schedule: if the tick scales ~linearly with the inner
count, it is solve-bound (banded scans + VPU glue); the residual at
zero-extrapolation is the per-tick fixed cost (tube_ws evaluate pass,
plan shift, surrogate PD tracking, adoption gating).
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from legged_gym_dev_tpu.utils.runtime import setup_tpu_runtime

    setup_tpu_runtime()
    import jax
    import jax.numpy as jnp

    from legged_gym_dev_tpu.core import DoubleInt2D, make_rom
    from legged_gym_dev_tpu.solver import ALConfig, PROBLEM_DICT, TrajOptParams
    from legged_gym_dev_tpu.solver.fast_tube import closed_loop_tube_mpc_fast
    from legged_gym_dev_tpu.tube.models import MLP

    N, H_REV, H = 50, 10, 25
    B = int(os.environ.get("B", "2048"))
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
    p = TrajOptParams.create(pm, N, H_REV, 10 * np.eye(2), 10 * np.eye(2),
                             prob["start"], prob["goal"], prob["obs"]["c"],
                             prob["obs"]["r"], Qw=0.1, w_max=1.0,
                             tube_params=nn)
    robot = DoubleInt2D.create(prob["dt"], [-np.inf, -np.inf, -0.3, -0.3],
                               [np.inf, np.inf, 0.3, 0.3], [-0.5, -0.5],
                               [0.5, 0.5])
    rng = np.random.default_rng(1)
    pb = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape), p)
    pb = pb.replace(
        z0=pb.z0 + jnp.asarray(rng.uniform(-0.15, 0.15, (B, 2)), jnp.float32),
        zf=pb.zf + jnp.asarray(rng.uniform(-0.15, 0.15, (B, 2)), jnp.float32))

    def tick_ms(outers, inners, tube_ws="evaluate", label=""):
        cfg_first = ALConfig(nn_basis_refresh=3, linsolve="pallas")
        cfg_loop = ALConfig(outer_iters=outers, inner_iters=inners,
                            nn_basis_refresh=3, linsolve="pallas")
        run = jax.jit(jax.vmap(lambda pp: closed_loop_tube_mpc_fast(
            pp, robot, tube_kind="NN_oneshot", scaling=0.5, H=H, N=N,
            H_rev=H_REV, cfg_first=cfg_first, cfg_loop=cfg_loop,
            warm_start="interpolate", tube_ws=tube_ws)))
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
        w = min(ts) / (H + 1)
        ad = float(np.asarray(out[5]).mean())
        print(f"{label or f'{outers}x{inners}'} tube_ws={tube_ws}: "
              f"{w*1e3:.1f} ms/tick, adoption {ad:.4f}", flush=True)
        return w

    t_44 = tick_ms(4, 6)                      # production schedule
    t_24 = tick_ms(2, 6)                      # half the outers
    t_43 = tick_ms(4, 3)                      # half the inners
    t_12 = tick_ms(1, 2, label="1x2 floor")   # near-zero solve
    tick_ms(4, 6, tube_ws=0.0)
    per_inner = (t_44 - t_12) / (4 * 6 - 1 * 2)
    print(f"approx per-inner cost {per_inner*1e3:.2f} ms; fixed per-tick "
          f"~{(t_12 - per_inner * 2)*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
