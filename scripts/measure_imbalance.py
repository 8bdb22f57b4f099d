"""Per-shard load-imbalance measurement for the multi-chip solve
(round-5 VERDICT item 8).

The >=0.85x multi-host scaling estimate rests on "comms <=3%, the risk is
load imbalance". The staged AL solve runs a FIXED outer x inner schedule
(solver/al_solver.py lax.scan: converged scenarios freeze their updates
but still execute every iteration), so per-shard wall should be
data-INdependent — identical FLOPs on identical shapes regardless of how
hard each shard's scenarios are. This script checks that empirically on
the real chip: the bench batch (B=2048) is split into 8 dp-style shards
(what an 8-chip mesh would give each device), each shard is solved
separately under the same jit, and the wall/outer_used spreads are
reported. Straggler penalty = max_shard_wall / mean_shard_wall - 1.
"""
import json
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

    from legged_gym_dev_tpu.core import make_rom
    from legged_gym_dev_tpu.solver import ALConfig, PROBLEM_DICT, TrajOptParams
    from legged_gym_dev_tpu.solver.fast_tube import solve_tube_fast_batched

    N, H_REV = 50, 10
    B = int(os.environ.get("B", "2048"))
    SHARDS = int(os.environ.get("SHARDS", "8"))
    Bs = B // SHARDS
    prob = PROBLEM_DICT["gap"]
    pm = make_rom("SingleInt2D", prob["dt"], [-prob["pos_max"]] * 2,
                  [prob["pos_max"]] * 2, [-prob["vel_max"]] * 2,
                  [prob["vel_max"]] * 2)
    p = TrajOptParams.create(pm, N, H_REV, 10 * np.eye(2), 10 * np.eye(2),
                             prob["start"], prob["goal"], prob["obs"]["c"],
                             prob["obs"]["r"], Qw=0.0, w_max=1.0)
    rng = np.random.default_rng(0)
    pb = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape), p)
    pb = pb.replace(
        z0=pb.z0 + jnp.asarray(rng.uniform(-0.15, 0.15, (B, 2)), jnp.float32),
        zf=pb.zf + jnp.asarray(rng.uniform(-0.15, 0.15, (B, 2)), jnp.float32),
        obs_c=pb.obs_c + jnp.asarray(rng.uniform(-0.05, 0.05, (B, 2, 2)),
                                     jnp.float32),
        obs_r=pb.obs_r * jnp.asarray(rng.uniform(0.85, 1.0, (B, 2)),
                                     jnp.float32))

    cfg = ALConfig(linsolve=os.environ.get("BENCH_LINSOLVE", "pallas"))
    solve = jax.jit(lambda pp: solve_tube_fast_batched(
        pp, N, H_REV, tube_kind="l1", scaling=0.5, cfg=cfg,
        warm_start="interpolate"))

    def shard(i):
        return jax.tree.map(lambda x: x[i * Bs:(i + 1) * Bs], pb)

    # Warm the executable on one shard shape.
    out = solve(shard(0))
    np.asarray(out.sol.viol)
    for _ in range(2):
        out = solve(shard(0))
    np.asarray(out.sol.viol)

    walls, outers = [], []
    for i in range(SHARDS):
        sh = shard(i)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = solve(sh)
            np.asarray(out.sol.viol)
            ts.append(time.perf_counter() - t0)
        walls.append(min(ts))
        ou = np.asarray(out.sol.outer_used)
        outers.append((float(ou.mean()), float(np.percentile(ou, 90)),
                       int(ou.max())))
    walls = np.asarray(walls)
    rec = {
        "shards": SHARDS, "per_shard_batch": Bs,
        "wall_ms": [round(w * 1e3, 2) for w in walls],
        "wall_spread": round(float(walls.max() / walls.mean() - 1.0), 4),
        "straggler_penalty_pct": round(
            100 * float(walls.max() / walls.mean() - 1.0), 2),
        "outer_used_mean_p90_max": outers,
    }
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
