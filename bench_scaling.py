"""Multi-device scaling benchmark: batched tube-MPC solves over a dp mesh.

The BASELINE multi-host requirement is >=0.85x linear scaling of solves/s
when the scenario batch fans out over more chips (SURVEY.md §6). This script
shards a fixed per-device batch over every available device (weak scaling)
and reports efficiency vs the single-device rate.

On a real pod slice each chip solves its shard independently (no collectives
in the solve; only the dispatch is shared), so efficiency should be near 1.0
— the measurement exists to prove the program actually runs SPMD and to
catch regressions that serialize it. Runs on any mesh, including the
virtual-CPU 8-device mesh (JAX_PLATFORMS=cpu + xla_force_host_platform_
device_count=8), where it validates mechanics rather than hardware scaling.
"""
import json
import time

import numpy as np


def main():
    import os

    if os.environ.get("SCALING_CPU"):
        from legged_gym_dev_tpu.utils.runtime import force_cpu

        force_cpu(int(os.environ.get("SCALING_CPU", "8")))
    else:
        from legged_gym_dev_tpu.utils.runtime import setup_tpu_runtime

        setup_tpu_runtime()

    import jax
    import jax.numpy as jnp

    from legged_gym_dev_tpu.core import make_rom
    from legged_gym_dev_tpu.parallel.mesh import make_mesh, shard_batch
    from legged_gym_dev_tpu.solver import ALConfig, PROBLEM_DICT, TrajOptParams
    from legged_gym_dev_tpu.solver.fast_tube import solve_tube_fast_batched

    N, H_REV = 50, 10
    per_device = int(os.environ.get("SCALING_PER_DEVICE", "256"))
    n_dev = len(jax.devices())

    prob = PROBLEM_DICT["gap"]
    pm = make_rom("SingleInt2D", prob["dt"], [-10.0] * 2, [10.0] * 2,
                  [-prob["vel_max"]] * 2, [prob["vel_max"]] * 2)
    Q = 10 * np.eye(2)
    p = TrajOptParams.create(pm, N, H_REV, Q, Q, prob["start"], prob["goal"],
                             prob["obs"]["c"], prob["obs"]["r"], Qw=0.0,
                             w_max=1.0)
    cfg = ALConfig(outer_iters=8, inner_iters=6)
    rng = np.random.default_rng(0)

    def make_batch(B):
        pb = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape), p)
        return pb.replace(z0=pb.z0 + jnp.asarray(
            rng.uniform(-0.1, 0.1, (B, 2)), jnp.float32))

    solve = jax.jit(lambda pb: solve_tube_fast_batched(
        pb, N, H_REV, tube_kind="l1", scaling=0.5, cfg=cfg,
        warm_start="interpolate", tube_ws=0.0).z)

    def rate(B, mesh=None):
        pb = make_batch(B)
        if mesh is not None:
            pb = shard_batch(pb, mesh)
        np.asarray(solve(pb))  # compile+warm
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(solve(pb))
            ts.append(time.perf_counter() - t0)
        return B / min(ts)

    r1 = rate(per_device)
    rN = rate(per_device * n_dev, make_mesh(n_dev)) if n_dev > 1 else r1
    eff = rN / (r1 * n_dev)
    # Mesh-overhead metric: same TOTAL batch, sharded over the mesh vs one
    # device. On a virtual CPU mesh all "devices" share the host's cores, so
    # weak scaling vs linear is bounded by the core budget and only this
    # ratio is meaningful (1.0 = the sharded program adds no overhead).
    r_full_1dev = rate(per_device * n_dev) if n_dev > 1 else r1
    print(json.dumps({
        "metric": "tube_mpc_scaling_efficiency",
        "n_devices": n_dev,
        "per_device_batch": per_device,
        "solves_per_s_1dev": round(r1, 1),
        "solves_per_s_ndev": round(rN, 1),
        "efficiency_vs_linear": round(eff, 3),
        "sharded_vs_same_batch_1dev": round(rN / r_full_1dev, 3),
    }))


if __name__ == "__main__":
    main()
