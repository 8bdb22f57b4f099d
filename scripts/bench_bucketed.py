"""Same-session A/B: two-phase convergence bucketing vs single-phase.

docs/PERF.md records outer_used p50=17/p90=20 on the bench batch, so the
theoretical ceiling of freeing converged scenarios early is ~1.1-1.2x;
this measures what compaction actually buys at bench shapes (l1, B=4096
and 1024) including the host round-trip + gather/scatter.
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
    from legged_gym_dev_tpu.solver.bucketed import solve_tube_fast_bucketed
    from legged_gym_dev_tpu.solver.fast_tube import solve_tube_fast_batched

    N, H_REV = 50, 10
    LINSOLVE = os.environ.get("LINSOLVE", "pallas")
    PH1 = int(os.environ.get("PH1", "16"))
    prob = PROBLEM_DICT["gap"]
    pm = make_rom("SingleInt2D", prob["dt"], [-prob["pos_max"]] * 2,
                  [prob["pos_max"]] * 2, [-prob["vel_max"]] * 2,
                  [prob["vel_max"]] * 2)
    p = TrajOptParams.create(
        pm, N, H_REV, 10 * np.eye(2), 10 * np.eye(2), prob["start"],
        prob["goal"], prob["obs"]["c"], prob["obs"]["r"], Qw=0.0, w_max=1.0)

    for B in (4096, 1024):
        rng = np.random.default_rng(0)
        pb = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape), p)
        pb = pb.replace(
            z0=pb.z0 + jnp.asarray(rng.uniform(-0.15, 0.15, (B, 2)),
                                   jnp.float32),
            zf=pb.zf + jnp.asarray(rng.uniform(-0.15, 0.15, (B, 2)),
                                   jnp.float32),
            obs_c=pb.obs_c + jnp.asarray(
                rng.uniform(-0.05, 0.05, (B, 2, 2)), jnp.float32),
            obs_r=pb.obs_r * jnp.asarray(rng.uniform(0.85, 1.0, (B, 2)),
                                         jnp.float32))
        cfg = ALConfig(linsolve=LINSOLVE)

        single = jax.jit(lambda pb: solve_tube_fast_batched(
            pb, N, H_REV, tube_kind="l1", scaling=0.5, cfg=cfg,
            warm_start="interpolate", tube_ws="evaluate"))

        def bucketed(pb):
            return solve_tube_fast_bucketed(
                pb, N, H_REV, tube_kind="l1", scaling=0.5, cfg=cfg,
                phase1_outers=PH1, warm_start="interpolate",
                tube_ws="evaluate")

        # interleaved A/B
        res = {}
        def unpack(out):
            # bucketed returns (TrajOptSolution, stats); single returns the
            # TrajOptSolution (itself a NamedTuple, so no isinstance(tuple))
            if isinstance(out, tuple) and len(out) == 2 \
                    and isinstance(out[1], dict):
                return out
            return out, None

        for tag, fn in (("single", lambda: single(pb)),
                        ("bucketed", lambda: bucketed(pb))):
            out, stats = unpack(fn())
            np.asarray(out.z)
            for _ in range(2):
                out, stats = unpack(fn())
            np.asarray(out.z)
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                out, stats = unpack(fn())
                np.asarray(out.z)
                ts.append(time.perf_counter() - t0)
            viol = np.asarray(out.sol.viol)
            res[tag] = {"wall": min(ts), "feas": float((viol < 1e-3).mean()),
                        "stats": stats}
            print(f"B={B} {tag}: {B/min(ts):.1f} solves/s "
                  f"(wall {min(ts):.4f}s feas {res[tag]['feas']:.4f} "
                  f"{stats})", flush=True)
        print(json.dumps({
            "case": f"l1_B{B}_ph1_{PH1}_{LINSOLVE}",
            "single": round(B / res["single"]["wall"], 1),
            "bucketed": round(B / res["bucketed"]["wall"], 1),
            "speedup": round(res["single"]["wall"]
                             / res["bucketed"]["wall"], 3),
            "feas_single": res["single"]["feas"],
            "feas_bucketed": res["bucketed"]["feas"],
        }), flush=True)


if __name__ == "__main__":
    main()
