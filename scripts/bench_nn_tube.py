"""A/B bench: NN_oneshot tube solves/s — scalar-entry Woodbury path vs the
array-form staged path (same session, per docs/PERF.md conventions).

Bench shape matches BASELINE config 3 / docs/PERF.md: N=50, H_rev=10,
2x128 softplus tube MLP, 'nominal' warm start via the structured no-tube
solve, randomized gap scenarios.
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

    from legged_gym_dev_tpu.core import make_rom
    from legged_gym_dev_tpu.solver import ALConfig, PROBLEM_DICT, TrajOptParams
    from legged_gym_dev_tpu.solver import fast_tube as ft
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
        prob["goal"], prob["obs"]["c"], prob["obs"]["r"], Qw=0.1, w_max=1.0,
        tube_params=nn,
    )
    cfg = ALConfig()

    def batch(B):
        rng = np.random.default_rng(0)
        pb = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape), p)
        return pb.replace(
            z0=pb.z0 + jnp.asarray(rng.uniform(-0.15, 0.15, (B, 2)), jnp.float32),
            zf=pb.zf + jnp.asarray(rng.uniform(-0.15, 0.15, (B, 2)), jnp.float32),
            obs_c=pb.obs_c + jnp.asarray(rng.uniform(-0.05, 0.05, (B, 2, 2)), jnp.float32),
            obs_r=pb.obs_r * jnp.asarray(rng.uniform(0.85, 1.0, (B, 2)), jnp.float32),
        )

    ws = os.environ.get("NN_WS", "nominal")

    def run(tag, solve_single, B, cfg_run=None):
        cfg_l = cfg_run or cfg

        def one(pp):
            return ft.solve_tube_fast(
                pp, N, H_REV, tube_kind="NN_oneshot", cfg=cfg_l,
                warm_start=ws, tube_ws="evaluate")
        # Patch dispatch: solve_single decides scalar vs array.
        orig = ft.solve_tube_fast_single
        ft.solve_tube_fast_single = solve_single
        try:
            solve = jax.jit(jax.vmap(one))
            pb = batch(B)
            t_c0 = time.perf_counter()
            out = solve(pb)
            np.asarray(out.z)
            compile_s = time.perf_counter() - t_c0
            # warmup burst (executable finalization)
            for _ in range(2):
                out = solve(pb)
            np.asarray(out.z)
            times = []
            for _ in range(3):
                t0 = time.perf_counter()
                out = solve(pb)
                np.asarray(out.z)
                times.append(time.perf_counter() - t0)
            dt = min(times)
            viol = np.asarray(out.sol.viol)
            print(f"{tag} B={B}: {B/dt:.1f} solves/s  wall={dt:.3f}s  "
                  f"feas={float(np.mean(viol < 1e-3)):.4f}  "
                  f"max_viol={viol.max():.3g}  compile={compile_s:.0f}s",
                  flush=True)
            return out
        finally:
            ft.solve_tube_fast_single = orig

    from legged_gym_dev_tpu.solver.staged_scalar import solve_staged_scalar

    def scalar_single(sp, p_, u0, lb, ub, cfg_, lam0=None, mu0=None,
                      rho_init=None):
        return solve_staged_scalar(sp, p_, u0, lb, ub, cfg_, lam0=lam0,
                                   mu0=mu0, rho_init=rho_init)

    def array_single(sp, p_, u0, lb, ub, cfg_, lam0=None, mu0=None,
                     rho_init=None):
        if sp.tube_kind in ("l1", "l2"):
            return solve_staged_scalar(sp, p_, u0, lb, ub, cfg_, lam0=lam0,
                                       mu0=mu0, rho_init=rho_init)
        return ft.solve_tube_fast_single_array(sp, p_, u0, lb, ub, cfg_,
                                               lam0=lam0, mu0=mu0,
                                               rho_init=rho_init)

    cfg_outer = ALConfig(nn_basis_refresh="outer")

    which = os.environ.get("NN_BENCH", "scalar1024,array1024,scalar4096")
    out_s = out_a = out_o = None
    for item in which.split(","):
        if item == "scalar1024":
            out_s = run("scalar", scalar_single, 1024)
        elif item == "array1024":
            out_a = run("array ", array_single, 1024)
        elif item == "scalar4096":
            run("scalar", scalar_single, 4096)
        elif item == "array4096":
            run("array ", array_single, 4096)
        elif item == "outer1024":
            out_o = run("outer ", scalar_single, 1024, cfg_run=cfg_outer)
        elif item == "outer4096":
            run("outer ", scalar_single, 4096, cfg_run=cfg_outer)
        elif item.startswith("chunk"):
            k, B = item[5:].split("_")
            out_o = run(f"chunk{k}", scalar_single, int(B),
                        cfg_run=ALConfig(nn_basis_refresh=int(k)))
    pairs = [("scalar", out_s), ("array", out_a), ("chunk", out_o)]
    for i in range(len(pairs)):
        for j in range(i + 1, len(pairs)):
            (ta, oa), (tb, ob) = pairs[i], pairs[j]
            if oa is None or ob is None:
                continue
            dz = np.abs(np.asarray(oa.z) - np.asarray(ob.z)).max()
            dw = np.abs(np.asarray(oa.w) - np.asarray(ob.w)).max()
            print(f"{ta}-vs-{tb} parity: dz={dz:.3g} dw={dw:.3g}",
                  flush=True)


if __name__ == "__main__":
    main()
