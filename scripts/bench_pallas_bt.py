"""A/B: Pallas block-tridiagonal factor+solve vs the XLA scalar-entry scan.

Sweeps the Pallas lane-tile size — the round-1 kernel ran at tile_b=128,
i.e. (1, 128) register tiles per block-scalar op (1/8 sublane utilization);
tile_b=1024 gives full (8, 128) vregs at ~11 MB VMEM residency.

Shapes: the bench solve's inner linear system (S=51, b=5) at B=1024/4096,
200 repetitions in one fused fori (the solve's per-batch call count).
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

    from legged_gym_dev_tpu.ops.pallas_block_tridiag import (
        block_tridiag_solve_pallas,
    )
    from legged_gym_dev_tpu.solver.staged_scalar import factor_solve_entries

    S, b = 51, 5
    ITERS = int(os.environ.get("ITERS", "200"))
    rng = np.random.default_rng(0)

    def timeit(tag, fn, *args, reps=3):
        out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0])
        for _ in range(2):
            out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0])
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn(*args)
            np.asarray(jax.tree.leaves(out)[0])
            ts.append(time.perf_counter() - t0)
        print(f"{tag}: {min(ts)*1000:.1f} ms ({ITERS} solves)", flush=True)
        return out

    for B in (1024, 4096):
        Df = np.einsum("bsij,bskj->bsik",
                       rng.normal(size=(B, S, b, b)).astype(np.float32),
                       rng.normal(size=(B, S, b, b)).astype(np.float32))
        Df += 10 * b * np.eye(b, dtype=np.float32)
        Lf = 0.3 * rng.normal(size=(B, S - 1, b, b)).astype(np.float32)
        rf = rng.normal(size=(B, S, b)).astype(np.float32)
        D, L, rhs = jnp.asarray(Df), jnp.asarray(Lf), jnp.asarray(rf)

        # XLA scalar-entry scan reference (the production path), x ITERS.
        def xla_loop(D, L, rhs):
            def once(rr):
                # vmap over B: entries per problem are (S,)
                def solve_one(Di, Li, ri):
                    de = [[Di[:, i, j] for j in range(i + 1)]
                          for i in range(b)]
                    le = [[Li[:, i, j] for j in range(b)] for i in range(b)]
                    re = [ri[:, i] for i in range(b)]
                    return factor_solve_entries(de, le, re, b)
                return jax.vmap(solve_one)(D, L, rr)
            return jax.lax.fori_loop(
                0, ITERS,
                lambda i, c: jax.tree.map(lambda a, bb: a + 0.0 * bb,
                                          once(rhs + 1e-6 * i), c),
                once(rhs))

        x_ref = timeit(f"B={B} xla entry-scan", jax.jit(xla_loop), D, L, rhs)

        for tile in (128, 256, 512, 1024):
            if B % tile != 0:
                continue

            def pl_loop(D, L, rhs, tile=tile):
                def once(rr):
                    return block_tridiag_solve_pallas(D, L, rr, tile_b=tile)
                return jax.lax.fori_loop(
                    0, ITERS, lambda i, c: once(rhs + 1e-6 * i) + 0.0 * c,
                    once(rhs))

            try:
                x_pl = timeit(f"B={B} pallas tile={tile}",
                              jax.jit(pl_loop), D, L, rhs)
                err = float(jnp.max(jnp.abs(
                    x_pl - jnp.stack([x_ref[i] for i in range(b)], axis=-1)
                )))
                print(f"   max_err vs xla: {err:.2e}", flush=True)
            except Exception as e:
                print(f"B={B} pallas tile={tile} FAILED: "
                      f"{type(e).__name__}: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
