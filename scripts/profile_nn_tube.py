"""Component profile of the NN-oneshot scalar-entry solve at bench shapes.

Times each candidate hot spot in isolation at its per-solve call count
(200 inner iterations) so the full-solve wall time can be attributed:
  - MLP Jacobian (jacfwd vs jacrev, highest vs default matmul precision)
  - multi-RHS banded Thomas scan (R=51) vs single-RHS
  - (B, N, N) capacitance Cholesky vs LU solve
  - MLP merit evals (11x per inner: 10 LS candidates + assemble)
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(tag, fn, *args, reps=5):
    """Round-5 fix: time a CHECKSUM of the result, not the result.

    The original fetched ``tree.leaves(out)[0]`` — for the Jacobian
    variants that is a 28 MB device->host transfer over the remote tunnel
    PER REP, which swamped compute ~20x and produced the round-3/4
    "5-6 ms/call vs <1 ms roofline" attribution (real: ~0.25 ms/call).
    The checksum is applied OUTSIDE the fori_loop carry, so every
    iteration's full computation stays live."""
    import jax
    import jax.numpy as jnp

    fnw = jax.jit(lambda *a: jax.tree_util.tree_reduce(
        lambda acc, x: acc + jnp.sum(jnp.asarray(x, jnp.float32)),
        fn(*a), jnp.float32(0.0)))
    out = fnw(*args)
    np.asarray(out)
    for _ in range(2):
        out = fnw(*args)
    np.asarray(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fnw(*args)
        np.asarray(out)
        ts.append(time.perf_counter() - t0)
    print(f"{tag}: {min(ts)*1000:.1f} ms", flush=True)
    return min(ts)


def main():
    from legged_gym_dev_tpu.utils.runtime import setup_tpu_runtime

    setup_tpu_runtime()

    import jax
    import jax.numpy as jnp

    from legged_gym_dev_tpu.tube.models import MLP

    B = int(os.environ.get("B", "1024"))
    N, H_REV, m = 50, 10, 2
    S = N + 1
    ITERS = 200  # inner iterations per solve (20 outer x 10 inner)
    key = jax.random.PRNGKey(0)
    nn = MLP.create(key, H_REV + (H_REV + N) * m, N, num_units=128,
                    num_layers=2, final_activation="softplus")

    zv = jax.random.normal(key, (B, N * m)) * 0.1
    e_hist = jnp.zeros((B, H_REV))
    vprev = jnp.zeros((B, H_REV, m))

    def fw_of(zvi, e, vp):
        vs = zvi.reshape(m, N)
        x = jnp.concatenate([e, jnp.concatenate([vp[:, 0], vs[0]]),
                             jnp.concatenate([vp[:, 1], vs[1]])])
        return nn(x)

    # --- MLP Jacobian variants (xITERS) ---
    def jac_fwd_hi(zv):
        with jax.default_matmul_precision("highest"):
            def once(z):
                return jax.vmap(jax.jacfwd(fw_of), (0, 0, 0))(z, e_hist, vprev)
            return jax.lax.fori_loop(
                0, ITERS, lambda i, c: once(zv + 1e-6 * i) + 0.0 * c,
                once(zv))

    def jac_rev_hi(zv):
        with jax.default_matmul_precision("highest"):
            def once(z):
                return jax.vmap(jax.jacrev(fw_of), (0, 0, 0))(z, e_hist, vprev)
            return jax.lax.fori_loop(
                0, ITERS, lambda i, c: once(zv + 1e-6 * i) + 0.0 * c,
                once(zv))

    def jac_rev_def(zv):
        def once(z):
            return jax.vmap(jax.jacrev(fw_of), (0, 0, 0))(z, e_hist, vprev)
        return jax.lax.fori_loop(
            0, ITERS, lambda i, c: once(zv + 1e-6 * i) + 0.0 * c, once(zv))

    if os.environ.get("PROF_JAC_AD"):
        timeit("jacfwd highest x200", jax.jit(jac_fwd_hi), zv)
        timeit("jacrev highest x200", jax.jit(jac_rev_hi), zv)
        timeit("jacrev default x200", jax.jit(jac_rev_def), zv)

    # The analytic matmul-chain Jacobian actually used by the solver.
    def jac_analytic(zv):
        def once(z):
            def one(zi, e, vp):
                vs = zi.reshape(m, N)
                x = jnp.concatenate(
                    [e, jnp.concatenate([vp[:, 0], vs[0]]),
                     jnp.concatenate([vp[:, 1], vs[1]])])
                return nn.value_and_jacobian(x)[1]
            return jax.vmap(one, (0, 0, 0))(z, e_hist, vprev)
        return jax.lax.fori_loop(
            0, ITERS, lambda i, c: once(zv + 1e-6 * i) + 0.0 * c, once(zv))

    timeit("value_and_jacobian x200", jax.jit(jac_analytic), zv)

    # --- MLP forward (merit) 11x per inner ---
    def fwd_11(zv):
        with jax.default_matmul_precision("highest"):
            def once(z):
                zb = jnp.broadcast_to(z[:, None], (B, 11, N * m))
                return jax.vmap(jax.vmap(fw_of, (0, None, None)), (0, 0, 0))(
                    zb, e_hist, vprev)
            return jax.lax.fori_loop(
                0, ITERS, lambda i, c: once(zv + 1e-6 * i) + 0.0 * c,
                once(zv))
    timeit("mlp fwd 11-cand x200", jax.jit(fwd_11), zv)

    # --- capacitance solve (B, N, N) x200 ---
    A = jax.random.normal(key, (B, N, N)) * 0.1
    C = jnp.eye(N) + jnp.einsum("bij,bkj->bik", A, A)
    rhs = jax.random.normal(key, (B, N))

    def cho_loop(C, rhs):
        with jax.default_matmul_precision("highest"):
            def once(C):
                cf = jax.scipy.linalg.cho_factor(C, lower=True)
                return jax.scipy.linalg.cho_solve(cf, rhs)
            return jax.lax.fori_loop(
                0, ITERS, lambda i, c: once(C + 1e-6 * i) + 0.0 * c, once(C))

    def blocked_loop(C, rhs):
        from legged_gym_dev_tpu.ops.blocked_chol import (
            blocked_cho_solve, blocked_cholesky,
        )

        def once(C):
            Lc = jax.vmap(lambda Ci: blocked_cholesky(Ci, p=10))(C)
            return jax.vmap(lambda Li, ri: blocked_cho_solve(Li, ri, p=10))(
                Lc, rhs)
        return jax.lax.fori_loop(
            0, ITERS, lambda i, c: once(C + 1e-6 * i) + 0.0 * c, once(C))

    if os.environ.get("PROF_CHOL_XLA"):
        timeit("cho_factor+solve (B,50,50) x200", jax.jit(cho_loop), C, rhs)
    timeit("blocked chol+solve (B,50,50) x200", jax.jit(blocked_loop), C, rhs)

    # Capacitance assembly: 3x batched (N, S) @ (S, N) matmuls + matvecs.
    Um3 = jax.random.normal(key, (3, B, S, 50)) * 0.1
    Ru3 = jax.random.normal(key, (3, B, S, 50)) * 0.1

    def cap_loop(Um3, Ru3):
        def once(Um3):
            C = jnp.eye(50)
            for i in range(3):
                C = C + jnp.einsum("bsi,bsj->bij", Um3[i], Ru3[i])
            return C
        return jax.lax.fori_loop(
            0, ITERS, lambda i, c: once(Um3 + 1e-6 * i) + 0.0 * c,
            once(Um3))

    timeit("capacitance 3x UtRu x200", jax.jit(cap_loop), Um3, Ru3)

    # --- banded Thomas: single vs multi RHS x200 ---
    from legged_gym_dev_tpu.solver.staged_scalar import factor_solve_entries
    b = 5
    rng = np.random.default_rng(0)
    Dfull = np.einsum("bsij,bskj->bsik",
                      rng.normal(size=(B, S, b, b)).astype(np.float32),
                      rng.normal(size=(B, S, b, b)).astype(np.float32))
    Dfull += 10 * b * np.eye(b, dtype=np.float32)
    Lfull = 0.3 * rng.normal(size=(B, S - 1, b, b)).astype(np.float32)

    D_e = [[jnp.asarray(Dfull[:, :, i, j]) for j in range(i + 1)]
           for i in range(b)]
    L_e = [[jnp.asarray(Lfull[:, :, i, j]) for j in range(b)]
           for i in range(b)]
    r1 = [jnp.asarray(rng.normal(size=(B, S)).astype(np.float32))
          for _ in range(b)]
    rM = [jnp.asarray(rng.normal(size=(B, S, 51)).astype(np.float32))
          for _ in range(b)]

    Dj = jnp.asarray(Dfull)
    Lj = jnp.asarray(Lfull)

    def solve1(r):
        def call(rr):
            return jax.vmap(lambda Df, Lf, rs: factor_solve_entries(
                [[Df[:, i, j] for j in range(i + 1)] for i in range(b)],
                [[Lf[:, i, j] for j in range(b)] for i in range(b)],
                list(rs), b))(Dj, Lj, rr)
        return jax.lax.fori_loop(
            0, ITERS, lambda i, c: jax.tree.map(
                lambda a, bb: a + 0.0 * bb, call([x + 1e-6 * i for x in r]),
                c), call(r))

    timeit("thomas single-rhs x200", jax.jit(solve1), r1)
    timeit("thomas 51-rhs x200", jax.jit(solve1), rM)


if __name__ == "__main__":
    main()
