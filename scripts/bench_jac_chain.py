"""Same-session A/B: MLP Jacobian chain forms at the NN-solve shapes
(round-5 VERDICT item 3 groundwork).

The staged solve is vmap(per-scenario); its per-inner tube-net Jacobian
is therefore a BATCHED einsum chain — per-scenario (i, j)x(j, o) GEMMs,
a fraction of a 128x128 MXU tile each (the round-4 tick analysis).
Variants measured with the full-Jacobian fori_loop carry (x200, the
per-solve call count; a reduced output would let XLA push the sum into
the chain and collapse the GEMMs to matvecs — an earlier version of this
script had exactly that bug):

  A. vmap(per-scenario value_and_jacobian)  — the solver's current form
  B. direct batched value_and_jacobian      — models.py (leftmul big GEMM)
  C. direct batched, shared-W einsum form   — the pre-round-5 chain
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, *args, reps=5, warm=3):
    import jax
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])
    for _ in range(warm - 1):
        out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0])
        ts.append(time.perf_counter() - t0)
    return min(ts), out


def main():
    from legged_gym_dev_tpu.utils.runtime import setup_tpu_runtime

    setup_tpu_runtime()
    import jax
    import jax.numpy as jnp

    from legged_gym_dev_tpu.tube.models import MLP, _ACT_DERIVS, _ACTIVATIONS

    B, N, H_REV = 1024, 50, 10
    d_in = H_REV + (H_REV + N) * 2
    nn = MLP.create(jax.random.PRNGKey(0), d_in, N, num_units=128,
                    num_layers=2, final_activation="softplus")
    x = jax.random.normal(jax.random.PRNGKey(1), (B, d_in))
    ITERS = 200

    def vj_einsum(x):
        """Pre-round-5 form: shared-W left-product as batched einsum."""
        act = _ACTIVATIONS[nn.activation]
        dact = _ACT_DERIVS[nn.activation]
        h = x
        acts_pre = []
        for W, b in zip(nn.weights[:-1], nn.biases[:-1]):
            a = h @ W + b
            acts_pre.append(a)
            h = act(a)
        out_pre = h @ nn.weights[-1] + nn.biases[-1]
        W_last = nn.weights[-1]
        M = jnp.broadcast_to(W_last, x.shape[:-1] + W_last.shape)
        for W, a in zip(reversed(nn.weights[:-1]), reversed(acts_pre)):
            M = jnp.einsum("ij,...jo->...io", W, dact(a)[..., :, None] * M)
        M = M * _ACT_DERIVS[nn.final_activation](out_pre)[..., None, :]
        return jnp.swapaxes(M, -1, -2)

    def loop(once):
        # The loop carries the FULL Jacobian (every iteration stays live —
        # a reduced carry would let XLA push the sum into the chain and
        # collapse the GEMMs to matvecs), but the timed call returns only
        # a checksum: fetching the 28 MB J per rep over the remote tunnel
        # would swamp compute (an earlier version of this script did).
        def f(x):
            with jax.default_matmul_precision("highest"):
                J = jax.lax.fori_loop(
                    0, ITERS, lambda i, c: once(x + 1e-6 * i) + 0.0 * c,
                    once(x))
            return jnp.sum(J), J
        return jax.jit(f)

    f_vmap = loop(lambda xb: jax.vmap(
        lambda xi: nn.value_and_jacobian(xi)[1])(xb))
    f_batch = loop(lambda xb: nn.value_and_jacobian(xb)[1])
    f_ein = loop(vj_einsum)

    t_vmap, (_, J_vmap) = timed(f_vmap, x)
    t_batch, (_, J_batch) = timed(f_batch, x)
    t_ein, (_, J_ein) = timed(f_ein, x)
    e1 = float(jnp.max(jnp.abs(J_vmap - J_batch)))
    e2 = float(jnp.max(jnp.abs(J_ein - J_batch)))
    print(f"x{ITERS} B={B}: vmap(per-scn) {t_vmap*1e3:.1f} ms | "
          f"batched-bigGEMM {t_batch*1e3:.1f} ms | "
          f"batched-einsum {t_ein*1e3:.1f} ms", flush=True)
    print(f"speedup bigGEMM vs vmap {t_vmap/t_batch:.2f}x, vs einsum "
          f"{t_ein/t_batch:.2f}x; maxerr vmap={e1:.2e} einsum={e2:.2e}",
          flush=True)

    # Capacitance U^T(Ru): genuinely per-scenario; XLA batched einsum vs
    # a flattened one-GEMM-per-entry alternative does not exist — measure
    # the XLA form for the roofline record.
    S = N + 1
    Um = jax.random.normal(jax.random.PRNGKey(2), (B, S, N)) * 0.1
    Ru = jax.random.normal(jax.random.PRNGKey(3), (B, S, N)) * 0.1
    f_cap = loop(lambda u: jnp.einsum("bsi,bsj->bij", u, Ru))
    t_cap, _ = timed(f_cap, Um)
    print(f"capacitance UtRu x{ITERS}: {t_cap*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
