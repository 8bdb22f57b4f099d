"""Heightfield gather forms on chip (round-5 item 2, after the analytic-
gradient fix): the contact path's 4-corner sample is 83% of the rough
env step (4.49 of 5.42 ms at B=2048, profile_rough.py). Candidates:

  A. current: one 1D take of (..., 4) scattered flat indices
  B. pre-paired rows: hf2[(x, y)] = [h(x, y), h(x, y+1)]  -> 2-wide slices
  C. pre-quadded:   hf4[(x, y)] = [h00, h01, h10, h11]    -> 4-wide slices
  D. two separate row gathers (idx, idx+1 contiguity exposed)

All computed at the contact-path scale: B*nc points, x200 loop-carried,
checksum output (no transfer in the timing).
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(tag, fn, *args, reps=5):
    import jax
    import jax.numpy as jnp

    fnw = jax.jit(lambda *a: jnp.sum(fn(*a)))
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
    print(f"{tag}: {min(ts)*1000:.2f} ms ({min(ts)*1000/200:.4f} ms/call)",
          flush=True)
    return min(ts)


def main():
    from legged_gym_dev_tpu.utils.runtime import setup_tpu_runtime

    setup_tpu_runtime()
    import jax
    import jax.numpy as jnp

    B, NC = 2048, 13
    P = B * NC
    H, W = 820, 1620   # the anymal_c_rough 10x20 grid heightfield scale
    ITERS = 200
    rng = np.random.default_rng(0)
    hf = jnp.asarray(rng.normal(size=(H, W)).astype(np.float32))
    hf_flat = hf.reshape(-1)
    # Pre-paired/quadded tables (host-side one-time cost at terrain build).
    hf2 = jnp.stack([hf[:, :-1], hf[:, 1:]], axis=-1).reshape(-1, 2)
    hf4 = jnp.stack([hf[:-1, :-1], hf[:-1, 1:], hf[1:, :-1], hf[1:, 1:]],
                    axis=-1).reshape(-1, 4)
    px = jnp.asarray(rng.uniform(1, H - 2, P).astype(np.float32))
    py = jnp.asarray(rng.uniform(1, W - 2, P).astype(np.float32))

    def loop(once):
        def f(px):
            return jax.lax.fori_loop(
                0, ITERS, lambda i, c: once(px + 0.001 * i) + 0.0 * c,
                once(px))
        return f

    def corners_A(px):
        x0 = jnp.clip(jnp.floor(px).astype(jnp.int32), 0, H - 2)
        y0 = jnp.clip(jnp.floor(py).astype(jnp.int32), 0, W - 2)
        idx = (x0 * W + y0)[:, None] + jnp.asarray([0, 1, W, W + 1],
                                                   jnp.int32)
        return jnp.take(hf_flat, idx).sum(-1)

    def corners_B(px):
        x0 = jnp.clip(jnp.floor(px).astype(jnp.int32), 0, H - 2)
        y0 = jnp.clip(jnp.floor(py).astype(jnp.int32), 0, W - 2)
        i0 = x0 * (W - 1) + y0
        i1 = (x0 + 1) * (W - 1) + y0
        top = jnp.take(hf2, i0, axis=0)     # (P, 2) slices
        bot = jnp.take(hf2, i1, axis=0)
        return (top.sum(-1) + bot.sum(-1))

    def corners_C(px):
        x0 = jnp.clip(jnp.floor(px).astype(jnp.int32), 0, H - 2)
        y0 = jnp.clip(jnp.floor(py).astype(jnp.int32), 0, W - 2)
        q = jnp.take(hf4, x0 * (W - 1) + y0, axis=0)  # (P, 4) slices
        return q.sum(-1)

    def corners_D(px):
        x0 = jnp.clip(jnp.floor(px).astype(jnp.int32), 0, H - 2)
        y0 = jnp.clip(jnp.floor(py).astype(jnp.int32), 0, W - 2)
        base = x0 * W + y0
        a = jnp.take(hf_flat, base) + jnp.take(hf_flat, base + 1)
        bvals = jnp.take(hf_flat, base + W) + jnp.take(hf_flat, base + W + 1)
        return a + bvals

    for tag, fn in (("A 4-single flat take", corners_A),
                    ("B 2x pair-slice take", corners_B),
                    ("C 1x quad-slice take", corners_C),
                    ("D 4 separate takes", corners_D)):
        timeit(tag, loop(fn), px)


if __name__ == "__main__":
    main()
