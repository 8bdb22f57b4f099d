"""Component-level timing of the structured tube solve's inner step.

Times, at bench shapes (B=1024, N=50, SingleInt2D gap problem):
  - full solve (reference point)
  - assemble only (grad/D/L), x inner-step count
  - factor+solve only
  - merit (residual) eval only, x line-search count
Run on the real chip: `python scripts/profile_solver.py`.
"""
import time

import numpy as np


def timeit(fn, *a, n=3):
    out = fn(*a)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*a)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        ts.append(time.perf_counter() - t0)
    return min(ts)


from legged_gym_dev_tpu.utils.runtime import setup_tpu_runtime

setup_tpu_runtime()

import jax
import jax.numpy as jnp

from legged_gym_dev_tpu.core import make_rom
from legged_gym_dev_tpu.solver import ALConfig, PROBLEM_DICT, TrajOptParams
from legged_gym_dev_tpu.solver import fast_tube as ft
from legged_gym_dev_tpu.solver.block_tridiag import (
    block_tridiag_factor,
    block_tridiag_solve,
)

N, H_REV, B = 50, 10, 1024
prob = PROBLEM_DICT["gap"]
pm = make_rom("SingleInt2D", prob["dt"], [-prob["pos_max"]] * 2,
              [prob["pos_max"]] * 2, [-prob["vel_max"]] * 2,
              [prob["vel_max"]] * 2)
Q = 10 * np.eye(2)
p = TrajOptParams.create(pm, N, H_REV, Q, Q, prob["start"], prob["goal"],
                         prob["obs"]["c"], prob["obs"]["r"], Qw=0.0, w_max=1.0)
rng = np.random.default_rng(0)
p_batch = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape), p)
p_batch = p_batch.replace(
    z0=p_batch.z0 + jnp.asarray(rng.uniform(-0.15, 0.15, (B, 2)), jnp.float32))

cfg = ALConfig()
n, m = pm.n, pm.m
S, b = N + 1, n + 1 + m
sp = ft.StagedProblem(n=n, m=m, N=N, K=p.obs_r.shape[0], tube_kind="l1",
                      scaling=0.5, track_ref=False)

# representative iterates
from legged_gym_dev_tpu.solver.trajopt import get_warm_start

z0s, v0s = jax.vmap(lambda pp: get_warm_start("interpolate", pp, N, cfg))(p_batch)
w0s = 0.5 * jnp.sum(jnp.abs(v0s), axis=-1)
w0s = jnp.concatenate([jnp.zeros((B, 1)), w0s], axis=1)
u0 = jax.vmap(lambda z, w, v: ft.pack_staged(z, w, v, n, m, N))(z0s, w0s, v0s)
lam = jnp.zeros((B, N * n + 2 + N))
mu = jnp.zeros((B, S * sp.K))
rho = jnp.full((B,), 100.0)

n_inner = cfg.outer_iters * cfg.inner_iters  # 200
n_merit = n_inner * cfg.ls_iters

full = jax.jit(lambda pb: ft.solve_tube_fast_batched(
    pb, N, H_REV, tube_kind="l1", scaling=0.5, cfg=cfg,
    warm_start="interpolate", tube_ws="evaluate").z)
t_full = timeit(full, p_batch)

@jax.jit
def assemble_rep(u, pb, lam, mu, rho):
    def body(c, _):
        g, D, L, _ = jax.vmap(
            lambda uu, pp, l_, m_, r_: ft._assemble(sp, uu, pp, l_, m_, r_)
        )(c, pb, lam, mu, rho)
        return c + 1e-12 * g, (jnp.sum(D), jnp.sum(L))
    c, outs = jax.lax.scan(body, u, None, length=n_inner)
    return c, outs

t_asm = timeit(assemble_rep, u0, p_batch, lam, mu, rho)

g0, D0, L0, _ = jax.vmap(
    lambda uu, pp, l_, m_, r_: ft._assemble(sp, uu, pp, l_, m_, r_)
)(u0, p_batch, lam, mu, rho)

@jax.jit
def factor_rep(D, L, g):
    def body(c, _):
        fac = jax.vmap(block_tridiag_factor)(D, L)
        d = jax.vmap(block_tridiag_solve)(fac, c)
        return c + 1e-12 * d, None
    c, _ = jax.lax.scan(body, g, None, length=n_inner)
    return c

t_fac = timeit(factor_rep, D0, L0, g0)

@jax.jit
def merit_rep(u, pb, lam, mu, rho):
    def body(c, _):
        mval = jax.vmap(lambda uu, pp, l_, m_, r_: ft._merit(sp, uu, pp, l_, m_, r_))(
            u, pb, lam, mu, rho)
        return c + 1e-12 * mval[:, None, None], None
    c, _ = jax.lax.scan(body, u, None, length=n_inner)
    return c

t_merit_seq = timeit(merit_rep, u0, p_batch, lam, mu, rho)

print(f"full solve          : {t_full*1e3:8.1f} ms   ({B/t_full:7.1f} solves/s)")
print(f"assemble x{n_inner:3d}       : {t_asm*1e3:8.1f} ms")
print(f"factor+solve x{n_inner:3d}   : {t_fac*1e3:8.1f} ms")
print(f"merit(seq-dep) x{n_inner:3d} : {t_merit_seq*1e3:8.1f} ms  (1 per inner; ls adds a parallel 10-wide)")
print(f"unaccounted         : {(t_full-t_asm-t_fac-t_merit_seq)*1e3:8.1f} ms")
