"""Component-level timing of the scalar-entry staged tube solver.

Times at bench shapes (B from env BENCH_BATCH or 4096, N=50, gap problem):
  - full solve (reference point)
  - assemble only (x inner count)
  - factor+solve only (x inner count)
  - merit eval (1 + ls-batch) only (x inner count)
Run on the real chip: `python scripts/profile_staged.py`.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from legged_gym_dev_tpu.utils.runtime import setup_tpu_runtime

setup_tpu_runtime()

import jax
import jax.numpy as jnp

from legged_gym_dev_tpu.core import make_rom
from legged_gym_dev_tpu.solver import ALConfig, PROBLEM_DICT, TrajOptParams
from legged_gym_dev_tpu.solver import fast_tube as ft
from legged_gym_dev_tpu.solver import staged_scalar as ss


def timeit(fn, *a, n=5):
    # Round-5 fix: fetch a checksum, not the first output leaf — a large
    # leaf transferred over the remote tunnel per rep swamps compute (the
    # r3/r4 NN attribution bug, docs/PERF.md round-5 correction).
    import jax.numpy as jnp

    fnw = jax.jit(lambda *aa: jax.tree_util.tree_reduce(
        lambda acc, x: acc + jnp.sum(jnp.asarray(x, jnp.float32)),
        fn(*aa), jnp.float32(0.0)))
    out = fnw(*a)
    np.asarray(out)
    for _ in range(2):
        out = fnw(*a)
    np.asarray(out)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fnw(*a)
        np.asarray(out)
        ts.append(time.perf_counter() - t0)
    return min(ts)


N, H_REV = 50, 10
B = int(os.environ.get("BENCH_BATCH", "4096"))
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

INNER = cfg.outer_iters * cfg.inner_iters  # sequential inner steps per solve


def make_u0(pp):
    z_ws = pp.z0[None] + (pp.zf - pp.z0)[None] * jnp.linspace(0, 1, S)[:, None]
    u0 = ft.pack_staged(z_ws, jnp.full((S,), 0.1), jnp.zeros((N, m)), n, m, N)
    lb, ub = ft.staged_bounds(pp, n, m, N)
    return u0, lb, ub


@jax.jit
def full_solve(pb):
    def one(pp):
        u0, lb, ub = make_u0(pp)
        return ss.solve_staged_scalar(sp, pp, u0, lb, ub, cfg)
    return jax.vmap(one)(pb).x


def lam_mu(pp):
    E = N * n + 2 + N
    I = S * sp.K
    return jnp.zeros((E,)), jnp.zeros((I,)), jnp.asarray(cfg.rho0)


@jax.jit
def assemble_only(pb):
    def one(pp):
        u0, lb, ub = make_u0(pp)
        u_e = tuple(u0[:, i] for i in range(b))
        lam, mu, rho = lam_mu(pp)

        def body(carry, _):
            u_c = carry
            g_e, D_e, L_e, _ = ss._assemble_e(sp, u_c, pp, lam, mu, rho)
            bump = sum(ss._none_to_zero(D_e[i][i]) for i in range(b))
            u_n = tuple(u_c[i] + 1e-12 * (g_e[i] + bump) for i in range(b))
            return u_n, None

        out, _ = jax.lax.scan(body, u_e, None, length=INNER)
        return out[0]
    return jax.vmap(one)(pb)


@jax.jit
def factor_only(pb):
    def one(pp):
        u0, lb, ub = make_u0(pp)
        u_e = tuple(u0[:, i] for i in range(b))
        lam, mu, rho = lam_mu(pp)
        g_e, D_e, L_e, _ = ss._assemble_e(sp, u_e, pp, lam, mu, rho)
        reg = cfg.reg
        Dm = [[0.0] * b for _ in range(b)]
        for i in range(b):
            for j in range(i + 1):
                v = D_e[i][j]
                if i == j:
                    v = ss._add(v, reg)
                if ss._is0(v):
                    Dm[i][j] = jnp.zeros((S,))
                else:
                    Dm[i][j] = jnp.broadcast_to(
                        jnp.asarray(v, jnp.float32), (S,))
        rhs0 = [-(ss._none_to_zero(g_e[i]) + 0.0 * u_e[i]) for i in range(b)]

        def body(carry, _):
            r = carry
            d = ss.factor_solve_entries(Dm, L_e, list(r), b)
            r2 = tuple(ri + 1e-12 * di for ri, di in zip(r, d))
            return r2, None

        out, _ = jax.lax.scan(body, tuple(rhs0), None, length=INNER)
        return out[0]
    return jax.vmap(one)(pb)


@jax.jit
def merit_only(pb):
    def one(pp):
        u0, lb, ub = make_u0(pp)
        u_e = tuple(u0[:, i] for i in range(b))
        lam, mu, rho = lam_mu(pp)
        alphas = cfg.ls_backtrack ** jnp.arange(cfg.ls_iters,
                                                dtype=jnp.float32)

        def body(carry, _):
            u_c = carry
            m0 = ss._merit_e(sp, u_c, pp, lam, mu, rho)
            u_try = tuple(u_c[i][None] * (1.0 + 0.0 * alphas[:, None])
                          for i in range(b))
            mt = ss._merit_e(sp, u_try, pp, lam, mu, rho)
            u_n = tuple(u_c[i] + 1e-12 * (m0 + mt[0]) for i in range(b))
            return u_n, None

        out, _ = jax.lax.scan(body, u_e, None, length=INNER)
        return out[0]
    return jax.vmap(one)(pb)


@jax.jit
def inner_only(pb):
    """The solver's actual inner_step, iterated INNER times (no outer-body
    multiplier updates / residual recomputes), to separate inner cost from
    outer overhead."""
    def one(pp):
        u0, lb, ub = make_u0(pp)
        u_e = tuple(u0[:, i] for i in range(b))
        lb_e = tuple(lb[:, i] for i in range(b))
        ub_e = tuple(ub[:, i] for i in range(b))
        lam, mu, rho = lam_mu(pp)
        E = N * n + 2 + N
        I_ = S * sp.K
        lam = jnp.zeros((E,))
        mu = jnp.zeros((I_,))

        # replicate solve_staged_scalar's inner_step via its private pieces
        from legged_gym_dev_tpu.solver.staged_scalar import (
            _assemble_e, _merit_e, _mul, _add, _is0, factor_solve_entries,
        )
        eps_e = tuple(1e-9 + 1e-6 * (ub_e[i] - lb_e[i]) for i in range(b))

        def inner_step(u_e):
            merit = _merit_e(sp, u_e, pp, lam, mu, rho)
            grad_e, D_e, L_e, _ = _assemble_e(sp, u_e, pp, lam, mu, rho)
            fm = []
            for i in range(b):
                at_lb = (u_e[i] <= lb_e[i] + eps_e[i]) & (grad_e[i] > 0.0)
                at_ub = (u_e[i] >= ub_e[i] - eps_e[i]) & (grad_e[i] < 0.0)
                fm.append((~(at_lb | at_ub)).astype(jnp.float32))
            reg = cfg.reg + 1e-6 * rho
            Dm = [[0.0] * b for _ in range(b)]
            for i in range(b):
                for j in range(i + 1):
                    if _is0(D_e[i][j]) and i != j:
                        Dm[i][j] = jnp.zeros((S,))
                        continue
                    v = _mul(D_e[i][j], fm[i] * fm[j])
                    if i == j:
                        v = _add(v, (1.0 - fm[i]) + reg)
                    Dm[i][j] = v if not _is0(v) else jnp.zeros((S,))
            Lm = [[0.0] * b for _ in range(b)]
            for i in range(b):
                for j in range(b):
                    Lm[i][j] = _mul(L_e[i][j], fm[i][1:] * fm[j][:-1])
            gf = [grad_e[i] * fm[i] for i in range(b)]
            d_e = factor_solve_entries(Dm, Lm, [-g for g in gf], b)
            d_e = [jnp.where(fm[i] > 0.0, d_e[i], 0.0) for i in range(b)]
            dir_deriv = 0.0
            for i in range(b):
                dir_deriv = dir_deriv + jnp.sum(grad_e[i] * d_e[i])
            alphas = cfg.ls_backtrack ** jnp.arange(cfg.ls_iters,
                                                    dtype=jnp.float32)
            u_try = tuple(
                jnp.clip(u_e[i][None] + alphas[:, None] * d_e[i][None],
                         lb_e[i], ub_e[i]) for i in range(b))
            m_trys = _merit_e(sp, u_try, pp, lam, mu, rho)
            ok = m_trys <= merit + cfg.armijo * alphas * dir_deriv
            idx = jnp.argmax(ok)
            any_ok = jnp.any(ok)
            return tuple(jnp.where(any_ok, u_try[i][idx], u_e[i])
                         for i in range(b))

        def body(carry, _):
            return inner_step(carry), None

        out, _ = jax.lax.scan(body, u_e, None, length=INNER)
        return out[0]
    return jax.vmap(one)(pb)


print(f"B={B} N={N} inner-steps/solve={INNER}")
t = timeit(full_solve, p_batch)
print(f"full solve:      {t*1e3:8.1f} ms   ({B/t:8.0f} solves/s)")
t = timeit(inner_only, p_batch)
print(f"inner   x{INNER}:   {t*1e3:8.1f} ms")
t = timeit(assemble_only, p_batch)
print(f"assemble x{INNER}:  {t*1e3:8.1f} ms")
t = timeit(factor_only, p_batch)
print(f"factor  x{INNER}:   {t*1e3:8.1f} ms")
t = timeit(merit_only, p_batch)
print(f"merit   x{INNER}:   {t*1e3:8.1f} ms")
