"""Two-phase batched solve with convergence compaction ("bucketing").

The SPMD staged solver freezes converged scenarios but still runs the full
outer schedule for them (docs/PERF.md "known remaining headroom": with
outer_used p50=17 of 20 on the bench batch, the median scenario wastes
~15% of its outer iterations; easy scenarios more). This driver splits the
schedule:

  phase 1: the first ``phase1_outers`` outer iterations on the FULL batch;
  compaction: the still-unconverged subset is gathered host-side into the
    smallest padded bucket (powers of two — one compiled phase-2 program
    per bucket size, cached);
  phase 2: the remaining outers run ONLY on the bucket, warm-started from
    phase-1 state (iterate + multipliers + penalty), then scatter back.

Not jittable end-to-end (the compaction is a host round-trip on the
converged mask — two device programs instead of one); use where the solve
is already host-driven (bench, data pipelines). The phase-2 resume carries
(u, lam, mu, rho) exactly; only the penalty-growth hysteresis state
(prev_viol) resets at the phase boundary, so iterates can differ from the
single-phase path within solver tolerance — parity is on feasibility
stats, asserted in tests/test_fast_tube.py.

Replaces nothing in the reference (IPOPT solves one scenario at a time,
ref trajopt/tube_trajopt.py:277); this is a TPU-batch-shape concern only.
"""
from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from .al_solver import ALConfig
from .fast_tube import (
    StagedProblem,
    solve_tube_fast_batched,
    solve_tube_fast_single,
    staged_bounds,
)
from .trajopt import TrajOptSolution


def _next_bucket(n: int, minimum: int = 128) -> int:
    b = minimum
    while b < n:
        b *= 2
    return b


@functools.lru_cache(maxsize=None)
def _phase1_fn(N, H_rev, tube_kind, scaling, cfg1, warm_start, tube_ws):
    """Cached jitted phase-1 solve (a fresh jax.jit wrapper per call would
    re-trace every invocation — the A/B loop calls this repeatedly)."""
    return jax.jit(lambda pb: solve_tube_fast_batched(
        pb, N, H_rev, tube_kind=tube_kind, scaling=scaling, cfg=cfg1,
        warm_start=warm_start, tube_ws=tube_ws))


@functools.lru_cache(maxsize=None)
def _phase2_fn(sp, cfg2):
    return jax.jit(lambda pp, uu, ll, mm, rr, lb, ub: jax.vmap(
        lambda p_, u_, l_, m_, r_: solve_tube_fast_single(
            sp, p_, u_, lb, ub, cfg2, lam0=l_, mu0=m_, rho_init=r_)
    )(pp, uu, ll, mm, rr))


def solve_tube_fast_bucketed(
    p_batch,
    N: int,
    H_rev: int,
    tube_kind: str = "l1",
    scaling: float = 0.5,
    cfg: ALConfig = ALConfig(),
    phase1_outers: int = 16,
    warm_start: str = "interpolate",
    tube_ws="evaluate",
):
    """Bucketed twin of ``solve_tube_fast_batched`` (same signature + the
    phase-1 outer count). Returns (TrajOptSolution, stats dict)."""
    assert 0 < phase1_outers < cfg.outer_iters
    cfg1 = dataclasses.replace(cfg, outer_iters=phase1_outers)
    cfg2 = dataclasses.replace(cfg, outer_iters=cfg.outer_iters - phase1_outers)

    tube_ws_key = tube_ws if isinstance(tube_ws, str) else float(tube_ws)
    out1 = _phase1_fn(N, H_rev, tube_kind, scaling, cfg1, warm_start,
                      tube_ws_key)(p_batch)

    conv = np.asarray(out1.sol.converged)
    B = conv.shape[0]
    idx = np.nonzero(~conv)[0]
    stats = {"B": B, "unconverged_after_phase1": int(idx.size)}
    if idx.size == 0:
        return out1, stats

    bucket = min(_next_bucket(idx.size), B)
    pad = np.concatenate([idx, np.zeros(bucket - idx.size, np.int64)])
    stats["bucket"] = bucket

    sp = StagedProblem(
        n=p_batch.rom.n, m=p_batch.rom.m, N=N, K=p_batch.obs_r.shape[-1],
        tube_kind=("nn" if tube_kind == "NN_oneshot" else tube_kind),
        scaling=scaling, track_ref=False)
    p0 = jax.tree.map(lambda x: x[0], p_batch)
    lb_u, ub_u = staged_bounds(p0, sp.n, sp.m, N)

    pad_j = jnp.asarray(pad)
    p_sub = jax.tree.map(lambda x: x[pad_j], p_batch)
    u_sub = out1.sol.x.reshape(B, N + 1, -1)[pad_j]
    lam_sub = out1.sol.lam[pad_j]
    mu_sub = out1.sol.mu[pad_j]
    rho_sub = out1.sol.rho[pad_j]

    sol2 = _phase2_fn(sp, cfg2)(p_sub, u_sub, lam_sub, mu_sub, rho_sub,
                                lb_u, ub_u)

    take = jnp.asarray(idx)
    src = jnp.arange(idx.size)

    def scatter(full, part):
        return full.at[take].set(part[src])

    sol = out1.sol._replace(
        x=scatter(out1.sol.x, sol2.x),
        lam=scatter(out1.sol.lam, sol2.lam),
        mu=scatter(out1.sol.mu, sol2.mu),
        viol=scatter(out1.sol.viol, sol2.viol),
        grad_norm=scatter(out1.sol.grad_norm, sol2.grad_norm),
        obj=scatter(out1.sol.obj, sol2.obj),
        rho=scatter(out1.sol.rho, sol2.rho),
        converged=scatter(out1.sol.converged, sol2.converged),
        outer_used=scatter(
            out1.sol.outer_used,
            sol2.outer_used + out1.sol.outer_used[pad_j]),
    )
    b = sp.n + 1 + sp.m
    u_all = sol.x.reshape(B, N + 1, b)
    z = u_all[:, :, : sp.n]
    w = u_all[:, :, sp.n]
    v = u_all[:, :-1, sp.n + 1:]
    return TrajOptSolution(z=z, v=v, w=w, sol=sol), stats
