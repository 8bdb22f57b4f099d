"""Batched augmented-Lagrangian Gauss-Newton NLP solver in pure JAX.

TPU-native replacement for the reference's CasADi + IPOPT(+MUMPS) stack
(ref: trajopt/tube_trajopt.py:129-285). Design:

- The NLP is supplied as pure functions of a flat decision vector ``x`` and a
  scenario-parameter pytree ``p``: a least-squares objective residual ``r``
  (cost = 0.5 * ||r||^2), equality constraints ``h(x,p)=0``, inequality
  constraints ``g(x,p)>=0``, and box bounds.
- Outer loop: Powell-Hestenes-Rockafellar augmented Lagrangian with first-order
  multiplier updates and penalty growth on stalled feasibility.
- Inner loop: projected Gauss-Newton. The GN/KKT system is dense per scenario
  (a few hundred variables for N=50 horizons) and solved with a Cholesky
  factorization — batched over thousands of scenarios via ``vmap``, the
  factorizations and the Jacobian products are large batched matmuls that map
  straight onto the TPU MXU.
- Everything is fixed-iteration with per-scenario convergence freezing
  (``jnp.where``), so one compiled program serves the entire batch with no
  data-dependent control flow.

Accuracy: with exact Jacobians (via jax.jacfwd) and multiplier convergence,
the solver converges to the same KKT points as IPOPT; parity is enforced in
tests against scipy trust-constr golden solutions (<=1e-3, BASELINE.json).
"""
from __future__ import annotations

import functools
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class ALConfig:
    """Static solver configuration."""

    outer_iters: int = struct.field(pytree_node=False, default=20)
    inner_iters: int = struct.field(pytree_node=False, default=10)
    ls_iters: int = struct.field(pytree_node=False, default=10)
    rho0: float = struct.field(pytree_node=False, default=100.0)
    rho_growth: float = struct.field(pytree_node=False, default=5.0)
    # rho_max bounds the GN least-squares condition number; the QR inner
    # solve tolerates ~3e4 in f32 (the normal-equations/Cholesky form only
    # managed ~1e4 because it squares the conditioning).
    rho_max: float = struct.field(pytree_node=False, default=3e4)
    viol_reduction: float = struct.field(pytree_node=False, default=0.5)
    tol_feas: float = struct.field(pytree_node=False, default=1e-5)
    # Stationarity tolerance is relative to the objective scale (IPOPT also
    # scales its dual-infeasibility test by multiplier magnitude).
    tol_grad: float = struct.field(pytree_node=False, default=1e-3)
    reg: float = struct.field(pytree_node=False, default=1e-7)
    ls_backtrack: float = struct.field(pytree_node=False, default=0.5)
    armijo: float = struct.field(pytree_node=False, default=1e-4)
    # Pure quadratic-penalty mode: freeze the multipliers at their initial
    # values (zeros). With the objective zeroed this minimizes exactly the
    # violation measure theta = 0.5||h||^2 + 0.5||g-||^2 — the restoration
    # phase (first-order multiplier updates diverge on infeasible problems
    # and drag the iterate away from the violation minimizer).
    penalty_only: bool = struct.field(pytree_node=False, default=False)
    # Stage-structured linear solve (staged_scalar.py only):
    # "thomas" = block-Thomas scan — fewer FLOPs, 2(S-1) sequential steps;
    # "cr" = block cyclic reduction — one fused scan-free graph, ~2-3x the
    # FLOPs; "pallas" = the fused lane-major TPU kernel
    # (ops/pallas_block_tridiag.py) routed batch-major via custom_vmap —
    # the whole stage recursion runs from VMEM (per-chip only: under a
    # sharded multi-chip jit use thomas/cr or wrap in shard_map);
    # "auto" picks thomas/cr by horizon. Measured (docs/PERF.md): thomas
    # wins at N=50 (8.9k vs 8.2k solves/s, B=4096), cr wins 1.3-1.35x at
    # N=200 where the scan's sequential depth dominates; the pallas factor
    # beats the thomas scan 4.7x/2.5x standalone at B=1024/4096.
    linsolve: str = struct.field(pytree_node=False, default="auto")
    # NN-oneshot Woodbury basis refresh (staged_scalar.py only):
    # "inner" = exact — full tube-net Jacobian + (N+1)-RHS banded solve +
    # capacitance factorization every inner iteration;
    # "outer" = refresh the basis once per outer iteration; measured
    # (docs/PERF.md) the 10-inner-stale basis collapses feasibility
    # (bound-crossing tube rows invalidate the frozen masked U) — kept for
    # the record;
    # an int k >= 1 = refresh every k inner iterations (chunked inner
    # scans). Between refreshes the correction reuses the frozen basis
    # (inexact Newton, guarded by the line search) with exact per-inner
    # gradients via one VJP (MLP.value_and_vjp).
    nn_basis_refresh: object = struct.field(pytree_node=False,
                                            default="inner")


class ALSolution(NamedTuple):
    x: jax.Array            # (D,) solution
    lam: jax.Array          # (E,) equality multipliers
    mu: jax.Array           # (I,) inequality multipliers (>= 0)
    viol: jax.Array         # () max constraint violation
    grad_norm: jax.Array    # () projected-gradient inf-norm at x
    obj: jax.Array          # () objective value
    rho: jax.Array          # () final penalty
    converged: jax.Array    # () bool
    outer_used: jax.Array   # () iterations until convergence


def _merit_and_grad_terms(r_fn, h_fn, g_fn, x, p, lam, mu, rho):
    r = r_fn(x, p)
    h = h_fn(x, p)
    g = g_fn(x, p)
    # PHR: ineq term (1/2rho)*(max(0, mu - rho g)^2 - mu^2)
    act = jnp.maximum(0.0, mu - rho * g)
    merit = (
        0.5 * jnp.sum(r * r)
        + jnp.sum(lam * h)
        + 0.5 * rho * jnp.sum(h * h)
        + (0.5 / rho) * jnp.sum(act * act - mu * mu)
    )
    return merit, r, h, g, act


def solve_al(
    r_fn: Callable,
    h_fn: Callable,
    g_fn: Callable,
    x0: jax.Array,
    p,
    lb: jax.Array,
    ub: jax.Array,
    cfg: ALConfig = ALConfig(),
    lam0: Optional[jax.Array] = None,
    mu0: Optional[jax.Array] = None,
    rho_init: Optional[jax.Array] = None,
    return_trace: bool = False,
) -> ALSolution:
    """Solve one NLP instance; vmap over (x0, p, lb, ub[, lam0, mu0]) to batch.

    min_x 0.5||r(x,p)||^2  s.t.  h(x,p)=0,  g(x,p)>=0,  lb<=x<=ub.

    With ``return_trace=True`` also returns a dict of per-outer-iteration
    stats (viol / grad_norm / rho / obj / converged), each (outer_iters,) —
    the counterpart of the reference's per-iteration solver CSV
    (ref tube_trajopt.py SolverCallback:588-657); see solver.debug.

    Traced under full-f32 matmul precision: TPU's default bf16 matmul passes
    destroy the Jacobian-product accuracy this solver's feasibility targets
    need (NN inference elsewhere keeps the fast default).
    """
    with jax.default_matmul_precision("highest"):
        return _solve_al_impl(r_fn, h_fn, g_fn, x0, p, lb, ub, cfg, lam0,
                              mu0, rho_init, return_trace)


def _solve_al_impl(r_fn, h_fn, g_fn, x0, p, lb, ub, cfg, lam0, mu0,
                   rho_init, return_trace=False) -> ALSolution:
    D = x0.shape[0]
    h0 = h_fn(x0, p)
    g0 = g_fn(x0, p)
    E, I = h0.shape[0], g0.shape[0]

    lam = jnp.zeros((E,)) if lam0 is None else lam0
    mu = jnp.zeros((I,)) if mu0 is None else mu0
    rho = jnp.asarray(cfg.rho0 if rho_init is None else rho_init, jnp.float32)

    jac_r = jax.jacfwd(r_fn)
    jac_h = jax.jacfwd(h_fn)
    jac_g = jax.jacfwd(g_fn)

    def al_value(x, lam, mu, rho):
        merit, *_ = _merit_and_grad_terms(r_fn, h_fn, g_fn, x, p, lam, mu, rho)
        return merit

    def inner_step(x, lam, mu, rho):
        """One projected Gauss-Newton step on the AL merit.

        The GN step is solved as a stacked least-squares via QR rather than
        Cholesky of the normal equations: the penalty Hessian has intrinsic
        condition ~rho * cond(J^T J), which f32 Cholesky cannot handle at the
        rho needed for tight feasibility; QR of the stacked Jacobian only
        pays the square root of that condition number.
        """
        merit, r, h, g, act = _merit_and_grad_terms(
            r_fn, h_fn, g_fn, x, p, lam, mu, rho
        )
        Jr = jac_r(x, p)
        Jh = jac_h(x, p)
        Jg = jac_g(x, p)

        grad = (
            Jr.T @ r
            + Jh.T @ (lam + rho * h)
            - Jg.T @ act
        )

        # Freeze variables pinned at a bound with gradient pushing outward
        # (projected Newton, Bertsekas 1982).
        eps_b = 1e-9 + 1e-6 * (ub - lb)
        at_lb = (x <= lb + eps_b) & (grad > 0.0)
        at_ub = (x >= ub - eps_b) & (grad < 0.0)
        free = ~(at_lb | at_ub)
        fmask = free.astype(x.dtype)

        # GN normal equations with Jacobi scaling + iterative refinement.
        # (QR would pay only sqrt of the condition number but batched
        # small-matrix QR is pathologically slow on TPU; scaled Cholesky on
        # the MXU plus one refinement pass recovers the accuracy.)
        active = (act > 0.0).astype(x.dtype)
        H = (
            Jr.T @ Jr
            + rho * (Jh.T @ Jh)
            + rho * (Jg.T * active[None, :]) @ Jg
        )
        H = H * fmask[:, None] * fmask[None, :] + jnp.diag(1.0 - fmask)
        gf = grad * fmask
        # Jacobi (symmetric diagonal) scaling equilibrates the z/v/w blocks
        # whose scales differ by O(rho).
        s = jax.lax.rsqrt(jnp.clip(jnp.diagonal(H), 1e-12))
        Hs = H * s[:, None] * s[None, :]
        Hs = Hs + cfg.reg * jnp.eye(D, dtype=x.dtype)
        gs = gf * s
        L = jax.scipy.linalg.cho_factor(Hs, lower=True)
        y = jax.scipy.linalg.cho_solve(L, -gs)
        # One refinement pass: residual is computed exactly enough in f32 to
        # claw back the factorization's lost digits.
        y = y + jax.scipy.linalg.cho_solve(L, -gs - Hs @ y)
        d = jnp.where(free, y * s, 0.0)

        # Backtracking projected line search (Armijo on the AL merit).
        dir_deriv = jnp.dot(grad, d)

        def ls_body(carry, _):
            alpha, best_x, best_merit, done = carry
            x_try = jnp.clip(x + alpha * d, lb, ub)
            m_try = al_value(x_try, lam, mu, rho)
            ok = (m_try <= merit + cfg.armijo * alpha * dir_deriv) & ~done
            best_x = jnp.where(ok, x_try, best_x)
            best_merit = jnp.where(ok, m_try, best_merit)
            done = done | ok
            return (alpha * cfg.ls_backtrack, best_x, best_merit, done), None

        (_, x_new, merit_new, ls_ok), _ = jax.lax.scan(
            ls_body, (jnp.asarray(1.0, x.dtype), x, merit, jnp.asarray(False)),
            None, length=cfg.ls_iters,
        )
        # Projected-gradient inf-norm as stationarity measure.
        pg = x - jnp.clip(x - grad, lb, ub)
        return x_new, jnp.max(jnp.abs(pg)), ls_ok

    def outer_body(carry, _):
        x, lam, mu, rho, prev_viol, converged, outer_used = carry

        def inner_body(carry2, _):
            x2, frozen = carry2
            x3, gnorm, ls_ok = inner_step(x2, lam, mu, rho)
            # Freeze once stationary on the current subproblem. A failed line
            # search keeps x unchanged for this iteration but does NOT freeze:
            # the next iteration recomputes the model at the same point with
            # (possibly) different active sets and can recover.
            frozen2 = frozen | (gnorm < cfg.tol_grad * 0.1)
            x4 = jnp.where(frozen, x2, x3)
            return (x4, frozen2), None

        (x_new, _), _ = jax.lax.scan(
            inner_body, (x, jnp.asarray(False)), None, length=cfg.inner_iters
        )
        x_new = jnp.where(converged, x, x_new)

        h = h_fn(x_new, p)
        g = g_fn(x_new, p)
        viol = jnp.maximum(
            jnp.max(jnp.abs(h)) if E > 0 else 0.0,
            jnp.max(jnp.maximum(-g, 0.0)) if I > 0 else 0.0,
        )
        # First-order multiplier updates.
        lam_new = jnp.where(converged, lam, lam + rho * h)
        mu_new = jnp.where(converged, mu, jnp.maximum(0.0, mu - rho * g))
        # Penalty growth if feasibility stalls.
        grow = viol > cfg.viol_reduction * prev_viol
        rho_new = jnp.where(
            converged | ~grow, rho, jnp.minimum(rho * cfg.rho_growth, cfg.rho_max)
        )

        # Stationarity of the Lagrangian at the new multipliers.
        r = r_fn(x_new, p)
        grad_L = (
            jac_r(x_new, p).T @ r
            + (jac_h(x_new, p).T @ lam_new if E > 0 else 0.0)
            - (jac_g(x_new, p).T @ mu_new if I > 0 else 0.0)
        )
        pg = x_new - jnp.clip(x_new - grad_L, lb, ub)
        gnorm = jnp.max(jnp.abs(pg))
        # Scale-aware dual tolerance (objective gradients grow with cost
        # magnitude; cf. IPOPT's s_d scaling of dual infeasibility).
        obj_scale = 1.0 + jnp.sqrt(jnp.sum(r * r))
        now_conv = (viol < cfg.tol_feas) & (gnorm < cfg.tol_grad * obj_scale)
        outer_used = jnp.where(converged, outer_used, outer_used + 1)
        converged = converged | now_conv
        # Per-outer-iteration stats (the reference's IPOPT iteration log /
        # SolverCallback CSV, ref tube_trajopt.py:588-657); tiny (O(outer)
        # scalars), stacked by scan and surfaced via return_trace.
        stats = {
            "viol": viol,
            "grad_norm": gnorm,
            "rho": rho_new,
            "obj": 0.5 * jnp.sum(r * r),
            "converged": converged,
        }
        return (
            (x_new, lam_new, mu_new, rho_new, viol, converged, outer_used),
            stats,
        )

    init = (
        jnp.clip(x0, lb, ub), lam, mu, rho,
        jnp.asarray(jnp.inf, jnp.float32), jnp.asarray(False),
        jnp.asarray(0, jnp.int32),
    )
    (x, lam, mu, rho, viol, converged, outer_used), trace = jax.lax.scan(
        outer_body, init, None, length=cfg.outer_iters
    )

    r = r_fn(x, p)
    grad_L = (
        jac_r(x, p).T @ r
        + (jac_h(x, p).T @ lam if E > 0 else 0.0)
        - (jac_g(x, p).T @ mu if I > 0 else 0.0)
    )
    pg = x - jnp.clip(x - grad_L, lb, ub)
    sol = ALSolution(
        x=x, lam=lam, mu=mu, viol=viol,
        grad_norm=jnp.max(jnp.abs(pg)),
        obj=0.5 * jnp.sum(r * r),
        rho=rho, converged=converged, outer_used=outer_used,
    )
    if return_trace:
        return sol, trace
    return sol


def solve_al_batched(r_fn, h_fn, g_fn, x0, p, lb, ub, cfg: ALConfig = ALConfig(),
                     lam0=None, mu0=None, rho_init=None) -> ALSolution:
    """vmap wrapper: leading batch axis on x0 / p / lb / ub (and warm duals)."""
    fn = functools.partial(solve_al, r_fn, h_fn, g_fn, cfg=cfg)
    kw = {}
    if lam0 is not None:
        kw["lam0"] = lam0
    if mu0 is not None:
        kw["mu0"] = mu0
    if rho_init is not None:
        kw["rho_init"] = rho_init
    return jax.vmap(fn)(x0, p, lb, ub, **kw)
