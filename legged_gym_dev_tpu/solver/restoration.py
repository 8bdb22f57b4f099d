"""Feasibility restoration + local-infeasibility certification.

The batched AL solver is SPMD: it always returns its final iterate, even
for scenarios whose constraints cannot be satisfied (tight corridors where
the tube-inflated obstacles close the passage). IPOPT — the solver the
reference relies on (ref: trajopt/tube_trajopt.py:256-277) — signals this
via its restoration phase; this module provides the TPU-native analog:

1. **Restoration**: re-solve the scenario with the objective zeroed
   (``Lq = Lr = Lqf = sqrt_qw = 0``) from the solver's final iterate. The
   PHR augmented Lagrangian of the pure-constraint problem is exactly a
   penalty method on the constraint violation, so this drives the iterate
   to a (local) minimizer of the violation measure.
2. **Certificate**: at the restored point, evaluate the violation measure
   ``theta = 0.5 ||h||^2 + 0.5 ||min(g, 0)||^2`` and its projected
   gradient. A stationary point of theta with theta > 0 is a first-order
   certificate of LOCAL infeasibility (J^T c = 0 with c != 0 — the same
   criterion IPOPT's restoration phase reports as "restoration failed").

Every scenario is classified as one of four verdicts; consumers
(``solver.mpc`` / ``fast_tube.closed_loop_tube_mpc_fast`` / ``bench.py``)
gate plan execution on ``VERDICT_FEASIBLE``/``VERDICT_RESTORED`` instead
of silently executing a violating plan.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from .al_solver import ALConfig, ALSolution

# Verdict codes (int32 per scenario).
VERDICT_FEASIBLE = 0     # original solve satisfied all constraints (< tol)
VERDICT_RESTORED = 1     # original iterate violated, restoration found a
#                          feasible point (the solve failed, not the problem)
VERDICT_INFEASIBLE = 2   # certified locally infeasible (stationary theta > 0)
VERDICT_FAILED = 3       # violating and not certified — solver failure

VERDICT_NAMES = ("feasible", "restored", "infeasible", "failed")


class CertResult(NamedTuple):
    verdict: jax.Array    # () int32 — one of the VERDICT_* codes
    u_restored: jax.Array  # (S, b) restored staged iterate
    viol_restored: jax.Array  # () max constraint violation at u_restored
    theta: jax.Array      # () violation measure at u_restored
    theta_pg: jax.Array   # () projected-gradient inf-norm of theta
    stalled: jax.Array    # () bool — PGD polish found NO descent direction
    #                       down to step 1e-9 (nonsmooth stationarity: theta
    #                       has |v|-kinks from the l1 tube rows, so the
    #                       gradient norm alone can sit above zero at a
    #                       genuine local minimizer of the violation)


def _theta_fn(sp, p):
    from .fast_tube import _residuals

    def theta_of(uu):
        _, h, g = _residuals(sp, uu, p)
        gneg = jnp.minimum(g, 0.0)
        return 0.5 * (jnp.sum(h * h) + jnp.sum(gneg * gneg))

    return theta_of


def _theta_and_pg(sp, p, u, lb_u, ub_u):
    """Violation measure theta and its projected gradient at u."""
    th, gr = jax.value_and_grad(_theta_fn(sp, p))(u)
    pg = u - jnp.clip(u - gr, lb_u, ub_u)
    return th, jnp.max(jnp.abs(pg))


def _pgd_polish(sp, p, u0, lb_u, ub_u, iters: int = 256):
    """Projected gradient descent directly on theta with adaptive step.

    The GN restoration converges fast while smooth but stalls near the
    |v|-kinks of the l1 tube rows; this first-order polish keeps making
    progress there, and its terminal state doubles as the infeasibility
    certificate: a step size driven below 1e-9 means backtracking found no
    descent direction — first-order (Clarke-)stationarity of theta.
    """
    grad_fn = jax.value_and_grad(_theta_fn(sp, p))

    def body(carry, _):
        u, th, gr, step = carry
        cand = jnp.clip(u - step * gr, lb_u, ub_u)
        thc, grc = grad_fn(cand)
        ok = thc < th - 1e-14
        u2 = jnp.where(ok, cand, u)
        th2 = jnp.where(ok, thc, th)
        gr2 = jnp.where(ok, grc, gr)
        step2 = jnp.where(ok, jnp.minimum(step * 1.3, 1e3), step * 0.5)
        return (u2, th2, gr2, step2), None

    th0, gr0 = grad_fn(u0)
    (u, th, gr, step), _ = jax.lax.scan(
        body, (u0, th0, gr0, jnp.asarray(1.0, jnp.float32)), None,
        length=iters)
    pg = u - jnp.clip(u - gr, lb_u, ub_u)
    return u, th, jnp.max(jnp.abs(pg)), step < 1e-9


def restore_feasibility(sp, p, u0, lb_u, ub_u,
                        cfg: Optional[ALConfig] = None,
                        prox: float = 1.0) -> ALSolution:
    """Minimize constraint violation from ``u0`` with a proximal objective.

    IPOPT's restoration phase minimizes ``||c(x)|| + zeta/2 ||x - x_R||^2``
    (the proximal term regularizes the otherwise rank-deficient feasibility
    problem); here the proximal term rides the solver's existing
    reference-tracking objective (``track_ref`` with the current iterate as
    reference, weight ``prox`` << rho), and the violation is minimized by
    the quadratic penalty: multipliers stay frozen at zero
    (``penalty_only`` — first-order multiplier updates diverge on
    infeasible problems and drag the iterate off the theta-minimizer).

    Single scenario; vmap to batch.
    """
    from .staged_scalar import solve_staged_scalar

    n, m, N = sp.n, sp.m, sp.N
    if cfg is None:
        # Deep backtracking: the GN model of the penalty merit is poor far
        # from the violation minimizer (active-set changes, |v| kinks), so
        # accepted steps can be ~1e-3 of the GN step early on. The parallel
        # line search makes extra candidates nearly free.
        cfg = ALConfig(outer_iters=4, inner_iters=12, ls_iters=20,
                       rho0=1e3, penalty_only=True)
    sL = jnp.sqrt(2.0 * prox)
    z_cur = u0[:, :n]
    v_cur = u0[:-1, n + 1:n + 1 + m]
    p_feas = p.replace(
        Lq=sL * jnp.eye(n), Lr=sL * jnp.eye(m), Lqf=sL * jnp.eye(n),
        sqrt_qw=jnp.zeros_like(p.sqrt_qw),
        z_ref=z_cur, v_ref=v_cur,
    )
    sp_feas = sp._replace(track_ref=True)
    return solve_staged_scalar(sp_feas, p_feas, u0, lb_u, ub_u, cfg)


def certify_staged(sp, p, u_final, viol_final, lb_u, ub_u,
                   cfg: Optional[ALConfig] = None,
                   tol: float = 1e-3, escalate: bool = True) -> CertResult:
    """Classify one scenario's solve outcome (vmap to batch).

    Args:
      u_final: (S, b) staged iterate from the tube solve.
      viol_final: () its max constraint violation (``sol.viol``).
      escalate: run a SECOND restoration attempt from the interpolate warm
        start (a fresh basin — the solver's final iterate can sit in a bad
        one, e.g. wedged at an l1 kink behind an obstacle) with a deeper
        schedule and a longer polish. The escalation exists to make the
        "failed" verdict (violating, unrestorable, uncertified — a solver
        failure) empty: every violating scenario either restores or ends
        at a first-order-stationary theta minimizer (a local-infeasibility
        certificate, the signal IPOPT's restoration failure carries,
        ref tube_trajopt.py:256-277).
    """
    from .fast_tube import _residuals, pack_staged
    from .trajopt import warm_start_interpolate

    def viol_of(uu):
        _, h, g = _residuals(sp, uu, p)
        return jnp.maximum(jnp.max(jnp.abs(h)),
                           jnp.max(jnp.maximum(-g, 0.0)))

    sol_r = restore_feasibility(sp, p, u_final, lb_u, ub_u, cfg)
    u_r, th, pg, stalled = _pgd_polish(
        sp, p, sol_r.x.reshape(u_final.shape), lb_u, ub_u)
    viol_r = viol_of(u_r)
    stationary = stalled | (pg < 1e-4 + 1e-2 * jnp.sqrt(2.0 * th))

    if escalate:
        # Continuation pass: AL restoration (multiplier updates ON) from
        # the polished point. The pure-penalty phase converges only
        # linearly in rho near the feasible set — measured on the bench
        # batch it strands tight-corridor scenarios at viol 3-10x tol
        # (theta ~ 1e-4) and they get misclassified "failed"; with
        # multipliers the restoration problem converges to EXACT
        # feasibility at finite rho whenever the scenario is feasible.
        cfg_al = ALConfig(outer_iters=8, inner_iters=12, ls_iters=20,
                          rho0=1e3, penalty_only=False)
        sol_al = restore_feasibility(sp, p, u_r, lb_u, ub_u, cfg_al)
        u_al, th_al, pg_al, stalled_al = _pgd_polish(
            sp, p, sol_al.x.reshape(u_final.shape), lb_u, ub_u, iters=128)
        viol_al = viol_of(u_al)
        stationary_al = stalled_al | (pg_al
                                      < 1e-4 + 1e-2 * jnp.sqrt(2.0 * th_al))
        better_al = viol_al < viol_r
        u_r = jnp.where(better_al, u_al, u_r)
        viol_r = jnp.where(better_al, viol_al, viol_r)
        th = jnp.where(better_al, th_al, th)
        pg = jnp.where(better_al, pg_al, pg)
        stalled = jnp.where(better_al, stalled_al, stalled)
        stationary = stationary | stationary_al

    if escalate:
        # Stay-at-start candidate: z == z0, v = 0, w = tube(0). For the
        # single/double-integrator ROM family this satisfies dynamics, IC
        # and tube rows EXACTLY, so it is feasible whenever z0 sits
        # outside the (w-inflated) obstacles — a closed-form restoration
        # point for precisely the tight-corridor scenarios whose theta
        # landscape traps descent methods at nonzero local minima
        # (measured: bench scenarios with viol_r ~ 3-9e-3 where f64
        # L-BFGS from the interpolate start lands even higher; "stop
        # where you are" is the plan the MPC gate falls back to anyway).
        # For ROMs where it is not feasible it simply scores a high viol
        # and loses the candidate selection below.
        from .fast_tube import _tube_fw

        n, m, N = sp.n, sp.m, sp.N
        z_stay = jnp.broadcast_to(p.z0, (N + 1, n))
        v_stay = jnp.zeros((N, m))
        fw_stay = _tube_fw(sp, z_stay, v_stay, p)
        w_stay = jnp.concatenate([jnp.zeros((1,)), fw_stay])
        u_stay = pack_staged(z_stay, w_stay, v_stay, n, m, N)
        u_stay = jnp.clip(u_stay, lb_u, ub_u)
        viol_stay = viol_of(u_stay)
        better_stay = viol_stay < viol_r
        u_r = jnp.where(better_stay, u_stay, u_r)
        viol_r = jnp.where(better_stay, viol_stay, viol_r)
        # (theta/pg/stalled keep the descent attempt's values: the stay
        # candidate is a feasibility witness, not a theta minimizer.)

        z_i, v_i = warm_start_interpolate(p.z0, p.zf, N, p.rom.dt, m=m)
        u_i = pack_staged(z_i, jnp.zeros(N + 1), v_i, n, m, N)
        u_i = jnp.clip(u_i, lb_u, ub_u)
        cfg2 = ALConfig(outer_iters=6, inner_iters=16, ls_iters=24,
                        rho0=1e3, penalty_only=True)
        sol_r2 = restore_feasibility(sp, p, u_i, lb_u, ub_u, cfg2)
        u_r2, th2, pg2, stalled2 = _pgd_polish(
            sp, p, sol_r2.x.reshape(u_final.shape), lb_u, ub_u, iters=512)
        viol_r2 = viol_of(u_r2)
        stationary2 = stalled2 | (pg2 < 1e-4 + 1e-2 * jnp.sqrt(2.0 * th2))
        # Report whichever attempt reached the lower violation; a
        # stationary theta > 0 from EITHER basin certifies local
        # infeasibility.
        better2 = viol_r2 < viol_r
        u_r = jnp.where(better2, u_r2, u_r)
        viol_r = jnp.where(better2, viol_r2, viol_r)
        th = jnp.where(better2, th2, th)
        pg = jnp.where(better2, pg2, pg)
        stalled = jnp.where(better2, stalled2, stalled)
        stationary = stationary | stationary2

    feas0 = viol_final < tol
    feas_r = viol_r < tol
    # First-order stationarity of theta: either the smooth projected
    # gradient is small relative to theta's own scale (||grad theta|| ~
    # ||J|| * ||c|| with O(1) Jacobian entries), or the PGD polish
    # exhausted its backtracking — no descent direction exists at 1e-9
    # resolution (Clarke stationarity at the l1 tube rows' |v|-kinks).
    verdict = jnp.where(
        feas0, VERDICT_FEASIBLE,
        jnp.where(feas_r, VERDICT_RESTORED,
                  jnp.where(stationary, VERDICT_INFEASIBLE, VERDICT_FAILED)),
    ).astype(jnp.int32)
    return CertResult(verdict=verdict, u_restored=u_r,
                      viol_restored=viol_r, theta=th, theta_pg=pg,
                      stalled=stalled)


def certify_staged_batched(sp, p_batch, u_final, viol_final, lb_u, ub_u,
                           cfg: Optional[ALConfig] = None,
                           tol: float = 1e-3,
                           escalate: bool = True) -> CertResult:
    """vmap over (p, u_final, viol_final); bounds are shared."""
    fn = functools.partial(certify_staged, sp, lb_u=lb_u, ub_u=ub_u,
                           cfg=cfg, tol=tol, escalate=escalate)
    return jax.vmap(lambda pp, uu, vv: fn(pp, uu, vv))(
        p_batch, u_final, viol_final)
