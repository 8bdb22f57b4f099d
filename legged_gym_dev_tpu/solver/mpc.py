"""Closed-loop receding-horizon tube MPC as a single compiled scan.

TPU-native re-design of the reference's serial Python MPC loop
(ref: trajopt/tube_planning_closed_loop.py:35-200): per step, the plan's first
input advances the ROM, a double-integrator "robot" PD-tracks the plan, the
error/input histories roll, and the NLP is re-solved warm-started from the
previous primal (and here also dual) solution. The whole loop is a
``lax.scan`` whose body contains the fixed-iteration AL solve, so one XLA
program runs the entire horizon — and ``vmap`` over the scenario pytree runs
thousands of closed loops at once.
"""
from __future__ import annotations

import functools
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from flax import struct

from ..core.rom import DoubleInt2D, RomDynamics
from .al_solver import ALConfig, solve_al
from .trajopt import (
    TrajOptParams,
    build_nlp_fns,
    make_bounds,
    pack_x,
    solve_tube,
    unpack_x,
)


@struct.dataclass
class MPCConfig:
    """Static closed-loop configuration (ref :27-30, 84)."""

    H: int = struct.field(pytree_node=False, default=75)
    N: int = struct.field(pytree_node=False, default=50)
    H_rev: int = struct.field(pytree_node=False, default=10)
    Kp: float = struct.field(pytree_node=False, default=10.0)
    Kd: float = struct.field(pytree_node=False, default=10.0)


class MPCTrace(NamedTuple):
    z: jax.Array        # (H+1, n) planned ROM trajectory actually executed
    v: jax.Array        # (H, m) applied ROM inputs
    w: jax.Array        # (H+1,) tube widths along the executed trajectory
    x: jax.Array        # (H+1, nx) tracked robot states
    u: jax.Array        # (H, mx) robot inputs
    pz_x: jax.Array     # (H+1, n) robot state projections
    z_sol: jax.Array    # (H, N+1, n) per-step plans
    v_sol: jax.Array    # (H, N, m)
    w_sol: jax.Array    # (H, N+1)
    viol: jax.Array     # (H,) solver violation per re-solve
    converged: jax.Array  # (H,) solver convergence per re-solve
    adopted: jax.Array  # (H,) bool — plan executed this step was fresh
    #                     (False = re-solve violated constraints; the last
    #                     feasible plan was executed instead)


def closed_loop_tube_mpc(
    p: TrajOptParams,
    tube_fn: Callable,
    robot: DoubleInt2D,
    mpc: MPCConfig = MPCConfig(),
    al_first: ALConfig = ALConfig(outer_iters=15),
    al_loop: ALConfig = ALConfig(outer_iters=4, inner_iters=6),
    warm_start: str = "nominal",
    tube_ws="evaluate",
    exec_tol: float = 1e-3,
) -> MPCTrace:
    """Run H receding-horizon re-solves with a PD-tracked double integrator.

    ``al_loop`` uses fewer iterations than the first solve because every
    re-solve is warm-started from the previous primal/dual solution — the
    analog of the reference's max_iter=200 first solve + warm-started
    re-solves (ref :82-85, 159-168).

    Execution gate: a re-solve whose constraint violation exceeds
    ``exec_tol`` is NOT executed (the role IPOPT's restoration-failure
    signal plays in the reference); the loop instead keeps executing the
    last feasible plan, advanced one stage per step. If the FIRST solve is
    infeasible there is no previous plan and it executes regardless
    (mirrors the reference, which has no fallback there either).
    """
    N, H_rev = mpc.N, mpc.H_rev
    n, m = p.rom.n, p.rom.m

    # Initial solve (full effort).
    out0 = solve_tube(p, tube_fn, N, H_rev, al_first, warm_start=warm_start,
                      tube_ws=tube_ws)

    r_fn, h_fn, g_fn = build_nlp_fns(n, m, N, with_tube=True, tube_fn=tube_fn)
    lb, ub = make_bounds(p, N, with_w=True)

    x0 = jnp.concatenate([p.z0[:2], jnp.zeros(2)])   # robot starts at rest
    z0 = p.z0

    def body(carry, _):
        sol, x_exec, age, z_cur, x_cur, e_hist, v_prev, p_cur = carry

        # Adopt the fresh plan only if it satisfies the constraints;
        # otherwise advance along the last feasible plan.
        adopt = sol.viol < exec_tol
        x_exec = jnp.where(adopt, sol.x, x_exec)
        age = jnp.where(adopt, 0, jnp.minimum(age + 1, N - 1))
        z_sol, v_sol, w_sol = unpack_x(x_exec, N, n, m, True)
        z_tgt = z_sol[age]
        v_tgt = v_sol[jnp.minimum(age + 1, N - 1)]

        # PD-track the plan with the double integrator (ref :87-103).
        u = robot.clip_v_z(
            x_cur[None, :],
            mpc.Kp * (z_tgt - x_cur[:2])[None, :]
            + mpc.Kd * (v_tgt - x_cur[2:])[None, :],
        )[0]
        x_next = robot.f(x_cur[None, :], u[None, :])[0]
        pz_x_next = robot.proj_z(x_next[None, :])[0]

        # Execute the plan's current input on the ROM (ref :98-99).
        v_apply = v_sol[age]
        z_next = p_cur.rom.f(z_cur[None, :], v_apply[None, :])[0]

        # Roll histories (ref :159-164).
        pz_x_cur = robot.proj_z(x_cur[None, :])[0]
        e_new = jnp.linalg.norm(z_cur - pz_x_cur)
        e_hist = jnp.concatenate([e_hist[1:], e_new[None]])
        v_prev = jnp.concatenate([v_prev[1:], v_apply[None, :]], axis=0)

        # Re-solve warm-started from the previous primal + dual + penalty
        # (ref :165-168; carrying rho keeps feasibility tight across
        # re-solves instead of re-ramping the AL penalty from scratch).
        p_new = p_cur.replace(z0=z_next, e_hist=e_hist, v_prev=v_prev)
        sol_new = solve_al(
            r_fn, h_fn, g_fn, sol.x, p_new, lb, ub, al_loop,
            lam0=sol.lam, mu0=sol.mu, rho_init=sol.rho,
        )
        outs = (
            z_next, v_apply, w_sol[jnp.minimum(age + 1, N)], x_next, u,
            pz_x_next, z_sol, v_sol, w_sol, sol_new.viol, sol_new.converged,
            adopt,
        )
        return (sol_new, x_exec, age, z_next, x_next, e_hist, v_prev,
                p_new), outs

    # age starts at -1 so an infeasible FIRST solve still executes its
    # stage-0 input (there is no older plan to fall back to).
    carry0 = (out0.sol, out0.sol.x, jnp.asarray(-1, jnp.int32), z0, x0,
              p.e_hist, p.v_prev, p)
    _, outs = jax.lax.scan(body, carry0, None, length=mpc.H)
    (z_t, v_t, w_t, x_t, u_t, pzx_t, z_sols, v_sols, w_sols, viols,
     convs, adopts) = outs

    return MPCTrace(
        z=jnp.concatenate([z0[None], z_t], axis=0),
        v=v_t,
        w=jnp.concatenate([jnp.zeros((1,)), w_t], axis=0),
        x=jnp.concatenate([x0[None], x_t], axis=0),
        u=u_t,
        pz_x=jnp.concatenate([robot.proj_z(x0[None, :]), pzx_t], axis=0),
        z_sol=z_sols, v_sol=v_sols, w_sol=w_sols,
        viol=viols, converged=convs, adopted=adopts,
    )


def closed_loop_tube_mpc_batched(p_batch, tube_fn, robot, mpc=MPCConfig(),
                                 **kw) -> MPCTrace:
    """vmap over scenarios: batched closed-loop MPC (BASELINE.json config 5)."""
    fn = functools.partial(
        closed_loop_tube_mpc, tube_fn=tube_fn, robot=robot, mpc=mpc, **kw
    )
    return jax.vmap(fn)(p_batch)
