"""Tube trajectory-optimization problem assembly + solve drivers.

TPU-native re-design of the reference NLP assembly and solve entry points
(ref: trajopt/tube_trajopt.py:24-285, 339-486). The CasADi symbolic graph is
replaced by plain JAX functions over a flat decision vector; IPOPT by the
batched augmented-Lagrangian Gauss-Newton solver in ``al_solver``; l4casadi by
directly calling the tube MLP inside the constraint residual.

Decision vector layout (single scenario):
    x = [ z.flatten()   ((N+1)*n, row-major)
          v.flatten()   (N*m)
          w             (N+1, only tube problems) ]

Scenario data (start/goal/obstacles/history/weights/ROM bounds/tube-NN params)
lives in a ``TrajOptParams`` pytree: ``vmap`` over it solves thousands of
scenarios in one compiled program (BASELINE.json north star).
"""
from __future__ import annotations

import functools
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..core.rom import RomDynamics
from .al_solver import ALConfig, ALSolution, solve_al
from .tube_dynamics import get_tube_dynamics

# Benchmark problem library (ref: tube_trajopt.py:11-21).
PROBLEM_DICT = {
    "gap": {
        "start": np.array([0.3, 0.3]), "goal": np.array([1.5, 1.5]),
        "obs": {"c": np.array([[1.0, 0.0], [0.75, 1.5]]),
                 "r": np.array([0.5, 0.5])},
        "vel_max": 0.2, "pos_max": 10.0, "dt": 0.1,
    },
    "right": {
        "start": np.array([0.5, 0.0]), "goal": np.array([2.0, 0.0]),
        "obs": {"c": np.array([[1.0, 1.0], [0.625, -0.625]]),
                 "r": np.array([0.5, 0.5])},
        "vel_max": 1.0, "pos_max": 10.0, "dt": 0.1,
    },
    "right_wide": {
        "start": np.array([0.5, 0.0]), "goal": np.array([2.0, 0.0]),
        "obs": {"c": np.array([[1.0, 1.0], [1.25, -1.25]]),
                 "r": np.array([0.5, 0.5])},
        "vel_max": 1.0, "pos_max": 10.0, "dt": 0.1,
    },
}
# NOTE: the reference stores obstacle centers transposed ((2, K) columns per
# obstacle) in problem_dict but reads rows in obstacle_constraints; we store
# centers as (K, 2) rows consistently.


@struct.dataclass
class TrajOptParams:
    """Per-scenario NLP data (every field is a vmap-able leaf)."""

    rom: RomDynamics
    Lq: jax.Array        # (n, n) chol factor of Q (state cost)
    Lr: jax.Array        # (m, m) chol factor of R (input cost)
    Lqf: jax.Array       # (n, n) chol factor of Qf (terminal cost)
    sqrt_qw: jax.Array   # () sqrt of tube-width cost Qw
    z0: jax.Array        # (n,) initial ROM projection
    zf: jax.Array        # (n,) goal
    obs_c: jax.Array     # (K, 2) obstacle centers
    obs_r: jax.Array     # (K,) obstacle radii
    w_max: jax.Array     # () tube width upper bound
    e_hist: jax.Array    # (H_rev,) tracking-error history
    v_prev: jax.Array    # (H_rev, m) applied-input history
    z_ref: jax.Array     # (N+1, n) tracking reference (track_ref mode)
    v_ref: jax.Array     # (N, m)
    tube_params: Any = None   # e.g. tube MLP pytree

    @classmethod
    def create(cls, rom, N, H_rev, Q, R, z0, zf, obs_c, obs_r, Qw=0.0,
               Qf=None, w_max=1.0, e_hist=None, v_prev=None, z_ref=None,
               v_ref=None, tube_params=None):
        n, m = rom.n, rom.m
        Q = jnp.asarray(Q, jnp.float32)
        R = jnp.asarray(R, jnp.float32)
        Qf = Q if Qf is None else jnp.asarray(Qf, jnp.float32)
        # 0.5||r||^2 must equal the reference's sum d^T Q d => scale by sqrt(2).
        chol = lambda M: jnp.linalg.cholesky(
            jnp.asarray(M) + 1e-12 * jnp.eye(M.shape[0])
        ) * jnp.sqrt(2.0)
        return cls(
            rom=rom,
            Lq=chol(Q), Lr=chol(R), Lqf=chol(Qf),
            sqrt_qw=jnp.sqrt(2.0 * jnp.asarray(Qw, jnp.float32)),
            z0=jnp.asarray(z0, jnp.float32), zf=jnp.asarray(zf, jnp.float32),
            obs_c=jnp.asarray(obs_c, jnp.float32),
            obs_r=jnp.asarray(obs_r, jnp.float32),
            w_max=jnp.asarray(w_max, jnp.float32),
            e_hist=(jnp.zeros(H_rev) if e_hist is None
                    else jnp.asarray(e_hist, jnp.float32)),
            v_prev=(jnp.zeros((H_rev, m)) if v_prev is None
                    else jnp.asarray(v_prev, jnp.float32)),
            z_ref=(jnp.zeros((N + 1, n)) if z_ref is None
                   else jnp.asarray(z_ref, jnp.float32)),
            v_ref=(jnp.zeros((N, m)) if v_ref is None
                   else jnp.asarray(v_ref, jnp.float32)),
            tube_params=tube_params,
        )


# ---------------------------------------------------------------------------
# Packing
# ---------------------------------------------------------------------------

def pack_x(z, v, w=None):
    parts = [z.reshape(-1), v.reshape(-1)]
    if w is not None:
        parts.append(w.reshape(-1))
    return jnp.concatenate(parts)


def unpack_x(x, N, n, m, with_w):
    nz = (N + 1) * n
    nv = N * m
    z = x[:nz].reshape(N + 1, n)
    v = x[nz:nz + nv].reshape(N, m)
    w = x[nz + nv:] if with_w else None
    return z, v, w


def make_bounds(p: TrajOptParams, N: int, with_w: bool):
    """Box bounds from ROM state/input limits + tube width cap
    (ref: tube_trajopt.py:105-114, 194-196)."""
    rom = p.rom
    lb = [jnp.tile(rom.z_min, N + 1), jnp.tile(rom.v_min, N)]
    ub = [jnp.tile(rom.z_max, N + 1), jnp.tile(rom.v_max, N)]
    if with_w:
        lb.append(jnp.zeros(N + 1))
        ub.append(jnp.ones(N + 1) * p.w_max)
    return jnp.concatenate(lb), jnp.concatenate(ub)


# ---------------------------------------------------------------------------
# NLP function builders
# ---------------------------------------------------------------------------

def build_nlp_fns(n: int, m: int, N: int, with_tube: bool,
                  tube_fn: Optional[Callable] = None, track_ref: bool = False):
    """Build (r_fn, h_fn, g_fn) for the (tube) trajopt NLP.

    Objective (ref :138, :206-214): quadratic state/input (goal- or
    reference-tracking) + Qw * w^2.
    Equalities (ref :215-218): dynamics, initial condition (position dims),
    and tube-width dynamics.
    Inequalities (ref :80-97): tube-inflated circular obstacle avoidance.
    """

    def r_fn(x, p: TrajOptParams):
        z, v, w = unpack_x(x, N, n, m, with_tube)
        z_goal = p.z_ref if track_ref else jnp.broadcast_to(p.zf, (N + 1, n))
        v_goal = p.v_ref if track_ref else jnp.zeros((N, m))
        r_state = (z[:-1] - z_goal[:-1]) @ p.Lq
        r_term = (z[-1] - z_goal[-1]) @ p.Lqf
        r_input = (v - v_goal) @ p.Lr
        parts = [r_state.reshape(-1), r_term.reshape(-1), r_input.reshape(-1)]
        if with_tube:
            parts.append(p.sqrt_qw * w)
        return jnp.concatenate(parts)

    def h_fn(x, p: TrajOptParams):
        z, v, w = unpack_x(x, N, n, m, with_tube)
        h_dyn = (p.rom.f(z[:-1], v) - z[1:]).reshape(-1)
        h_ic = z[0, :2] - p.z0[:2]
        parts = [h_dyn, h_ic]
        if with_tube:
            fw = tube_fn(z, v, w, p.e_hist, p.v_prev, p.tube_params)
            parts.append(fw - w[1:])
        return jnp.concatenate(parts)

    def g_fn(x, p: TrajOptParams):
        z, v, w = unpack_x(x, N, n, m, with_tube)
        d = z[:, None, :2] - p.obs_c[None, :, :]          # (N+1, K, 2)
        dist_sq = jnp.sum(d * d, axis=-1)                 # (N+1, K)
        radius = p.obs_r[None, :] + (w[:, None] if with_tube else 0.0)
        return (dist_sq - radius**2).reshape(-1)

    return r_fn, h_fn, g_fn


# ---------------------------------------------------------------------------
# Warm starts (ref: tube_trajopt.py:415-440)
# ---------------------------------------------------------------------------

def warm_start_interpolate(start, goal, N, dt, m=None):
    alpha = jnp.linspace(0.0, 1.0, N + 1)[:, None]
    z_init = start[None, :] + alpha * (goal - start)[None, :]
    v_init = jnp.diff(z_init, axis=0) / dt
    if m is not None and m != z_init.shape[-1]:
        # State-difference inputs only make sense when the input directly
        # drives every state dim (SingleInt2D); otherwise start from zeros.
        v_init = jnp.zeros((N, m))
    return z_init, v_init


def warm_start_constant(point, N, m):
    return jnp.repeat(point[None, :], N + 1, axis=0), jnp.zeros((N, m))


def get_warm_start(kind: str, p: TrajOptParams, N: int,
                   cfg: ALConfig = ALConfig(), nominal_ws: str = "interpolate"):
    """'start' | 'goal' | 'interpolate' | 'nominal' (ref :415-432)."""
    n, m = p.rom.n, p.rom.m
    if kind == "start":
        return warm_start_constant(p.z0, N, m)
    if kind == "goal":
        return warm_start_constant(p.zf, N, m)
    if kind == "interpolate":
        return warm_start_interpolate(p.z0, p.zf, N, p.rom.dt, m=m)
    if kind == "nominal":
        z, v, _sol = solve_nominal(p, N, cfg=cfg, warm_start=nominal_ws)
        return z, v
    raise ValueError(f"Warm start '{kind}' not implemented")


def get_tube_warm_start(tube_ws, tube_fn, z_init, v_init, p: TrajOptParams,
                        N: int):
    """'evaluate' | scalar (ref :435-440)."""
    if tube_ws == "evaluate":
        fw = tube_fn(z_init, v_init, jnp.zeros(N + 1), p.e_hist, p.v_prev,
                     p.tube_params)
        return jnp.concatenate([jnp.zeros(1), fw])
    return jnp.ones(N + 1) * float(tube_ws)


# ---------------------------------------------------------------------------
# Solve drivers (ref: tube_trajopt.py:443-486)
# ---------------------------------------------------------------------------

class TrajOptSolution(NamedTuple):
    z: jax.Array
    v: jax.Array
    w: Optional[jax.Array]
    sol: ALSolution


def solve_nominal(p: TrajOptParams, N: int, cfg: ALConfig = ALConfig(),
                  warm_start: str = "interpolate",
                  x_init=None) -> tuple:
    """Nominal (no-tube) trajectory optimization (ref :443-456)."""
    n, m = p.rom.n, p.rom.m
    r_fn, h_fn, g_fn = build_nlp_fns(n, m, N, with_tube=False)
    if x_init is None:
        z_init, v_init = get_warm_start(warm_start, p, N, cfg)
        x_init = pack_x(z_init, v_init)
    lb, ub = make_bounds(p, N, with_w=False)
    sol = solve_al(r_fn, h_fn, g_fn, x_init, p, lb, ub, cfg)
    z, v, _ = unpack_x(sol.x, N, n, m, False)
    return z, v, sol


def solve_tube(p: TrajOptParams, tube_fn: Callable, N: int, H_rev: int,
               cfg: ALConfig = ALConfig(), warm_start: str = "start",
               nominal_ws: str = "interpolate", tube_ws="evaluate",
               track_warm: bool = False, x_init=None,
               lam0=None, mu0=None, return_trace: bool = False):
    """Tube trajectory optimization (ref :459-486). Returns TrajOptSolution
    (plus the per-iteration trace dict when ``return_trace``, see
    solver.debug.trace_to_csv).

    ``track_warm`` switches the objective to track the warm-start trajectory
    instead of the goal point (ref :463-464, 208-214).
    """
    n, m = p.rom.n, p.rom.m
    if x_init is None:
        z_init, v_init = get_warm_start(warm_start, p, N, cfg,
                                        nominal_ws=nominal_ws)
        w_init = get_tube_warm_start(tube_ws, tube_fn, z_init, v_init, p, N)
        x_init = pack_x(z_init, v_init, w_init)
        if track_warm:
            p = p.replace(z_ref=z_init, v_ref=v_init)
    r_fn, h_fn, g_fn = build_nlp_fns(
        n, m, N, with_tube=True, tube_fn=tube_fn, track_ref=track_warm
    )
    lb, ub = make_bounds(p, N, with_w=True)
    out = solve_al(r_fn, h_fn, g_fn, x_init, p, lb, ub, cfg,
                   lam0=lam0, mu0=mu0, return_trace=return_trace)
    sol, trace = out if return_trace else (out, None)
    z, v, w = unpack_x(sol.x, N, n, m, True)
    res = TrajOptSolution(z=z, v=v, w=w, sol=sol)
    return (res, trace) if return_trace else res


def solve_tube_batched(p_batch: TrajOptParams, tube_fn, N, H_rev,
                       cfg: ALConfig = ALConfig(), **kw) -> TrajOptSolution:
    """vmap over the scenario batch: thousands of tube-MPC solves in one
    compiled program (the BASELINE.json operating point)."""
    fn = functools.partial(solve_tube, tube_fn=tube_fn, N=N, H_rev=H_rev,
                           cfg=cfg, **kw)
    return jax.vmap(fn)(p_batch)
