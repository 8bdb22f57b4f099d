"""Solver observability: named columns, violation segmentation, iteration CSV.

TPU-native counterpart of the reference's solver debugging machinery
(ref: trajopt/tube_trajopt.py generate_col_names:288-336,
compute_constraint_violation:385-390, segment_constraint_violation:393-412,
SolverCallback:588-657): named decision/constraint columns for postmortems,
per-constraint-family violation segmentation of a solution, and a
per-iteration CSV dump of the solver trace (`solve_al(..., return_trace=True)`
replaces the CasADi iteration callback).
"""
from __future__ import annotations

import csv
import os
from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

from .trajopt import TrajOptParams, build_nlp_fns, pack_x


def generate_col_names(n: int, m: int, N: int, n_obs: int,
                       with_tube: bool, H_rev: int = 0):
    """Named columns for the decision vector, equality/inequality residuals
    and the scenario parameters (ref generate_col_names:288-336; same
    ``z_{k}_{i}`` / ``v_{k}_{i}`` / ``w_{k}`` scheme, constraint families
    split into h = [dyn, ic, tube] and g = [obs] to match this solver's
    equality/inequality layout).

    Returns (x_cols, h_cols, g_cols, p_cols).
    """
    x_cols = [f"z_{k}_{i}" for k in range(N + 1) for i in range(n)]
    x_cols += [f"v_{k}_{i}" for k in range(N) for i in range(m)]
    if with_tube:
        x_cols += [f"w_{k}" for k in range(N + 1)]

    h_cols = [f"dyn_{i}_{k}" for k in range(N) for i in range(n)]
    h_cols += [f"ic_{i}" for i in range(2)]
    if with_tube:
        h_cols += [f"tube_{k}" for k in range(N)]

    g_cols = [f"obs_{i}_{k}" for k in range(N + 1) for i in range(n_obs)]

    p_cols = [f"z_ic_{i}" for i in range(n)]
    p_cols += [f"z_g_{i}" for i in range(n)]
    p_cols += [f"obs_{i}_x" for i in range(n_obs)]
    p_cols += [f"obs_{i}_y" for i in range(n_obs)]
    p_cols += [f"obs_{i}_r" for i in range(n_obs)]
    if H_rev:
        p_cols += [f"e_{i}" for i in range(H_rev)]
        p_cols += [f"v_prev_{r}_{c}" for r in range(H_rev) for c in range(m)]
    return x_cols, h_cols, g_cols, p_cols


def compute_constraint_violation(p: TrajOptParams, z, v, w, N: int,
                                 tube_fn=None):
    """Per-constraint violations of a candidate solution (ref
    compute_constraint_violation:385-390): |h| for equalities, max(-g, 0)
    for inequalities. Returns (viol_h, viol_g) numpy arrays aligned with
    generate_col_names's h_cols/g_cols."""
    n, m = int(p.rom.n), int(p.rom.m)
    with_tube = w is not None
    _, h_fn, g_fn = build_nlp_fns(n, m, N, with_tube, tube_fn=tube_fn)
    x = pack_x(jnp.asarray(z), jnp.asarray(v),
               jnp.asarray(w) if with_tube else None)
    viol_h = np.abs(np.asarray(h_fn(x, p)))
    viol_g = np.maximum(-np.asarray(g_fn(x, p)), 0.0)
    return viol_h, viol_g


def segment_constraint_violation(viol_h, viol_g, h_cols,
                                 g_cols) -> Dict[str, np.ndarray]:
    """Split violations by constraint family (ref
    segment_constraint_violation:393-412): Dynamics, per-obstacle, Initial
    Condition, Tube Dynamics."""
    viol_h = np.asarray(viol_h)
    viol_g = np.asarray(viol_g)
    seg = {
        "Dynamics": viol_h[[j for j, s in enumerate(h_cols)
                            if s.startswith("dyn")]],
    }
    i = 0
    while True:
        idx = [j for j, s in enumerate(g_cols) if s.startswith(f"obs_{i}_")]
        if not idx:
            break
        seg[f"Obstacle {i}"] = viol_g[idx]
        i += 1
    seg["Initial Condition"] = viol_h[
        [j for j, s in enumerate(h_cols) if s.startswith("ic")]
    ]
    tube_idx = [j for j, s in enumerate(h_cols) if s.startswith("tube")]
    if tube_idx:
        seg["Tube Dynamics"] = viol_h[tube_idx]
    return seg


def trace_to_csv(trace: dict, path: str,
                 scenario: Optional[int] = None) -> str:
    """Write a solver iteration trace to CSV (ref SolverCallback:588-657
    writes one row per IPOPT iteration). ``trace`` is the dict returned by
    ``solve_al(..., return_trace=True)`` — each value (outer_iters,) for one
    scenario or (B, outer_iters) batched; pass ``scenario`` to select a row
    of a batched trace."""
    cols = sorted(trace.keys())
    arrs = {}
    for k in cols:
        a = np.asarray(trace[k])
        if a.ndim == 2:
            if scenario is None:
                raise ValueError(
                    "batched trace: pass scenario= to select one row")
            a = a[scenario]
        arrs[k] = a
    n_iter = len(next(iter(arrs.values())))
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w", newline="") as f:
        writer = csv.writer(f)
        writer.writerow(["iter"] + cols)
        for i in range(n_iter):
            writer.writerow([i] + [float(arrs[k][i]) for k in cols])
    return path
