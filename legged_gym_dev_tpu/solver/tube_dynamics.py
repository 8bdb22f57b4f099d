"""Tube-width dynamics family used as NLP constraints.

Re-design of the reference's tube-dynamics constraint builders
(ref: trajopt/tube_trajopt.py:489-585). Each entry maps the planned
trajectory (z, v), tube widths w, and the error/input history (e, v_prev) to
the predicted tube widths ``fw`` of the next N nodes; the NLP imposes
``fw - w[1:] = 0``.

Unlike the reference (where the NN variant needs l4casadi C++ codegen to live
inside the CasADi graph), the learned tube network here is just a JAX function
evaluated inside the residual — fused into the batched solve and
differentiated end-to-end by the same autodiff as everything else.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..tube.models import MLP


def l1_tube(scaling: float) -> Callable:
    """fw_k = scaling * sum_j |v_kj| (ref :489-499)."""

    def fn(z, v, w, e, v_prev, params):
        return scaling * jnp.sum(jnp.abs(v), axis=-1)

    return fn


def l2_tube(scaling: float) -> Callable:
    """fw_k = scaling * sum_j v_kj^2 (ref :502-512)."""

    def fn(z, v, w, e, v_prev, params):
        return scaling * jnp.sum(v * v, axis=-1)

    return fn


def _rolling_matrix(N: int, window: int) -> np.ndarray:
    """A[i, j] = 1/min(window, i+1) for max(i-window+1, 0) <= j <= i."""
    A = np.zeros((N, N), np.float32)
    for i in range(N):
        lo = max(i - window + 1, 0)
        A[i, lo:i + 1] = 1.0 / min(window, i + 1)
    return A


def l1_rolling_tube(scaling: float, window: int, N: int) -> Callable:
    """Rolling mean of per-step l1 (ref :515-526)."""
    A = jnp.asarray(_rolling_matrix(N, window))

    def fn(z, v, w, e, v_prev, params):
        l1 = scaling * jnp.sum(jnp.abs(v), axis=-1)
        return A @ l1

    return fn


def l2_rolling_tube(scaling: float, window: int, N: int) -> Callable:
    """Rolling mean of per-step l2 (ref :529-540)."""
    A = jnp.asarray(_rolling_matrix(N, window))

    def fn(z, v, w, e, v_prev, params):
        l2 = scaling * jnp.sum(v * v, axis=-1)
        return A @ l2

    return fn


def nn_oneshot_tube() -> Callable:
    """One-shot NN tube dynamics (ref :543-570).

    Input layout matches the reference exactly: ``[e (H_rev), z_0[2:],
    vec_F(v_total)]`` where ``v_total = [v_prev; v]`` is flattened
    column-major (CasADi ``reshape`` semantics, ref :562-563). The MLP params
    ride in through the scenario pytree, so different scenarios may even carry
    different tube networks.
    """

    def fn(z, v, w, e, v_prev, params: MLP):
        v_total = jnp.concatenate([v_prev, v], axis=0)        # (H_rev+N, m)
        v_flat = v_total.T.reshape(-1)                        # column-major
        x = jnp.concatenate([e.reshape(-1), z[0, 2:], v_flat])
        return params(x)

    return fn


def get_tube_dynamics(tube_dyn: str, N: int, scaling: float = 0.5,
                      window_size: int = 10) -> Callable:
    """Registry lookup (ref: tube_trajopt.py:573-585)."""
    if tube_dyn == "l1":
        return l1_tube(scaling)
    if tube_dyn == "l2":
        return l2_tube(scaling)
    if tube_dyn == "l1_rolling":
        return l1_rolling_tube(scaling, window_size, N)
    if tube_dyn == "l2_rolling":
        return l2_rolling_tube(scaling, window_size, N)
    if tube_dyn == "NN_oneshot":
        return nn_oneshot_tube()
    raise ValueError(f"Tube dynamics '{tube_dyn}' not implemented")
