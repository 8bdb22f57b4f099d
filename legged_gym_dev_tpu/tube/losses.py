"""Quantile ("pinball-through-Huber") tube losses in JAX.

Re-design of the reference torch losses (ref: deep_tube_learning/losses.py).
Each loss is a pure function ``loss(fw, w, data) -> scalar``; the asymmetric
alpha weighting makes the regressor estimate the alpha-quantile of the tube
width (so ``fw >= w`` holds with probability ~alpha), and the Huber wrapper
bounds gradient magnitude on outliers.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def huber(x: jax.Array, delta: float = 1.0) -> jax.Array:
    """Mean Huber loss of x against zero (torch nn.HuberLoss semantics)."""
    absx = jnp.abs(x)
    return jnp.mean(
        jnp.where(absx <= delta, 0.5 * x * x, delta * (absx - 0.5 * delta))
    )


def _pinball(residual: jax.Array, alpha) -> jax.Array:
    return jnp.where(residual > 0, alpha * residual,
                     (1.0 - alpha) * jnp.abs(residual))


def scalar_tube_loss(fw, w, data=None, *, alpha: float = 0.9,
                     delta: float = 1.0) -> jax.Array:
    """Asymmetric quantile residual through Huber (ref losses.py:5-14)."""
    return huber(_pinball(w - fw, alpha), delta)


# The reference's ScalarHorizonTubeLoss is identical to ScalarTubeLoss
# (ref losses.py:17-26); one-shot horizon training reuses scalar_tube_loss.
scalar_horizon_tube_loss = scalar_tube_loss


def vector_tube_loss(fw, w, data=None, *, alpha: float = 0.9,
                     delta: float = 1.0) -> jax.Array:
    """Per-dim pinball summed over dims, then Huber (ref losses.py:29-37)."""
    return huber(jnp.sum(_pinball(w - fw, alpha), axis=-1), delta)


def alpha_scalar_tube_loss(fw, w, data, *, delta: float = 1.0) -> jax.Array:
    """Quantile level alpha read from the last input column (ref :40-49)."""
    alpha = data[:, -1:]
    return huber(_pinball(w - fw, alpha), delta)


def alpha_vector_tube_loss(fw, w, data, *, delta: float = 1.0) -> jax.Array:
    """Vector variant of the alpha-conditioned loss (ref :52-61)."""
    alpha = data[:, -1:]
    return huber(jnp.sum(_pinball(w - fw, alpha), axis=-1), delta)


def error_loss(fe, e, data=None) -> jax.Array:
    """Plain MSE for signed error-dynamics regression (ref :64-71)."""
    return jnp.mean((fe - e) ** 2)


LOSS_REGISTRY = {
    "ScalarTubeLoss": scalar_tube_loss,
    "ScalarHorizonTubeLoss": scalar_horizon_tube_loss,
    "VectorTubeLoss": vector_tube_loss,
    "AlphaScalarTubeLoss": alpha_scalar_tube_loss,
    "AlphaVectorTubeLoss": alpha_vector_tube_loss,
    "ErrorLoss": error_loss,
}
