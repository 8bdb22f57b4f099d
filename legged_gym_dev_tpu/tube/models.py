"""Tube-width network models as functional JAX pytrees.

Replaces the reference's torch ``MLP`` (ref: deep_tube_learning/models.py:4-18)
and l4casadi embedding (ref: trajopt/tube_trajopt.py:543-570): the model is a
plain params-pytree + pure apply function, so it drops directly into solver
residuals, is differentiated end-to-end by JAX, and fuses into the batched
solve on TPU.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import struct


def softplus_beta(x: jax.Array, beta: float = 5.0) -> jax.Array:
    """Numerically-stable softplus with sharpness beta (torch Softplus(beta))."""
    bx = beta * x
    return jnp.where(bx > 20.0, x, jax.nn.softplus(bx) / beta)


_ACTIVATIONS = {
    "softplus_b5": lambda x: softplus_beta(x, 5.0),
    "softplus": jax.nn.softplus,
    "relu": jax.nn.relu,
    "tanh": jnp.tanh,
    "elu": jax.nn.elu,
    "none": lambda x: x,
}

# Exact derivatives of the activations above (used by the analytic
# Jacobian below; d softplus(bx)/b / dx = sigmoid(bx)).
_ACT_DERIVS = {
    "softplus_b5": lambda x: jax.nn.sigmoid(5.0 * x),
    "softplus": jax.nn.sigmoid,
    "relu": lambda x: (x > 0.0).astype(x.dtype),
    "tanh": lambda x: 1.0 - jnp.tanh(x) ** 2,
    "elu": lambda x: jnp.where(x > 0.0, 1.0, jnp.exp(x)),
    "none": lambda x: jnp.ones_like(x),
}


@struct.dataclass
class MLP:
    """Multi-layer perceptron: weights are leaves, architecture is static.

    Matches the reference tube net shape: ``num_layers`` hidden layers of
    ``num_units`` with an activation (default Softplus(beta=5), ref:
    configs/tube_learning/tube_learning_oneshot.yaml), linear output with
    optional final activation.
    """

    weights: tuple          # tuple of (in, out) arrays
    biases: tuple           # tuple of (out,) arrays
    activation: str = struct.field(pytree_node=False, default="softplus_b5")
    final_activation: str = struct.field(pytree_node=False, default="none")
    # Optional scalar output multiplier, applied AFTER the final activation.
    # Used for split-conformal width calibration (tube.train
    # ``conformal_width_scale``): the softplus head makes a post-activation
    # scale unfoldable into the last linear layer, so it rides as its own
    # (differentiable) leaf. None = 1.0 (and keeps old checkpoints'
    # pytree structure unchanged).
    out_scale: jax.Array = None

    @classmethod
    def create(cls, key, input_size: int, output_dim: int, num_units: int = 128,
               num_layers: int = 2, activation: str = "softplus_b5",
               final_activation: str = "none") -> "MLP":
        sizes = [input_size] + [num_units] * num_layers + [output_dim]
        ws, bs = [], []
        for i, (fan_in, fan_out) in enumerate(zip(sizes[:-1], sizes[1:])):
            key, sub = jax.random.split(key)
            # Kaiming-uniform fan_in init (torch nn.Linear default).
            bound = 1.0 / jnp.sqrt(fan_in)
            ws.append(
                jax.random.uniform(sub, (fan_in, fan_out), minval=-bound,
                                   maxval=bound)
            )
            key, sub = jax.random.split(key)
            bs.append(
                jax.random.uniform(sub, (fan_out,), minval=-bound, maxval=bound)
            )
        return cls(weights=tuple(ws), biases=tuple(bs), activation=activation,
                   final_activation=final_activation)

    def __call__(self, x: jax.Array) -> jax.Array:
        act = _ACTIVATIONS[self.activation]
        for W, b in zip(self.weights[:-1], self.biases[:-1]):
            x = act(x @ W + b)
        x = x @ self.weights[-1] + self.biases[-1]
        out = _ACTIVATIONS[self.final_activation](x)
        if self.out_scale is not None:
            out = out * self.out_scale
        return out

    def value_and_jacobian(self, x: jax.Array):
        """(out, J) with J[..., o, i] = d out_o / d x_i, computed as an
        explicit matmul chain (W_L^T D_{L-1} ... D_1 W_1^T).

        ~10x cheaper on TPU than ``jax.jacfwd``/``jacrev`` of ``__call__``
        at the tube-solver shapes: the per-layer work is one dense
        (hidden, hidden) @ (hidden, out) matmul on the MXU instead of
        n_in forward tangent passes (measured in docs/PERF.md; used by the
        NN-oneshot staged solve's per-inner-iteration linearization)."""
        act = _ACTIVATIONS[self.activation]
        dact = _ACT_DERIVS[self.activation]
        h = x
        acts_pre = []
        for W, b in zip(self.weights[:-1], self.biases[:-1]):
            a = h @ W + b
            acts_pre.append(a)
            h = act(a)
        out_pre = h @ self.weights[-1] + self.biases[-1]
        out = _ACTIVATIONS[self.final_activation](out_pre)

        # Backward accumulation M_k = d out_pre / d (layer-k input),
        # shaped (..., h_k, out). The shared-weight left-product
        # ``einsum("ij,...jo->...io", W, Y)`` lowers on TPU to a batched
        # small GEMM — one (i, j)x(j, o) per batch element, a fraction of
        # a 128x128 MXU tile each, serialized in tile-sized waves (the
        # round-4 tick analysis, docs/PERF.md). Reassociating to ONE
        # (i, j)x(j, B*o) GEMM via two cheap transposes keeps the MXU
        # full at identical f32 semantics (round-5 A/B: 5.5x on this
        # chain at B=1024).
        W_last = self.weights[-1]
        M = jnp.broadcast_to(W_last, x.shape[:-1] + W_last.shape)

        def leftmul(W, Y):
            lead = Y.shape[:-2]
            j, o = Y.shape[-2], Y.shape[-1]
            Yr = jnp.moveaxis(Y.reshape((-1, j, o)), 0, 1).reshape(j, -1)
            Z = W @ Yr                                   # (i, B*o)
            return jnp.moveaxis(
                Z.reshape(W.shape[0], -1, o), 1, 0
            ).reshape(lead + (W.shape[0], o))

        for W, a in zip(reversed(self.weights[:-1]), reversed(acts_pre)):
            M = leftmul(W, dact(a)[..., :, None] * M)
        if self.final_activation != "none":
            M = M * _ACT_DERIVS[self.final_activation](out_pre)[..., None, :]
        J = jnp.swapaxes(M, -1, -2)
        if self.out_scale is not None:
            out = out * self.out_scale
            J = J * self.out_scale
        return out, J

    def value_and_vjp(self, x: jax.Array, ct: jax.Array):
        """(out, J^T ct): one explicit backward pass — O(width) matvecs
        instead of the O(n_out * width) matmuls of the full Jacobian.

        Used by the NN-oneshot staged solve for exact per-inner-iteration
        gradients when the Woodbury basis (which needs the full J) is only
        refreshed once per outer (ALConfig.nn_basis_refresh='outer')."""
        act = _ACTIVATIONS[self.activation]
        dact = _ACT_DERIVS[self.activation]
        h = x
        acts_pre = []
        for W, b in zip(self.weights[:-1], self.biases[:-1]):
            a = h @ W + b
            acts_pre.append(a)
            h = act(a)
        out_pre = h @ self.weights[-1] + self.biases[-1]
        out = _ACTIVATIONS[self.final_activation](out_pre)

        u = ct
        if self.out_scale is not None:
            out = out * self.out_scale
            u = u * self.out_scale
        if self.final_activation != "none":
            u = u * _ACT_DERIVS[self.final_activation](out_pre)
        u = jnp.einsum("io,...o->...i", self.weights[-1], u)
        for W, a in zip(reversed(self.weights[:-1]), reversed(acts_pre)):
            u = jnp.einsum("io,...o->...i", W, dact(a) * u)
        return out, u
