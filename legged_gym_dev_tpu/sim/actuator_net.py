"""ANYdrive LSTM actuator network in JAX.

TPU-native replacement for the reference's TorchScript actuator net
(ref: legged_gym/envs/anymal_c/anymal.py:50-81, asset
resources/actuator_nets/anydrive_v3_lstm.pt): a per-joint 2-layer LSTM(8)
over (position error, velocity) inputs producing joint torque, evaluated
every physics substep with hidden state carried in the env state and zeroed
on resets (ref anymal.py:56-60).

Weights load directly from the reference TorchScript checkpoint (torch CPU
runtime only used at load time), so torque outputs match the reference
exactly; parity is asserted in tests.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

HIDDEN = 8
LAYERS = 2


@struct.dataclass
class ActuatorNetLSTM:
    w_ih: tuple      # per layer (4H, in)
    w_hh: tuple      # per layer (4H, H)
    b_ih: tuple      # per layer (4H,)
    b_hh: tuple      # per layer (4H,)
    out_w: jax.Array  # (1, H)
    out_b: jax.Array  # (1,)
    out_scale: jax.Array  # ()
    in_scale: jax.Array   # (2,) input normalization [pos_err, vel]

    @classmethod
    def from_torchscript(cls, path: str) -> "ActuatorNetLSTM":
        import torch

        mod = torch.jit.load(path, map_location="cpu")
        sd = mod.state_dict()
        g = lambda k: jnp.asarray(sd[k].detach().numpy(), jnp.float32)
        return cls(
            w_ih=tuple(g(f"lstm.weight_ih_l{i}") for i in range(LAYERS)),
            w_hh=tuple(g(f"lstm.weight_hh_l{i}") for i in range(LAYERS)),
            b_ih=tuple(g(f"lstm.bias_ih_l{i}") for i in range(LAYERS)),
            b_hh=tuple(g(f"lstm.bias_hh_l{i}") for i in range(LAYERS)),
            out_w=g("linear.weight"),
            out_b=g("linear.bias"),
            out_scale=g("out_scale").reshape(()),
            in_scale=jnp.asarray(
                mod.in_scale.detach().numpy().reshape(-1), jnp.float32
            ),
        )

    def __call__(self, x: jax.Array, hidden: jax.Array,
                 cell: jax.Array) -> Tuple[jax.Array, jax.Array, jax.Array]:
        """One step. x: (N, 2); hidden/cell: (LAYERS, N, H).

        Returns (torque (N,), hidden', cell'). Gate order matches torch LSTM
        chunks [input, forget, cell, output].
        """
        h_new, c_new = [], []
        inp = x * self.in_scale
        for l in range(LAYERS):
            gates = (inp @ self.w_ih[l].T + self.b_ih[l]
                     + hidden[l] @ self.w_hh[l].T + self.b_hh[l])
            i, f, g, o = jnp.split(gates, 4, axis=-1)
            c = jax.nn.sigmoid(f) * cell[l] + jax.nn.sigmoid(i) * jnp.tanh(g)
            h = jax.nn.sigmoid(o) * jnp.tanh(c)
            h_new.append(h)
            c_new.append(c)
            inp = h
        tau = (inp @ self.out_w.T + self.out_b)[..., 0] * self.out_scale
        return tau, jnp.stack(h_new), jnp.stack(c_new)
