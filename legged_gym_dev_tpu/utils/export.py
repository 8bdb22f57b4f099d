"""Policy export: StableHLO + TF SavedModel + TorchScript + ONNX.

Replaces the reference's TorchScript JIT + ONNX policy exporters
(ref: legged_gym/utils/helpers.py:274-313, scripts/play.py:74-87,
deep_tube_learning/train_rl.py:57-63) with the TPU-native equivalents: a
serialized StableHLO artifact (jax.export — loadable from any XLA runtime)
and, when TensorFlow is present, a SavedModel for non-JAX consumers.
"""
from __future__ import annotations

import os
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def export_policy_stablehlo(policy: Callable, obs_dim: int, path: str,
                            batch: Optional[int] = None) -> str:
    """Serialize a jitted policy to a StableHLO artifact (.shlo)."""
    from jax import export as jexport

    shape = (batch or 1, obs_dim)
    exported = jexport.export(jax.jit(policy))(
        jax.ShapeDtypeStruct(shape, jnp.float32)
    )
    blob = exported.serialize()
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(blob)
    return path


def load_policy_stablehlo(path: str) -> Callable:
    from jax import export as jexport

    with open(path, "rb") as f:
        exported = jexport.deserialize(bytearray(f.read()))
    return exported.call


def export_policy_savedmodel(policy: Callable, obs_dim: int, path: str,
                             batch: Optional[int] = None) -> Optional[str]:
    """Export as a TF SavedModel (returns None if TF is unavailable)."""
    try:
        import tensorflow as tf
        from jax.experimental import jax2tf
    except Exception:
        return None

    f_tf = tf.function(
        jax2tf.convert(jax.jit(policy), with_gradient=False),
        autograph=False,
        input_signature=[
            tf.TensorSpec((batch or 1, obs_dim), tf.float32, name="obs")
        ],
    )
    module = tf.Module()
    module.f = f_tf
    tf.saved_model.save(module, path)
    return path


def _actor_torch_module(params, activation: str = "elu"):
    """Rebuild the flax actor MLP as an eval-mode torch.nn.Sequential.

    flax Dense kernels are (in, out); torch Linear weights are (out, in),
    so kernels are transposed. Shared by the TorchScript and ONNX
    exporters; parity vs the JAX forward is asserted in
    tests/test_export.py.
    """
    import torch

    actor = params["params"]["actor"]
    layers = []
    n_dense = len([k for k in actor if k.startswith("Dense_")])
    acts = {"elu": torch.nn.ELU, "relu": torch.nn.ReLU,
            "tanh": torch.nn.Tanh, "selu": torch.nn.SELU}
    for i in range(n_dense):
        d = actor[f"Dense_{i}"]
        w = np.asarray(d["kernel"], np.float32)
        lin = torch.nn.Linear(w.shape[0], w.shape[1])
        with torch.no_grad():
            lin.weight.copy_(torch.from_numpy(w.T))
            lin.bias.copy_(torch.from_numpy(np.asarray(d["bias"],
                                                       np.float32)))
        layers.append(lin)
        if i < n_dense - 1:
            layers.append(acts[activation]())
    return torch.nn.Sequential(*layers).eval()


def export_policy_torchscript(params, path: str,
                              activation: str = "elu") -> str:
    """Export a flax ActorCritic's actor as a TorchScript module.

    Direct counterpart of the reference's ``export_policy_as_jit``
    (ref: legged_gym/utils/helpers.py:274-286): deployment stacks that
    consume TorchScript keep working against policies trained here.
    """
    import torch

    scripted = torch.jit.script(_actor_torch_module(params, activation))
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    scripted.save(path)
    return path


def export_policy_onnx(params, obs_dim: int, path: str,
                       activation: str = "elu") -> Optional[str]:
    """Export a flax ActorCritic's actor as an ONNX model.

    Counterpart of the reference's ONNX export (ref: scripts/play.py:79-87,
    deep_tube_learning/train_rl.py:57-63). Requires the ``onnx`` package
    (torch's exporter serializes through it); returns None when it is not
    installed — StableHLO (`export_policy_stablehlo`) is the always-available
    portable format here.
    """
    try:
        import onnx  # noqa: F401
        import torch
    except Exception:
        return None

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    torch.onnx.export(
        _actor_torch_module(params, activation),
        (torch.zeros(1, obs_dim),),
        path,
        input_names=["obs"],
        output_names=["actions"],
        dynamic_axes={"obs": {0: "batch"}, "actions": {0: "batch"}},
        dynamo=False,
    )
    return path


def export_policy_lstm_torchscript(params, path: str,
                                   activation: str = "elu") -> str:
    """Export a flax ActorCriticRecurrent actor as a STATEFUL TorchScript
    module: hidden/cell states are registered buffers advanced by
    ``forward`` and cleared by the exported ``reset_memory`` method —
    exact counterpart of the reference's ``PolicyExporterLSTM``
    (ref: legged_gym/utils/helpers.py:287-313).

    flax ``OptimizedLSTMCell`` keeps per-gate kernels (input kernels
    bias-free, hidden kernels biased); torch ``LSTMCell`` stacks gates
    [i, f, g, o] row-wise — same equations, so weights map exactly
    (parity asserted in tests/test_export.py).
    """
    import torch

    lstm_p = params["params"]["lstm"]
    actor = params["params"]["actor"]
    in_dim = np.asarray(lstm_p["ii"]["kernel"]).shape[0]
    hidden = np.asarray(lstm_p["hi"]["kernel"]).shape[0]

    def stack_gates(prefix):
        # torch gate order: i, f, g, o
        return np.concatenate(
            [np.asarray(lstm_p[prefix + g]["kernel"], np.float32).T
             for g in ("i", "f", "g", "o")], axis=0)

    class PolicyExporterLSTM(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.cell = torch.nn.LSTMCell(in_dim, hidden)
            with torch.no_grad():
                self.cell.weight_ih.copy_(torch.from_numpy(stack_gates("i")))
                self.cell.weight_hh.copy_(torch.from_numpy(stack_gates("h")))
                self.cell.bias_ih.zero_()
                self.cell.bias_hh.copy_(torch.from_numpy(np.concatenate(
                    [np.asarray(lstm_p["h" + g]["bias"], np.float32)
                     for g in ("i", "f", "g", "o")])))
            layers = []
            n_dense = len([k for k in actor if k.startswith("Dense_")])
            acts = {"elu": torch.nn.ELU, "relu": torch.nn.ReLU,
                    "tanh": torch.nn.Tanh, "selu": torch.nn.SELU}
            for i in range(n_dense):
                d = actor[f"Dense_{i}"]
                w = np.asarray(d["kernel"], np.float32)
                lin = torch.nn.Linear(w.shape[0], w.shape[1])
                with torch.no_grad():
                    lin.weight.copy_(torch.from_numpy(w.T))
                    lin.bias.copy_(torch.from_numpy(
                        np.asarray(d["bias"], np.float32)))
                layers.append(lin)
                if i < n_dense - 1:
                    layers.append(acts[activation]())
            self.actor = torch.nn.Sequential(*layers)
            self.register_buffer("hidden_state", torch.zeros(1, hidden))
            self.register_buffer("cell_state", torch.zeros(1, hidden))

        def forward(self, x):
            h, c = self.cell(x, (self.hidden_state, self.cell_state))
            self.hidden_state[:] = h
            self.cell_state[:] = c
            return self.actor(h)

        @torch.jit.export
        def reset_memory(self):
            self.hidden_state[:] = 0.0
            self.cell_state[:] = 0.0

    scripted = torch.jit.script(PolicyExporterLSTM().eval())
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    scripted.save(path)
    return path
