"""Policy export: StableHLO + TF SavedModel.

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
