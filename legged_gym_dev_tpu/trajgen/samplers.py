"""Hold-time and mode-weight samplers for the trajectory generator.

TPU-native re-design of the reference samplers
(ref: deep_tube_learning/utils.py:20-79). Stateless: every sampler is a
``sample(key, batch) -> array`` callable configured by a small dataclass, so
it threads explicit ``jax.random`` keys instead of mutating global RNG state.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class UniformSampleHoldDT:
    """Uniform hold-time sampler. Ref: deep_tube_learning/utils.py:27-43."""

    t_low: jax.Array
    t_high: jax.Array

    @classmethod
    def create(cls, t_low: float, t_high: float) -> "UniformSampleHoldDT":
        return cls(
            t_low=jnp.asarray(t_low, jnp.float32),
            t_high=jnp.asarray(t_high, jnp.float32),
        )

    def sample(self, key: jax.Array, batch: int) -> jax.Array:
        return jax.random.uniform(
            key, (batch,), minval=self.t_low, maxval=self.t_high
        )

    def sample_from_unit(self, u: jax.Array) -> jax.Array:
        """Transform pre-drawn unit uniforms (consolidated-RNG fast path)."""
        return self.t_low + u * (self.t_high - self.t_low)


def _dirichlet_like(key: jax.Array, batch: int, mask) -> jax.Array:
    """Sample weights on the simplex over the 4 input modes, zeroing masked
    modes. The reference samples U(0,1)^4 then normalizes
    (ref: utils.py:46-79); we keep that distribution for parity."""
    w = jax.random.uniform(key, (batch, 4))
    w = w * jnp.asarray(mask, jnp.float32)[None, :]
    return w / jnp.clip(jnp.sum(w, axis=-1, keepdims=True), 1e-8)


@struct.dataclass
class UniformWeightSampler:
    """Weights over (sample-hold, ramp, extreme, sinusoid). Ref: utils.py:46-57."""

    mask: jax.Array = struct.field(default_factory=lambda: jnp.ones(4))

    def sample(self, key: jax.Array, batch: int) -> jax.Array:
        return _dirichlet_like(key, batch, self.mask)


def UniformWeightSamplerNoExtreme() -> UniformWeightSampler:
    """Ref: deep_tube_learning/utils.py:60-68."""
    return UniformWeightSampler(mask=jnp.asarray([1.0, 1.0, 0.0, 1.0]))


def UniformWeightSamplerNoRamp() -> UniformWeightSampler:
    """Ref: deep_tube_learning/utils.py:71-79."""
    return UniformWeightSampler(mask=jnp.asarray([1.0, 0.0, 1.0, 1.0]))


def UniformWeightSamplerOnlySampleHold() -> UniformWeightSampler:
    """Sample-and-hold-only weights. The reference config names a
    ``WeightSamplerSampleAndHold`` class that does not exist (latent bug noted
    in SURVEY.md §2 item 11); this is its obvious intent."""
    return UniformWeightSampler(mask=jnp.asarray([1.0, 0.0, 0.0, 0.0]))


def UniformWeightSamplerTurnBiased(
        sin_weight: float = 3.0) -> UniformWeightSampler:
    """Sinusoid-heavy mixing weights (no ramp, extreme halved).

    The ``mask`` multiplies the U(0,1) mode draws before simplex
    normalization, so a mask entry >1 biases the expected weight share
    toward that mode without ever excluding the others. With the default
    ``sin_weight=3`` the sinusoid mode carries ~2/3 of the expected mass —
    sustained-turning segments (circular / weaving ROM paths) dominate the
    training distribution. Built for the circle-fixture tracking gap the
    ``UniformWeightSamplerNoRamp`` curriculum leaves (a policy trained on
    mostly sample-hold segments underweights continuous lateral motion;
    docs/PERF.md round-3 fixture table, ref
    evaluate_rl_policy.py:14-174)."""
    return UniformWeightSampler(
        mask=jnp.asarray([1.0, 0.0, 0.5, float(sin_weight)]))


SAMPLER_REGISTRY = {
    "UniformSampleHoldDT": UniformSampleHoldDT,
    "UniformWeightSampler": UniformWeightSampler,
    "UniformWeightSamplerNoExtreme": UniformWeightSamplerNoExtreme,
    "UniformWeightSamplerNoRamp": UniformWeightSamplerNoRamp,
    "WeightSamplerSampleAndHold": UniformWeightSamplerOnlySampleHold,
    "UniformWeightSamplerTurnBiased": UniformWeightSamplerTurnBiased,
}
