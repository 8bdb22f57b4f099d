"""Actor-critic policy networks (flax.linen).

Re-design of the reference's rsl_rl ``ActorCritic``/``ActorCriticRecurrent``
(external dep, configured by legged_robot_config.py:236-254): MLP actor and
critic with a state-independent learnable log-std Gaussian head; an LSTM
variant mirrors the recurrent policy and the ANYmal actuator-net pattern.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

_ACT = {"elu": nn.elu, "relu": nn.relu, "tanh": jnp.tanh, "selu": nn.selu}


class MLPBody(nn.Module):
    hidden_dims: Sequence[int]
    out_dim: int
    activation: str = "elu"

    @nn.compact
    def __call__(self, x):
        act = _ACT[self.activation]
        for h in self.hidden_dims:
            x = act(nn.Dense(h)(x))
        return nn.Dense(self.out_dim)(x)


class ActorCritic(nn.Module):
    """Gaussian MLP actor + value critic (rsl_rl ActorCritic parity).

    Default hidden dims match the reference robots' configs
    (ref: legged_robot_config.py:239-241; hopper uses [128, 64, 32],
    hopper_trajectory_config.py:270-271).
    """

    num_actions: int
    actor_hidden_dims: Sequence[int] = (512, 256, 128)
    critic_hidden_dims: Sequence[int] = (512, 256, 128)
    activation: str = "elu"
    init_noise_std: float = 1.0

    @nn.compact
    def __call__(self, obs):
        mean = MLPBody(self.actor_hidden_dims, self.num_actions,
                       self.activation, name="actor")(obs)
        value = MLPBody(self.critic_hidden_dims, 1, self.activation,
                        name="critic")(obs)[..., 0]
        log_std = self.param(
            "log_std",
            lambda k, s: jnp.full(s, jnp.log(self.init_noise_std)),
            (self.num_actions,),
        )
        return mean, log_std, value


def gaussian_sample(key, mean, log_std):
    std = jnp.exp(log_std)
    eps = jax.random.normal(key, mean.shape)
    action = mean + std * eps
    return action, gaussian_log_prob(action, mean, log_std)


def gaussian_log_prob(action, mean, log_std):
    std = jnp.exp(log_std)
    z = (action - mean) / std
    return jnp.sum(
        -0.5 * z * z - log_std - 0.5 * jnp.log(2.0 * jnp.pi), axis=-1
    )


def gaussian_entropy(log_std):
    return jnp.sum(log_std + 0.5 * jnp.log(2.0 * jnp.pi * jnp.e), axis=-1)


def gaussian_kl(mean_a, log_std_a, mean_b, log_std_b):
    """KL(a || b) for diagonal Gaussians (rsl_rl adaptive-LR form)."""
    var_a, var_b = jnp.exp(2 * log_std_a), jnp.exp(2 * log_std_b)
    return jnp.sum(
        log_std_b - log_std_a
        + (var_a + (mean_a - mean_b) ** 2) / (2.0 * var_b) - 0.5,
        axis=-1,
    )


class ActorCriticRecurrent(nn.Module):
    """LSTM-backed actor-critic (rsl_rl ``ActorCriticRecurrent`` parity).

    The reference's recurrent policy (external rsl_rl v1.0.2, selected by
    ``policy.rnn_type``/``rnn_hidden_size`` in the train cfg; see
    task_registry.py:148) runs one shared LSTM over the observation stream
    and feeds its hidden state to the actor/critic MLPs. Functional here:
    the cell carry is explicit, threaded by the rollout scan, and reset to
    zeros where an episode ends (``mask_carry``).
    """

    num_actions: int
    rnn_hidden_size: int = 256
    actor_hidden_dims: Sequence[int] = (256, 128)
    critic_hidden_dims: Sequence[int] = (256, 128)
    activation: str = "elu"
    init_noise_std: float = 1.0

    @nn.compact
    def __call__(self, obs, carry):
        """obs (B, O), carry ((B, H), (B, H)) -> mean, log_std, value, carry."""
        cell = nn.OptimizedLSTMCell(self.rnn_hidden_size, name="lstm")
        carry, hidden = cell(carry, obs)
        mean = MLPBody(self.actor_hidden_dims, self.num_actions,
                       self.activation, name="actor")(hidden)
        value = MLPBody(self.critic_hidden_dims, 1, self.activation,
                        name="critic")(hidden)[..., 0]
        log_std = self.param(
            "log_std",
            lambda k, s: jnp.full(s, jnp.log(self.init_noise_std)),
            (self.num_actions,),
        )
        return mean, log_std, value, carry

    def initial_carry(self, batch: int):
        h = jnp.zeros((batch, self.rnn_hidden_size))
        return (h, h)

    @staticmethod
    def mask_carry(carry, done):
        """Zero the (c, h) state of envs whose episode just ended."""
        keep = (1.0 - done.astype(jnp.float32))[:, None]
        return tuple(x * keep for x in carry)
