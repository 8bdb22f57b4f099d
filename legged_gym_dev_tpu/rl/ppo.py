"""PPO in pure JAX: fused rollout + update under one jit.

TPU-native replacement for the reference's external rsl_rl v1.0.2
``OnPolicyRunner``+``PPO`` (consumed via task_registry.py:105-156 and
configured by legged_robot_config.py:236-279): clipped-surrogate PPO with
GAE(lambda), adaptive-KL learning rate, value clipping, entropy bonus, and
time-limit bootstrapping, with the whole (rollout, advantage, epochs x
minibatches) iteration compiled as a single XLA program over the vectorized
env. Data parallelism over devices is plain batch-axis sharding (the update
is linear in batch; gradient all-reduce rides the mesh).
"""
from __future__ import annotations

import functools
from typing import Any, Callable, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from .networks import (
    ActorCritic,
    gaussian_entropy,
    gaussian_kl,
    gaussian_log_prob,
    gaussian_sample,
)


@struct.dataclass
class PPOConfig:
    """Defaults = the reference PPO block (legged_robot_config.py:255-269)."""

    num_steps: int = struct.field(pytree_node=False, default=24)
    num_learning_epochs: int = struct.field(pytree_node=False, default=5)
    num_mini_batches: int = struct.field(pytree_node=False, default=4)
    clip_param: float = struct.field(pytree_node=False, default=0.2)
    gamma: float = struct.field(pytree_node=False, default=0.99)
    lam: float = struct.field(pytree_node=False, default=0.95)
    value_loss_coef: float = struct.field(pytree_node=False, default=1.0)
    entropy_coef: float = struct.field(pytree_node=False, default=0.01)
    learning_rate: float = struct.field(pytree_node=False, default=1e-3)
    schedule: str = struct.field(pytree_node=False, default="adaptive")
    desired_kl: float = struct.field(pytree_node=False, default=0.01)
    max_grad_norm: float = struct.field(pytree_node=False, default=1.0)
    use_clipped_value_loss: bool = struct.field(pytree_node=False, default=True)
    min_lr: float = struct.field(pytree_node=False, default=1e-5)
    max_lr: float = struct.field(pytree_node=False, default=1e-2)


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    lr: jax.Array
    key: jax.Array


class RolloutBatch(NamedTuple):
    obs: jax.Array        # (T, B, O)
    actions: jax.Array    # (T, B, A)
    log_probs: jax.Array  # (T, B)
    values: jax.Array     # (T, B)
    advantages: jax.Array
    returns: jax.Array
    means: jax.Array      # (T, B, A) old policy means (for KL)
    log_stds: jax.Array   # (T, A) broadcast old log-stds


def make_optimizer(cfg: PPOConfig):
    return optax.chain(
        optax.clip_by_global_norm(cfg.max_grad_norm),
        optax.inject_hyperparams(optax.adam)(learning_rate=cfg.learning_rate),
    )


def init_train_state(model: ActorCritic, obs_dim: int, cfg: PPOConfig,
                     key: jax.Array) -> TrainState:
    params = model.init(key, jnp.zeros((1, obs_dim)))
    tx = make_optimizer(cfg)
    return TrainState(
        params=params,
        opt_state=tx.init(params),
        lr=jnp.asarray(cfg.learning_rate, jnp.float32),
        key=key,
    )


def compute_gae(rewards, values, dones, last_value, gamma, lam):
    """GAE(lambda) over (T, B) arrays; episode boundaries cut the recursion."""

    def body(carry, inp):
        gae_next, value_next = carry
        reward, value, done = inp
        nonterminal = 1.0 - done.astype(jnp.float32)
        delta = reward + gamma * value_next * nonterminal - value
        gae = delta + gamma * lam * nonterminal * gae_next
        return (gae, value), gae

    (_, _), advantages = jax.lax.scan(
        body,
        (jnp.zeros_like(last_value), last_value),
        (rewards, values, dones),
        reverse=True,
    )
    return advantages, advantages + values


def rollout(env, model, train_state: TrainState, env_state, cfg: PPOConfig):
    """Collect cfg.num_steps transitions from the vectorized env."""

    def body(carry, _):
        env_state, obs, key = carry
        key, sub = jax.random.split(key)
        mean, log_std, value = model.apply(train_state.params, obs)
        action, log_prob = gaussian_sample(sub, mean, log_std)
        env_state, tr = env.step(env_state, action)
        # Time-limit bootstrapping (rsl_rl: reward += gamma * value on
        # time-outs, so truncation is not treated as death).
        reward = tr.reward + cfg.gamma * value * tr.info["time_outs"].astype(
            jnp.float32
        )
        out = (obs, action, log_prob, value, reward, tr.done, mean, log_std,
               tr.info["episode"], tr.info["n_resets"])
        return (env_state, tr.obs, key), out

    obs0 = env._obs(env_state)
    (env_state, last_obs, key), outs = jax.lax.scan(
        body, (env_state, obs0, train_state.key), None, length=cfg.num_steps
    )
    (obs, actions, log_probs, values, rewards, dones, means, log_stds,
     ep_infos, n_resets) = outs
    _, _, last_value = model.apply(train_state.params, last_obs)
    advantages, returns = compute_gae(
        rewards, values, dones, last_value, cfg.gamma, cfg.lam
    )
    batch = RolloutBatch(
        obs=obs, actions=actions, log_probs=log_probs, values=values,
        advantages=advantages, returns=returns, means=means,
        log_stds=log_stds,
    )
    total_resets = jnp.maximum(jnp.sum(n_resets), 1)
    metrics = {
        "mean_reward": rewards.mean(),
        # Envs emit per-step SUMS over reset envs; the true per-episode
        # average divides the total by the number of resets in the window.
        "mean_episode_info": jax.tree.map(
            lambda x: jnp.sum(x) / total_resets, ep_infos
        ),
    }
    return train_state._replace(key=key), env_state, batch, metrics


def ppo_update(model, train_state: TrainState, batch: RolloutBatch,
               cfg: PPOConfig):
    """Epochs x minibatches of clipped PPO with adaptive-KL LR."""
    T, B = batch.log_probs.shape
    N = T * B
    flat = jax.tree.map(lambda x: x.reshape((N,) + x.shape[2:]), batch._replace(
        log_stds=jnp.broadcast_to(
            batch.log_stds[:, None, :], batch.means.shape
        )
    ))
    adv = flat.advantages
    adv = (adv - adv.mean()) / (adv.std() + 1e-8)
    flat = flat._replace(advantages=adv)
    mb_size = N // cfg.num_mini_batches
    tx = make_optimizer(cfg)

    def loss_fn(params, mb):
        mean, log_std, value = model.apply(params, mb.obs)
        log_prob = gaussian_log_prob(mb.actions, mean, log_std)
        ratio = jnp.exp(log_prob - mb.log_probs)
        surr1 = ratio * mb.advantages
        surr2 = jnp.clip(ratio, 1.0 - cfg.clip_param,
                         1.0 + cfg.clip_param) * mb.advantages
        policy_loss = -jnp.minimum(surr1, surr2).mean()
        if cfg.use_clipped_value_loss:
            value_clipped = mb.values + jnp.clip(
                value - mb.values, -cfg.clip_param, cfg.clip_param
            )
            value_loss = jnp.maximum(
                (value - mb.returns) ** 2, (value_clipped - mb.returns) ** 2
            ).mean()
        else:
            value_loss = ((value - mb.returns) ** 2).mean()
        entropy = gaussian_entropy(log_std).mean()
        kl = gaussian_kl(mb.means, mb.log_stds[0], mean, log_std).mean()
        total = (policy_loss + cfg.value_loss_coef * value_loss
                 - cfg.entropy_coef * entropy)
        return total, (policy_loss, value_loss, kl)

    def minibatch_step(carry, idx):
        params, opt_state, lr, key = carry
        mb = jax.tree.map(lambda x: x[idx], flat)
        (loss, (pl, vl, kl)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params, mb)
        # Adaptive-KL LR (rsl_rl schedule): shrink on overshoot, grow when
        # conservative; applied per minibatch.
        if cfg.schedule == "adaptive":
            lr = jnp.where(kl > cfg.desired_kl * 2.0, lr / 1.5, lr)
            lr = jnp.where(kl < cfg.desired_kl / 2.0, lr * 1.5, lr)
            lr = jnp.clip(lr, cfg.min_lr, cfg.max_lr)
        opt_state[1].hyperparams["learning_rate"] = lr
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state, lr, key), (loss, pl, vl, kl)

    def epoch_step(carry, _):
        params, opt_state, lr, key = carry
        key, sub = jax.random.split(key)
        perm = jax.random.permutation(sub, N)
        idxs = perm[: mb_size * cfg.num_mini_batches].reshape(
            cfg.num_mini_batches, mb_size
        )
        carry, stats = jax.lax.scan(
            minibatch_step, (params, opt_state, lr, key), idxs
        )
        return carry, stats

    (params, opt_state, lr, key), stats = jax.lax.scan(
        epoch_step,
        (train_state.params, train_state.opt_state, train_state.lr,
         train_state.key),
        None,
        length=cfg.num_learning_epochs,
    )
    loss, pl, vl, kl = jax.tree.map(jnp.mean, stats)
    metrics = {"loss": loss, "policy_loss": pl, "value_loss": vl,
               "kl": kl, "lr": lr}
    return TrainState(params=params, opt_state=opt_state, lr=lr, key=key), metrics


def make_learn_iteration(env, model, cfg: PPOConfig) -> Callable:
    """One fused (rollout -> GAE -> update) iteration, jit-compiled."""

    @jax.jit
    def learn_iteration(train_state: TrainState, env_state):
        train_state, env_state, batch, roll_metrics = rollout(
            env, model, train_state, env_state, cfg
        )
        train_state, up_metrics = ppo_update(model, train_state, batch, cfg)
        return train_state, env_state, {**roll_metrics, **up_metrics}

    return learn_iteration
