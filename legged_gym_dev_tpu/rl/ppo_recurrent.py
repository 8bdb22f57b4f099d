"""Recurrent PPO: BPTT over the rollout window for LSTM policies.

Counterpart of rsl_rl's recurrent training path (``ActorCriticRecurrent``
+ ``recurrent_mini_batch_generator``; external dep of the reference, see
task_registry.py:148 and legged_robot_config.py:236-254). Differences,
deliberately TPU-shaped:

- The rollout saves the window-start LSTM carry and the per-step done
  flags; updates REPLAY the whole ``num_steps`` window under the current
  params with carries re-masked at episode boundaries — exact truncated
  BPTT over the window. rsl_rl instead splits/pads per-trajectory; the
  masked replay computes the same hidden states without dynamic-shape
  padding (which XLA cannot compile efficiently).
- Minibatches slice the ENV axis (sequences stay whole), epochs permute
  env order. Everything runs under one jit.
"""
from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax

from .networks import (
    ActorCriticRecurrent,
    gaussian_entropy,
    gaussian_kl,
    gaussian_log_prob,
    gaussian_sample,
)
from .ppo import PPOConfig, TrainState, compute_gae, make_optimizer


def init_train_state_recurrent(model: ActorCriticRecurrent, obs_dim: int,
                               cfg: PPOConfig, key: jax.Array) -> TrainState:
    params = model.init(key, jnp.zeros((1, obs_dim)),
                        model.initial_carry(1))
    tx = make_optimizer(cfg)
    return TrainState(params=params, opt_state=tx.init(params),
                      lr=jnp.asarray(cfg.learning_rate, jnp.float32),
                      key=key)


def rollout_recurrent(env, model, train_state: TrainState, env_state,
                      carry, cfg: PPOConfig):
    """Collect cfg.num_steps transitions, threading the LSTM carry."""
    carry0 = carry

    def body(c, _):
        env_state, obs, carry, key = c
        key, sub = jax.random.split(key)
        mean, log_std, value, carry = model.apply(
            train_state.params, obs, carry
        )
        action, log_prob = gaussian_sample(sub, mean, log_std)
        env_state, tr = env.step(env_state, action)
        reward = tr.reward + cfg.gamma * value * tr.info["time_outs"].astype(
            jnp.float32
        )
        carry = ActorCriticRecurrent.mask_carry(carry, tr.done)
        out = (obs, action, log_prob, value, reward, tr.done, mean, log_std,
               tr.info["episode"], tr.info["n_resets"])
        return (env_state, tr.obs, carry, key), out

    obs0 = env._obs(env_state)
    (env_state, last_obs, carry, key), outs = jax.lax.scan(
        body, (env_state, obs0, carry0, train_state.key), None,
        length=cfg.num_steps,
    )
    (obs, actions, log_probs, values, rewards, dones, means, log_stds,
     ep_infos, n_resets) = outs
    _, _, last_value, _ = model.apply(train_state.params, last_obs, carry)
    advantages, returns = compute_gae(
        rewards, values, dones, last_value, cfg.gamma, cfg.lam
    )
    total_resets = jnp.maximum(jnp.sum(n_resets), 1)
    metrics = {
        "mean_reward": rewards.mean(),
        "mean_episode_info": jax.tree.map(
            lambda x: jnp.sum(x) / total_resets, ep_infos
        ),
    }
    batch = {
        "obs": obs, "actions": actions, "log_probs": log_probs,
        "values": values, "advantages": advantages, "returns": returns,
        "means": means, "log_stds": log_stds, "dones": dones,
        "carry0": carry0,
    }
    return (train_state._replace(key=key), env_state, carry, batch, metrics)


def ppo_update_recurrent(model, train_state: TrainState, batch,
                         cfg: PPOConfig):
    """Epochs x env-axis minibatches of clipped PPO with window replay."""
    T, B = batch["log_probs"].shape
    adv = batch["advantages"]
    adv = (adv - adv.mean()) / (adv.std() + 1e-8)
    batch = dict(batch, advantages=adv)
    mb_envs = B // cfg.num_mini_batches
    tx = make_optimizer(cfg)

    def loss_fn(params, mb):
        def step(carry, inp):
            obs, done = inp
            mean, log_std, value, carry = model.apply(params, obs, carry)
            carry = ActorCriticRecurrent.mask_carry(carry, done)
            return carry, (mean, log_std, value)

        _, (mean, log_std, value) = jax.lax.scan(
            step, mb["carry0"], (mb["obs"], mb["dones"])
        )
        log_std = log_std[:, None, :]   # (T, A) -> (T, 1, A) over envs
        log_prob = gaussian_log_prob(mb["actions"], mean, log_std)
        ratio = jnp.exp(log_prob - mb["log_probs"])
        surr1 = ratio * mb["advantages"]
        surr2 = jnp.clip(ratio, 1.0 - cfg.clip_param,
                         1.0 + cfg.clip_param) * mb["advantages"]
        policy_loss = -jnp.minimum(surr1, surr2).mean()
        if cfg.use_clipped_value_loss:
            value_clipped = mb["values"] + jnp.clip(
                value - mb["values"], -cfg.clip_param, cfg.clip_param
            )
            value_loss = jnp.maximum(
                (value - mb["returns"]) ** 2,
                (value_clipped - mb["returns"]) ** 2,
            ).mean()
        else:
            value_loss = ((value - mb["returns"]) ** 2).mean()
        entropy = gaussian_entropy(log_std).mean()
        kl = gaussian_kl(mb["means"], mb["log_stds"][0], mean, log_std).mean()
        total = (policy_loss + cfg.value_loss_coef * value_loss
                 - cfg.entropy_coef * entropy)
        return total, (policy_loss, value_loss, kl)

    def take_envs(idx):
        mb = {k: v[:, idx] for k, v in batch.items()
              if k not in ("log_stds", "carry0")}
        mb["log_stds"] = batch["log_stds"]
        mb["carry0"] = tuple(x[idx] for x in batch["carry0"])
        return mb

    def minibatch_step(carry, idx):
        params, opt_state, lr, key = carry
        mb = take_envs(idx)
        (loss, (pl, vl, kl)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params, mb)
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
        perm = jax.random.permutation(sub, B)
        idxs = perm[: mb_envs * cfg.num_mini_batches].reshape(
            cfg.num_mini_batches, mb_envs
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
    return (TrainState(params=params, opt_state=opt_state, lr=lr, key=key),
            metrics)


def make_learn_iteration_recurrent(env, model, cfg: PPOConfig) -> Callable:
    """One fused recurrent (rollout -> GAE -> BPTT update) iteration."""

    @jax.jit
    def learn_iteration(train_state: TrainState, env_state, carry):
        train_state, env_state, carry, batch, roll_metrics = (
            rollout_recurrent(env, model, train_state, env_state, carry, cfg)
        )
        train_state, up_metrics = ppo_update_recurrent(
            model, train_state, batch, cfg
        )
        return train_state, env_state, carry, {**roll_metrics, **up_metrics}

    return learn_iteration
