"""Recurrent PPO (ActorCriticRecurrent parity): replay consistency,
hidden-reset semantics, and learning signal."""
import numpy as np

import jax
import jax.numpy as jnp
import pytest

from legged_gym_dev_tpu.rl import PPOConfig
from legged_gym_dev_tpu.rl.networks import ActorCriticRecurrent
from legged_gym_dev_tpu.rl.ppo_recurrent import (
    init_train_state_recurrent,
    make_learn_iteration_recurrent,
    rollout_recurrent,
)

from tests.test_rl import make_env


@pytest.fixture(autouse=True, scope="module")
def _free_compile_memory():
    # The BPTT-through-physics compiles here spike XLA host memory on top
    # of the executables accumulated by earlier tests on the same xdist
    # worker; under ``-n 2`` that combination has OOM-killed a worker
    # (green standalone). Dropping the accumulated cache before and after
    # this module keeps the peak bounded.
    jax.clear_caches()
    yield
    jax.clear_caches()


def _setup(num_envs=32, hidden=32):
    env = make_env(num_envs)
    model = ActorCriticRecurrent(
        num_actions=2, rnn_hidden_size=hidden,
        actor_hidden_dims=(32,), critic_hidden_dims=(32,),
    )
    cfg = PPOConfig(num_steps=8, num_mini_batches=2, num_learning_epochs=2)
    ts = init_train_state_recurrent(model, env.num_obs, cfg,
                                    jax.random.PRNGKey(0))
    es, _ = env.reset(jax.random.PRNGKey(1))
    return env, model, cfg, ts, es


def test_mask_carry_zeroes_done_envs():
    c = (jnp.ones((4, 8)), 2.0 * jnp.ones((4, 8)))
    done = jnp.asarray([True, False, True, False])
    c2 = ActorCriticRecurrent.mask_carry(c, done)
    assert np.all(np.asarray(c2[0][0]) == 0) and np.all(
        np.asarray(c2[0][1]) == 1)
    assert np.all(np.asarray(c2[1][2]) == 0) and np.all(
        np.asarray(c2[1][3]) == 2)


def test_replay_reproduces_rollout_distributions():
    """The update's masked window replay (same params) must reproduce the
    action means/values recorded during the rollout — the BPTT replay is
    only correct if the recomputed hidden states match."""
    env, model, cfg, ts, es = _setup()
    carry = model.initial_carry(env.num_envs)
    ts2, es2, carry2, batch, _ = jax.jit(
        lambda t, e, c: rollout_recurrent(env, model, t, e, c, cfg)
    )(ts, es, carry)

    def step(c, inp):
        obs, done = inp
        mean, log_std, value, c = model.apply(ts.params, obs, c)
        c = ActorCriticRecurrent.mask_carry(c, done)
        return c, (mean, value)

    _, (means, values) = jax.lax.scan(
        step, batch["carry0"], (batch["obs"], batch["dones"])
    )
    np.testing.assert_allclose(np.asarray(means), np.asarray(batch["means"]),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(values),
                               np.asarray(batch["values"]), atol=1e-5)


def test_recurrent_ppo_improves_reward():
    env = make_env(128)
    model = ActorCriticRecurrent(
        num_actions=2, rnn_hidden_size=64,
        actor_hidden_dims=(64,), critic_hidden_dims=(64,),
    )
    # Short BPTT windows (8 steps) carry too little credit signal on this
    # task; the reference window length (24) learns reliably.
    cfg = PPOConfig(num_steps=24, num_mini_batches=2, num_learning_epochs=3)
    ts = init_train_state_recurrent(model, env.num_obs, cfg,
                                    jax.random.PRNGKey(0))
    es, _ = env.reset(jax.random.PRNGKey(1))
    learn = make_learn_iteration_recurrent(env, model, cfg)
    carry = model.initial_carry(env.num_envs)
    rewards = []
    for _ in range(40):
        ts, es, carry, m = learn(ts, es, carry)
        rewards.append(float(np.asarray(m["mean_reward"])))
    r0 = np.mean(rewards[:5])
    r1 = np.mean(rewards[-5:])
    assert np.isfinite(rewards).all()
    assert r1 > r0 + 0.03, (r0, r1)


def test_runner_supports_recurrent_model(tmp_path):
    from legged_gym_dev_tpu.rl import OnPolicyRunner

    env = make_env(16)
    runner = OnPolicyRunner(
        env,
        model=ActorCriticRecurrent(num_actions=2, rnn_hidden_size=16,
                                   actor_hidden_dims=(16,),
                                   critic_hidden_dims=(16,)),
        cfg=PPOConfig(num_steps=4, num_mini_batches=2,
                      num_learning_epochs=1),
        log_dir=str(tmp_path), seed=0,
    )
    hist = runner.learn(3, save_interval=1)
    assert len(hist) == 3 and np.isfinite(hist[-1]["loss"])
    runner.load("latest")
    policy = runner.get_inference_policy()
    a1 = np.asarray(policy(jnp.ones((4, env.num_obs))))
    a2 = np.asarray(policy(jnp.ones((4, env.num_obs))))
    assert a1.shape == (4, 2)
    # hidden state advances between calls; reset restores the first output
    assert np.abs(a1 - a2).max() > 1e-7
    policy.reset()
    a3 = np.asarray(policy(jnp.ones((4, env.num_obs))))
    np.testing.assert_allclose(a3, a1, atol=1e-6)
