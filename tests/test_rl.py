"""PPO + env layer tests: learning signal, GAE correctness, registry."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from legged_gym_dev_tpu.core import DoubleInt2D, SingleInt2D
from legged_gym_dev_tpu.envs import RomTrackingEnv, TaskRegistry
from legged_gym_dev_tpu.rl import ActorCritic, OnPolicyRunner, PPOConfig
from legged_gym_dev_tpu.rl.ppo import compute_gae
from legged_gym_dev_tpu.sim import RomSim
from legged_gym_dev_tpu.trajgen import (
    TrajectoryGenerator,
    UniformSampleHoldDT,
    UniformWeightSampler,
)


def make_env(num_envs=64, episode_length_s=4.0):
    rom = SingleInt2D.create(0.1, [-10, -10], [10, 10], [-1, -1], [1, 1])
    model = DoubleInt2D.create(
        0.05, [-20, -20, -2, -2], [20, 20, 2, 2], [-4, -4], [4, 4]
    )
    gen = TrajectoryGenerator.create(
        rom, UniformSampleHoldDT.create(0.5, 2.0), UniformWeightSampler(),
        dt_loop=0.05, N=4, dN=1, prob_stationary=0.0,
    )
    sim = RomSim.create(
        model, gen, num_envs=num_envs,
        init_noise_lower=[-0.5, -0.5, -0.1, -0.1],
        init_noise_upper=[0.5, 0.5, 0.1, 0.1],
        max_rom_distance=[0.3, 0.3],
    )
    return RomTrackingEnv(
        sim=sim, reward_weighting=jnp.asarray([1.0, 1.0]),
        tracking_sigma=jnp.asarray(0.25),
        episode_length_s=episode_length_s,
    )


def test_env_step_contract():
    env = make_env(8)
    state, obs = env.reset(jax.random.PRNGKey(0))
    assert obs.shape == (8, env.num_obs)
    state, tr = env.step(state, jnp.zeros((8, 2)))
    assert tr.obs.shape == (8, env.num_obs)
    assert tr.reward.shape == (8,)
    assert tr.done.shape == (8,)
    assert "time_outs" in tr.info and "episode" in tr.info
    assert np.all(np.isfinite(np.asarray(tr.obs)))


def test_env_time_limit_resets():
    env = make_env(4, episode_length_s=0.25)  # 5 steps
    state, _ = env.reset(jax.random.PRNGKey(0))
    dones = []
    for _ in range(6):
        state, tr = env.step(state, jnp.zeros((4, 2)))
        dones.append(np.asarray(tr.done))
    assert np.any(np.stack(dones))
    # After reset, episode steps restart (no immediate second done).
    assert np.all(np.asarray(state.episode_step) < 5)


def test_gae_matches_reference_recursion():
    T, B = 5, 2
    rng = np.random.default_rng(0)
    rewards = rng.normal(size=(T, B)).astype(np.float32)
    values = rng.normal(size=(T, B)).astype(np.float32)
    dones = np.zeros((T, B), bool)
    dones[2, 0] = True
    last_value = rng.normal(size=(B,)).astype(np.float32)
    gamma, lam = 0.99, 0.95
    adv, ret = compute_gae(
        jnp.asarray(rewards), jnp.asarray(values), jnp.asarray(dones),
        jnp.asarray(last_value), gamma, lam,
    )
    # Reference backward recursion (rsl_rl storage.compute_returns).
    adv_ref = np.zeros((T, B), np.float32)
    gae = np.zeros(B, np.float32)
    next_v = last_value
    for t in reversed(range(T)):
        nonterm = 1.0 - dones[t].astype(np.float32)
        delta = rewards[t] + gamma * next_v * nonterm - values[t]
        gae = delta + gamma * lam * nonterm * gae
        adv_ref[t] = gae
        next_v = values[t]
    np.testing.assert_allclose(np.asarray(adv), adv_ref, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ret), adv_ref + values, atol=1e-5)


def test_ppo_improves_tracking_reward():
    env = make_env(128)
    runner = OnPolicyRunner(
        env,
        model=ActorCritic(num_actions=2, actor_hidden_dims=(64, 32),
                          critic_hidden_dims=(64, 32)),
        cfg=PPOConfig(), seed=0,
    )
    hist = runner.learn(25)
    r0 = np.mean([h["mean_reward"] for h in hist[:5]])
    r1 = np.mean([h["mean_reward"] for h in hist[-5:]])
    assert r1 > r0 * 1.2, (r0, r1)
    assert np.isfinite(hist[-1]["kl"])


def test_checkpoint_roundtrip(tmp_path):
    env = make_env(16)
    runner = OnPolicyRunner(env, cfg=PPOConfig(), log_dir=str(tmp_path),
                            seed=0)
    runner.learn(2, save_interval=1)
    params_before = jax.tree.leaves(runner.train_state.params)
    runner.load("latest")
    params_after = jax.tree.leaves(runner.train_state.params)
    for a, b in zip(params_before, params_after):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    policy = runner.get_inference_policy()
    acts = policy(jnp.zeros((4, env.num_obs)))
    assert acts.shape == (4, 2)


def test_task_registry():
    reg = TaskRegistry()
    reg.register("rom_tracking", lambda **kw: make_env(**kw))
    env = reg.make_env("rom_tracking", num_envs=8)
    assert env.num_envs == 8
    with pytest.raises(ValueError):
        reg.make_env("nope")


def test_best_stage_reset_semantics(tmp_path):
    """CheckpointManager best{stage} aliases: best resets when the
    curriculum stage changes (ref deep_tube_learning/utils.py:314-344)."""
    from legged_gym_dev_tpu.rl.runner import CheckpointManager

    mgr = CheckpointManager(str(tmp_path))
    p1 = {"w": jnp.asarray([1.0])}
    p2 = {"w": jnp.asarray([2.0])}
    p3 = {"w": jnp.asarray([3.0])}
    p4 = {"w": jnp.asarray([4.0])}
    mgr.save(p1, it=0, metric=5.0, stage=0)
    mgr.save(p2, it=1, metric=3.0, stage=0)    # worse: best0 keeps p1
    # Stage change: best RESETS — a much worse metric must still win.
    mgr.save(p3, it=2, metric=-10.0, stage=1)
    mgr.save(p4, it=3, metric=-20.0, stage=1)  # worse: best1 keeps p3
    mgr.wait_until_finished()
    assert mgr.best_stages() == [0, 1]
    tmpl = {"w": jnp.zeros(1)}
    np.testing.assert_allclose(np.asarray(mgr.load("best0", tmpl)["w"]), [1.0])
    np.testing.assert_allclose(np.asarray(mgr.load("best1", tmpl)["w"]), [3.0])


def test_best_stage_end_to_end(tmp_path):
    """Runner end-to-end: a curriculum_stage_fn produces per-stage best
    checkpoints that load back (the flagship's selection candidates)."""
    from legged_gym_dev_tpu.rl.runner import make_curriculum_stage_fn

    env = make_env(16)
    runner = OnPolicyRunner(env, cfg=PPOConfig(), log_dir=str(tmp_path),
                            seed=0)
    runner.learn(6, save_interval=1,
                 curriculum_stage_fn=lambda it: 0 if it < 3 else 1)
    assert runner.ckpt.best_stages() == [0, 1]
    for name in ("best0", "best1", "latest"):
        runner.load(name)
        policy = runner.get_inference_policy()
        assert policy(jnp.zeros((2, env.num_obs))).shape == (2, 2)

    # The env<->host stage mapping: thresholds in common_step units,
    # num_steps env steps per learn iteration (ref legged_robot.py:359-363).
    class Cur:
        steps = (24, 48)

    fn = make_curriculum_stage_fn(Cur(), steps_per_iter=24)
    assert [fn(i) for i in range(4)] == [1, 2, 2, 2]
    fn2 = make_curriculum_stage_fn(Cur(), steps_per_iter=8)
    assert [fn2(i) for i in range(8)] == [0, 0, 1, 1, 1, 2, 2, 2]
