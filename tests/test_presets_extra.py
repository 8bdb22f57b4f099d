"""Tests for the remaining reference task registrations (ref
legged_gym/envs/__init__.py:53-62): hopper velocity (`hopper_flat`),
anymal_b, anymal_c rough variants, adam."""
import jax
import jax.numpy as jnp
import pytest

from legged_gym_dev_tpu.envs import task_registry


def _rollout(env, n_steps=3, zero_action=None):
    state, obs = jax.jit(env.reset)(jax.random.PRNGKey(0))
    B = env.num_envs
    a = (jnp.tile(jnp.asarray(zero_action), (B, 1))
         if zero_action is not None else jnp.zeros((B, env.num_actions)))
    step = jax.jit(env.step)
    for _ in range(n_steps):
        state, tr = step(state, a)
    return obs, tr


def test_hopper_velocity_env():
    env = task_registry.make_env("hopper_velocity", num_envs=4)
    # ref flat/hopper_config.py env.num_observations = 21.
    assert env.num_obs == 21
    assert env.num_actions == 4
    obs, tr = _rollout(env, zero_action=[1.0, 0.0, 0.0, 0.0])
    assert obs.shape == (4, 21)
    assert bool(jnp.all(jnp.isfinite(tr.obs)))
    assert bool(jnp.all(jnp.isfinite(tr.reward)))
    # Tracking terms must be among the episode metrics.
    assert "rew_tracking_lin_vel" in tr.info["episode"]


def test_hopper_velocity_commands_resample_on_reset():
    env = task_registry.make_env("hopper_velocity", num_envs=64)
    state, _ = jax.jit(env.reset)(jax.random.PRNGKey(1))
    cmd = state.commands
    # Within configured ranges (ref flat/hopper_config.py commands.ranges).
    assert bool(jnp.all(jnp.abs(cmd[:, :2]) <= 0.35 + 1e-6))
    assert bool(jnp.all(jnp.abs(cmd[:, 2]) <= 1.0 + 1e-6))
    # Small planar commands snapped to exactly zero (ref hopper.py:446).
    norms = jnp.linalg.norm(cmd[:, :2], axis=-1)
    assert bool(jnp.all((norms > 0.05) | (norms == 0.0)))
    # Not all commands identical (they are actually sampled).
    assert float(jnp.std(cmd[:, 0])) > 0.0


def test_anymal_b_velocity_env():
    env = task_registry.make_env("anymal_b_velocity", num_envs=2)
    # Same observation layout as anymal_c (ref anymal_b_config.py inherits
    # AnymalCRoughCfg): 48 proprioceptive dims on the flat setup here.
    assert env.num_actions == 12
    obs, tr = _rollout(env)
    assert bool(jnp.all(jnp.isfinite(tr.obs)))


@pytest.mark.slow
def test_anymal_c_rough_env_heights():
    env = task_registry.make_env("anymal_c_rough", num_envs=2,
                                 terrain_rows=2, terrain_cols=2)
    # ref anymal_c_rough_config: 235 = 48 proprio + 187 height scan.
    assert env.num_obs == 235
    obs, tr = _rollout(env, n_steps=2)
    assert bool(jnp.all(jnp.isfinite(tr.obs)))


@pytest.mark.slow
def test_anymal_c_rough_trajectory_env():
    env = task_registry.make_env("anymal_c_rough_trajectory", num_envs=2,
                                 terrain_rows=2, terrain_cols=2)
    # 48 proprio - 3 commands + 20 trajectory window + 187 heights = 252.
    assert env.num_obs == 252
    obs, tr = _rollout(env, n_steps=2)
    assert bool(jnp.all(jnp.isfinite(tr.obs)))
    assert "rew_tracking_rom" in tr.info["episode"]


def test_hopper_single_int_curriculum():
    """The 8-stage schedule the fork trains with
    (ref configs/rl/hopper_single_int.yaml:67-98)."""
    from legged_gym_dev_tpu.envs.hopper_trajectory import CurriculumTables

    cur = CurriculumTables.hopper_single_int()
    assert cur.enabled and len(cur.steps) == 7
    assert cur.push_magnitude.shape == (8,)

    env = task_registry.make_env("hopper_trajectory", num_envs=2,
                                 curriculum="single_int")
    state, _ = jax.jit(env.reset)(jax.random.PRNGKey(0))
    # Stage advance is driven by the global step counter.
    s0 = state.replace(common_step=jnp.asarray(0, jnp.int32))
    s_late = state.replace(common_step=jnp.asarray(17501, jnp.int32))
    a = jnp.tile(jnp.asarray([1.0, 0.0, 0.0, 0.0]), (2, 1))
    step = jax.jit(env.step)
    s1, _ = step(s0, a)
    s2, _ = step(s_late, a)
    assert int(s1.curriculum_stage) == 0
    assert int(s2.curriculum_stage) == 7
    # Curriculum-scaled generator: stage 0 ROM velocity bound is 0.5x
    # nominal, sinusoid band 100x lower.
    g0 = env._traj_gen_cur(s1)
    g7 = env._traj_gen_cur(s2)
    assert float(g0.rom.v_max[0]) == pytest.approx(
        0.5 * float(env.rom.v_max[0]))
    assert float(g0.freq_low) == pytest.approx(0.01 * float(
        env.traj_gen.freq_low))
    assert float(g7.freq_low) == pytest.approx(float(env.traj_gen.freq_low))


def test_friction_and_mass_domain_randomization():
    """Friction buckets + base payload mass (ref legged_robot.py
    _process_rigid_shape_props / _process_rigid_body_props)."""
    env = task_registry.make_env(
        "a1_velocity", num_envs=32,
        randomize_base_mass=True, added_mass_range=(-1.0, 1.0))
    state, _ = jax.jit(env.reset)(jax.random.PRNGKey(0))
    # Per-env friction in range with at most num_friction_buckets values.
    fr = state.friction
    assert fr.shape == (32,)
    assert bool(jnp.all((fr >= 0.5) & (fr <= 1.25)))
    assert float(jnp.std(fr)) > 0.0
    dm = state.base_mass
    assert bool(jnp.all(jnp.abs(dm) <= 1.0)) and float(jnp.std(dm)) > 0.0
    # The DR'd sim carries them.
    sim = env._dr_sim(state)
    assert sim.contact.friction.shape == (32, 1, 1)
    assert sim.base_mass_delta is dm
    # Payload mass shifts M's base-translation diagonal exactly.
    from legged_gym_dev_tpu.sim.kinematics import mass_matrix

    M0 = mass_matrix(env.sim.model, state.robot)
    M1 = mass_matrix(env.sim.model, state.robot, base_mass_delta=dm)
    assert bool(jnp.allclose(M1[:, 0, 0] - M0[:, 0, 0], dm, atol=1e-5))
    # Stepping under DR stays finite.
    a = jnp.zeros((32, env.num_actions))
    state, tr = jax.jit(env.step)(state, a)
    assert bool(jnp.all(jnp.isfinite(tr.obs)))


def test_contact_property_randomization():
    """Rigid-shape restitution/compliance analog: per-env contact
    stiffness/damping multipliers (ref domain_rand.rigid_shape_properties)."""
    env = task_registry.make_env("a1_velocity", num_envs=8,
                                 randomize_contact=True)
    state, _ = jax.jit(env.reset)(jax.random.PRNGKey(0))
    cm = state.contact_mult
    assert cm.shape == (8, 2)
    assert bool(jnp.all((cm >= 0.7) & (cm <= 1.3)))
    assert float(jnp.std(cm)) > 0.0
    sim = env._dr_sim(state)
    assert sim.contact.stiffness.shape == (8, 1)
    a = jnp.zeros((8, env.num_actions))
    state, tr = jax.jit(env.step)(state, a)
    assert bool(jnp.all(jnp.isfinite(tr.obs)))


def test_domain_randomization_off_is_nominal():
    env = task_registry.make_env("a1_velocity", num_envs=4,
                                 randomize_friction=False)
    state, _ = jax.jit(env.reset)(jax.random.PRNGKey(0))
    assert bool(jnp.all(state.friction
                        == env.sim.contact.friction))
    assert bool(jnp.all(state.base_mass == 0.0))
    sim = env._dr_sim(state)
    assert sim.base_mass_delta is None
    assert sim.contact.friction.ndim == 0


def test_trajectory_env_alternate_roms():
    """Config-selected ROM class (ref legged_robot_trajectory.py:90-123
    globals()[rom_cfg.cls]): the trajectory task runs on any of the six
    ROMs with per-ROM tracking weights (ref rom_dynamics
    get_weighting_vector)."""
    from legged_gym_dev_tpu.envs.presets import (
        A1_URDF,
        RewardWeighting,
        make_trajectory_env,
    )

    env = make_trajectory_env(
        A1_URDF, num_envs=2, rom_cls="DoubleInt2D",
        reward_weighting=RewardWeighting(position=1.0, velocity=0.5))
    assert env.rom.n == 4
    # DoubleInt2D weighting = [pos, pos, vel, vel] (ref :257-260).
    assert list(jnp.round(env.reward_weighting, 3)) == [1.0, 1.0, 0.5, 0.5]
    # 48 - 3 commands + 4*10 window = 85.
    assert env.num_obs == 85
    state, obs = jax.jit(env.reset)(jax.random.PRNGKey(0))
    state, tr = jax.jit(env.step)(state, jnp.zeros((2, 12)))
    assert bool(jnp.all(jnp.isfinite(tr.obs)))


def test_adam_requires_urdf():
    # The reference checkout ships no adam URDF; the preset must say so.
    with pytest.raises(FileNotFoundError):
        task_registry.make_env("adam_velocity", num_envs=1)
