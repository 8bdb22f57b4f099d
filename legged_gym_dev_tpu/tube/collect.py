"""ROM-tracking data collection: fully-jitted rollout recorder.

Re-design of the reference collectors
(ref: deep_tube_learning/data_collection_trajectory.py:29-195 and
simple_data_collection.py): rolls a policy in a tracking env and records, at
every ROM tick, the planned ROM state ``z``, the achieved projection
``pz_x``, the applied ROM input ``v`` and termination flags.

The reference's data-dependent inner loop ("step env until the ROM tick
advances", ref :122-138) becomes a static inner scan of
``round(rom.dt / dt_loop)`` env steps — with the uniform env clock the ROM
tick cadence is deterministic, so the masked while-loop collapses to a fixed
shape (SURVEY.md §7 hard part 4). Terminated envs get their planned state
snapped to the projection so the recorded tracking error is zero
(ref :148).
"""
from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..sim.rom_sim import RomSim, RomSimState
from .datasets import RolloutData


def collect_rom_tracking(
    sim: RomSim,
    policy: Callable[[jax.Array], jax.Array],
    key: jax.Array,
    episode_length_s: float,
) -> Tuple[RolloutData, RomSimState]:
    """Collect one epoch of ROM-tracking data from every env in ``sim``.

    Returns host ``RolloutData`` with shapes (B, T+1, n) / (B, T, m) / (B, T)
    where T = episode_length_s / rom.dt.
    """
    rom = sim.rom
    T = int(round(float(episode_length_s) / float(rom.dt)))
    steps_per_rom = max(1, int(round(float(rom.dt) / float(sim.traj_gen.dt_loop))))

    state = sim.reset(key)

    @jax.jit
    def rollout(state):
        def rom_tick(state, _):
            def env_step(s, _):
                obs = sim.get_observations(s)
                actions = policy(obs)
                return sim.step(s, actions), None

            state, _ = jax.lax.scan(env_step, state, None, length=steps_per_rom)
            proj = rom.proj_z(state.root_states)
            z_t = sim.traj_gen.get_trajectory(state.traj_gen)[:, 0, :]
            v_t = state.traj_gen.v
            done_t = jnp.zeros((sim.num_envs,), bool)  # RomSim never terminates
            # Terminated envs: zero recorded tracking error (ref :148).
            z_t = jnp.where(done_t[:, None], proj, z_t)
            return state, (z_t, proj, v_t, done_t)

        z0 = sim.traj_gen.get_trajectory(state.traj_gen)[:, 0, :]
        pz0 = rom.proj_z(state.root_states)
        state2, (z_t, pz_t, v_t, done_t) = jax.lax.scan(
            rom_tick, state, None, length=T
        )
        return state2, z0, pz0, z_t, pz_t, v_t, done_t

    state2, z0, pz0, z_t, pz_t, v_t, done_t = rollout(state)

    # Time-major -> episode-major, prepend t=0 row.
    z = np.concatenate(
        [np.asarray(z0)[:, None], np.asarray(z_t).transpose(1, 0, 2)], axis=1
    )
    pz_x = np.concatenate(
        [np.asarray(pz0)[:, None], np.asarray(pz_t).transpose(1, 0, 2)], axis=1
    )
    v = np.asarray(v_t).transpose(1, 0, 2)
    done = np.asarray(done_t).transpose(1, 0)
    return RolloutData(z=z, v=v, pz_x=pz_x, done=done), state2


def collect_epochs(sim, policy, key, episode_length_s, epochs: int) -> RolloutData:
    """Multiple epochs concatenated along the episode axis (ref :102-188)."""
    parts = []
    for e in range(epochs):
        data, _ = collect_rom_tracking(
            sim, policy, jax.random.fold_in(key, e), episode_length_s
        )
        parts.append(data)
    return RolloutData.concatenate(parts)


def collect_velocity_tracking(
    env,
    policy: Callable[[jax.Array], jax.Array],
    traj_gen,
    key: jax.Array,
    episode_length_s: float,
    Kp: float = 1.0,
) -> RolloutData:
    """ROM tracking through a velocity-command policy (legacy pipeline,
    ref: deep_tube_learning/data_collection_velocity.py:21-146).

    An external ROM trajectory generator produces the plan; a P controller
    on the projection error writes [vx, vy] commands into the env's command
    slots (the reference patches obs slots 9-11 directly; here we set
    ``state.commands`` and rebuild the observation so the policy sees the
    fresh command with zero latency). Commands are rotated into the base
    yaw frame — the env and the trained policy treat commands as
    body-frame (the reference applies the same yaw2rot, ref
    data_collection_velocity.py err_local/des_vel_local). Records
    (z, pz_x, v, done) at ROM ticks like the trajectory collector.
    """
    from ..core.maths import quat_to_yaw, yaw2rot
    rom = traj_gen.rom
    T = int(round(float(episode_length_s) / float(rom.dt)))
    steps_per_rom = max(1, int(round(float(rom.dt) / env.dt)))
    B = env.num_envs

    state, obs = env.reset(key)
    tg = traj_gen.init_state(jax.random.fold_in(key, 1), B)
    tg = traj_gen.reset(tg, jnp.ones((B,), bool),
                        rom.proj_z(state.robot.root_states))

    @jax.jit
    def rom_tick(carry, _):
        state, tg, obs = carry

        def env_step(carry2, _):
            state, tg, obs = carry2
            pz_x = rom.proj_z(state.robot.root_states)
            z_des = traj_gen.get_trajectory(tg)[:, 0, :2]
            v_des = tg.v[:, :2]
            cmd_world = Kp * (z_des - pz_x[:, :2]) + v_des
            yaw = quat_to_yaw(state.robot.base_quat)
            cmd_body = jnp.clip(
                jnp.einsum("bij,bj->bi", yaw2rot(yaw), cmd_world), -1.0, 1.0
            )
            state = state.replace(
                commands=state.commands.at[:, :2].set(cmd_body)
                .at[:, 2].set(0.0)
            )
            # Rebuild obs so the policy acts on the freshly injected command
            # (the reference patches obs in place right before policy()).
            actions = policy(env._obs(state))
            state, tr = env.step(state, actions)
            tg = traj_gen.step(tg)
            return (state, tg, tr.obs), tr.done

        (state, tg, obs), dones = jax.lax.scan(
            env_step, (state, tg, obs), None, length=steps_per_rom
        )
        pz_x = rom.proj_z(state.robot.root_states)
        z_t = traj_gen.get_trajectory(tg)[:, 0, :]
        done_t = jnp.any(dones, axis=0)
        z_t = jnp.where(done_t[:, None], pz_x, z_t)
        return (state, tg, obs), (z_t, pz_x, tg.v, done_t)

    pz0 = rom.proj_z(state.robot.root_states)
    z0 = traj_gen.get_trajectory(tg)[:, 0, :]
    (state, tg, obs), (z_t, pz_t, v_t, done_t) = jax.lax.scan(
        rom_tick, (state, tg, obs), None, length=T
    )
    z = np.concatenate(
        [np.asarray(z0)[:, None], np.asarray(z_t).transpose(1, 0, 2)], axis=1
    )
    pz_x = np.concatenate(
        [np.asarray(pz0)[:, None], np.asarray(pz_t).transpose(1, 0, 2)],
        axis=1,
    )
    return RolloutData(
        z=z, v=np.asarray(v_t).transpose(1, 0, 2), pz_x=pz_x,
        done=np.asarray(done_t).transpose(1, 0),
    )


def collect_tracking(
    env,
    policy: Callable[[jax.Array], jax.Array],
    key: jax.Array,
    episode_length_s: float,
    raibert_obs: bool = False,
) -> RolloutData:
    """Collect ROM-tracking data from any rigid-body trajectory env
    (hopper, anymal_c_trajectory, a1_trajectory — anything exposing
    rom/traj_gen/trajectory and robot.root_states).

    The reference collects from the Isaac hopper with either the trained RL
    policy or the Raibert heuristic (ref data_collection_trajectory.py:
    56-149); ``raibert_obs=True`` feeds the policy the Raibert observation
    [pos_err(2), vel(2), des_vel(2), quat_xyzw(4)] built from env internals
    (ref :125-136) instead of the policy observation.
    """
    rom = env.rom
    T = int(round(float(episode_length_s) / float(rom.dt)))
    steps_per_rom = max(1, int(round(float(rom.dt) / env.dt)))
    B = env.num_envs

    state, obs = env.reset(key)

    def build_raibert_obs(state):
        pz_x = rom.proj_z(state.robot.root_states)
        des_pos = state.trajectory[:, -1, :]
        des_vel = env.traj_gen.get_v_trajectory(state.traj_gen)[:, -1, :2]
        return jnp.concatenate([
            des_pos - pz_x, state.robot.v[:, :2], des_vel,
            state.robot.base_quat,
        ], axis=-1)

    @jax.jit
    def rom_tick(carry, _):
        state, obs = carry

        def env_step(carry2, _):
            state, obs = carry2
            a_in = build_raibert_obs(state) if raibert_obs else obs
            actions = policy(a_in)
            state, tr = env.step(state, actions)
            return (state, tr.obs), tr.done

        (state, obs), dones = jax.lax.scan(
            env_step, (state, obs), None, length=steps_per_rom
        )
        pz_x = rom.proj_z(state.robot.root_states)
        z_t = state.trajectory[:, 0, :]
        done_t = jnp.any(dones, axis=0)
        z_t = jnp.where(done_t[:, None], pz_x, z_t)   # zero recorded error
        v_t = state.traj_gen.v
        return (state, obs), (z_t, pz_x, v_t, done_t)

    pz0 = rom.proj_z(state.robot.root_states)
    z0 = state.trajectory[:, 0, :]
    (state, obs), (z_t, pz_t, v_t, done_t) = jax.lax.scan(
        rom_tick, (state, obs), None, length=T
    )
    z = np.concatenate(
        [np.asarray(z0)[:, None], np.asarray(z_t).transpose(1, 0, 2)], axis=1
    )
    pz_x = np.concatenate(
        [np.asarray(pz0)[:, None], np.asarray(pz_t).transpose(1, 0, 2)],
        axis=1,
    )
    return RolloutData(
        z=z, v=np.asarray(v_t).transpose(1, 0, 2), pz_x=pz_x,
        done=np.asarray(done_t).transpose(1, 0),
    )


# Back-compat name: the collector was written for the hopper first.
collect_hopper_tracking = collect_tracking
