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
