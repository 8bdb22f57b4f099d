"""ROM trajectory-tracking RL environment (physics-free robot model).

The trajectory-tracking task of the reference
(ref: legged_gym/envs/base/legged_robot_trajectory.py) instantiated on the
ROM-only simulator: a simple model (e.g. double integrator) must track a
rolling ROM trajectory window. This is the framework's first end-to-end
trainable env — the same task layer (obs layout, reward terms, resets,
episode bookkeeping) later hosts the rigid-body robots.

Semantics carried over from the reference:
- Observations include the trajectory window *relative to the robot's
  projected position* (ref: legged_robot_trajectory.py:274-295).
- ``tracking_rom`` reward: exp of weighted squared projection error
  (ref :1060-1069); ``differential_error``: slope-asymmetric error delta
  (ref :1100-1110); action-rate penalty (ref legged_robot.py:958-960).
- Time-limit termination surfaces as ``time_outs`` in extras
  (ref: legged_robot.py:174-187); per-term episode sums are normalized by
  episode seconds on reset.
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from ..sim.rom_sim import RomSim, RomSimState
from .base import Transition


@struct.dataclass
class RomTrackingEnvState:
    key: jax.Array
    sim: RomSimState
    prev_action: jax.Array     # (B, act_dim)
    prev_error: jax.Array      # (B, rom.n) squared tracking error, previous
    episode_step: jax.Array    # (B,)
    episode_sums: Dict[str, jax.Array]  # per-term reward accumulators (B,)


@struct.dataclass
class RomTrackingEnv:
    sim: RomSim
    reward_weighting: jax.Array     # (rom.n,)
    tracking_sigma: jax.Array       # ()
    reward_scales: tuple = struct.field(
        pytree_node=False,
        default=(("tracking_rom", 1.0), ("differential_error", 0.0),
                 ("action_rate", -0.01)),
    )
    episode_length_s: float = struct.field(pytree_node=False, default=20.0)
    only_positive_rewards: bool = struct.field(pytree_node=False, default=False)

    # ---- sizes -----------------------------------------------------------
    @property
    def num_envs(self) -> int:
        return self.sim.num_envs

    @property
    def num_actions(self) -> int:
        return self.sim.model.m

    @property
    def num_obs(self) -> int:
        return (self.sim.model.n + self.sim.traj_gen.N * self.sim.rom.n
                + self.num_actions)

    @property
    def max_episode_length(self) -> int:
        return int(round(self.episode_length_s
                         / float(self.sim.traj_gen.dt_loop)))

    @property
    def dt(self) -> float:
        return float(self.sim.traj_gen.dt_loop)

    # ---- reward terms (explicit registry; ref reflection scan) -----------
    def _reward_tracking_rom(self, state: RomTrackingEnvState) -> jax.Array:
        """Ref: legged_robot_trajectory.py:1060-1069."""
        desired = state.sim.trajectory[:, 0, :]
        pz_x = self.sim.rom.proj_z(state.sim.root_states)
        err = jnp.square(pz_x - desired) @ self.reward_weighting
        return jnp.exp(-err / self.tracking_sigma)

    def _reward_differential_error(self, state) -> jax.Array:
        """Ref: legged_robot_trajectory.py:1100-1110 (slopes 1/-1 default)."""
        desired = state.sim.trajectory[:, 0, :]
        pz_x = self.sim.rom.proj_z(state.sim.root_states)
        sq = jnp.square(pz_x - desired)
        err = jnp.linalg.norm(sq, axis=-1)
        diff = err - jnp.linalg.norm(state.prev_error, axis=-1)
        return diff  # scale in cfg sets the sign/slope

    def _reward_action_rate(self, state, action) -> jax.Array:
        return jnp.sum(jnp.square(action - state.prev_action), axis=-1)

    # ---- API -------------------------------------------------------------
    def _obs(self, state: RomTrackingEnvState) -> jax.Array:
        """Trajectory window relative to projected position (ref :274-295)."""
        pz_x = self.sim.rom.proj_z(state.sim.root_states)
        rel_traj = state.sim.trajectory - pz_x[:, None, :]
        B = self.num_envs
        return jnp.concatenate(
            [
                state.sim.root_states,
                rel_traj.reshape(B, -1),
                state.prev_action,
            ],
            axis=-1,
        )

    def _zero_sums(self) -> Dict[str, jax.Array]:
        B = self.num_envs
        return {name: jnp.zeros((B,)) for name, _ in self.reward_scales}

    def reset(self, key: jax.Array) -> Tuple[RomTrackingEnvState, jax.Array]:
        B = self.num_envs
        sim_state = self.sim.reset(key)
        state = RomTrackingEnvState(
            key=jax.random.fold_in(key, 17),
            sim=sim_state,
            prev_action=jnp.zeros((B, self.num_actions)),
            prev_error=jnp.zeros((B, self.sim.rom.n)),
            episode_step=jnp.zeros((B,), jnp.int32),
            episode_sums=self._zero_sums(),
        )
        return state, self._obs(state)

    def step(self, state: RomTrackingEnvState,
             actions: jax.Array) -> Tuple[RomTrackingEnvState, Transition]:
        B = self.num_envs
        actions = self.sim.model.clip_v_z(state.sim.root_states, actions)
        sim_state = self.sim.step(state.sim, actions)
        mid = state.replace(sim=sim_state)

        # Rewards (dt-scaled like the reference, ref legged_robot.py:612-617).
        rews = {}
        for name, scale in self.reward_scales:
            if scale == 0.0:
                continue
            if name == "tracking_rom":
                r = self._reward_tracking_rom(mid)
            elif name == "differential_error":
                r = self._reward_differential_error(mid)
            elif name == "action_rate":
                r = self._reward_action_rate(mid, actions)
            else:
                raise ValueError(f"unknown reward term {name}")
            rews[name] = r * (scale * self.dt)
        total = sum(rews.values())
        if self.only_positive_rewards:
            total = jnp.clip(total, 0.0)

        episode_sums = {
            k: state.episode_sums[k] + rews.get(k, 0.0)
            for k in state.episode_sums
        }

        # Termination: time limit only on this env (no falls to detect).
        episode_step = state.episode_step + 1
        done = episode_step >= self.max_episode_length
        time_outs = done

        # Episode metrics: per-term sum / episode seconds over reset envs
        # (ref: legged_robot.py:174-187).
        episode_info = {
            # Per-term reward sums of envs that reset this step,
            # normalized by episode seconds; the consumer divides by
            # the reset count (averaging over steps would deflate by
            # the no-reset steps).
            "rew_" + k: jnp.sum(jnp.where(done, v, 0.0))
            / self.episode_length_s
            for k, v in episode_sums.items()
        }

        # Masked auto-reset.
        key, sub = jax.random.split(state.key)
        sim_state = self.sim.reset_idx(sim_state.replace(key=sub), done)
        desired = sim_state.trajectory[:, 0, :]
        pz_x = self.sim.rom.proj_z(sim_state.root_states)

        new_state = RomTrackingEnvState(
            key=key,
            sim=sim_state,
            prev_action=jnp.where(done[:, None], 0.0, actions),
            prev_error=jnp.square(pz_x - desired),
            episode_step=jnp.where(done, 0, episode_step),
            episode_sums={
                k: jnp.where(done, 0.0, v) for k, v in episode_sums.items()
            },
        )
        obs = self._obs(new_state)
        info = {"episode": episode_info, "time_outs": time_outs,
                "n_resets": done.sum()}
        return new_state, Transition(
            obs=obs, privileged_obs=None, reward=total, done=done, info=info
        )
