"""Hopper velocity-command RL environment (the reference's `hopper_flat`).

TPU-native re-design of the reference's velocity-command hopper task (ref:
legged_gym/envs/hopper/hopper.py:41-458 + flat/hopper_config.py): the same
3-reaction-wheel + spring-foot hopper as the trajectory task, but driven by
resampled (vx, vy, wz) velocity commands instead of a rolling ROM window.

Faithful behaviors:
- Identical contact-gated hybrid torque controller, DR, and yaw-randomized
  resets as the trajectory variant (shared implementations).
- Observations (21): [z, quat, body lin vel, body ang vel, wheel vels,
  commands, normalized action quat] (ref hopper.py:239-259; commands get no
  noise, ref _get_noise_scale_vec:426).
- Commands resampled every `resampling_time` seconds within the config
  ranges; small planar commands snapped to zero (ref hopper.py:432-446,
  flat/hopper_config.py commands block: +-0.35 m/s, +-1 rad/s, 10 s).
- 6-dim pushes [vx vy vz wx wy wz] (ref flat/hopper_config.py
  domain_rand.max_push_vel).
- NOTE on reward scales: the reference checkout ships `hopper_flat` with
  every reward term commented out except `collision = 0` (ref
  flat/hopper_config.py rewards.scales — the task is vestigial there); the
  default scales here are that block's commented-out nominal values so the
  task actually trains.
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from ..core.maths import masked_update as _mwhere
from ..core.maths import quat_to_rotmat
from ..sim.contact import contact_forces
from ..sim.dynamics import RobotState, contact_kinematics
from ..sim.robot_sim import RobotSim
from .base import Transition
from .hopper_trajectory import HopperDR, HopperTrajectoryEnv

# ref flat/hopper_config.py rewards.scales (commented nominal values).
HOPPER_VELOCITY_REWARD_SCALES = (
    ("termination", -5.0),
    ("tracking_lin_vel", 1.0),
    ("tracking_ang_vel", 0.5),
    ("orientation", -1.0),
    ("action_rate", -0.1),
    ("torques", -0.00001),
    ("dof_acc", -2.5e-7),
    ("unit_quat", -0.1),
)


@struct.dataclass
class HopperVelEnvState:
    key: jax.Array
    robot: RobotState
    commands: jax.Array          # (B, 3) [vx, vy, wz]
    actions: jax.Array           # (B, 4) raw policy actions (quat wxyz)
    last_actions: jax.Array
    last_dof_vel: jax.Array      # (B, 4)
    torques: jax.Array           # (B, 4)
    time_until_next_push: jax.Array  # (B,) seconds
    episode_step: jax.Array      # (B,)
    episode_sums: Dict[str, jax.Array]
    dr: HopperDR
    common_step: jax.Array       # () int32


@struct.dataclass
class HopperVelocityEnv:
    sim: RobotSim

    # Controller params — field names shared with HopperTrajectoryEnv so
    # its controller/reset/DR implementations apply unchanged.
    p_gains: jax.Array
    d_gains: jax.Array
    kd_spindown: jax.Array
    spring_stiffness: jax.Array
    spring_damping: jax.Array
    spring_setpoint: jax.Array
    foot_pos_des: jax.Array
    rot_actuator: jax.Array
    torque_limits: jax.Array
    wheel_speed_limit: jax.Array
    ts_ratio: jax.Array
    obs_scales: jax.Array          # (21,)
    noise_vec: jax.Array           # (21,)
    # ref flat/hopper_config.py commands.ranges.
    command_ranges: jax.Array      # (3, 2) [[vx lo hi], [vy], [wz]]
    tracking_sigma: jax.Array      # ()
    max_push_vel: jax.Array        # (6,)
    reward_scales: tuple = struct.field(
        pytree_node=False, default=HOPPER_VELOCITY_REWARD_SCALES)
    control_type: str = struct.field(pytree_node=False,
                                     default="orientation_spindown")
    add_noise: bool = struct.field(pytree_node=False, default=True)
    domain_rand: bool = struct.field(pytree_node=False, default=True)
    episode_length_s: float = struct.field(pytree_node=False, default=20.0)
    resampling_time_s: float = struct.field(pytree_node=False, default=10.0)
    # Pushes SET the 6-dim base velocity on per-env random timers (ref
    # hopper.py:142-152, _push_robots:332-341).
    push_robots: bool = struct.field(pytree_node=False, default=True)
    time_between_pushes: tuple = struct.field(pytree_node=False,
                                              default=(0.5, 10.0))
    foot_sphere: int = struct.field(pytree_node=False, default=1)
    termination_spheres: tuple = struct.field(pytree_node=False,
                                              default=(0, 2, 3, 4))
    num_envs: int = struct.field(pytree_node=False, default=4096)
    # No curriculum on the flat velocity task (ref use_curriculum = False).
    curriculum: None = struct.field(pytree_node=False, default=None)

    # Shared hopper machinery (identical physics / controller / resets /
    # non-tracking reward terms).
    _compute_torques = HopperTrajectoryEnv._compute_torques
    _reset_robot = HopperTrajectoryEnv._reset_robot
    _resample_dr = HopperTrajectoryEnv._resample_dr
    _common_rewards = HopperTrajectoryEnv._common_rewards

    # ------------------------------------------------------------------
    @property
    def num_actions(self) -> int:
        return 4

    @property
    def num_obs(self) -> int:
        return 1 + 4 + 3 + 3 + 3 + 3 + 4

    @property
    def dt(self) -> float:
        return self.sim.dt * self.sim.decimation

    @property
    def max_episode_length(self) -> int:
        return int(round(self.episode_length_s / self.dt))

    # ---- commands (ref hopper.py:432-446) ------------------------------
    def _sample_commands(self, key: jax.Array) -> jax.Array:
        lo = self.command_ranges[:, 0]
        hi = self.command_ranges[:, 1]
        cmd = jax.random.uniform(key, (self.num_envs, 3),
                                 minval=lo, maxval=hi)
        keep = jnp.linalg.norm(cmd[:, :2], axis=-1) > 0.05
        return cmd.at[:, :2].multiply(keep[:, None].astype(cmd.dtype))

    # ---- observations (ref hopper.py:239-259) ---------------------------
    def _obs(self, state: HopperVelEnvState) -> jax.Array:
        robot = state.robot
        a = state.actions
        an = a / jnp.clip(jnp.linalg.norm(a, axis=-1, keepdims=True), 1e-8)
        an = jnp.where(an[:, :1] < 0, -an, an)
        R = quat_to_rotmat(robot.base_quat)
        lin_vel_body = jnp.einsum("bji,bj->bi", R, robot.v[:, :3])
        obs = jnp.concatenate([
            robot.base_pos[:, 2:3],
            robot.base_quat,
            lin_vel_body,
            robot.v[:, 3:6],
            robot.v[:, 7:10],
            state.commands,
            an,
        ], axis=-1)
        obs = obs * self.obs_scales[None, :]
        if self.add_noise:
            key = jax.random.fold_in(state.key, 3)
            obs = obs + (2.0 * jax.random.uniform(key, obs.shape) - 1.0) \
                * self.noise_vec[None, :]
        return obs

    # ---- reset -----------------------------------------------------------
    def reset(self, key: jax.Array) -> Tuple[HopperVelEnvState, jax.Array]:
        B = self.num_envs
        ones_dr = HopperDR(
            spring_k=jnp.ones(B), spring_d=jnp.ones(B),
            spring_set=jnp.ones(B), p_gain=jnp.ones((B, 4)),
            d_gain=jnp.ones((B, 4)), torque=jnp.ones(B),
            speed=jnp.ones(B), ts_slope=jnp.ones(B),
            base_mass=jnp.zeros(B),
        )
        zero_action = jnp.tile(jnp.asarray([1.0, 0, 0, 0]), (B, 1))
        state = HopperVelEnvState(
            key=key,
            robot=self.sim.default_state(B, base_pos=(0, 0, 0.3)),
            commands=jnp.zeros((B, 3)),
            actions=zero_action,
            last_actions=zero_action,
            last_dof_vel=jnp.zeros((B, 4)),
            torques=jnp.zeros((B, 4)),
            time_until_next_push=jnp.zeros((B,)),
            episode_step=jnp.zeros((B,), jnp.int32),
            episode_sums={name: jnp.zeros((B,))
                          for name, _ in self.reward_scales},
            dr=ones_dr,
            common_step=jnp.asarray(0, jnp.int32),
        )
        state = self._do_reset(state, jnp.ones((B,), bool))
        return state, self._obs(state)

    def _do_reset(self, state: HopperVelEnvState,
                  mask: jax.Array) -> HopperVelEnvState:
        k1, k2, k3, key = jax.random.split(state.key, 4)
        robot = self._reset_robot(state, mask, k1)
        dr = self._resample_dr(state.dr, mask, k2)
        B = self.num_envs
        zero_action = jnp.tile(jnp.asarray([1.0, 0, 0, 0]), (B, 1))
        first_push = jax.random.uniform(
            jax.random.fold_in(key, 7), (B,),
            minval=self.time_between_pushes[0],
            maxval=self.time_between_pushes[1],
        )
        return state.replace(
            key=key,
            robot=robot,
            commands=_mwhere(mask, self._sample_commands(k3), state.commands),
            actions=_mwhere(mask, zero_action, state.actions),
            last_actions=_mwhere(mask, zero_action, state.last_actions),
            last_dof_vel=_mwhere(mask, jnp.zeros((B, 4)), state.last_dof_vel),
            time_until_next_push=jnp.where(mask, first_push,
                                           state.time_until_next_push),
            episode_step=jnp.where(mask, 0, state.episode_step),
            episode_sums={k: jnp.where(mask, 0.0, v)
                          for k, v in state.episode_sums.items()},
            dr=dr,
        )

    # ---- rewards ----------------------------------------------------------
    def _rewards(self, state: HopperVelEnvState, robot: RobotState,
                 actions, torques, term_contact) -> Dict[str, jax.Array]:
        R = quat_to_rotmat(robot.base_quat)
        lin_vel_body = jnp.einsum("bji,bj->bi", R, robot.v[:, :3])
        out = {}
        rest = []
        for name, _ in self.reward_scales:
            if name == "tracking_lin_vel":
                err = jnp.sum(
                    jnp.square(state.commands[:, :2] - lin_vel_body[:, :2]),
                    axis=-1)
                out[name] = jnp.exp(-err / self.tracking_sigma)
            elif name == "tracking_ang_vel":
                err = jnp.square(state.commands[:, 2] - robot.v[:, 5])
                out[name] = jnp.exp(-err / self.tracking_sigma)
            else:
                rest.append(name)
        out.update(self._common_rewards(state, robot, actions, torques,
                                        term_contact, rest))
        return out

    # ---- step --------------------------------------------------------------
    def step(self, state: HopperVelEnvState,
             actions: jax.Array) -> Tuple[HopperVelEnvState, Transition]:
        B = self.num_envs
        actions = jnp.clip(actions, -100.0, 100.0)
        state = state.replace(actions=actions)

        def ctrl(carry, rs):
            tau = self._compute_torques(state, rs)
            return tau, tau

        sim = self.sim.replace(base_mass_delta=state.dr.base_mass) \
            if self.domain_rand else self.sim
        robot, torques = sim.step_with_carry(
            state.robot, jnp.zeros((B, 4)), ctrl
        )

        pos, vel, _ = contact_kinematics(self.sim.model, robot)
        f = contact_forces(self.sim.contact, pos, vel,
                           self.sim.model.contact_radius, self.sim.terrain_fn)
        term_idx = jnp.asarray(self.termination_spheres)
        term_contact = jnp.any(
            jnp.linalg.norm(f[:, term_idx, :], axis=-1) > 1.0, axis=-1)
        episode_step = state.episode_step + 1
        time_out = episode_step >= self.max_episode_length
        done = term_contact | time_out

        rews = self._rewards(state, robot, actions, torques, term_contact)
        scales = dict(self.reward_scales)
        total = sum(r * (scales[k] * self.dt) for k, r in rews.items()
                    if k != "termination")
        if "termination" in scales:
            total = total + term_contact.astype(jnp.float32) \
                * scales["termination"]
            rews["termination"] = term_contact.astype(jnp.float32)
        episode_sums = {
            k: state.episode_sums[k]
            + rews[k] * (scales[k] * (self.dt if k != "termination" else 1.0))
            for k in state.episode_sums
        }
        episode_info = {
            "rew_" + k: jnp.sum(jnp.where(done, v, 0.0))
            / self.episode_length_s
            for k, v in episode_sums.items()
        }

        # Command resampling on a fixed clock (ref legged_robot.py pattern
        # used by hopper: env_ids where episode step crosses the interval).
        key, kc, kp, kt = jax.random.split(state.key, 4)
        resample_every = max(int(round(self.resampling_time_s / self.dt)), 1)
        do_resample = (episode_step % resample_every) == 0
        commands = _mwhere(do_resample, self._sample_commands(kc),
                           state.commands)

        # 6-dim pushes on per-env random timers: SET the base velocity
        # (ref hopper.py:142-152 + _push_robots:332-341; magnitudes from
        # flat/hopper_config.py max_push_vel).
        if self.push_robots:
            timer = state.time_until_next_push - self.dt
            need_push = timer <= 0.0
            push = jax.random.uniform(kp, (B, 6), minval=-self.max_push_vel,
                                      maxval=self.max_push_vel)
            robot = robot.replace(v=robot.v.at[:, :6].set(
                jnp.where(need_push[:, None], push, robot.v[:, :6])))
            timer = jnp.where(
                need_push,
                jax.random.uniform(kt, (B,),
                                   minval=self.time_between_pushes[0],
                                   maxval=self.time_between_pushes[1]),
                timer,
            )
        else:
            timer = state.time_until_next_push

        new_state = state.replace(
            key=key,
            robot=robot,
            commands=commands,
            common_step=state.common_step + 1,
            last_actions=actions,
            last_dof_vel=robot.v[:, 6:],
            torques=torques,
            time_until_next_push=timer,
            episode_step=episode_step,
            episode_sums=episode_sums,
        )
        new_state = self._do_reset(new_state, done)
        obs = self._obs(new_state)
        info = {"episode": episode_info, "time_outs": time_out,
                "n_resets": done.sum()}
        return new_state, Transition(obs=obs, privileged_obs=None,
                                     reward=total, done=done, info=info)
