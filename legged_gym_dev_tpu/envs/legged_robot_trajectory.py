"""Trajectory-tracking locomotion environment (generic legged robot).

TPU-native re-design of the reference's trajectory task applied to any URDF
robot (ref: legged_gym/envs/base/legged_robot_trajectory.py and its ANYmal
instantiation, anymal_c/anymal_trajectory.py + flat_trajectory /
mixed_terrains_trajectory configs): the velocity commands are replaced by a
rolling ROM-trajectory window that the robot must track.

Faithful behaviors:
- Observations: [base lin vel, base ang vel, projected gravity,
  (trajectory window - rom.proj_z(root_states)) flattened, dof pos rel
  default, dof vel, actions] (ref compute_observations:274-295; 65 dims for
  ANYmal with a SingleInt2D ROM and N=10 — anymal_c_flat_trajectory_config
  num_observations).
- Per-step trajectory-generator tick (ref _post_physics_step_callback:
  405-417) with the async two-rate clock inside the generator.
- Rewards `tracking_rom` (weighted exp of squared proj error, ref :1060)
  and `differential_error` (asymmetric slopes on the error increment,
  ref :1100), the command-gate-free `feet_air_time` variant
  (ref _reward_feet_air_time, gate commented out), and delegation of every
  other term to the shared velocity-env reward table.
- Random-interval pushes: per-env countdown resampled from
  `time_between_pushes` after each push, lin-vel xy SET to a random value
  (ref post_physics_step:169-178, _push_robots:486-491,
  legged_robot_trajectory_config domain_rand.time_between_pushes).
- ROM-distance randomization on trajectory reset: with probability
  1 - zero_rom_dist_llh the window is rebuilt around proj_z(x) + U(-d, d)
  (ref reset_traj:248-253).
- Optional curriculum tables scaling push magnitude, ROM input bounds,
  hold times and tracking sigma (ref update_command_curriculum:519-555),
  shared with the hopper task.
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from ..core.maths import masked_update as _mwhere
from ..core.maths import quat_to_rotmat
from ..trajgen.generator import TrajectoryGenerator, TrajGenState
from .base import Transition, guard_finite_state
from .legged_robot_velocity import LeggedRobotVelocityEnv, VelocityEnvState


@struct.dataclass
class TrajectoryEnvState(VelocityEnvState):
    """Velocity-env state + trajectory tracking extras. ``commands`` is kept
    (filled with the ROM's desired velocity) so the shared reward terms'
    command gates read the trajectory's motion."""

    traj_gen: TrajGenState = None
    trajectory: jax.Array = None          # (B, N, rom.n)
    prev_error: jax.Array = None          # (B, rom.n) squared tracking error
    time_until_next_push: jax.Array = None  # (B,) seconds


@struct.dataclass
class LeggedRobotTrajectoryEnv(LeggedRobotVelocityEnv):
    """ROM-trajectory tracking task on the batched rigid-body sim."""

    traj_gen: Optional[TrajectoryGenerator] = None
    reward_weighting: Optional[jax.Array] = None   # (rom.n,)
    max_rom_distance: Optional[jax.Array] = None   # (rom.n,)
    zero_rom_dist_llh: Optional[jax.Array] = None  # ()
    # (pos_slope, neg_slope), ref legged_robot_trajectory_config.py:178-180.
    diff_err_slopes: tuple = struct.field(pytree_node=False,
                                          default=(4.0, 1.0))
    # ref domain_rand.time_between_pushes = [.5, 10.] seconds.
    time_between_pushes: tuple = struct.field(pytree_node=False,
                                              default=(0.5, 10.0))
    randomize_rom_distance: bool = struct.field(pytree_node=False,
                                                default=True)

    @property
    def rom(self):
        return self.traj_gen.rom

    @property
    def n_traj(self) -> int:
        return self.traj_gen.N

    @property
    def num_obs(self) -> int:
        return (3 + 3 + 3 + self.rom.n * self.n_traj + 3 * self.nj
                + self.num_height_points)

    # ---- observations (ref compute_observations:274-295) ----------------
    def _obs(self, state: TrajectoryEnvState) -> jax.Array:
        robot = state.robot
        B = self.num_envs
        R = quat_to_rotmat(robot.base_quat)
        lin_vel_body = jnp.einsum("bji,bj->bi", R, robot.v[:, :3])
        gravity_body = -R[:, 2, :]
        mod_traj = state.trajectory - self.rom.proj_z(
            robot.root_states
        )[:, None, :]
        parts = [
            lin_vel_body * 2.0,
            robot.v[:, 3:6] * 0.25,
            gravity_body,
            mod_traj.reshape(B, -1),
            (robot.q - self.default_dof_pos) * 1.0,
            robot.v[:, 6:] * 0.05,
            state.actions,
        ]
        if self.num_height_points:
            parts.append(self._height_obs(robot))
        obs = jnp.concatenate(parts, axis=-1)
        if self.add_noise:
            key = jax.random.fold_in(state.key, 7)
            obs = obs + (2.0 * jax.random.uniform(key, obs.shape) - 1.0) \
                * self.noise_vec[None, :]
        # ref legged_robot.py:100 clip_observations=100.
        return jnp.clip(obs, -100.0, 100.0)

    # ---- resets ----------------------------------------------------------
    def reset(self, key: jax.Array) -> Tuple[TrajectoryEnvState, jax.Array]:
        B, nj = self.num_envs, self.nj
        import numpy as np

        state = TrajectoryEnvState(
            key=key,
            robot=self.sim.default_state(B, base_pos=tuple(
                np.asarray(self.base_init_pos)
            ), q=self.default_dof_pos),
            commands=jnp.zeros((B, 4)),
            actions=jnp.zeros((B, nj)),
            last_actions=jnp.zeros((B, nj)),
            last_dof_vel=jnp.zeros((B, nj)),
            torques=jnp.zeros((B, nj)),
            feet_air_time=jnp.zeros((B, len(self.feet_spheres))),
            last_contacts=jnp.zeros((B, len(self.feet_spheres)), bool),
            episode_step=jnp.zeros((B,), jnp.int32),
            episode_sums={n: jnp.zeros((B,)) for n, _ in self.reward_scales},
            command_ranges=self.init_command_ranges,
            sea_hidden=jnp.zeros(
                (2, B * nj if self.actuator_net is not None else 0, 8)
            ),
            sea_cell=jnp.zeros(
                (2, B * nj if self.actuator_net is not None else 0, 8)
            ),
            terrain_levels=jnp.zeros((B,), jnp.int32),
            env_origin=(self.env_origins if self.env_origins is not None
                        else jnp.zeros((B, 3))),
            friction=jnp.broadcast_to(self.sim.contact.friction, (B,)),
            base_mass=jnp.zeros((B,)),
            contact_mult=jnp.ones((B, 2)),
            traj_gen=self.traj_gen.init_state(jax.random.fold_in(key, 0), B),
            trajectory=jnp.zeros((B, self.n_traj, self.rom.n)),
            prev_error=jnp.zeros((B, self.rom.n)),
            time_until_next_push=jnp.zeros((B,)),
        )
        state = self._do_reset(state, jnp.ones((B,), bool))
        return state, self._obs(state)

    def _do_reset(self, state: TrajectoryEnvState,
                  mask: jax.Array) -> TrajectoryEnvState:
        # Robot/DR/terrain-origin resets are shared with the velocity task;
        # its command resample is harmless (commands are overwritten below
        # with the ROM's desired velocity).
        state = super()._do_reset(state, mask)
        B = self.num_envs
        key, k1, k2 = jax.random.split(state.key, 3)
        # ROM-distance randomization (ref reset_traj:248-253).
        p_zx = self.rom.proj_z(state.robot.root_states)
        if self.randomize_rom_distance and self.max_rom_distance is not None:
            offset_on = (jax.random.uniform(k1, (B,))
                         > self.zero_rom_dist_llh)
            offset = jax.random.uniform(
                k2, p_zx.shape,
                minval=-self.max_rom_distance, maxval=self.max_rom_distance,
            )
            p_zx = p_zx + jnp.where(offset_on[:, None], offset, 0.0)
        tgen = self._traj_gen_cur(state)
        tg = tgen.reset(state.traj_gen, mask, p_zx)
        trajectory = tgen.get_trajectory(tg)
        # First push due after a random interval (ref __init__:85-87).
        k3 = jax.random.fold_in(key, 3)
        push_t = jax.random.uniform(
            k3, (B,), minval=self.time_between_pushes[0],
            maxval=self.time_between_pushes[1],
        )
        return state.replace(
            key=key,
            traj_gen=tg,
            trajectory=trajectory,
            commands=self._rom_commands(state.commands, tg),
            prev_error=_mwhere(mask, jnp.zeros((B, self.rom.n)),
                               state.prev_error),
            time_until_next_push=jnp.where(
                mask, push_t, state.time_until_next_push
            ),
        )

    def _rom_commands(self, commands: jax.Array,
                      tg: TrajGenState) -> jax.Array:
        """Expose the ROM's desired planar velocity in the commands buffer
        so shared reward gates (stand_still) see the trajectory's motion."""
        v = tg.v[:, :2] if tg.v.shape[-1] >= 2 else jnp.pad(
            tg.v, ((0, 0), (0, 2 - tg.v.shape[-1]))
        )
        return commands.at[:, :2].set(v).at[:, 2:].set(0.0)

    def _traj_gen_cur(self, state) -> TrajectoryGenerator:
        """Trajectory generator under the current curriculum stage — ROM
        input bounds and hold times are stage-scaled (ref :533-546). The
        base env has no curriculum tables; subclass hook."""
        return self.traj_gen

    # ---- rewards ---------------------------------------------------------
    def _rewards(self, state, robot, f_contact, term_contact,
                 first_contact, air_time,
                 names=None) -> Dict[str, jax.Array]:
        desired = state.trajectory[:, 0, :]
        pz_x = self.rom.proj_z(robot.root_states)
        sq_err = jnp.square(pz_x - desired)

        own = {}
        rest = []
        for name in (names if names is not None
                     else [n for n, _ in self.reward_scales]):
            if name == "tracking_rom":
                # ref _reward_tracking_rom:1060.
                err = sq_err @ self.reward_weighting
                own[name] = jnp.exp(-err / self.tracking_sigma)
            elif name == "differential_error":
                # ref _reward_differential_error:1100.
                err = jnp.linalg.norm(sq_err, axis=-1)
                diff = err - jnp.linalg.norm(state.prev_error, axis=-1)
                pos_s, neg_s = self.diff_err_slopes
                own[name] = jnp.where(diff < 0, neg_s, pos_s) * diff
            elif name == "feet_air_time":
                # The trajectory task drops the command gate
                # (ref _reward_feet_air_time, gate commented out).
                own[name] = jnp.sum(
                    (air_time - 0.5) * first_contact, axis=-1
                )
            else:
                rest.append(name)
        own.update(super()._rewards(state, robot, f_contact, term_contact,
                                    first_contact, air_time, names=rest))
        return own

    # ---- step ------------------------------------------------------------
    def step(self, state: TrajectoryEnvState,
             actions: jax.Array) -> Tuple[TrajectoryEnvState, Transition]:
        B, nj = self.num_envs, self.nj
        actions = jnp.clip(actions, -100.0, 100.0)
        state = state.replace(actions=actions)

        # Decimated physics (PD or actuator-net torques), shared machinery.
        if self.actuator_net is not None:
            net = self.actuator_net

            def sea_torque(carry, rs):
                h, c, _ = carry
                pos_err = (state.actions * self.action_scale
                           + self.default_dof_pos - rs.q)
                x = jnp.stack(
                    [pos_err.reshape(-1), rs.v[:, 6:].reshape(-1)], axis=-1
                )
                tau, h, c = net(x, h, c)
                tau = jnp.clip(tau.reshape(B, nj),
                               -self.sim.model.effort_limit,
                               self.sim.model.effort_limit)
                return (h, c, tau), tau

            carry0 = (state.sea_hidden, state.sea_cell, jnp.zeros((B, nj)))
            robot, (sea_h, sea_c, torques) = self._dr_sim(state)\
                .step_with_carry(state.robot, carry0, sea_torque)
            state = state.replace(torques=torques, sea_hidden=sea_h,
                                  sea_cell=sea_c)
        else:
            def pd_torque(carry, rs):
                tau = self._compute_torques(state, rs)
                return tau, tau

            robot, torques = self._dr_sim(state).step_with_carry(
                state.robot, jnp.zeros((B, nj)), pd_torque
            )
            state = state.replace(torques=torques)

        # Non-finite backstop (base.guard_finite_state): sanitize +
        # force-terminate exploded envs before reward/obs math.
        robot, nonfinite = guard_finite_state(
            robot, self.sim.default_state(B))
        # The physics also produced this step's torques (and SEA state)
        # BEFORE the guard could see the blow-up — scrub them too, else
        # NaN reaches the torque/energy rewards (the a1 leak, round 4).
        state = state.replace(torques=jnp.where(
            nonfinite[:, None], 0.0, state.torques))
        if getattr(state, "sea_hidden", None) is not None \
                and state.sea_hidden.size:
            nf_sea = jnp.repeat(nonfinite, self.nj)[None, :, None]
            state = state.replace(
                sea_hidden=jnp.where(nf_sea, 0.0, state.sea_hidden),
                sea_cell=jnp.where(nf_sea, 0.0, state.sea_cell))

        # Trajectory-generator tick at the policy rate (ref :405-417).
        tgen = self._traj_gen_cur(state)
        tg = tgen.step(state.traj_gen)
        trajectory = tgen.get_trajectory(tg)
        state = state.replace(
            robot=robot, traj_gen=tg, trajectory=trajectory,
            commands=self._rom_commands(state.commands, tg),
        )

        f_contact = self._contact_forces(robot, self._dr_sim(state))
        feet = jnp.asarray(self.feet_spheres, jnp.int32)
        contact = f_contact[:, feet, 2] > 1.0
        contact_filt = contact | state.last_contacts
        first_contact = (state.feet_air_time > 0.0) & contact_filt
        air_time = state.feet_air_time + self.dt

        term_idx = jnp.asarray(self.termination_spheres, jnp.int32)
        term_contact = (jnp.any(
            jnp.linalg.norm(f_contact[:, term_idx, :], axis=-1) > 1.0,
            axis=-1,
        ) if self.termination_spheres else jnp.zeros((B,), bool)) | nonfinite
        episode_step = state.episode_step + 1
        time_out = episode_step >= self.max_episode_length
        done = term_contact | time_out

        rews = self._rewards(state, robot, f_contact, term_contact,
                             first_contact.astype(jnp.float32), air_time)
        scales = dict(self.reward_scales)
        total = sum(r * (scales[k] * self.dt) for k, r in rews.items()
                    if k != "termination")
        if self.only_positive_rewards:
            total = jnp.clip(total, 0.0)
        if "termination" in scales:
            total = total + rews["termination"] * scales["termination"]
        episode_sums = {
            k: state.episode_sums[k] + rews[k]
            * (scales[k] * (self.dt if k != "termination" else 1.0))
            for k in state.episode_sums
        }
        episode_info = {
            "rew_" + k: jnp.sum(jnp.where(done, v, 0.0))
            / self.episode_length_s
            for k, v in episode_sums.items()
        }

        # Random-interval pushes (ref :169-178): per-env countdown, lin-vel
        # xy SET to U(-max_push_vel, max_push_vel) on expiry, countdown
        # resampled from time_between_pushes.
        key, k1, k2 = jax.random.split(state.key, 3)
        countdown = state.time_until_next_push - self.dt
        need_push = countdown <= 0.0
        push_vel = jax.random.uniform(k1, (B, 2), minval=-self.max_push_vel,
                                      maxval=self.max_push_vel)
        robot = robot.replace(
            v=robot.v.at[:, :2].set(
                jnp.where(need_push[:, None], push_vel, robot.v[:, :2])
            )
        )
        next_push = jax.random.uniform(
            k2, (B,), minval=self.time_between_pushes[0],
            maxval=self.time_between_pushes[1],
        )
        countdown = jnp.where(need_push, next_push, countdown)

        desired = trajectory[:, 0, :]
        pz_x = self.rom.proj_z(robot.root_states)
        new_state = state.replace(
            key=key,
            robot=robot,
            last_actions=actions,
            last_dof_vel=robot.v[:, 6:],
            feet_air_time=jnp.where(contact_filt, 0.0, air_time),
            last_contacts=contact,
            prev_error=jnp.square(pz_x - desired),
            episode_step=episode_step,
            episode_sums=episode_sums,
            time_until_next_push=countdown,
        )
        new_state = self._do_reset(new_state, done)
        obs = self._obs(new_state)
        info = {"episode": episode_info, "time_outs": time_out,
                "n_resets": done.sum()}
        return new_state, Transition(obs=obs, privileged_obs=None,
                                     reward=total, done=done, info=info)
