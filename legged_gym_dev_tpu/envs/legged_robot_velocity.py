"""Velocity-command locomotion environment (generic legged robot).

TPU-native re-design of the reference's core rough-terrain locomotion task
(ref: legged_gym/envs/base/legged_robot.py): PD joint control with
decimation, velocity/heading command resampling, domain randomization,
pushes, the full 19-term reward table (ref :918-1015), and optional
heightfield terrain with perceptive height-scan observations.

Works for any URDF robot loaded by the sim (A1/ANYmal/Cassie): contact
spheres are classified into feet / penalized / termination sets by link-name
substrings exactly like the reference's asset config
(ref: a1_config.py foot_name/penalize_contacts_on/terminate_after_contacts_on).
"""
from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..core.maths import quat_apply, quat_to_rotmat, quat_to_yaw, wrap_to_pi
from ..sim.actuator_net import ActuatorNetLSTM
from ..sim.contact import contact_forces, flat_terrain
from ..sim.dynamics import RobotState, contact_kinematics
from ..sim.robot_sim import RobotSim
from .base import Transition, guard_finite_state


from ..core.maths import masked_update as _mwhere  # noqa: E402


def classify_contacts(model, foot_name: str, penalize_on, terminate_on):
    """Sphere index sets from link-name substrings (ref legged_robot.py:
    601-615 body-index resolution)."""
    feet, pen, term = [], [], []
    for i, name in enumerate(model.contact_link_names):
        if foot_name and foot_name in name:
            feet.append(i)
        if any(s in name for s in penalize_on):
            pen.append(i)
        if any(s in name for s in terminate_on):
            term.append(i)
    return tuple(feet), tuple(pen), tuple(term)


@struct.dataclass
class VelocityEnvState:
    key: jax.Array
    robot: RobotState
    commands: jax.Array        # (B, 4): vx, vy, wyaw, heading
    actions: jax.Array         # (B, nj)
    last_actions: jax.Array
    last_dof_vel: jax.Array
    torques: jax.Array
    feet_air_time: jax.Array   # (B, n_feet)
    last_contacts: jax.Array   # (B, n_feet) bool
    episode_step: jax.Array
    episode_sums: Dict[str, jax.Array]
    command_ranges: jax.Array  # (4, 2) [lin_x, lin_y, yaw, heading] curriculum
    sea_hidden: jax.Array      # (2, B*nj or 0, 8) actuator-net LSTM state
    sea_cell: jax.Array
    terrain_levels: jax.Array  # (B,) int32 terrain-curriculum rows
    env_origin: jax.Array      # (B, 3) current spawn origins
    friction: jax.Array        # (B,) per-env Coulomb mu (friction-bucket DR)
    base_mass: jax.Array       # (B,) payload mass added to the base (DR)
    contact_mult: jax.Array    # (B, 2) contact stiffness/damping multipliers


@struct.dataclass
class LeggedRobotVelocityEnv:
    sim: RobotSim
    default_dof_pos: jax.Array   # (nj,)
    p_gains: jax.Array           # (nj,)
    d_gains: jax.Array           # (nj,)
    base_init_pos: jax.Array     # (3,)
    obs_scales: jax.Array        # per-component scale blocks applied inline
    noise_vec: jax.Array         # (num_obs,)
    init_command_ranges: jax.Array  # (4, 2)
    tracking_sigma: jax.Array
    base_height_target: jax.Array
    max_contact_force: jax.Array
    soft_dof_vel_limit: jax.Array
    soft_torque_limit: jax.Array
    # Per-env spawn origins (terrain grid cells, ref legged_robot.py:433-441;
    # zeros = single shared origin on flat ground).
    env_origins: Optional[jax.Array] = None   # (B, 3) initial assignment
    # Terrain-level curriculum (ref legged_robot.py:497-517): origins table
    # indexed [level(row), type(col)] + per-env fixed column assignment.
    terrain_origins: Optional[jax.Array] = None   # (rows, cols, 3)
    terrain_types: Optional[jax.Array] = None     # (B,) int32
    actuator_net: Optional[ActuatorNetLSTM] = None
    # Perceptive height scan (ref legged_robot.py:877-915 _get_heights +
    # legged_robot_config.py:54-57): yaw-rotated measurement grid appended
    # to obs as clip(base_z - 0.5 - h, -1, 1) * 5.0. None = blind.
    measured_points_x: Optional[tuple] = struct.field(pytree_node=False,
                                                      default=None)
    measured_points_y: Optional[tuple] = struct.field(pytree_node=False,
                                                      default=None)
    action_scale: float = struct.field(pytree_node=False, default=0.25)
    control_type: str = struct.field(pytree_node=False, default="P")
    heading_command: bool = struct.field(pytree_node=False, default=True)
    resampling_time_s: float = struct.field(pytree_node=False, default=10.0)
    episode_length_s: float = struct.field(pytree_node=False, default=20.0)
    push_interval_s: float = struct.field(pytree_node=False, default=15.0)
    max_push_vel: float = struct.field(pytree_node=False, default=1.0)
    terrain_curriculum: bool = struct.field(pytree_node=False, default=False)
    add_noise: bool = struct.field(pytree_node=False, default=True)
    # Domain randomization (ref legged_robot_config.py domain_rand +
    # legged_robot.py _process_rigid_shape_props / _process_rigid_body_props):
    # per-env friction drawn from `num_friction_buckets` random bucket
    # values in `friction_range`; per-env payload mass on the base in
    # `added_mass_range`. The reference assigns these once at env creation;
    # here they resample per env-reset (same marginal distribution).
    randomize_friction: bool = struct.field(pytree_node=False, default=True)
    friction_range: tuple = struct.field(pytree_node=False,
                                         default=(0.5, 1.25))
    num_friction_buckets: int = struct.field(pytree_node=False, default=64)
    randomize_base_mass: bool = struct.field(pytree_node=False, default=False)
    added_mass_range: tuple = struct.field(pytree_node=False,
                                           default=(-1.0, 1.0))
    # Rigid-shape restitution/compliance/thickness randomization (ref
    # domain_rand.rigid_shape_properties) maps onto the compliant contact
    # model as multiplicative per-env stiffness/damping factors (compliance
    # ~ 1/stiffness, restitution ~ 1/damping, thickness folds into the
    # penetration depth the spring sees).
    randomize_contact: bool = struct.field(pytree_node=False, default=False)
    contact_mult_range: tuple = struct.field(pytree_node=False,
                                             default=(0.7, 1.3))
    command_curriculum: bool = struct.field(pytree_node=False, default=False)
    only_positive_rewards: bool = struct.field(pytree_node=False, default=True)
    reward_scales: tuple = struct.field(pytree_node=False, default=())
    feet_spheres: tuple = struct.field(pytree_node=False, default=())
    penalized_spheres: tuple = struct.field(pytree_node=False, default=())
    termination_spheres: tuple = struct.field(pytree_node=False, default=())
    num_envs: int = struct.field(pytree_node=False, default=4096)

    # ------------------------------------------------------------------
    @property
    def nj(self) -> int:
        return self.sim.model.nj

    @property
    def num_actions(self) -> int:
        return self.nj

    @property
    def num_height_points(self) -> int:
        if self.measured_points_x is None:
            return 0
        return len(self.measured_points_x) * len(self.measured_points_y)

    @property
    def num_obs(self) -> int:
        return (3 + 3 + 3 + 3 + self.nj + self.nj + self.nj
                + self.num_height_points)

    def _height_obs(self, robot: RobotState) -> jax.Array:
        """Perceptive observation block (ref legged_robot.py:219-222)."""
        from ..utils.terrain import height_scan

        h = height_scan(self.sim.terrain_fn, robot.base_pos,
                        robot.base_quat, self.measured_points_x,
                        self.measured_points_y)
        return jnp.clip(
            robot.base_pos[:, 2:3] - 0.5 - h, -1.0, 1.0
        ) * 5.0

    @property
    def dt(self) -> float:
        return self.sim.dt * self.sim.decimation

    @property
    def max_episode_length(self) -> int:
        return int(round(self.episode_length_s / self.dt))

    # ---- control (ref legged_robot.py:389-414) ------------------------
    def _compute_torques(self, state: VelocityEnvState,
                         robot: RobotState) -> jax.Array:
        a_scaled = state.actions * self.action_scale
        q, qd = robot.q, robot.v[:, 6:]
        if self.control_type == "P":
            tau = (self.p_gains * (a_scaled + self.default_dof_pos - q)
                   - self.d_gains * qd)
        elif self.control_type == "V":
            tau = (self.p_gains * (a_scaled - qd)
                   - self.d_gains * (qd - state.last_dof_vel) / self.sim.dt)
        else:  # "T"
            tau = a_scaled
        return jnp.clip(tau, -self.sim.model.effort_limit,
                        self.sim.model.effort_limit)

    def _contact_forces(self, robot: RobotState,
                        sim: Optional[RobotSim] = None) -> jax.Array:
        sim = sim if sim is not None else self.sim
        pos, vel, _ = contact_kinematics(sim.model, robot)
        return contact_forces(sim.contact, pos, vel,
                              sim.model.contact_radius,
                              sim.terrain_fn)

    # ---- observations (ref legged_robot.py:208-227) --------------------
    def _obs(self, state: VelocityEnvState) -> jax.Array:
        robot = state.robot
        R = quat_to_rotmat(robot.base_quat)
        lin_vel_body = jnp.einsum("bji,bj->bi", R, robot.v[:, :3])
        gravity_body = R[:, 2, :] * -1.0   # unit gravity in body frame
        cmd_scale = jnp.asarray([2.0, 2.0, 0.25])
        parts = [
            lin_vel_body * 2.0,
            robot.v[:, 3:6] * 0.25,
            gravity_body,
            state.commands[:, :3] * cmd_scale,
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

    # ---- commands (ref legged_robot.py:336-388) ------------------------
    def _resample_commands(self, state: VelocityEnvState, mask, key):
        B = self.num_envs
        cr = state.command_ranges
        ks = jax.random.split(key, 4)
        new = jnp.stack([
            jax.random.uniform(ks[0], (B,), minval=cr[0, 0], maxval=cr[0, 1]),
            jax.random.uniform(ks[1], (B,), minval=cr[1, 0], maxval=cr[1, 1]),
            jax.random.uniform(ks[2], (B,), minval=cr[2, 0], maxval=cr[2, 1]),
            jax.random.uniform(ks[3], (B,), minval=cr[3, 0], maxval=cr[3, 1]),
        ], axis=-1)
        # Zero-out small commands (ref :388).
        small = jnp.linalg.norm(new[:, :2], axis=-1) < 0.2
        new = new.at[:, :2].multiply(jnp.where(small, 0.0, 1.0)[:, None])
        return _mwhere(mask, new, state.commands)

    def _heading_to_yaw_cmd(self, commands, robot: RobotState):
        """Heading controller writes the yaw-rate command (ref :351-354)."""
        fwd = quat_apply(robot.base_quat,
                         jnp.asarray([1.0, 0.0, 0.0])[None, :].repeat(
                             self.num_envs, 0))
        heading = jnp.arctan2(fwd[:, 1], fwd[:, 0])
        yaw_cmd = jnp.clip(
            0.5 * wrap_to_pi(commands[:, 3] - heading), -1.0, 1.0
        )
        return commands.at[:, 2].set(yaw_cmd)

    # ---- resets ---------------------------------------------------------
    def reset(self, key: jax.Array) -> Tuple[VelocityEnvState, jax.Array]:
        B, nj = self.num_envs, self.nj
        state = VelocityEnvState(
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
        )
        state = self._do_reset(state, jnp.ones((B,), bool))
        return state, self._obs(state)

    # ---- domain randomization (ref legged_robot.py:271-319) -------------
    def _resample_dr(self, state: VelocityEnvState, mask,
                     key: jax.Array) -> VelocityEnvState:
        B = self.num_envs
        friction, base_mass = state.friction, state.base_mass
        if self.randomize_friction:
            # Friction buckets (ref _process_rigid_shape_props): bucket
            # values uniform in friction_range, envs assigned a bucket.
            kv, ki = jax.random.split(jax.random.fold_in(key, 0))
            vals = jax.random.uniform(
                kv, (self.num_friction_buckets,),
                minval=self.friction_range[0], maxval=self.friction_range[1])
            ids = jax.random.randint(ki, (B,), 0, self.num_friction_buckets)
            friction = jnp.where(mask, vals[ids], friction)
        if self.randomize_base_mass:
            km = jax.random.fold_in(key, 1)
            dm = jax.random.uniform(km, (B,),
                                    minval=self.added_mass_range[0],
                                    maxval=self.added_mass_range[1])
            base_mass = jnp.where(mask, dm, base_mass)
        contact_mult = state.contact_mult
        if self.randomize_contact:
            kc = jax.random.fold_in(key, 2)
            cm = jax.random.uniform(kc, (B, 2),
                                    minval=self.contact_mult_range[0],
                                    maxval=self.contact_mult_range[1])
            contact_mult = _mwhere(mask, cm, contact_mult)
        return state.replace(friction=friction, base_mass=base_mass,
                             contact_mult=contact_mult)

    def _dr_sim(self, state: VelocityEnvState) -> RobotSim:
        """Sim with this step's per-env DR applied (friction via broadcast
        contact params, payload mass via the scalar-graph base_mass_delta)."""
        sim = self.sim
        if self.randomize_friction:
            # (B, 1, 1): broadcasts against the (B, nc, ...) contact arrays.
            sim = sim.replace(contact=sim.contact.replace(
                friction=state.friction[:, None, None]))
        if self.randomize_base_mass:
            sim = sim.replace(base_mass_delta=state.base_mass)
        if self.randomize_contact:
            # (B, 1): stiffness/damping multiply the (B, nc) depth/velocity
            # terms (friction instead broadcasts against (B, nc, 3)).
            sim = sim.replace(contact=sim.contact.replace(
                stiffness=sim.contact.stiffness
                * state.contact_mult[:, 0:1],
                damping=sim.contact.damping
                * state.contact_mult[:, 1:2],
            ))
        return sim

    def _do_reset(self, state: VelocityEnvState, mask) -> VelocityEnvState:
        B, nj = self.num_envs, self.nj
        k1, k2, k3, key = jax.random.split(state.key, 4)
        robot = state.robot
        # DOFs at 0.5-1.5x default, zero vel (ref :416-431).
        q = self.default_dof_pos * jax.random.uniform(
            k1, (B, nj), minval=0.5, maxval=1.5
        )
        q = jnp.clip(q, self.sim.model.q_lower, self.sim.model.q_upper)
        # Root at init pos, random vel in [-0.5, 0.5] (ref :433-453).
        v = jnp.concatenate([
            jax.random.uniform(k2, (B, 6), minval=-0.5, maxval=0.5),
            jnp.zeros((B, nj)),
        ], axis=-1)
        base_pos = jnp.broadcast_to(self.base_init_pos, (B, 3))
        levels = state.terrain_levels
        origin = state.env_origin
        if self.terrain_curriculum and self.terrain_origins is not None:
            # Game-inspired terrain curriculum (ref :497-517): walked far
            # enough -> harder row; under half the commanded distance ->
            # easier; solved top level -> random row.
            max_level = self.terrain_origins.shape[0]
            dist = jnp.linalg.norm(
                state.robot.base_pos[:, :2] - origin[:, :2], axis=-1
            )
            cmd_dist = (jnp.linalg.norm(state.commands[:, :2], axis=-1)
                        * self.episode_length_s)
            # Only score envs that actually ran an episode (the initial
            # reset measures distance from the default pose, not a walk).
            ran = state.episode_step > 0
            move_up = (dist > 4.0) & ran  # ~ env_length / 2
            move_down = (dist < cmd_dist * 0.5) & ~move_up & ran
            new_levels = levels + move_up.astype(jnp.int32)                 - move_down.astype(jnp.int32)
            k_lvl = jax.random.fold_in(k2, 13)
            rand_lvl = jax.random.randint(k_lvl, (B,), 0, max_level)
            new_levels = jnp.where(new_levels >= max_level, rand_lvl,
                                   jnp.clip(new_levels, 0))
            levels = jnp.where(mask, new_levels, levels)
            origin = _mwhere(
                mask, self.terrain_origins[levels, self.terrain_types], origin
            )
        if self.env_origins is not None or self.terrain_origins is not None:
            # Spawn at the terrain-cell origin +-1m xy (ref :437-441).
            k_xy = jax.random.fold_in(k2, 11)
            base_pos = base_pos + origin + jnp.concatenate([
                jax.random.uniform(k_xy, (B, 2), minval=-1.0, maxval=1.0),
                jnp.zeros((B, 1)),
            ], axis=-1)
        base_quat = jnp.broadcast_to(jnp.asarray([0.0, 0, 0, 1.0]), (B, 4))
        robot = RobotState(
            base_pos=_mwhere(mask, base_pos, robot.base_pos),
            base_quat=_mwhere(mask, base_quat, robot.base_quat),
            q=_mwhere(mask, q, robot.q),
            v=_mwhere(mask, v, robot.v),
        )
        commands = self._resample_commands(
            state.replace(robot=robot), mask, k3
        )
        state = self._resample_dr(state, mask, jax.random.fold_in(k2, 23))
        return state.replace(
            key=key, robot=robot, commands=commands,
            actions=_mwhere(mask, jnp.zeros((B, nj)), state.actions),
            last_actions=_mwhere(mask, jnp.zeros((B, nj)),
                                 state.last_actions),
            last_dof_vel=_mwhere(mask, jnp.zeros((B, nj)),
                                 state.last_dof_vel),
            feet_air_time=_mwhere(
                mask, jnp.zeros((B, len(self.feet_spheres))),
                state.feet_air_time,
            ),
            episode_step=jnp.where(mask, 0, state.episode_step),
            episode_sums={k: jnp.where(mask, 0.0, v)
                          for k, v in state.episode_sums.items()},
            sea_hidden=self._mask_sea(state.sea_hidden, mask),
            sea_cell=self._mask_sea(state.sea_cell, mask),
            terrain_levels=levels,
            env_origin=origin,
        )

    def _mask_sea(self, sea: jax.Array, mask: jax.Array) -> jax.Array:
        """Zero actuator-net hidden states of reset envs (ref anymal.py:56-60)."""
        if self.actuator_net is None:
            return sea
        B, nj = self.num_envs, self.nj
        per_env = sea.reshape(2, B, nj, 8)
        per_env = jnp.where(mask[None, :, None, None], 0.0, per_env)
        return per_env.reshape(2, B * nj, 8)

    # ---- rewards (ref legged_robot.py:918-1015) ------------------------
    def _rewards(self, state, robot, f_contact, term_contact,
                 first_contact, air_time,
                 names=None) -> Dict[str, jax.Array]:
        """Reward-term table. ``names`` restricts to a subset so variants
        (the trajectory task) can compute their own terms and delegate the
        shared ones here."""
        R = quat_to_rotmat(robot.base_quat)
        lin_vel_body = jnp.einsum("bji,bj->bi", R, robot.v[:, :3])
        gravity_body = -R[:, 2, :]
        q, qd = robot.q, robot.v[:, 6:]
        cmd = state.commands
        model = self.sim.model
        feet = jnp.asarray(self.feet_spheres, jnp.int32)
        pen = (jnp.asarray(self.penalized_spheres, jnp.int32)
               if self.penalized_spheres else None)

        out = {}
        for name in (names if names is not None
                     else [n for n, _ in self.reward_scales]):
            if name == "lin_vel_z":
                out[name] = jnp.square(lin_vel_body[:, 2])
            elif name == "ang_vel_xy":
                out[name] = jnp.sum(jnp.square(robot.v[:, 3:5]), axis=-1)
            elif name == "orientation":
                out[name] = jnp.sum(jnp.square(gravity_body[:, :2]), axis=-1)
            elif name == "base_height":
                h = robot.base_pos[:, 2] - self.sim.terrain_fn(
                    robot.base_pos[:, :2]
                )
                out[name] = jnp.square(h - self.base_height_target)
            elif name == "torques":
                out[name] = jnp.sum(jnp.square(state.torques), axis=-1)
            elif name == "dof_vel":
                out[name] = jnp.sum(jnp.square(qd), axis=-1)
            elif name == "dof_acc":
                out[name] = jnp.sum(
                    jnp.square((state.last_dof_vel - qd) / self.dt), axis=-1
                )
            elif name == "action_rate":
                out[name] = jnp.sum(
                    jnp.square(state.last_actions - state.actions), axis=-1
                )
            elif name == "collision":
                out[name] = (jnp.sum(
                    (jnp.linalg.norm(f_contact[:, pen, :], axis=-1) > 0.1)
                    .astype(jnp.float32), axis=-1,
                ) if pen is not None else jnp.zeros(self.num_envs))
            elif name == "termination":
                out[name] = term_contact.astype(jnp.float32)
            elif name == "dof_pos_limits":
                low = jnp.clip(q - model.q_lower, None, 0.0)
                high = jnp.clip(q - model.q_upper, 0.0, None)
                out[name] = jnp.sum(-low + high, axis=-1)
            elif name == "dof_vel_limits":
                out[name] = jnp.sum(jnp.clip(
                    jnp.abs(qd) - model.vel_limit * self.soft_dof_vel_limit,
                    0.0, 1.0,
                ), axis=-1)
            elif name == "torque_limits":
                out[name] = jnp.sum(jnp.clip(
                    jnp.abs(state.torques)
                    - model.effort_limit * self.soft_torque_limit, 0.0, None,
                ), axis=-1)
            elif name == "tracking_lin_vel":
                err = jnp.sum(
                    jnp.square(cmd[:, :2] - lin_vel_body[:, :2]), axis=-1
                )
                out[name] = jnp.exp(-err / self.tracking_sigma)
            elif name == "tracking_ang_vel":
                err = jnp.square(cmd[:, 2] - robot.v[:, 5])
                out[name] = jnp.exp(-err / self.tracking_sigma)
            elif name == "feet_air_time":
                rew = jnp.sum((air_time - 0.5) * first_contact, axis=-1)
                out[name] = rew * (
                    jnp.linalg.norm(cmd[:, :2], axis=-1) > 0.1
                )
            elif name == "stumble":
                fxy = jnp.linalg.norm(f_contact[:, feet, :2], axis=-1)
                fz = jnp.abs(f_contact[:, feet, 2])
                out[name] = jnp.any(fxy > 5.0 * fz, axis=-1).astype(
                    jnp.float32
                )
            elif name == "stand_still":
                out[name] = jnp.sum(
                    jnp.abs(q - self.default_dof_pos), axis=-1
                ) * (jnp.linalg.norm(cmd[:, :2], axis=-1) < 0.1)
            elif name == "no_fly":
                # Single-stance reward for bipeds (ref cassie.py:43-46):
                # reward exactly one foot in firm contact.
                contacts = f_contact[:, feet, 2] > 0.1
                single = jnp.sum(contacts.astype(jnp.int32), axis=-1) == 1
                out[name] = single.astype(jnp.float32)
            elif name == "feet_contact_forces":
                out[name] = jnp.sum(jnp.clip(
                    jnp.linalg.norm(f_contact[:, feet, :], axis=-1)
                    - self.max_contact_force, 0.0, None,
                ), axis=-1)
            else:
                raise ValueError(f"unknown reward term {name}")
        return out

    def _update_command_curriculum(self, state, done, episode_sums):
        """Expand lin-vel command ranges when tracking is good (ref
        legged_robot.py:488-500): if the mean episode tracking reward of
        reset envs exceeds 80% of its max, widen lin_vel_x/y by 0.5 up to
        +-max_curriculum (5.0 here, as upstream)."""
        if not any(n == "tracking_lin_vel" for n, _ in self.reward_scales):
            return state.command_ranges
        scale = dict(self.reward_scales)["tracking_lin_vel"] * self.dt
        denom = jnp.maximum(done.sum(), 1)
        mean_track = jnp.sum(
            jnp.where(done, episode_sums["tracking_lin_vel"], 0.0)
        ) / denom / self.max_episode_length
        good = (mean_track > 0.8 * scale) & (done.sum() > 0)
        cr = state.command_ranges
        delta = jnp.where(good, 0.5, 0.0)
        cr = cr.at[0, 0].set(jnp.clip(cr[0, 0] - delta, -5.0, 0.0))
        cr = cr.at[0, 1].set(jnp.clip(cr[0, 1] + delta, 0.0, 5.0))
        cr = cr.at[1, 0].set(jnp.clip(cr[1, 0] - delta, -5.0, 0.0))
        cr = cr.at[1, 1].set(jnp.clip(cr[1, 1] + delta, 0.0, 5.0))
        return cr

    # ---- step -----------------------------------------------------------
    def step(self, state: VelocityEnvState,
             actions: jax.Array) -> Tuple[VelocityEnvState, Transition]:
        B = self.num_envs
        actions = jnp.clip(actions, -100.0, 100.0)
        state = state.replace(actions=actions)

        B, nj = self.num_envs, self.nj
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
                # Isaac Gym's joint drive clamps to the URDF effort limit;
                # without it the net's out-of-distribution outputs at high
                # velocity destabilize the sim.
                tau = jnp.clip(tau.reshape(B, nj),
                               -self.sim.model.effort_limit,
                               self.sim.model.effort_limit)
                return (h, c, tau), tau

            carry0 = (state.sea_hidden, state.sea_cell,
                      jnp.zeros((B, nj)))
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

        # Non-finite backstop: sanitize + force-terminate exploded envs
        # before any reward/obs math sees them (base.guard_finite_state).
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
        # Per-term reward sums of envs that reset this step, normalized by
        # episode seconds; the consumer divides by the reset count
        # (averaging per-step values would deflate by the no-reset steps).
        episode_info = {
            "rew_" + k: jnp.sum(jnp.where(done, v, 0.0))
            / self.episode_length_s
            for k, v in episode_sums.items()
        }

        # Command resampling + heading controller + pushes.
        key, k1, k2 = jax.random.split(state.key, 3)
        resample_every = int(round(self.resampling_time_s / self.dt))
        resample = (episode_step % resample_every) == 0
        commands = self._resample_commands(state, resample, k1)
        if self.heading_command:
            commands = self._heading_to_yaw_cmd(commands, robot)
        push_every = int(round(self.push_interval_s / self.dt))
        do_push = (episode_step % push_every) == 0
        push_vel = jax.random.uniform(k2, (B, 2), minval=-self.max_push_vel,
                                      maxval=self.max_push_vel)
        robot = robot.replace(
            v=robot.v.at[:, :2].set(
                jnp.where(do_push[:, None], push_vel, robot.v[:, :2])
            )
        )

        command_ranges = (
            self._update_command_curriculum(state, done, episode_sums)
            if self.command_curriculum else state.command_ranges
        )
        new_state = state.replace(
            key=key,
            robot=robot,
            commands=commands,
            command_ranges=command_ranges,
            last_actions=actions,
            last_dof_vel=robot.v[:, 6:],
            feet_air_time=jnp.where(contact_filt, 0.0, air_time),
            last_contacts=contact,
            episode_step=episode_step,
            episode_sums=episode_sums,
        )
        new_state = self._do_reset(new_state, done)
        obs = self._obs(new_state)
        info = {"episode": episode_info, "time_outs": time_out,
                "n_resets": done.sum()}
        return new_state, Transition(obs=obs, privileged_obs=None,
                                     reward=total, done=done, info=info)
