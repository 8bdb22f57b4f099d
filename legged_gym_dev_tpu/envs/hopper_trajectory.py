"""Hopper trajectory-tracking RL environment on the batched rigid-body sim.

TPU-native re-design of the reference's flagship task (ref:
legged_gym/envs/hopper/hopper.py:41-458 + hopper_trajectory.py:46-502 +
flat_trajectory/hopper_trajectory_config.py): a 3D hopper with three
reaction wheels and a spring-loaded prismatic foot tracks a rolling ROM
trajectory window.

Faithful behaviors:
- Contact-gated hybrid torque controller (ref hopper.py:168-237): stance =
  foot spring force only; flight = PD to the foot-extension setpoint;
  wheels driven by an SO(3) quaternion-error PD in 'orientation' mode whose
  body torque is mapped through the actuator-frame rotation; optional
  'spindown' damping in stance; torque-speed-curve clipping.
- Observations (38): [z, quat, body lin vel, body ang vel, wheel vels,
  trajectory window relative to the base position, normalized action quat]
  with additive uniform noise (ref hopper_trajectory.py:255-282,
  _get_noise_scale_vec:439-468).
- Rewards: tracking_rom (weighted exp), differential_error (asymmetric
  slopes), raibert (deviation from the Raibert-heuristic action),
  orientation/ang-vel/torque/action-rate/dof-acc/unit-quat penalties,
  termination on body collision (ref hopper_trajectory.py:482-502,
  configs/rl/hopper_single_int.yaml reward scales).
- Domain randomization: spring stiffness/damping/setpoint, PD gains,
  torque/speed/slope multipliers (ref hopper.py:349-382); yaw-randomized
  resets with dof/root noise (ref hopper.py:292-330); periodic pushes.
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..controllers import RaibertHeuristic
from ..core.maths import (
    quat_apply,
    quat_mul,
    quat_inverse,
    quat_to_rotmat,
    quat_to_yaw,
    so3_log,
    yaw_to_quat,
)
from ..core.rom import SingleInt2D
from ..sim.contact import contact_forces
from ..sim.dynamics import RobotState, contact_kinematics
from ..sim.robot_sim import RobotSim
from ..trajgen.generator import TrajectoryGenerator, TrajGenState
from .base import Transition, guard_finite_state


from ..core.maths import masked_update as _mwhere  # noqa: E402


@struct.dataclass
class HopperDR:
    """Per-env multiplicative domain-randomization factors
    (ref hopper.py:349-382)."""

    spring_k: jax.Array      # (B,)
    spring_d: jax.Array      # (B,)
    spring_set: jax.Array    # (B,)
    p_gain: jax.Array        # (B, 4)
    d_gain: jax.Array        # (B, 4)
    torque: jax.Array        # (B,)
    speed: jax.Array         # (B,)
    ts_slope: jax.Array      # (B,)
    base_mass: jax.Array     # (B,) additive payload (ref randomize_base_mass)


@struct.dataclass
class CurriculumTables:
    """Stage-indexed multiplier tables (ref legged_robot_trajectory.py:
    519-555 update_command_curriculum; hopper_trajectory_config.py:216-258).

    Stage advances when the global step counter crosses the configured
    thresholds; every affected quantity is nominal * table[stage], evaluated
    dynamically under jit."""

    push_magnitude: jax.Array      # (S,)
    push_time: jax.Array           # (S,)
    rom_v: jax.Array               # (S,)
    sigma_tracking_rom: jax.Array  # (S,)
    reward_mult: jax.Array         # (S,) applied to all reward terms
    t_samp: jax.Array              # (S,) hold-time multiplier
    freq_low: jax.Array = None     # (S,) sinusoid-mode freq multipliers
    freq_high: jax.Array = None    # (S,)
    steps: tuple = struct.field(pytree_node=False, default=(2500, 5000))
    enabled: bool = struct.field(pytree_node=False, default=False)

    @classmethod
    def default(cls):
        # ref hopper_trajectory_config.py curriculum tables (3 stages).
        return cls(
            push_magnitude=jnp.asarray([0.1, 0.5, 1.0]),
            push_time=jnp.asarray([3.0, 2.0, 1.0]),
            rom_v=jnp.asarray([0.5, 0.75, 1.0]),
            sigma_tracking_rom=jnp.asarray([1.0, 0.8, 0.6]),
            reward_mult=jnp.asarray([1.0, 1.0, 1.0]),
            t_samp=jnp.asarray([3.0, 2.0, 1.0]),
            freq_low=jnp.asarray([0.01, 0.1, 1.0]),
            freq_high=jnp.asarray([0.1, 0.5, 1.0]),
        )

    @classmethod
    def hopper_single_int(cls):
        """The 8-stage schedule the fork actually trains the hopper with
        (ref deep_tube_learning/configs/rl/hopper_single_int.yaml:67-98):
        pushes ramp in over four stages, hold times/sinusoid freqs tighten,
        ROM velocity stays at 0.5x, tracking sigma sharpens 10x in the last
        two stages; per-term reward tables are all 1.0 there, and the
        max_rom_distance table is all-zero (both folded into the scalar
        ``reward_mult``/preset fields)."""
        return cls(
            push_magnitude=jnp.asarray(
                [0.0, 0.3, 0.6, 1.0, 1.0, 1.0, 1.0, 1.0]),
            push_time=jnp.asarray([4., 3., 2., 1., 1., 1., 1., 1.]),
            rom_v=jnp.full((8,), 0.5),
            sigma_tracking_rom=jnp.asarray(
                [1., 1., 1., 1., 1., 1., 0.1, 0.1]),
            reward_mult=jnp.ones(8),
            t_samp=jnp.asarray([3., 2., 1., 1., 1., 1., 1., 1.]),
            freq_low=jnp.asarray([0.01, 0.1, 1., 1., 1., 1., 1., 1.]),
            freq_high=jnp.asarray([0.1, 0.5, 1., 1., 1., 1., 1., 1.]),
            steps=(2500, 5000, 7500, 10000, 12500, 15000, 17500),
            enabled=True,
        )


@struct.dataclass
class HopperEnvState:
    key: jax.Array
    robot: RobotState
    traj_gen: TrajGenState
    trajectory: jax.Array        # (B, N_traj, 2)
    actions: jax.Array           # (B, 4) raw policy actions (quat wxyz)
    last_actions: jax.Array
    last_dof_vel: jax.Array      # (B, 4)
    torques: jax.Array           # (B, 4) last applied torques
    prev_error: jax.Array        # (B, 2) squared tracking error
    time_until_next_push: jax.Array  # (B,) seconds
    episode_step: jax.Array      # (B,)
    episode_sums: Dict[str, jax.Array]
    dr: HopperDR
    curriculum_stage: jax.Array      # () int32
    common_step: jax.Array           # () int32 global step counter


@struct.dataclass
class HopperTrajectoryEnv:
    sim: RobotSim                  # hopper model, dt=0.005, decimation=4
    traj_gen: TrajectoryGenerator  # SingleInt2D ROM window

    # Controller params (ref hopper_trajectory_config control/asset blocks).
    p_gains: jax.Array             # (4,) [foot, w1, w2, w3]
    d_gains: jax.Array
    kd_spindown: jax.Array         # (3,)
    spring_stiffness: jax.Array    # ()  11732
    spring_damping: jax.Array      # ()  50
    spring_setpoint: jax.Array     # ()  0
    foot_pos_des: jax.Array        # ()  0.03
    rot_actuator: jax.Array        # (3, 3)
    torque_limits: jax.Array       # (4,)
    wheel_speed_limit: jax.Array   # () 600
    ts_ratio: jax.Array            # () 6
    # Obs scales / noise.
    obs_scales: jax.Array          # (38,)
    noise_vec: jax.Array           # (38,)
    # Rewards.
    reward_weighting: jax.Array    # (2,) ROM weighting (position)
    tracking_sigma: jax.Array      # ()
    raibert: RaibertHeuristic
    curriculum: CurriculumTables = None
    reward_scales: tuple = struct.field(pytree_node=False, default=())
    diff_err_slopes: tuple = struct.field(pytree_node=False,
                                          default=(-4.0, -1.0))
    control_type: str = struct.field(pytree_node=False, default="orientation")
    add_noise: bool = struct.field(pytree_node=False, default=True)
    domain_rand: bool = struct.field(pytree_node=False, default=True)
    episode_length_s: float = struct.field(pytree_node=False, default=20.0)
    # Pushes SET the 6-dim base velocity on per-env random timers (ref
    # hopper_trajectory.py:153-167, _push_robots:362-372;
    # legged_robot_trajectory_config.py:150-152).
    push_robots: bool = struct.field(pytree_node=False, default=True)
    max_push_vel: tuple = struct.field(
        pytree_node=False, default=(0.25, 0.25, 0.25, 0.75, 0.75, 0.75))
    time_between_pushes: tuple = struct.field(pytree_node=False,
                                              default=(0.5, 10.0))
    # Contact sphere indices (from URDF order: torso, foot, wheels).
    foot_sphere: int = struct.field(pytree_node=False, default=1)
    termination_spheres: tuple = struct.field(pytree_node=False,
                                              default=(0, 2, 3, 4))
    num_envs: int = struct.field(pytree_node=False, default=4096)

    # ------------------------------------------------------------------
    @property
    def num_actions(self) -> int:
        return 4

    @property
    def n_traj(self) -> int:
        return self.traj_gen.N

    @property
    def num_obs(self) -> int:
        return 1 + 4 + 3 + 3 + 3 + 2 * self.n_traj + 4

    @property
    def dt(self) -> float:
        return self.sim.dt * self.sim.decimation

    @property
    def max_episode_length(self) -> int:
        return int(round(self.episode_length_s / self.dt))

    @property
    def rom(self) -> SingleInt2D:
        return self.traj_gen.rom

    # ---- controller (ref hopper.py:168-237) ---------------------------
    def _compute_torques(self, state: HopperEnvState,
                         robot: RobotState) -> jax.Array:
        B = self.num_envs
        actions = state.actions  # quat wxyz, scale 1
        foot_pos = robot.q[:, 0]
        foot_vel = robot.v[:, 6]
        wheel_vel = robot.v[:, 7:10]

        # Contact gating from the foot sphere's normal force.
        pos, vel, _ = contact_kinematics(self.sim.model, robot)
        f = contact_forces(self.sim.contact, pos, vel,
                           self.sim.model.contact_radius, self.sim.terrain_fn)
        contact = f[:, self.foot_sphere, 2] > 0.1

        p_g = self.p_gains[None, :] * state.dr.p_gain
        d_g = self.d_gains[None, :] * state.dr.d_gain

        # Foot: flight PD to setpoint; stance spring force (ref :195-200).
        tau_foot_flight = (-p_g[:, 0] * (foot_pos - self.foot_pos_des)
                           - d_g[:, 0] * foot_vel)
        spring_set = self.spring_setpoint * state.dr.spring_set
        tau_foot_stance = (
            -self.spring_stiffness * state.dr.spring_k * (foot_pos - spring_set)
            - self.spring_damping * state.dr.spring_d * foot_vel
        )
        tau_foot = jnp.where(contact, tau_foot_stance, tau_foot_flight)

        # Wheels: SO(3) orientation PD in body frame -> actuator frame
        # (ref :204-229).
        quat_wxyz = actions
        norm = jnp.clip(jnp.linalg.norm(quat_wxyz, axis=-1, keepdims=True),
                        1e-8)
        qd = quat_wxyz / norm
        # convert wxyz -> xyzw for our math lib
        quat_des = jnp.concatenate([qd[:, 1:], qd[:, :1]], axis=-1)
        err = quat_mul(quat_inverse(quat_des), robot.base_quat)
        log_err = so3_log(err)
        omega_body = robot.v[:, 3:6]
        local_tau = (-p_g[:, 1:] * log_err - d_g[:, 1:] * omega_body)
        # pytorch3d Rotate.transform_points is row-vector post-multiplication
        # (p @ R), so the actuator-frame map is local_tau @ R — NOT @ R^T
        # (that transposed map turns the attitude PD into positive feedback).
        tau_wheel = local_tau @ self.rot_actuator

        if "spindown" in self.control_type:
            kd_sp = self.kd_spindown[None, :] * state.dr.d_gain[:, 1:]
            tau_wheel = jnp.where(
                contact[:, None], -kd_sp * wheel_vel, tau_wheel
            )

        tau = jnp.concatenate([tau_foot[:, None], tau_wheel], axis=-1)

        # Torque-speed curve clipping on the wheels (ref :230-237).
        t_bound = self.torque_limits[None, :] * state.dr.torque[:, None]
        w_bound = self.wheel_speed_limit * state.dr.speed[:, None]
        slope = self.ts_ratio * state.dr.ts_slope[:, None]
        upper = -slope * t_bound[:, 1:] / w_bound * (wheel_vel - w_bound)
        lower = -slope * t_bound[:, 1:] / w_bound * (wheel_vel + w_bound)
        tau = tau.at[:, 1:].set(jnp.clip(tau[:, 1:], lower, upper))
        return jnp.clip(tau, -t_bound, t_bound)

    # ---- observations (ref hopper_trajectory.py:255-282) ---------------
    def _obs(self, state: HopperEnvState) -> jax.Array:
        B = self.num_envs
        robot = state.robot
        a = state.actions
        an = a / jnp.clip(jnp.linalg.norm(a, axis=-1, keepdims=True), 1e-8)
        an = jnp.where(an[:, :1] < 0, -an, an)  # qw > 0 convention
        R = quat_to_rotmat(robot.base_quat)
        lin_vel_body = jnp.einsum("bji,bj->bi", R, robot.v[:, :3])
        mod_traj = state.trajectory - self.rom.proj_z(
            robot.root_states
        )[:, None, :2]
        obs = jnp.concatenate([
            robot.base_pos[:, 2:3],
            robot.base_quat,
            lin_vel_body,
            robot.v[:, 3:6],
            robot.v[:, 7:10],
            mod_traj.reshape(B, -1),
            an,
        ], axis=-1)
        obs = obs * self.obs_scales[None, :]
        if self.add_noise:
            key = jax.random.fold_in(state.key, 3)
            obs = obs + (2.0 * jax.random.uniform(key, obs.shape) - 1.0) \
                * self.noise_vec[None, :]
        # ref legged_robot.py:100 clip_observations=100.
        return jnp.clip(obs, -100.0, 100.0)

    # ---- resets (ref hopper.py:292-330) --------------------------------
    def _reset_robot(self, state: HopperEnvState, mask: jax.Array,
                     key: jax.Array) -> RobotState:
        B = self.num_envs
        ks = jax.random.split(key, 6)
        robot = state.robot
        # Spawn with the foot sphere at ground contact: foot z =
        # base - 0.36 + q + radius(0.02). The reference's 0.3 init height
        # (hopper_trajectory_config.py:16) buries the foot 3cm in the plane;
        # Isaac's solver absorbs that, a penalty contact model launches it.
        base_pos = jnp.concatenate([
            jnp.zeros((B, 2)),
            0.36 + jax.random.uniform(ks[0], (B, 1), minval=0.0, maxval=0.06),
        ], axis=-1)
        yaw = jax.random.uniform(ks[1], (B,), minval=-jnp.pi, maxval=jnp.pi)
        quat = yaw_to_quat(yaw)
        quat = quat + jax.random.uniform(ks[2], (B, 4), minval=-0.03,
                                         maxval=0.03)
        quat = quat / jnp.linalg.norm(quat, axis=-1, keepdims=True)
        q = jnp.concatenate([
            jax.random.uniform(ks[3], (B, 1), minval=-0.02, maxval=0.02)
            + 0.03,
            jnp.zeros((B, 3)),
        ], axis=-1)
        v = jnp.concatenate([
            jax.random.uniform(ks[4], (B, 3), minval=-0.05, maxval=0.05),
            jax.random.uniform(ks[5], (B, 3), minval=-0.2, maxval=0.2),
            jnp.zeros((B, 4)),
        ], axis=-1)
        return RobotState(
            base_pos=_mwhere(mask, base_pos, robot.base_pos),
            base_quat=_mwhere(mask, quat, robot.base_quat),
            q=_mwhere(mask, jnp.clip(q, self.sim.model.q_lower,
                                     self.sim.model.q_upper), robot.q),
            v=_mwhere(mask, v, robot.v),
        )

    def _resample_dr(self, dr: HopperDR, mask: jax.Array,
                     key: jax.Array) -> HopperDR:
        if not self.domain_rand:
            # Data-generation configs disable DR (ref
            # configs/data_generation/default_hopper.yaml).
            return dr
        B = self.num_envs
        ks = jax.random.split(key, 9)
        u = lambda k, lo, hi, shape=(B,): jax.random.uniform(
            k, shape, minval=lo, maxval=hi
        )
        new = HopperDR(
            spring_k=u(ks[0], 0.9, 1.1),
            spring_d=u(ks[1], 0.9, 1.1),
            spring_set=u(ks[2], 0.75, 1.25),
            p_gain=u(ks[3], 0.9, 1.1, (B, 4)),
            d_gain=u(ks[4], 0.9, 1.1, (B, 4)),
            torque=u(ks[5], 0.95, 1.05),
            speed=u(ks[6], 0.9, 1.1),
            ts_slope=u(ks[7], 0.9, 1.1),
            # ref flat/hopper_config.py domain_rand.added_mass_range.
            base_mass=u(ks[8], -1.0, 1.0),
        )
        return jax.tree.map(lambda n, o: _mwhere(mask, n, o), new, dr)

    def reset(self, key: jax.Array) -> Tuple[HopperEnvState, jax.Array]:
        B = self.num_envs
        zero_dr = HopperDR(
            spring_k=jnp.ones(B), spring_d=jnp.ones(B),
            spring_set=jnp.ones(B), p_gain=jnp.ones((B, 4)),
            d_gain=jnp.ones((B, 4)), torque=jnp.ones(B),
            speed=jnp.ones(B), ts_slope=jnp.ones(B),
            base_mass=jnp.zeros(B),
        )
        zero_action = jnp.tile(
            jnp.asarray([1.0, 0, 0, 0]), (B, 1)
        )  # identity quat wxyz (cfg.control.zero_action)
        state = HopperEnvState(
            key=key,
            robot=self.sim.default_state(B, base_pos=(0, 0, 0.3)),
            traj_gen=self.traj_gen.init_state(jax.random.fold_in(key, 0), B),
            trajectory=jnp.zeros((B, self.n_traj, 2)),
            actions=zero_action,
            last_actions=zero_action,
            last_dof_vel=jnp.zeros((B, 4)),
            torques=jnp.zeros((B, 4)),
            prev_error=jnp.zeros((B, 2)),
            time_until_next_push=jnp.zeros((B,)),
            episode_step=jnp.zeros((B,), jnp.int32),
            episode_sums={name: jnp.zeros((B,))
                          for name, _ in self.reward_scales},
            dr=zero_dr,
            curriculum_stage=jnp.asarray(0, jnp.int32),
            common_step=jnp.asarray(0, jnp.int32),
        )
        state = self._do_reset(state, jnp.ones((B,), bool))
        return state, self._obs(state)

    def _do_reset(self, state: HopperEnvState,
                  mask: jax.Array) -> HopperEnvState:
        key = state.key
        k1, k2, k3, key = jax.random.split(key, 4)
        robot = self._reset_robot(state, mask, k1)
        dr = self._resample_dr(state.dr, mask, k2)
        p_zx = self.rom.proj_z(robot.root_states)
        tg = self._traj_gen_cur(state).reset(state.traj_gen, mask, p_zx)
        B = self.num_envs
        zero_action = jnp.tile(jnp.asarray([1.0, 0, 0, 0]), (B, 1))
        push_t = self._cur(state, self.curriculum.push_time) \
            if self.curriculum is not None else 1.0
        first_push = jax.random.uniform(
            jax.random.fold_in(key, 7), (B,),
            minval=self.time_between_pushes[0] * push_t,
            maxval=self.time_between_pushes[1] * push_t,
        )
        return state.replace(
            key=key,
            robot=robot,
            traj_gen=tg,
            trajectory=self.traj_gen.get_trajectory(tg)[..., :2],
            actions=_mwhere(mask, zero_action, state.actions),
            last_actions=_mwhere(mask, zero_action, state.last_actions),
            last_dof_vel=_mwhere(mask, jnp.zeros((B, 4)), state.last_dof_vel),
            prev_error=_mwhere(mask, jnp.zeros((B, 2)), state.prev_error),
            time_until_next_push=jnp.where(mask, first_push,
                                           state.time_until_next_push),
            episode_step=jnp.where(mask, 0, state.episode_step),
            episode_sums={k: jnp.where(mask, 0.0, v)
                          for k, v in state.episode_sums.items()},
            dr=dr,
        )

    def _cur(self, state: HopperEnvState, table: jax.Array) -> jax.Array:
        """Current curriculum multiplier (1.0 when disabled)."""
        if self.curriculum is None or not self.curriculum.enabled:
            return jnp.asarray(1.0)
        return table[jnp.clip(state.curriculum_stage, 0,
                              table.shape[0] - 1)]

    def _traj_gen_cur(self, state: HopperEnvState) -> TrajectoryGenerator:
        """Trajectory generator with curriculum-scaled ROM input bounds and
        hold times (ref :533-546)."""
        if self.curriculum is None or not self.curriculum.enabled:
            return self.traj_gen
        mv = self._cur(state, self.curriculum.rom_v)
        mt = self._cur(state, self.curriculum.t_samp)
        rom = self.rom.replace(v_min=self.rom.v_min * mv,
                               v_max=self.rom.v_max * mv)
        ts = self.traj_gen.t_sampler
        ts = ts.replace(t_low=ts.t_low * mt, t_high=ts.t_high * mt)
        gen = self.traj_gen.replace(rom=rom, t_sampler=ts)
        if self.curriculum.freq_low is not None:
            # Sinusoid-mode frequency band multipliers (ref yaml
            # trajectory_generator.freq_low/freq_high tables).
            gen = gen.replace(
                freq_low=gen.freq_low
                * self._cur(state, self.curriculum.freq_low),
                freq_high=gen.freq_high
                * self._cur(state, self.curriculum.freq_high),
            )
        return gen

    # ---- rewards --------------------------------------------------------
    def _common_rewards(self, state, robot: RobotState, actions, torques,
                        term_contact, names) -> Dict[str, jax.Array]:
        """Hopper reward terms shared by the trajectory and velocity tasks
        (ref hopper.py:448-458 overrides + base terms)."""
        out = {}
        for name in names:
            if name == "orientation":
                # Penalize non-upright base (projected gravity xy).
                R = quat_to_rotmat(robot.base_quat)
                g_body = R[:, 2, :2]  # world-z in body frame, xy components
                out[name] = jnp.sum(jnp.square(g_body), axis=-1)
            elif name == "ang_vel_xy":
                out[name] = jnp.sum(jnp.square(robot.v[:, 3:5]), axis=-1)
            elif name == "lin_vel_z":
                out[name] = jnp.square(robot.v[:, 2])
            elif name == "torques":
                out[name] = jnp.sum(jnp.square(torques), axis=-1)
            elif name == "torque_limits":
                # ref hopper.py:448-450: sum |tau| over the wheel joints.
                out[name] = jnp.sum(jnp.abs(torques[:, 1:]), axis=-1)
            elif name == "dof_acc":
                # WHEEL joints only (ref hopper.py:452-454 — the spring
                # foot's touchdown deceleration would swamp the term).
                out[name] = jnp.sum(
                    jnp.square(
                        (robot.v[:, 7:10] - state.last_dof_vel[:, 1:])
                        / self.dt
                    ),
                    axis=-1,
                )
            elif name == "action_rate":
                out[name] = jnp.sum(
                    jnp.square(actions - state.last_actions), axis=-1
                )
            elif name == "unit_quat":
                out[name] = jnp.square(
                    1.0 - jnp.linalg.norm(actions, axis=-1)
                )
            elif name == "collision":
                out[name] = term_contact.astype(jnp.float32)
            elif name == "termination":
                out[name] = jnp.zeros(self.num_envs)  # filled in step
            else:
                raise ValueError(f"unknown reward term {name}")
        return out

    def _rewards(self, state: HopperEnvState, robot: RobotState,
                 actions, torques, term_contact) -> Dict[str, jax.Array]:
        desired = state.trajectory[:, 0, :]
        pz_x = self.rom.proj_z(robot.root_states)
        sq_err = jnp.square(pz_x - desired)
        sigma = self.tracking_sigma * self._cur(
            state, self.curriculum.sigma_tracking_rom
        ) if self.curriculum is not None else self.tracking_sigma

        out = {}
        rest = []
        for name, _ in self.reward_scales:
            if name == "tracking_rom":
                err = sq_err @ self.reward_weighting
                out[name] = jnp.exp(-err / sigma)
            elif name == "differential_error":
                err = jnp.linalg.norm(sq_err, axis=-1)
                diff = err - jnp.linalg.norm(state.prev_error, axis=-1)
                pos_s, neg_s = self.diff_err_slopes
                mult = jnp.where(diff < 0, neg_s, pos_s)
                out[name] = mult * diff
            elif name == "raibert":
                # Deviation from the Raibert-heuristic action
                # (ref hopper_trajectory.py:482-502): target = the CURRENT
                # trajectory node, body-frame planar velocity, raw actions.
                R = quat_to_rotmat(robot.base_quat)
                vel_body = jnp.einsum("bji,bj->bi", R, robot.v[:, :3])
                des_pos = state.trajectory[:, 0, :]
                des_vel = state.traj_gen.v[:, :2]
                rh_obs = jnp.concatenate([
                    des_pos - pz_x, vel_body[:, :2], des_vel,
                    robot.base_quat,
                ], axis=-1)
                a_rh = self.raibert(rh_obs)
                out[name] = jnp.sum(jnp.square(actions - a_rh), axis=-1)
            else:
                rest.append(name)
        out.update(self._common_rewards(state, robot, actions, torques,
                                        term_contact, rest))
        return out

    # ---- step -----------------------------------------------------------
    def step(self, state: HopperEnvState,
             actions: jax.Array) -> Tuple[HopperEnvState, Transition]:
        B = self.num_envs
        actions = jnp.clip(actions, -100.0, 100.0)
        state = state.replace(actions=actions)

        # Decimated physics with torques recomputed per substep; the
        # recorded torques are those applied in the last substep (an extra
        # post-step recomputation would be both wasted contact work and not
        # a torque that was ever applied).
        def ctrl(carry, rs):
            tau = self._compute_torques(state, rs)
            return tau, tau

        sim = self.sim.replace(base_mass_delta=state.dr.base_mass) \
            if self.domain_rand else self.sim
        robot, torques = sim.step_with_carry(
            state.robot, jnp.zeros((self.num_envs, 4)), ctrl
        )
        # Non-finite backstop (base.guard_finite_state).
        robot, nonfinite = guard_finite_state(
            robot, self.sim.default_state(self.num_envs))
        torques = jnp.where(nonfinite[:, None], 0.0, torques)

        # Trajectory generator tick at the policy rate (curriculum-scaled).
        tgen = self._traj_gen_cur(state)
        tg = tgen.step(state.traj_gen)
        trajectory = tgen.get_trajectory(tg)[..., :2]
        mid = state.replace(robot=robot, traj_gen=tg, trajectory=trajectory)

        # Termination: bad contacts or time limit.
        pos, vel, _ = contact_kinematics(self.sim.model, robot)
        f = contact_forces(self.sim.contact, pos, vel,
                           self.sim.model.contact_radius, self.sim.terrain_fn)
        term_idx = jnp.asarray(self.termination_spheres)
        term_contact = jnp.any(
            jnp.linalg.norm(f[:, term_idx, :], axis=-1) > 1.0, axis=-1
        ) | nonfinite
        episode_step = state.episode_step + 1
        time_out = episode_step >= self.max_episode_length
        done = term_contact | time_out

        rews = self._rewards(mid, robot, actions, torques, term_contact)
        scales = dict(self.reward_scales)
        # Stage-wise reward multiplier (ref yaml curriculum.rewards tables;
        # the fork's actual tables are uniform across terms, so one scalar
        # table applies to every term).
        rmult = self._cur(state, self.curriculum.reward_mult) \
            if self.curriculum is not None else 1.0
        total = sum(
            r * (scales[k] * self.dt) for k, r in rews.items()
            if k != "termination"
        ) * rmult
        if "termination" in scales:
            term_r = term_contact.astype(jnp.float32) * scales["termination"]
            total = total + term_r * rmult
            rews["termination"] = term_contact.astype(jnp.float32)
        # rmult in the sums too: logged per-term rewards must track the
        # reward actually optimized across curriculum stages.
        episode_sums = {
            k: state.episode_sums[k]
            + rews[k] * rmult
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

        # Pushes on per-env random timers, curriculum-scaled: SET the 6-dim
        # base velocity (ref hopper_trajectory.py:153-167, :362-372).
        key, kp, kt = jax.random.split(state.key, 3)
        if self.push_robots:
            push_mag = jnp.asarray(self.max_push_vel) * (self._cur(
                state, self.curriculum.push_magnitude
            ) if self.curriculum is not None else 1.0)
            push_t = self._cur(
                state, self.curriculum.push_time
            ) if self.curriculum is not None else 1.0
            timer = state.time_until_next_push - self.dt
            need_push = timer <= 0.0
            push_vel = jax.random.uniform(kp, (B, 6), minval=-push_mag,
                                          maxval=push_mag)
            robot = robot.replace(v=robot.v.at[:, :6].set(
                jnp.where(need_push[:, None], push_vel, robot.v[:, :6])
            ))
            timer = jnp.where(
                need_push,
                jax.random.uniform(
                    kt, (B,),
                    minval=self.time_between_pushes[0] * push_t,
                    maxval=self.time_between_pushes[1] * push_t,
                ),
                timer,
            )
        else:
            timer = state.time_until_next_push

        desired = trajectory[:, 0, :]
        pz_x = self.rom.proj_z(robot.root_states)
        # Curriculum stage advance on global step thresholds (ref
        # legged_robot.py:359-363).
        common_step = state.common_step + 1
        stage = state.curriculum_stage
        if self.curriculum is not None and self.curriculum.enabled:
            thresholds = jnp.asarray(self.curriculum.steps, jnp.int32)
            stage = jnp.sum(
                (common_step >= thresholds).astype(jnp.int32)
            )

        new_state = mid.replace(
            key=key,
            robot=robot,
            curriculum_stage=stage,
            common_step=common_step,
            last_actions=actions,
            last_dof_vel=robot.v[:, 6:],
            torques=torques,
            prev_error=jnp.square(pz_x - desired),
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
