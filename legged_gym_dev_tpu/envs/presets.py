"""Preset task factories encoding the reference robot configurations.

The reference expresses per-robot setups as nested Python class configs
(ref: legged_gym/envs/hopper/flat_trajectory/hopper_trajectory_config.py,
deep_tube_learning/configs/rl/hopper_single_int.yaml); here each task is an
explicit factory with the same numbers, registered in the task registry.
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from ..controllers import RaibertHeuristic
from ..core.rom import DoubleInt2D, SingleInt2D, make_rom
from ..rl.ppo import PPOConfig
from ..sim.contact import ContactParams
from ..sim.dynamics import RobotModel
from ..sim.robot_sim import RobotSim
from ..sim.rom_sim import RomSim
from ..sim.urdf import parse_urdf
from ..trajgen.generator import TrajectoryGenerator
from ..trajgen.samplers import (
    SAMPLER_REGISTRY,
    UniformSampleHoldDT,
    UniformWeightSampler,
    UniformWeightSamplerNoRamp,
)
from .hopper_trajectory import HopperTrajectoryEnv
from .registry import task_registry
from .rom_tracking import RomTrackingEnv

HOPPER_URDF = "/root/reference/resources/robots/hopper/urdf/hopper.urdf"

# ref: flat_trajectory/hopper_trajectory_config.py:79-83
HOPPER_ROT_ACTUATOR = [
    [-0.8165, 0.2511, 0.2511],
    [-0.0, -0.7643, 0.7643],
    [-0.5773, -0.5939, -0.5939],
]

# ref: configs/rl/hopper_single_int.yaml reward scales
HOPPER_REWARD_SCALES = (
    ("termination", -500.0),
    ("tracking_rom", 6.0),
    ("ang_vel_xy", -0.01),
    ("orientation", -80.0),
    ("torques", -0.000001),
    ("dof_acc", -2.5e-8),
    ("unit_quat", -0.01),
    ("collision", -1.0),
    ("action_rate", -0.01),
    ("differential_error", 10.0),
    ("raibert", -0.1),
)


def make_hopper_trajectory_env(
    num_envs: int = 4096,
    vel_max: float = 0.2,
    rom_dt: float = 0.1,
    n_traj: int = 10,
    episode_length_s: float = 20.0,
    add_noise: bool = True,
    domain_rand: bool = True,
    push_robots: bool = True,
    max_push_vel=(0.25, 0.25, 0.25, 0.75, 0.75, 0.75),
    time_between_pushes=(0.5, 10.0),
    push_interval_s: float | None = None,
    urdf_path: str = HOPPER_URDF,
    reward_scales=HOPPER_REWARD_SCALES,
    curriculum: str | None = None,
    weight_sampler=None,
) -> HopperTrajectoryEnv:
    """Hopper tracking a SingleInt2D ROM (ref hopper_single_int.yaml).

    ``curriculum``: None (off, the config-default ``use_curriculum=False``),
    "single_int" (the 8-stage schedule the fork trains with, ref
    hopper_single_int.yaml:67-98) or "default" (the 3-stage config tables).

    Pushes SET the 6-dim base velocity on per-env random timers in
    ``time_between_pushes`` seconds (ref hopper_trajectory.py:153-167,
    legged_robot_trajectory_config.py:150-152). A scalar ``max_push_vel``
    is broadcast to all 6 dims; 0.0 (or push_robots=False) disables.
    ``push_interval_s`` is a legacy alias mapped onto the timer upper
    bound.
    """
    if isinstance(max_push_vel, (int, float)):
        push_robots = push_robots and max_push_vel > 0.0
        max_push_vel = (float(max_push_vel),) * 6
    if push_interval_s is not None:
        time_between_pushes = (min(0.5, push_interval_s), push_interval_s)
    spec = parse_urdf(urdf_path)
    model = RobotModel.from_spec(spec)
    # dt=2.5ms (policy rate unchanged at 50Hz): at the reference's 5ms the
    # explicit contact+foot-spring cycle pumps energy each hop and the
    # hopper bounces itself over (PhysX's implicit solver tolerates 5ms).
    sim = RobotSim.create(
        model,
        contact=ContactParams.create(stiffness=16000.0, damping=80.0,
                                     friction=1.0, slip_vel=0.05),
        dt=0.0025, decimation=8,
    )
    rom = SingleInt2D.create(
        rom_dt, [-10.0, -10.0], [10.0, 10.0],
        [-vel_max, -vel_max], [vel_max, vel_max],
    )
    # ``weight_sampler``: None -> the fork's UniformWeightSamplerNoRamp
    # (ref hopper_single_int.yaml weight_samp_cls), a SAMPLER_REGISTRY name
    # (e.g. "UniformWeightSamplerTurnBiased"), or a sampler instance.
    if weight_sampler is None:
        weight_sampler = UniformWeightSamplerNoRamp()
    elif isinstance(weight_sampler, str):
        weight_sampler = SAMPLER_REGISTRY[weight_sampler]()
    gen = TrajectoryGenerator.create(
        rom, UniformSampleHoldDT.create(2.0, 6.0), weight_sampler,
        dt_loop=0.02, N=n_traj, dN=1, freq_low=0.01, freq_high=2.0,
        prob_stationary=0.01,
    )
    n_t = 2 * n_traj
    obs_scales = jnp.concatenate([
        jnp.asarray([1.0]),              # z_pos
        jnp.ones(4),                     # quat
        0.5 * jnp.ones(3),               # lin vel
        0.25 * jnp.ones(3),              # ang vel
        0.01 * jnp.ones(3),              # wheel vel
        jnp.ones(n_t),                   # trajectory
        jnp.ones(4),                     # action quat
    ])
    # ref noise_scales (hopper_trajectory_config.py:105-114) x obs scale.
    noise_vec = jnp.concatenate([
        jnp.asarray([0.02]),
        0.05 * jnp.ones(4),
        0.1 * 0.5 * jnp.ones(3),
        0.2 * 0.25 * jnp.ones(3),
        1.5 * 0.01 * jnp.ones(3),
        jnp.zeros(n_t),
        jnp.zeros(4),
    ])
    from .hopper_trajectory import CurriculumTables

    cur_tables = {
        None: None,
        "default": CurriculumTables.default().replace(enabled=True),
        "single_int": CurriculumTables.hopper_single_int(),
    }[curriculum]
    return HopperTrajectoryEnv(
        sim=sim,
        traj_gen=gen,
        curriculum=cur_tables,
        p_gains=jnp.asarray([400.0, 15.0, 15.0, 15.0]),
        d_gains=jnp.asarray([40.0, 3.0, 3.0, 3.0]),
        kd_spindown=jnp.asarray([0.1, 0.1, 0.1]),
        spring_stiffness=jnp.asarray(11732.0),
        spring_damping=jnp.asarray(50.0),
        spring_setpoint=jnp.asarray(0.0),
        foot_pos_des=jnp.asarray(0.03),
        rot_actuator=jnp.asarray(HOPPER_ROT_ACTUATOR),
        torque_limits=jnp.asarray([25000.0, 2.1, 2.1, 2.1]),
        wheel_speed_limit=jnp.asarray(600.0),
        ts_ratio=jnp.asarray(6.0),
        obs_scales=obs_scales,
        noise_vec=noise_vec,
        reward_weighting=jnp.asarray([1.0, 1.0]),
        tracking_sigma=jnp.asarray(0.25),
        raibert=RaibertHeuristic.create(-0.3, -0.9, 0.0, 0.5, 1.0, 0.2),
        reward_scales=tuple(reward_scales),
        add_noise=add_noise,
        domain_rand=domain_rand,
        push_robots=push_robots,
        max_push_vel=tuple(max_push_vel),
        time_between_pushes=tuple(time_between_pushes),
        episode_length_s=episode_length_s,
        num_envs=num_envs,
    )


def make_rom_tracking_env(num_envs: int = 4096, episode_length_s: float = 8.0,
                          rom_dt: float = 0.1, dt_loop: float = 0.05,
                          add_noise: bool = False):
    """Double integrator tracking a SingleInt2D ROM (CustomSim analog).

    ``add_noise`` is accepted for factory-interface uniformity (play passes
    it to every task) and ignored: like the reference's CustomSim
    (ref deep_tube_learning/custom_sim.py:5-103) this env has no obs noise.
    """
    del add_noise
    rom = SingleInt2D.create(rom_dt, [-10, -10], [10, 10], [-1, -1], [1, 1])
    model = DoubleInt2D.create(
        dt_loop, [-20, -20, -2, -2], [20, 20, 2, 2], [-4, -4], [4, 4]
    )
    gen = TrajectoryGenerator.create(
        rom, UniformSampleHoldDT.create(0.5, 2.0), UniformWeightSampler(),
        dt_loop=dt_loop, N=4, dN=1, prob_stationary=0.01,
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


A1_URDF = "/root/reference/resources/robots/a1/urdf/a1.urdf"
ANYMAL_C_URDF = "/root/reference/resources/robots/anymal_c/urdf/anymal_c.urdf"
ANYMAL_B_URDF = "/root/reference/resources/robots/anymal_b/urdf/anymal_b.urdf"
CASSIE_URDF = "/root/reference/resources/robots/cassie/urdf/cassie.urdf"

# ref a1_config.py:36-50 default joint angles (URDF joint order: FR FL RR RL).
A1_DEFAULT_ANGLES = {
    "FR_hip_joint": -0.1, "FR_thigh_joint": 0.8, "FR_calf_joint": -1.5,
    "FL_hip_joint": 0.1, "FL_thigh_joint": 0.8, "FL_calf_joint": -1.5,
    "RR_hip_joint": -0.1, "RR_thigh_joint": 1.0, "RR_calf_joint": -1.5,
    "RL_hip_joint": 0.1, "RL_thigh_joint": 1.0, "RL_calf_joint": -1.5,
}

# Canonical rough-terrain locomotion scales (upstream legged_gym defaults +
# a1_config.py overrides: torques, dof_pos_limits).
A1_REWARD_SCALES = (
    ("tracking_lin_vel", 1.0),
    ("tracking_ang_vel", 0.5),
    ("lin_vel_z", -2.0),
    ("ang_vel_xy", -0.05),
    ("torques", -0.0002),
    ("dof_acc", -2.5e-7),
    ("feet_air_time", 1.0),
    ("collision", -1.0),
    ("action_rate", -0.01),
    ("dof_pos_limits", -10.0),
    ("termination", -0.0),
)


def make_velocity_env(urdf_path: str, num_envs: int = 4096,
                      default_angles: dict = A1_DEFAULT_ANGLES,
    sim_dt: float = 0.005,
    sim_decimation: int = 4,
    contact=None,
                      p_gain: float = 20.0, d_gain: float = 0.5,
                      action_scale: float = 0.25,
                      base_height: float = 0.42,
                      base_height_target: float = 0.25,
                      foot_name: str = "foot",
                      penalize_on=("thigh", "calf"),
                      terminate_on=("base", "trunk"),
                      reward_scales=A1_REWARD_SCALES,
                      add_noise: bool = True,
                      episode_length_s: float = 20.0,
                      # The reference clips negative totals at zero "to
                      # avoid early termination problems" (ref
                      # legged_robot_config.py:170). In THIS sim the
                      # explicit-integrator contact carries larger
                      # vz/dof_acc penalties at random init, and the clip
                      # then zeroes the PPO gradient everywhere (measured
                      # round 5: flat anymal pinned at reward exactly 0
                      # for 300 iters with the clip; learns without it —
                      # docs/PERF.md). Termination penalties in these
                      # presets are mild, so the clip's motivation does
                      # not apply; default False, overridable per task.
                      only_positive_rewards: bool = False,
                      max_contact_force: float = 100.0,
                      measure_heights: bool = False,
                      command_curriculum: bool = False,
                      init_lin_vel_range: float = 1.0,
                      randomize_friction: bool = True,
                      friction_range=(0.5, 1.25),
                      randomize_base_mass: bool = False,
                      added_mass_range=(-1.0, 1.0),
                      randomize_contact: bool = False,
                      contact_mult_range=(0.7, 1.3),
                      terrain=None):
    """Velocity-command task for any URDF robot (ref legged_robot.py)."""
    from .legged_robot_velocity import (
        LeggedRobotVelocityEnv,
        classify_contacts,
    )

    spec = parse_urdf(urdf_path)
    model = RobotModel.from_spec(spec)
    terrain_fn = terrain.make_terrain_fn() if terrain is not None else None
    env_origins = None
    terrain_origins = None
    terrain_types = None
    if terrain is not None and terrain.type not in ("none", "plane"):
        import numpy as _np

        # Origins table [row(level), col(type)]. make_terrain_fn maps world
        # (x, y) -> pixel via (x + border)/hs, so cell centers in world
        # coordinates are exactly env_origins (no border shift).
        table = terrain.env_origins
        terrain_origins = jnp.asarray(table, jnp.float32)
        # Fixed per-env terrain type (column); start at level 0 like the
        # reference curriculum (ref legged_robot.py custom_origins init).
        terrain_types = jnp.asarray(
            _np.arange(num_envs) % table.shape[1], jnp.int32
        )
        env_origins = terrain_origins[
            jnp.zeros(num_envs, jnp.int32), terrain_types
        ]
    sim = RobotSim.create(
        model,
        contact=contact or ContactParams.create(stiffness=5000.0,
                                                damping=50.0),
        dt=sim_dt, decimation=sim_decimation,
        **({"terrain_fn": terrain_fn} if terrain_fn else {}),
    )
    default_dof = jnp.asarray(
        [default_angles.get(n, 0.0) for n in model.dof_names], jnp.float32
    )

    def _gains(g):
        """Scalar, or dict matched by name-substring like the reference's
        control.stiffness/damping tables (ref legged_robot.py:560-575
        _init_buffers gain assignment: first key contained in the dof name
        wins)."""
        if isinstance(g, dict):
            vals = []
            for n in model.dof_names:
                v = 0.0
                for k, gv in g.items():
                    if k in n:
                        v = float(gv)
                        break
                vals.append(v)
            return jnp.asarray(vals, jnp.float32)
        return jnp.full((model.nj,), float(g))

    feet, pen, term = classify_contacts(model, foot_name, penalize_on,
                                        terminate_on)
    nj = model.nj
    # Perceptive height-scan grid (ref legged_robot_config.py:54-57:
    # 17 x 11 = 187 points -> num_observations 235 on the quadrupeds).
    mpx = tuple(np.round(np.arange(-0.8, 0.81, 0.1), 2)) \
        if measure_heights else None
    mpy = tuple(np.round(np.arange(-0.5, 0.51, 0.1), 2)) \
        if measure_heights else None
    n_hpts = len(mpx) * len(mpy) if measure_heights else 0
    # ref noise scales (legged_robot_config noise block) x obs scales.
    noise_vec = jnp.concatenate([
        0.1 * 2.0 * jnp.ones(3),      # lin vel
        0.2 * 0.25 * jnp.ones(3),     # ang vel
        0.05 * jnp.ones(3),           # gravity
        jnp.zeros(3),                 # commands
        0.01 * jnp.ones(nj),          # dof pos
        1.5 * 0.05 * jnp.ones(nj),    # dof vel
        jnp.zeros(nj),                # actions
        0.1 * 5.0 * jnp.ones(n_hpts),  # height measurements
    ])
    return LeggedRobotVelocityEnv(
        sim=sim,
        default_dof_pos=default_dof,
        p_gains=_gains(p_gain),
        d_gains=_gains(d_gain),
        base_init_pos=jnp.asarray([0.0, 0.0, base_height]),
        obs_scales=jnp.ones(1),  # scales applied inline
        noise_vec=noise_vec,
        # ref commands block: lin_vel_x/y [-1, 1], ang_vel [-1, 1],
        # heading [-pi, pi] (legged_robot_config.py:82-95). With
        # ``command_curriculum`` the lin-vel ranges start at
        # +-init_lin_vel_range and widen on tracking success (ref
        # legged_robot.py:488-500 update_command_curriculum).
        command_curriculum=command_curriculum,
        init_command_ranges=jnp.asarray(
            [[-init_lin_vel_range, init_lin_vel_range],
             [-init_lin_vel_range, init_lin_vel_range], [-1.0, 1.0],
             [-np.pi, np.pi]], jnp.float32,
        ),
        tracking_sigma=jnp.asarray(0.25),
        base_height_target=jnp.asarray(base_height_target),
        max_contact_force=jnp.asarray(max_contact_force),
        only_positive_rewards=only_positive_rewards,
        measured_points_x=mpx,
        measured_points_y=mpy,
        soft_dof_vel_limit=jnp.asarray(1.0),
        soft_torque_limit=jnp.asarray(1.0),
        env_origins=env_origins,
        terrain_origins=terrain_origins,
        terrain_types=terrain_types,
        terrain_curriculum=terrain is not None
        and terrain.type not in ("none", "plane"),
        randomize_friction=randomize_friction,
        friction_range=tuple(friction_range),
        randomize_base_mass=randomize_base_mass,
        added_mass_range=tuple(added_mass_range),
        randomize_contact=randomize_contact,
        contact_mult_range=tuple(contact_mult_range),
        action_scale=action_scale,
        reward_scales=tuple(reward_scales),
        feet_spheres=feet,
        penalized_spheres=pen,
        termination_spheres=term,
        add_noise=add_noise,
        episode_length_s=episode_length_s,
        num_envs=num_envs,
    )


@dataclasses.dataclass
class RewardWeighting:
    """Per-dim tracking-reward weights consumed by each ROM's
    ``weighting_vector`` (ref legged_robot_trajectory_config.py
    reward_weighting block)."""

    position: float = 1.0
    velocity: float = 1.0
    orientation: float = 1.0
    angular_velocity: float = 1.0


def make_trajectory_env(urdf_path: str, num_envs: int = 4096,
                        rom_dt: float = 0.1, vel_max: float = 0.35,
                        rom_cls: str = "SingleInt2D",
                        rom_z_min=None, rom_z_max=None,
                        rom_v_min=None, rom_v_max=None,
                        reward_weighting: RewardWeighting | None = None,
                        n_traj: int = 10, dn_traj: int = 1,
                        t_low: float = 1.0, t_high: float = 2.0,
                        max_rom_distance=None,
                        zero_rom_dist_llh: float = 0.25,
                        reward_scales=None,
                        **kw):
    """Trajectory-tracking task for any URDF robot: the velocity env's
    machinery with commands replaced by a rolling ROM window
    (ref legged_robot_trajectory.py + legged_robot_trajectory_config.py:
    71-100 rom/trajectory_generator blocks; anymal_c flat/rough trajectory
    configs).

    ``rom_cls`` selects any of the six ROMs by name (the reference's
    config-string lookup ``globals()[rom_cfg.cls]``, here the explicit
    registry); bounds default to unbounded positions and ±vel_max inputs
    (the config defaults), overridable per dim."""
    from ..core.rom import ROM_REGISTRY
    from .legged_robot_trajectory import LeggedRobotTrajectoryEnv

    rom_type = ROM_REGISTRY[rom_cls]
    rn, rm = rom_type.n, rom_type.m

    if reward_scales is None:
        # ANYmal flat-trajectory set (ref anymal_c_flat_trajectory_config
        # rewards.scales + base trajectory scales; tracking_rom at its
        # reference-commented nominal 6.0, differential_error slopes in
        # the env).
        reward_scales = (
            ("tracking_rom", 6.0),
            ("termination", -0.5),
            ("orientation", -5.0),
            ("torques", -2.5e-5),
            ("feet_air_time", 0.5),
            ("action_rate", -0.01),
            ("dof_acc", -2.5e-7),
        )
    base = make_velocity_env(
        urdf_path, num_envs=num_envs, reward_scales=reward_scales,
        only_positive_rewards=kw.pop("only_positive_rewards", False), **kw
    )
    rom = make_rom(
        rom_cls, rom_dt,
        rom_z_min if rom_z_min is not None else [-1e9] * rn,
        rom_z_max if rom_z_max is not None else [1e9] * rn,
        rom_v_min if rom_v_min is not None else [-vel_max] * rm,
        rom_v_max if rom_v_max is not None else [vel_max] * rm,
    )
    gen = TrajectoryGenerator.create(
        rom, UniformSampleHoldDT.create(t_low, t_high),
        UniformWeightSampler(),
        dt_loop=base.dt, N=n_traj, dN=dn_traj, prob_stationary=0.01,
    )
    weighting = rom.weighting_vector(reward_weighting or RewardWeighting())
    if max_rom_distance is None:
        max_rom_distance = (0.1,) * rn
    nj = base.nj
    # ref trajectory noise vector: velocity blocks as the velocity task,
    # zeros over the trajectory window and actions.
    noise_vec = jnp.concatenate([
        0.1 * 2.0 * jnp.ones(3),
        0.2 * 0.25 * jnp.ones(3),
        0.05 * jnp.ones(3),
        jnp.zeros(rom.n * n_traj),
        0.01 * jnp.ones(nj),
        1.5 * 0.05 * jnp.ones(nj),
        jnp.zeros(nj),
        0.1 * 5.0 * jnp.ones(base.num_height_points),
    ])
    return LeggedRobotTrajectoryEnv(
        **{f.name: getattr(base, f.name)
           for f in base.__dataclass_fields__.values()},
        traj_gen=gen,
        reward_weighting=weighting,
        max_rom_distance=jnp.asarray(max_rom_distance, jnp.float32),
        zero_rom_dist_llh=jnp.asarray(zero_rom_dist_llh, jnp.float32),
    ).replace(noise_vec=noise_vec)


def make_hopper_velocity_env(
    num_envs: int = 4096,
    add_noise: bool = True,
    domain_rand: bool = True,
    episode_length_s: float = 20.0,
    urdf_path: str = HOPPER_URDF,
    reward_scales=None,
):
    """Velocity-command hopper (ref task `hopper_flat`,
    flat/hopper_config.py): same physics as the trajectory hopper, commands
    replacing the ROM window. Spring/PD numbers follow the flat config
    (spring 7000/4, foot PD 900/60, wheels 15/3, foot setpoint 0.021)."""
    from .hopper_velocity import (
        HOPPER_VELOCITY_REWARD_SCALES,
        HopperVelocityEnv,
    )

    spec = parse_urdf(urdf_path)
    model = RobotModel.from_spec(spec)
    sim = RobotSim.create(
        model,
        contact=ContactParams.create(stiffness=16000.0, damping=80.0,
                                     friction=1.0, slip_vel=0.05),
        dt=0.0025, decimation=8,
    )
    obs_scales = jnp.concatenate([
        jnp.asarray([1.0]),               # z_pos
        jnp.ones(4),                      # quat
        0.5 * jnp.ones(3),                # lin vel
        0.25 * jnp.ones(3),               # ang vel
        0.01 * jnp.ones(3),               # wheel vel
        jnp.asarray([0.5, 0.5, 0.25]),    # commands (lin, lin, ang scale)
        jnp.ones(4),                      # action quat
    ])
    # ref flat/hopper_config.py noise block x obs scales; commands get none.
    noise_vec = jnp.concatenate([
        jnp.asarray([0.02]),
        0.05 * jnp.ones(4),
        0.1 * 0.5 * jnp.ones(3),
        0.2 * 0.25 * jnp.ones(3),
        1.5 * 0.01 * jnp.ones(3),
        jnp.zeros(3),
        jnp.zeros(4),
    ])
    return HopperVelocityEnv(
        sim=sim,
        p_gains=jnp.asarray([900.0, 15.0, 15.0, 15.0]),
        d_gains=jnp.asarray([60.0, 3.0, 3.0, 3.0]),
        kd_spindown=jnp.asarray([0.1, 0.1, 0.1]),
        spring_stiffness=jnp.asarray(7000.0),
        spring_damping=jnp.asarray(4.0),
        spring_setpoint=jnp.asarray(0.0),
        foot_pos_des=jnp.asarray(0.021),
        rot_actuator=jnp.asarray(HOPPER_ROT_ACTUATOR),
        torque_limits=jnp.asarray([25000.0, 2.1, 2.1, 2.1]),
        wheel_speed_limit=jnp.asarray(600.0),
        ts_ratio=jnp.asarray(6.0),
        obs_scales=obs_scales,
        noise_vec=noise_vec,
        # ref flat/hopper_config.py commands.ranges.
        command_ranges=jnp.asarray(
            [[-0.35, 0.35], [-0.35, 0.35], [-1.0, 1.0]], jnp.float32),
        tracking_sigma=jnp.asarray(0.25),
        # ref flat/hopper_config.py domain_rand.max_push_vel (6-dim).
        max_push_vel=jnp.asarray([0.25, 0.25, 0.1, 0.75, 0.75, 0.75]),
        reward_scales=tuple(reward_scales) if reward_scales is not None
        else HOPPER_VELOCITY_REWARD_SCALES,
        add_noise=add_noise,
        domain_rand=domain_rand,
        episode_length_s=episode_length_s,
        num_envs=num_envs,
    )


def make_a1_env(**kw):
    return make_velocity_env(A1_URDF, **kw)


# ANYmal-C reward scales. The fork's checkout comments out the base scale
# table (ref legged_robot_config.py:153-168) and its anymal_c_rough
# config adds none (`scales: pass`), so the operative public values are
# upstream legged_gym's: base scales with the anymal_c_flat overrides
# (ref anymal_c_flat_config.py:47-49: orientation -5.0, torques -2.5e-5,
# feet_air_time 2.0). Round-5 bug fix: these presets previously reused
# A1_REWARD_SCALES, whose torques scale (-2e-4, tuned for a 12 kg robot
# with ~5 Nm torques) is 10-20x the anymal value — on the 50 kg ANYmal
# the torque penalty swamped every positive term and only_positive_
# rewards clipped the total to exactly 0, which also zeroes the PPO
# gradient (the rough run sat at reward 0.0000 for 600 iterations).
ANYMAL_FLAT_REWARD_SCALES = (
    ("tracking_lin_vel", 1.0),
    ("tracking_ang_vel", 0.5),
    ("lin_vel_z", -2.0),
    ("ang_vel_xy", -0.05),
    ("orientation", -5.0),
    ("torques", -2.5e-5),
    ("dof_acc", -2.5e-7),
    ("feet_air_time", 2.0),
    ("collision", -1.0),
    ("action_rate", -0.01),
    ("termination", -0.0),
)
# Rough terrain: upstream base scales (torques -1e-5, feet_air_time 1.0,
# no orientation term — the heightfield makes a flat-base prior wrong).
ANYMAL_ROUGH_REWARD_SCALES = (
    ("tracking_lin_vel", 1.0),
    ("tracking_ang_vel", 0.5),
    ("lin_vel_z", -2.0),
    ("ang_vel_xy", -0.05),
    ("torques", -1.0e-5),
    ("dof_acc", -2.5e-7),
    ("feet_air_time", 1.0),
    ("collision", -1.0),
    ("action_rate", -0.01),
    ("termination", -0.0),
)


def _anymal_c_kwargs(kw):
    # NOTE: no reward_scales here — this helper is shared with the
    # trajectory presets, whose reward table (tracking_rom etc.) is set
    # by make_trajectory_env.
    kw.setdefault("default_angles", {
        "LF_HAA": 0.0, "LF_HFE": 0.4, "LF_KFE": -0.8,
        "RF_HAA": 0.0, "RF_HFE": 0.4, "RF_KFE": -0.8,
        "LH_HAA": 0.0, "LH_HFE": -0.4, "LH_KFE": 0.8,
        "RH_HAA": 0.0, "RH_HFE": -0.4, "RH_KFE": 0.8,
    })
    kw.setdefault("p_gain", 80.0)
    kw.setdefault("d_gain", 2.0)
    kw.setdefault("action_scale", 0.5)
    kw.setdefault("base_height", 0.6)
    kw.setdefault("base_height_target", 0.5)
    kw.setdefault("foot_name", "FOOT")
    kw.setdefault("penalize_on", ("SHANK", "THIGH"))
    kw.setdefault("terminate_on", ("base",))
    return kw


def make_anymal_c_env(**kw):
    kw.setdefault("reward_scales", ANYMAL_FLAT_REWARD_SCALES)
    return make_velocity_env(ANYMAL_C_URDF, **_anymal_c_kwargs(kw))


def make_anymal_b_env(**kw):
    """ANYmal B velocity task (ref anymal_b_config.py:34-41 —
    AnymalCRoughCfg with the anymal_b URDF and foot name `FOOT`)."""
    kw.setdefault("reward_scales", ANYMAL_FLAT_REWARD_SCALES)
    return make_velocity_env(ANYMAL_B_URDF, **_anymal_c_kwargs(kw))


def _rough_terrain(num_envs: int, num_rows: int, num_cols: int):
    from ..utils.terrain import Terrain, TerrainCfg

    return Terrain(
        TerrainCfg(mesh_type="trimesh", num_rows=num_rows,
                   num_cols=num_cols, curriculum=True),
        num_robots=num_envs,
    )


def make_anymal_c_rough_env(num_envs: int = 4096, terrain_rows: int = 10,
                            terrain_cols: int = 20, **kw):
    """ANYmal C on procedural rough terrain with perceptive height scan
    (ref task `anymal_c_rough`, anymal_c_rough_config.py: trimesh terrain,
    measure_heights on -> 235 observations, max_contact_force 500)."""
    kw.setdefault("reward_scales", ANYMAL_ROUGH_REWARD_SCALES)
    kw = _anymal_c_kwargs(kw)
    kw.setdefault("measure_heights", True)
    kw.setdefault("max_contact_force", 500.0)
    # ref anymal_c_rough_config.py domain_rand: base-mass payload +-5 kg.
    kw.setdefault("randomize_base_mass", True)
    kw.setdefault("added_mass_range", (-5.0, 5.0))
    if "terrain" not in kw:  # procedural build is expensive — only default
        kw["terrain"] = _rough_terrain(num_envs, terrain_rows, terrain_cols)
    return make_velocity_env(ANYMAL_C_URDF, num_envs=num_envs, **kw)


def make_anymal_c_rough_trajectory_env(num_envs: int = 4096,
                                       terrain_rows: int = 10,
                                       terrain_cols: int = 20, **kw):
    """ANYmal C trajectory tracking on rough terrain (ref task
    `anymal_c_rough_trajectory`, mixed_terrains_trajectory config)."""
    kw = _anymal_c_kwargs(kw)
    kw.setdefault("measure_heights", True)
    kw.setdefault("max_contact_force", 500.0)
    if "terrain" not in kw:
        kw["terrain"] = _rough_terrain(num_envs, terrain_rows, terrain_cols)
    return make_trajectory_env(ANYMAL_C_URDF, num_envs=num_envs, **kw)


def make_anymal_c_trajectory_env(**kw):
    """ANYmal C on the trajectory-tracking task (ref anymal_trajectory.py:
    46-81 — identical robot on LeggedRobotTrajectory; flat variant,
    anymal_c_flat_trajectory_config)."""
    kw = _anymal_c_kwargs(kw)
    kw.setdefault("max_contact_force", 350.0)
    return make_trajectory_env(ANYMAL_C_URDF, **kw)


def make_a1_trajectory_env(**kw):
    return make_trajectory_env(A1_URDF, **kw)


ACTUATOR_NET_PATH = (
    "/root/reference/resources/actuator_nets/anydrive_v3_lstm.pt"
)


def make_anymal_c_lstm_env(**kw):
    """ANYmal C with the ANYdrive LSTM actuator net replacing PD
    (ref anymal.py:50-81, anymal_c_rough_config use_actuator_network)."""
    from ..sim.actuator_net import ActuatorNetLSTM

    env = make_anymal_c_env(**kw)
    return env.replace(
        actuator_net=ActuatorNetLSTM.from_torchscript(ACTUATOR_NET_PATH)
    )


def make_adam_env(**kw):
    """Adam biped (ref adam.py/adam_config.py). The reference checkout ships
    NO adam URDF (resources/robots/adam/ is absent, not merely LFS-pruned),
    so this preset — like the reference itself in this checkout — needs an
    asset path supplied at call time; reward structure matches the cassie
    biped (shared `no_fly` single-stance term, ref adam.py:43-46)."""
    urdf = kw.pop("urdf_path", None)
    if urdf is None:
        raise FileNotFoundError(
            "adam URDF not present in the reference checkout; pass "
            "urdf_path= explicitly"
        )
    kw.setdefault("reward_scales", A1_REWARD_SCALES + (("no_fly", 0.25),))
    kw.setdefault("terminate_on", ("base", "trunk", "pelvis"))
    return make_velocity_env(urdf, **kw)


# ref cassie_config.py init_state.default_joint_angles (the crouched
# standing pose; an all-zero straight-legged pose is kinematically
# singular and collapses immediately — the round-4 cassie sanity run's
# reward explosion traced to it).
CASSIE_DEFAULT_ANGLES = {
    "hip_abduction_left": 0.1, "hip_rotation_left": 0.0,
    "hip_flexion_left": 1.0, "thigh_joint_left": -1.8,
    "ankle_joint_left": 1.57, "toe_joint_left": -1.57,
    "hip_abduction_right": -0.1, "hip_rotation_right": 0.0,
    "hip_flexion_right": 1.0, "thigh_joint_right": -1.8,
    "ankle_joint_right": 1.57, "toe_joint_right": -1.57,
}


def make_cassie_env(**kw):
    kw.setdefault("default_angles", CASSIE_DEFAULT_ANGLES)
    # ~32 kg biped on the explicit integrator: the hopper treatment
    # (2.5 ms substeps at the unchanged 50 Hz policy rate) + contact
    # stiff enough for ~1.5 cm static penetration.
    kw.setdefault("sim_dt", 0.0025)
    kw.setdefault("sim_decimation", 8)
    kw.setdefault("contact", ContactParams.create(stiffness=20000.0,
                                                  damping=100.0))
    # Per-joint PD tables + action scale (ref cassie_config.py control
    # block: 100/100/200/200/200/40 stiffness, 3/3/6/6/6/1 damping,
    # action_scale 0.5) — the round-4 run used flat 100/3 gains at 0.25
    # scale, which under-drives the flexion/thigh/ankle joints.
    kw.setdefault("p_gain", {"hip_abduction": 100.0, "hip_rotation": 100.0,
                             "hip_flexion": 200.0, "thigh_joint": 200.0,
                             "ankle_joint": 200.0, "toe_joint": 40.0})
    kw.setdefault("d_gain", {"hip_abduction": 3.0, "hip_rotation": 3.0,
                             "hip_flexion": 6.0, "thigh_joint": 6.0,
                             "ankle_joint": 6.0, "toe_joint": 1.0})
    # Sim-specific deviations from the ref's 0.5 action scale / -200
    # termination (round-5 A/B at 1000 iters x 4096: ref values diverged
    # reward -7.6 -> -54 pre-explosion-guard; 0.25 scale reached eval
    # tracking err 0.81 and -50 termination 0.64, both at ~0 falls —
    # docs/PERF.md cassie round 5). The explicit integrator's stiff
    # contact punishes the ref's +-0.5 rad exploration jolts.
    kw.setdefault("action_scale", 0.25)
    # Command curriculum breaks the stand-in-place local optimum the
    # full +-1 m/s command distribution traps the biped in (round-5 A/B
    # at 3000 iters: err 0.64 -> 0.19 at +-0.4 / 0.37 at +-1.0 eval;
    # docs/PERF.md). Ref mechanism: legged_robot.py:488-500.
    kw.setdefault("command_curriculum", True)
    kw.setdefault("init_lin_vel_range", 0.4)
    kw.setdefault("base_height", 1.0)
    kw.setdefault("base_height_target", 0.9)
    kw.setdefault("foot_name", "toe")
    kw.setdefault("penalize_on", ())
    kw.setdefault("terminate_on", ("pelvis",))
    kw.setdefault("only_positive_rewards", False)
    kw.setdefault("max_contact_force", 300.0)
    # Cassie reward set (ref cassie_config.py:89-100): the quadruped terms
    # that cassie zeroes are dropped, and the biped single-stance `no_fly`
    # term (ref cassie.py:43-46) is added.
    kw.setdefault("reward_scales", (
        ("tracking_lin_vel", 1.0),
        ("tracking_ang_vel", 1.0),
        ("lin_vel_z", -0.5),
        ("torques", -5.0e-6),
        ("dof_acc", -2.0e-7),
        ("feet_air_time", 5.0),
        ("dof_pos_limits", -1.0),
        ("no_fly", 0.25),
        ("action_rate", -0.01),   # inherited from the ref base scales
        ("termination", -50.0),   # ref -200; see the A/B note above
    ))
    return make_velocity_env(CASSIE_URDF, **kw)


# ref PPO configs: legged_robot_config.py:255-269 + hopper [128, 64, 32] nets.
HOPPER_PPO = PPOConfig()

task_registry.register("hopper_trajectory", make_hopper_trajectory_env,
                       HOPPER_PPO)
task_registry.register("rom_tracking", make_rom_tracking_env, PPOConfig())
task_registry.register("a1_velocity", make_a1_env, PPOConfig())
task_registry.register("anymal_c_velocity", make_anymal_c_env, PPOConfig())
task_registry.register("anymal_c_trajectory", make_anymal_c_trajectory_env,
                       PPOConfig())
task_registry.register("a1_trajectory", make_a1_trajectory_env, PPOConfig())
task_registry.register("anymal_c_lstm", make_anymal_c_lstm_env, PPOConfig())
task_registry.register("cassie_velocity", make_cassie_env, PPOConfig())
task_registry.register("hopper_velocity", make_hopper_velocity_env,
                       HOPPER_PPO)
task_registry.register("anymal_b_velocity", make_anymal_b_env, PPOConfig())
task_registry.register("anymal_c_rough", make_anymal_c_rough_env,
                       PPOConfig())
task_registry.register("anymal_c_rough_trajectory",
                       make_anymal_c_rough_trajectory_env, PPOConfig())
task_registry.register("adam_velocity", make_adam_env, PPOConfig())
