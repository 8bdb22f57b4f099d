"""Preset task factories encoding the reference robot configurations.

The reference expresses per-robot setups as nested Python class configs
(ref: legged_gym/envs/hopper/flat_trajectory/hopper_trajectory_config.py,
deep_tube_learning/configs/rl/hopper_single_int.yaml); here each task is an
explicit factory with the same numbers, registered in the task registry.
"""
from __future__ import annotations

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
    urdf_path: str = HOPPER_URDF,
    reward_scales=HOPPER_REWARD_SCALES,
) -> HopperTrajectoryEnv:
    """Hopper tracking a SingleInt2D ROM (ref hopper_single_int.yaml)."""
    spec = parse_urdf(urdf_path)
    model = RobotModel.from_spec(spec)
    sim = RobotSim.create(
        model,
        contact=ContactParams.create(stiffness=8000.0, damping=60.0,
                                     friction=1.0),
        dt=0.005, decimation=4,
    )
    rom = SingleInt2D.create(
        rom_dt, [-10.0, -10.0], [10.0, 10.0],
        [-vel_max, -vel_max], [vel_max, vel_max],
    )
    gen = TrajectoryGenerator.create(
        rom, UniformSampleHoldDT.create(2.0, 6.0), UniformWeightSamplerNoRamp(),
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
    return HopperTrajectoryEnv(
        sim=sim,
        traj_gen=gen,
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
        episode_length_s=episode_length_s,
        num_envs=num_envs,
    )


def make_rom_tracking_env(num_envs: int = 4096, episode_length_s: float = 8.0,
                          rom_dt: float = 0.1, dt_loop: float = 0.05):
    """Double integrator tracking a SingleInt2D ROM (CustomSim analog)."""
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


# ref PPO configs: legged_robot_config.py:255-269 + hopper [128, 64, 32] nets.
HOPPER_PPO = PPOConfig()

task_registry.register("hopper_trajectory", make_hopper_trajectory_env,
                       HOPPER_PPO)
task_registry.register("rom_tracking", make_rom_tracking_env, PPOConfig())
