"""legged_gym_dev_tpu — a TPU-native deep tube-MPC and legged-robot RL framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of the reference
``wdc3iii/legged_gym_dev`` stack (Isaac Gym legged RL + deep tube learning +
CasADi/IPOPT tube trajectory optimization):

- ``core``     — quaternion/SO(3) math and the reduced-order-model (ROM) zoo as
                 pure, batched JAX step functions (ref: trajopt/rom_dynamics.py).
- ``trajgen``  — functional trajectory generators (sample-hold / ramp / extreme /
                 sinusoid input mixing, async two-rate clock) as scan-able state.
- ``solver``   — batched SQP / augmented-Lagrangian tube trajectory optimization,
                 vmapped over thousands of scenarios (ref: trajopt/tube_trajopt.py,
                 replacing CasADi + IPOPT + l4casadi).
- ``sim``      — physics backends: ROM-only fast sim (ref: custom_sim.py) and a
                 batched rigid-body simulator for the robot zoo.
- ``envs``     — functional RL task layer (velocity-command + trajectory-tracking).
- ``rl``       — PPO actor-critic training in pure JAX (ref: rsl_rl usage).
- ``tube``     — tube-width dataset builders, quantile losses, training loop
                 (ref: deep_tube_learning/).
- ``parallel`` — device-mesh / sharding helpers for multi-chip scaling.
"""

__version__ = "0.1.0"

# Headless GL for mujoco.Renderer (utils/video.py): this image has Mesa's
# EGL but no display; the surfaceless platform is the only one whose
# eglInitialize succeeds. mujoco reads MUJOCO_GL at import time, so the
# default must be in place before anything imports mujoco.
import os as _os

_os.environ.setdefault("MUJOCO_GL", "egl")
_os.environ.setdefault("EGL_PLATFORM", "surfaceless")
del _os
