from .base import Transition
from .registry import TaskRegistry, task_registry
from .rom_tracking import RomTrackingEnv, RomTrackingEnvState
from . import presets  # noqa: F401  (registers preset tasks)
from .hopper_trajectory import HopperTrajectoryEnv

__all__ = [
    "Transition",
    "TaskRegistry",
    "task_registry",
    "RomTrackingEnv",
    "RomTrackingEnvState",
]
