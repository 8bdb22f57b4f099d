from .base import Transition
from .registry import TaskRegistry, task_registry
from .rom_tracking import RomTrackingEnv, RomTrackingEnvState

__all__ = [
    "Transition",
    "TaskRegistry",
    "task_registry",
    "RomTrackingEnv",
    "RomTrackingEnvState",
]
