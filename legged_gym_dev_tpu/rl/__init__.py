from .networks import ActorCritic
from .ppo import PPOConfig, TrainState, init_train_state, make_learn_iteration
from .runner import CheckpointManager, OnPolicyRunner

__all__ = [
    "ActorCritic",
    "PPOConfig",
    "TrainState",
    "init_train_state",
    "make_learn_iteration",
    "CheckpointManager",
    "OnPolicyRunner",
]
