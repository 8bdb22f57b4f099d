from .networks import ActorCritic, ActorCriticRecurrent
from .ppo import PPOConfig, TrainState, init_train_state, make_learn_iteration
from .runner import CheckpointManager, OnPolicyRunner

__all__ = [
    "ActorCritic",
    "ActorCriticRecurrent",
    "PPOConfig",
    "TrainState",
    "init_train_state",
    "make_learn_iteration",
    "CheckpointManager",
    "OnPolicyRunner",
]
