from pikazoo_tpu.train.networks import ActorCritic
from pikazoo_tpu.train.ppo import (PPOConfig, PPORunnerState, make_ppo_trainer,
                                   TrainMetrics)

__all__ = [
    "ActorCritic",
    "PPOConfig",
    "PPORunnerState",
    "TrainMetrics",
    "make_ppo_trainer",
]
