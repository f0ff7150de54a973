from pikazoo_tpu.envs.pika_volley import (EnvConfig, EnvState, PikaZoo,
                                          TimeStep)
from pikazoo_tpu.envs.observations import OBS_DIM, OBS_HIGH, OBS_LOW, NUM_ACTIONS

__all__ = [
    "EnvConfig",
    "EnvState",
    "PikaZoo",
    "TimeStep",
    "OBS_DIM",
    "OBS_LOW",
    "OBS_HIGH",
    "NUM_ACTIONS",
]
