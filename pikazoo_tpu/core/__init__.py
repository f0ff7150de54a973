from pikazoo_tpu.core import constants
from pikazoo_tpu.core.state import BallState, PlayerState, PlayerInput
from pikazoo_tpu.core.rng import DrawState, draw
from pikazoo_tpu.core.engine import physics_step

__all__ = [
    "constants",
    "BallState",
    "PlayerState",
    "PlayerInput",
    "DrawState",
    "draw",
    "physics_step",
]
