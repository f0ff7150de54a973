"""Action decoding and edge-detected input.

The env exposes ``Discrete(18)`` actions decoded through an 18x5 key table
(reference ``pikazoo_env.py:119-141``) into (x_direction, y_direction) in
{-1,0,1} and a rising-edge power-hit bit (``PikaUserInput.get_input``,
``physics.py:59-99``).  The latch ``power_hit_key_is_down_previous`` is part
of the observation (dims 12/25) and lives in env state.

The reference's vestigial 6th ``down_right`` key is never fed by the env
(action rows are 5-wide), so it is omitted here.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from pikazoo_tpu.core.state import PlayerInput

# [left, right, up, down, power_hit] per discrete action 0..17.
ACTION_KEY_TABLE = (
    (0, 0, 0, 0, 0),
    (0, 0, 0, 0, 1),
    (0, 0, 1, 0, 0),
    (0, 1, 0, 0, 0),
    (1, 0, 0, 0, 0),
    (0, 0, 0, 1, 0),
    (0, 1, 1, 0, 0),
    (1, 0, 1, 0, 0),
    (0, 1, 0, 1, 0),
    (1, 0, 0, 1, 0),
    (0, 0, 1, 0, 1),
    (0, 1, 0, 0, 1),
    (1, 0, 0, 0, 1),
    (0, 0, 0, 1, 1),
    (0, 1, 1, 0, 1),
    (1, 0, 1, 0, 1),
    (0, 1, 0, 1, 1),
    (1, 0, 0, 1, 1),
)

# Precomputed per-action decode: directions and the raw power-hit key bit.
# Folding the key table into direct lookup tables keeps the hot path at three
# gathers instead of five plus branch logic.
_XD = tuple(-1 if row[0] else (1 if row[1] else 0) for row in ACTION_KEY_TABLE)
_YD = tuple(-1 if row[2] else (1 if row[3] else 0) for row in ACTION_KEY_TABLE)
_PK = tuple(row[4] for row in ACTION_KEY_TABLE)

ACTION_X_DIRECTION = jnp.asarray(_XD, jnp.int32)
ACTION_Y_DIRECTION = jnp.asarray(_YD, jnp.int32)
ACTION_POWER_KEY = jnp.asarray(_PK, jnp.int32)


def decode_action(action: jnp.ndarray, latch_prev: jnp.ndarray
                  ) -> Tuple[PlayerInput, jnp.ndarray]:
    """Decode one discrete action with rising-edge power-hit detection.

    Returns the decoded :class:`PlayerInput` and the new latch value
    (= raw power key state, becoming ``power_hit_key_is_down_previous``).
    """
    xd = ACTION_X_DIRECTION[action]
    yd = ACTION_Y_DIRECTION[action]
    power_key = ACTION_POWER_KEY[action]
    power_hit = jnp.where((latch_prev == 0) & (power_key == 1),
                          jnp.int32(1), jnp.int32(0))
    return PlayerInput(xd, yd, power_hit), power_key
