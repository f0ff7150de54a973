"""Ball-player collision test and response.

Equivalent of the reference's AABB test
(``is_collision_between_ball_and_player_happened``, ``physics.py:340-356``)
and hit response (``process_collision_between_ball_and_player``,
``physics.py:580-641``), with the response masked by an ``active`` flag so it
can run unconditionally inside the traced step (the RNG kick draw is consumed
only where the response actually fires AND the computed x velocity is zero —
note the reference keeps the *old* velocity when ball.x == player.x, and only
then tests for zero).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from pikazoo_tpu.core import constants as C
from pikazoo_tpu.core.rng import DrawState, draw
from pikazoo_tpu.core.state import BallState, PlayerInput


def ball_player_overlap(ball: BallState, player_x: jnp.ndarray,
                        player_y: jnp.ndarray) -> jnp.ndarray:
    return (jnp.abs(ball.x - player_x) <= C.PLAYER_HALF_LENGTH) & \
           (jnp.abs(ball.y - player_y) <= C.PLAYER_HALF_LENGTH)


def collision_response(ball: BallState, player_x: jnp.ndarray,
                       inp: PlayerInput, player_state: jnp.ndarray,
                       active: jnp.ndarray, ds: DrawState
                       ) -> Tuple[BallState, jnp.ndarray, DrawState]:
    """Apply the hit response where ``active``; returns (ball, power_hit_sound, ds)."""
    i32 = jnp.int32
    diff = ball.x - player_x
    vx = jnp.where(diff < 0, -(jnp.abs(diff) // 3),
                   jnp.where(diff > 0, jnp.abs(diff) // 3, ball.x_velocity))

    kick_consume = active & (vx == 0)
    kick, ds = draw(ds, kick_consume, 3)
    vx = jnp.where(kick_consume, kick - 1, vx)

    abs_vy = jnp.abs(ball.y_velocity)
    vy = jnp.where(abs_vy < 15, i32(-15), -abs_vy)

    # Jumping-and-power-hitting player: directed smash.
    smash = player_state == 2
    smash_speed = (jnp.abs(inp.x_direction) + 1) * 10
    vx = jnp.where(smash,
                   jnp.where(ball.x < C.GROUND_HALF_WIDTH, smash_speed,
                             -smash_speed),
                   vx)
    vy = jnp.where(smash, jnp.abs(vy) * inp.y_direction * 2, vy)

    w = lambda new, old: jnp.where(active, new, old)
    ws = lambda new, old: jnp.where(active & smash, new, old)
    new_ball = ball._replace(
        x_velocity=w(vx, ball.x_velocity),
        y_velocity=w(vy, ball.y_velocity),
        punch_effect_x=ws(ball.x, ball.punch_effect_x),
        punch_effect_y=ws(ball.y, ball.punch_effect_y),
        punch_effect_radius=ws(i32(C.BALL_RADIUS), ball.punch_effect_radius),
        is_power_hit=w(smash.astype(jnp.int32), ball.is_power_hit),
    )
    power_hit_sound = (active & smash).astype(jnp.int32)
    return new_ball, power_hit_sound, ds
