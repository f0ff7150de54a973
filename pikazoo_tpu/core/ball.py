"""Ball-world collision and integration.

Pure-functional equivalent of the reference's
``process_collision_between_ball_and_world_and_set_ball_position``
(``physics.py:359-436``), including its deliberate quirks:

* the asymmetric wall bound ``x > GROUND_WIDTH`` (not GROUND_WIDTH - radius)
  — an original-game behavior the landing simulator's termination depends on;
* the hyper-ball fine-rotation glitch: ``fine_rotation += x_velocity // 2``
  (Python floor division — negative velocities round toward -inf) wrapping at
  0/50 such that exactly 50 yields rotation 5, the hyper sprite;
* the net-pillar top band: bounce off the top for y <= 192, push out sideways
  below it.

Returns the new ball and a 0/1 ``touched_ground`` flag; on the touching frame
the ball's y is pinned to 252, x is NOT advanced, y_velocity flips, and the
punch-effect witness fields are set (``punch_effect_x`` later decides the
scoring side).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from pikazoo_tpu.core import constants as C
from pikazoo_tpu.core.state import BallState


def ball_world_step(b: BallState) -> Tuple[BallState, jnp.ndarray]:
    one = jnp.int32(1)

    # Shift the two-frame position history (power-hit trail).
    prev_prev_x, prev_prev_y = b.previous_x, b.previous_y
    prev_x, prev_y = b.x, b.y

    # Rotation bookkeeping (hyper-ball glitch preserved: ==50 passes through).
    fr = b.fine_rotation + b.x_velocity // 2
    fr = jnp.where(fr < 0, fr + 50, jnp.where(fr > 50, fr - 50, fr))
    rotation = fr // 10

    # Wall bounce — asymmetric bound kept on purpose.
    future_x = b.x + b.x_velocity
    vx = jnp.where((future_x < C.BALL_RADIUS) | (future_x > C.GROUND_WIDTH),
                   -b.x_velocity, b.x_velocity)

    # Ceiling.
    vy = jnp.where(b.y + b.y_velocity < 0, one, b.y_velocity)

    # Net pillar: top bounce vs side push-out.
    at_net = (jnp.abs(b.x - C.GROUND_HALF_WIDTH) < C.NET_PILLAR_HALF_WIDTH) & \
             (b.y > C.NET_PILLAR_TOP_TOP_Y_COORD)
    on_top = b.y <= C.NET_PILLAR_TOP_BOTTOM_Y_COORD
    vy = jnp.where(at_net & on_top & (vy > 0), -vy, vy)
    side_vx = jnp.where(b.x < C.GROUND_HALF_WIDTH, -jnp.abs(vx), jnp.abs(vx))
    vx = jnp.where(at_net & ~on_top, side_vx, vx)

    future_y = b.y + vy
    touched = (future_y > C.BALL_TOUCHING_GROUND_Y_COORD).astype(jnp.int32)
    t = touched == 1

    new = b._replace(
        previous_x=prev_x,
        previous_y=prev_y,
        previous_previous_x=prev_prev_x,
        previous_previous_y=prev_prev_y,
        fine_rotation=fr,
        rotation=rotation,
        x=jnp.where(t, b.x, b.x + vx),
        y=jnp.where(t, jnp.int32(C.BALL_TOUCHING_GROUND_Y_COORD), future_y),
        x_velocity=vx,
        y_velocity=jnp.where(t, -vy, vy + 1),
        punch_effect_x=jnp.where(t, b.x, b.punch_effect_x),
        punch_effect_y=jnp.where(
            t, jnp.int32(C.BALL_TOUCHING_GROUND_Y_COORD + C.BALL_RADIUS),
            b.punch_effect_y),
        punch_effect_radius=jnp.where(t, jnp.int32(C.BALL_RADIUS),
                                      b.punch_effect_radius),
    )
    return new, touched
