"""Player movement and finite-state machine.

Pure-functional equivalent of the reference's
``process_player_movement_and_set_player_position`` (``physics.py:439-564``)
plus ``process_game_end_frame_for`` (``physics.py:567-577``).  Every branch of
the imperative code becomes a straight-line chain of ``jnp.where`` selects in
the same evaluation order, so intermediate-state interactions (e.g. landing
changing ``state`` before the power-hit check reads it) are preserved exactly.

The reference's early return for a lying player (state 4, ``physics.py:458-462``)
is realized by computing both paths and selecting on the entry state — note
the computer-AI decision (and its RNG draws) happens in the *caller* before
this function, exactly as in the reference.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from pikazoo_tpu.core import constants as C
from pikazoo_tpu.core.state import PlayerInput, PlayerState


def move_player(p: PlayerState, inp: PlayerInput, is_player2: bool
                ) -> Tuple[PlayerState, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Advance one player one frame.  Returns (player, chu, pika, pipikachu)
    sound event flags."""
    i32 = jnp.int32
    entry_lying = p.state == 4

    # ---- lying-down path (early return in the reference) ----
    lying_left_l = p.lying_down_duration_left - 1
    state_l = jnp.where(lying_left_l < -1, i32(0), i32(4))

    # ---- main path ----
    # x velocity: walk +-6, dive +-8 (state 5/6 freeze movement).
    vx = jnp.where(p.state < 5,
                   jnp.where(p.state < 3, inp.x_direction * 6,
                             p.diving_direction * 8),
                   i32(0))
    future_x = p.x + vx
    if is_player2:
        x = jnp.clip(future_x, C.GROUND_HALF_WIDTH + C.PLAYER_HALF_LENGTH,
                     C.GROUND_WIDTH - C.PLAYER_HALF_LENGTH)
    else:
        x = jnp.clip(future_x, C.PLAYER_HALF_LENGTH,
                     C.GROUND_HALF_WIDTH - C.PLAYER_HALF_LENGTH)

    # Jump: up input while standing on the ground.
    jump = (p.state < 3) & (inp.y_direction == -1) & \
           (p.y == C.PLAYER_TOUCHING_GROUND_Y_COORD)
    yv = jnp.where(jump, i32(-16), p.y_velocity)
    state = jnp.where(jump, i32(1), p.state)
    frame = jnp.where(jump, i32(0), p.frame_number)
    chu = jump

    # Gravity and landing.
    future_y = p.y + yv
    y = future_y
    rising = future_y < C.PLAYER_TOUCHING_GROUND_Y_COORD
    landing = future_y > C.PLAYER_TOUCHING_GROUND_Y_COORD
    yv = jnp.where(rising, yv + 1, yv)
    was_diving = state == 3
    lying_left = jnp.where(landing & was_diving, i32(3),
                           p.lying_down_duration_left)
    yv = jnp.where(landing, i32(0), yv)
    y = jnp.where(landing, i32(C.PLAYER_TOUCHING_GROUND_Y_COORD), y)
    frame = jnp.where(landing, i32(0), frame)
    state = jnp.where(landing, jnp.where(was_diving, i32(4), i32(0)), state)

    # Power hit: jumping -> smash pose; grounded + direction -> dive.
    # The two checks read the state sequence exactly as the reference's
    # if/elif does (a player who just landed can immediately dive).
    delay = p.delay_before_next_frame
    diving_dir = p.diving_direction
    ph = inp.power_hit == 1
    smash = ph & (state == 1)
    delay = jnp.where(smash, i32(5), delay)
    frame = jnp.where(smash, i32(0), frame)
    state = jnp.where(smash, i32(2), state)
    pika = smash
    dive = ph & (state == 0) & (inp.x_direction != 0)
    state = jnp.where(dive, i32(3), state)
    frame = jnp.where(dive, i32(0), frame)
    diving_dir = jnp.where(dive, inp.x_direction, diving_dir)
    yv = jnp.where(dive, i32(-5), yv)
    chu = chu | dive

    # Animation-frame counters, keyed on the post-power-hit state.
    arm = p.normal_status_arm_swing_direction
    s1 = state == 1
    frame = jnp.where(s1, (frame + 1) % 3, frame)
    s2 = state == 2
    s2_adv = s2 & (delay < 1)
    frame_s2 = frame + 1
    wrap = frame_s2 > 4
    frame = jnp.where(s2_adv, jnp.where(wrap, i32(0), frame_s2), frame)
    state = jnp.where(s2_adv & wrap, i32(1), state)
    delay = jnp.where(s2 & ~s2_adv, delay - 1, delay)
    s0 = state == 0
    delay_s0 = delay + 1
    tick = s0 & (delay_s0 > 3)
    delay = jnp.where(s0, jnp.where(tick, i32(0), delay_s0), delay)
    future_frame = frame + arm
    flip = (future_frame < 0) | (future_frame > 4)
    arm = jnp.where(tick & flip, -arm, arm)
    # The reference adds the possibly-flipped direction (physics.py:549-552).
    frame = jnp.where(tick, frame + arm, frame)

    # Game-end win/lose poses (dead code when driven through the env, which
    # terminates on the scoring frame — implemented for engine completeness).
    ge = (p.game_ended == 1) & (state == 0)
    pipikachu = ge & (p.is_winner == 1)
    state = jnp.where(ge, jnp.where(p.is_winner == 1, i32(5), i32(6)), state)
    delay = jnp.where(ge, i32(0), delay)
    frame = jnp.where(ge, i32(0), frame)
    g2 = (p.game_ended == 1) & (frame < 4)
    delay_g2 = delay + 1
    adv = g2 & (delay_g2 > 4)
    delay = jnp.where(g2, jnp.where(adv, i32(0), delay_g2), delay)
    frame = jnp.where(adv, frame + 1, frame)

    # ---- select lying vs main path ----
    sel = lambda l, m: jnp.where(entry_lying, l, m)
    out = p._replace(
        x=sel(p.x, x),
        y=sel(p.y, y),
        y_velocity=sel(p.y_velocity, yv),
        state=sel(state_l, state),
        frame_number=sel(p.frame_number, frame),
        normal_status_arm_swing_direction=sel(
            p.normal_status_arm_swing_direction, arm),
        delay_before_next_frame=sel(p.delay_before_next_frame, delay),
        diving_direction=sel(p.diving_direction, diving_dir),
        lying_down_duration_left=sel(lying_left_l, lying_left),
    )
    z = i32(0)
    active = ~entry_lying
    chu = jnp.where(active & chu, 1, z)
    pika = jnp.where(active & pika, 1, z)
    pipikachu = jnp.where(active & pipikachu, 1, z)
    return out, chu, pika, pipikachu
