"""Landing-point forward simulation — the hot loop, batched the TPU way.

The reference runs up to ~16 sequential Python while-loops per frame
(``calculate_expected_landing_point_x_for`` at ``physics.py:643-686``, called
from the movement loop and after each collision, plus up to 6
``expected_landing_point_x_when_power_hit`` sims per airborne computer,
``physics.py:820-884``).  Two structural observations collapse all of that
into ONE vectorized 7-lane loop per frame:

1. The ball does not change during the player-movement loop, so the two
   movement-loop predictor calls (``physics.py:313-316``) compute the same
   value, and both players' power-hit candidate sims see the same ball —
   and the candidate landing point depends only on (|x_dir|, y_dir, ball),
   not on the player.  One 6-candidate sim serves both players.
2. The post-collision recomputes (``physics.py:330-332``) write
   ``expected_landing_point_x``, which is *always* overwritten by the next
   frame's movement-loop recompute before any read (it appears in no
   observation and the AI only reads it inside the movement loop).  They are
   pure redundancy and are elided here.  Parity tests confirm this.

Lane 0 simulates the full net rule of the main predictor (note: strict
``y < 192`` top test, unlike the world step's ``<=``); lanes 1-6 simulate the
power-hit variant whose net model only flips y_velocity — the original game's
intentional "computer makes mistakes" physics (``physics.py:856-866``).

The loop is a ``lax.while_loop`` over int32 vectors with an explicit done
mask, so it vectorizes cleanly under vmap (iterations = max over the batch;
typical trajectories land in ~25 iterations, hard cap 1000).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from pikazoo_tpu.core import constants as C
from pikazoo_tpu.core.state import BallState

# Canonical candidate order (order "A", coin == 0): x_direction in (1, 0)
# outer, y_direction in (-1, 0, 1) inner — reference loops at physics.py:796-797.
CANDIDATE_X_DIRECTION = jnp.asarray([1, 1, 1, 0, 0, 0], jnp.int32)
CANDIDATE_Y_DIRECTION = jnp.asarray([-1, 0, 1, -1, 0, 1], jnp.int32)
# Order "B" (coin == 1): y_direction in (1, 0, -1) — indices into canonical.
ORDER_A = jnp.asarray([0, 1, 2, 3, 4, 5], jnp.int32)
ORDER_B = jnp.asarray([2, 1, 0, 5, 4, 3], jnp.int32)

# Lane 0 uses the two-branch net rule; lanes 1-6 the power-hit (mistake) rule.
_FULL_NET_RULE = jnp.asarray([1, 0, 0, 0, 0, 0, 0], jnp.int32)

# Sub-iterations per while-loop trip in the lax fallback (see body());
# tunable for experiments on hosts where the pallas kernel is unavailable.
import os as _os

_UNROLL = int(_os.environ.get("PIKAZOO_SIM_UNROLL", "8"))


def landing_sims_any(ball_x: jnp.ndarray, ball_y: jnp.ndarray,
                     ball_vx: jnp.ndarray, ball_vy: jnp.ndarray
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Shape-generic 7-lane landing simulation.

    Inputs may be scalars or arrays of any shape S; returns
    ``(expected_landing_point_x with shape S, candidates with shape (6,)+S)``.
    Uses only iota-built constants and elementwise ops, so the same function
    runs under jit/vmap AND inside Pallas kernels (which cannot capture array
    constants).
    """
    shape = jnp.shape(ball_x)
    lane_shape = (7,) + tuple(1 for _ in shape)
    if shape:
        lane = jax.lax.broadcasted_iota(jnp.int32, lane_shape, 0)
    else:
        # 1-D iota is fine outside pallas; scalars never occur inside it.
        lane = jnp.arange(7, dtype=jnp.int32).reshape(lane_shape)
    # Candidate tables from arithmetic: lanes 1..6 map to k = lane-1 with
    # |x_dir| = (k < 3) and y_dir = (k % 3) - 1 (canonical order "A").
    k = jnp.maximum(lane - 1, 0)
    cand_abs_xd = (k < 3).astype(jnp.int32)
    cand_yd = (k % 3) - 1
    full_rule = lane == 0

    x = jnp.broadcast_to(ball_x, (7,) + shape).astype(jnp.int32)
    y = jnp.broadcast_to(ball_y, (7,) + shape).astype(jnp.int32)
    # Power-hit candidate initial velocities (physics.py:841-845).
    speed = (cand_abs_xd + 1) * 10
    cand_vx = jnp.where(ball_x < C.GROUND_HALF_WIDTH, speed, -speed)
    cand_vy = jnp.abs(ball_vy) * cand_yd * 2
    vx = jnp.where(full_rule, ball_vx, cand_vx)
    vy = jnp.where(full_rule, ball_vy, cand_vy)

    # The done mask is carried as int32: Mosaic cannot legalize i1 vectors in
    # while-loop carries, and this function also runs inside Pallas kernels.
    def cond(carry):
        _, _, _, _, _, done_i, _ = carry
        return jnp.any(done_i == 0)

    def one_iteration(carry):
        x, y, vx, vy, count, done_i, result = carry
        done = done_i == 1
        # The iteration counter is a SCALAR: every still-live lane has been
        # live since iteration 0, so its private loop_counter equals the
        # global iteration index; finished lanes no longer read it.
        count1 = count + 1

        future_x = x + vx
        vx1 = jnp.where((future_x < C.BALL_RADIUS) | (future_x > C.GROUND_WIDTH),
                        -vx, vx)
        vy1 = jnp.where(y + vy < 0, jnp.int32(1), vy)

        at_net = (jnp.abs(x - C.GROUND_HALF_WIDTH) < C.NET_PILLAR_HALF_WIDTH) & \
                 (y > C.NET_PILLAR_TOP_TOP_Y_COORD)
        # Main predictor: strict < on the top band, side push-out below.
        on_top = y < C.NET_PILLAR_TOP_BOTTOM_Y_COORD
        flip_vy = at_net & (vy1 > 0) & (~full_rule | on_top)
        vy2 = jnp.where(flip_vy, -vy1, vy1)
        side_vx = jnp.where(x < C.GROUND_HALF_WIDTH, -jnp.abs(vx1), jnp.abs(vx1))
        vx2 = jnp.where(at_net & full_rule & ~on_top, side_vx, vx1)

        y1 = y + vy2
        finished = (y1 > C.BALL_TOUCHING_GROUND_Y_COORD) | \
                   (count1 >= C.INFINITE_LOOP_LIMIT)
        # On the finishing iteration x is NOT advanced — the result is x at
        # iteration entry (reference breaks before the x update).
        live = ~done
        result = jnp.where(live & finished, x, result)
        x = jnp.where(live & ~finished, x + vx2, x)
        y = jnp.where(live, y1, y)
        vx = jnp.where(live, vx2, vx)
        vy = jnp.where(live & ~finished, vy2 + 1, jnp.where(live, vy2, vy))
        done_i = jnp.where(done | finished, jnp.int32(1), jnp.int32(0))
        return x, y, vx, vy, count1, done_i, result

    def body(carry):
        # Manual 8x unroll: under vmap, XLA materializes while-loop carries in
        # HBM each trip, so batching 8 masked iterations per trip cuts that
        # traffic ~8x.  Finished lanes are frozen by the masks, so running a
        # few extra sub-iterations past a lane's exit is a no-op; live lanes
        # see exactly the reference iteration sequence.
        for _ in range(_UNROLL):
            carry = one_iteration(carry)
        return carry

    # Fast exit: a lane with vx == 0 can never change x (the wall and net
    # rules only negate it), so its result is identically its start x — no
    # need to iterate.  This removes the worst case where a ball trapped
    # bouncing on the net-pillar top (necessarily vx == 0) would drag every
    # batch lane through the full 1000-iteration cap; it also short-circuits
    # the common just-served state.  Power-hit lanes always have |vx| >= 10.
    pre_done = (vx == 0).astype(jnp.int32)
    init = (x, y, vx, vy, jnp.int32(0), pre_done, x)
    *_, result = jax.lax.while_loop(cond, body, init)
    return result[0], result[1:]


def _landing_sims_impl(ball: BallState) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """7-lane landing simulation for one (scalar) env's ball."""
    return landing_sims_any(ball.x, ball.y, ball.x_velocity, ball.y_velocity)


@jax.custom_batching.custom_vmap
def landing_sims(ball: BallState) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """7-lane landing simulation; scalar path uses the lax while-loop, the
    vmapped path dispatches to the VMEM-resident Pallas kernel on TPU (the
    HBM-bound vmap-of-while-loop is ~50x slower at large batch — see
    ``core.predict_pallas``).  Override with PIKAZOO_PREDICTOR=lax|pallas."""
    return _landing_sims_impl(ball)


@landing_sims.def_vmap
def _landing_sims_vmap_rule(axis_size, in_batched, ball: BallState):
    del axis_size
    import os

    assert all(jax.tree.leaves(in_batched)), \
        "landing_sims expects a fully batched BallState under vmap"
    impl = os.environ.get("PIKAZOO_PREDICTOR", "auto")
    # "auto" avoids pallas when the axon remote-compile tunnel is in play:
    # standalone kernels compile fine there, but a full XLA program embedding
    # the Mosaic custom call hangs that compile service (observed 2026-08-17;
    # set PIKAZOO_PREDICTOR=pallas to force it on healthy direct-TPU hosts).
    remote_compile = os.environ.get("PALLAS_AXON_REMOTE_COMPILE") == "1"
    use_pallas = (impl == "pallas" or
                  (impl == "auto" and jax.default_backend() == "tpu"
                   and not remote_compile))
    if use_pallas:
        from pikazoo_tpu.core.predict_pallas import landing_sims_batched
        expected, candidates = landing_sims_batched(
            ball.x, ball.y, ball.x_velocity, ball.y_velocity)
    else:
        expected, candidates = jax.vmap(_landing_sims_impl)(ball)
    return (expected, candidates), (True, True)
