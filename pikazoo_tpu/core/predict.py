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
# tunable via PIKAZOO_SIM_UNROLL.  Swept inside the full AI step on v5e
# (tools/sim_unroll_sweep.py, interleaved min-of-5, B=65536, 2026-08-19):
# 8 -> 38.1M steps/s, 16 -> 42.7M, 32 -> 44.8M, 64 -> 42.5M.  32 is the
# default: fewer while trips (each pays an HBM carry round trip) outweigh
# the masked extra sub-iterations until the wasted tail work catches up.
import os as _os

_UNROLL = int(_os.environ.get("PIKAZOO_SIM_UNROLL", "32"))


def _sim_loop(x, y, vx, vy, full_rule: bool, unroll: int = 0):
    """Bounded landing loop over any-shaped int32 state; ``full_rule`` is a
    STATIC flag selecting the main predictor's two-branch net model (strict
    top test + side push-out, ``physics.py:665-676``) vs the power-hit
    variant's flip-only mistake model (``physics.py:856-866``).

    Slim carry (x, y, vx, vy, count): the while-loop round-trips its carry
    through HBM every trip under vmap, so the carry IS the bandwidth bill.
    Two invariants make the usual done/result arrays redundant:
      * a live lane's vx never becomes 0 (the wall and net rules only
        negate it), so vx == 0 exactly encodes "finished or never-live";
      * x is not advanced on the finishing iteration (the reference breaks
        before the x update), so a finished lane's frozen x IS its result.
    Booleans stay out of the carry for Mosaic (no i1 vector legalization).
    """

    def cond(carry):
        _, _, vx, _, _ = carry
        return jnp.any(vx != 0)

    def one_iteration(carry):
        x, y, vx, vy, count = carry
        live = vx != 0
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
        if full_rule:
            # Main predictor: strict < on the top band, side push-out below.
            on_top = y < C.NET_PILLAR_TOP_BOTTOM_Y_COORD
            vy2 = jnp.where(at_net & (vy1 > 0) & on_top, -vy1, vy1)
            side_vx = jnp.where(x < C.GROUND_HALF_WIDTH,
                                -jnp.abs(vx1), jnp.abs(vx1))
            vx2 = jnp.where(at_net & ~on_top, side_vx, vx1)
        else:
            vy2 = jnp.where(at_net & (vy1 > 0), -vy1, vy1)
            vx2 = vx1

        y1 = y + vy2
        finished = (y1 > C.BALL_TOUCHING_GROUND_Y_COORD) | \
                   (count1 >= C.INFINITE_LOOP_LIMIT)
        advance = live & ~finished
        x = jnp.where(advance, x + vx2, x)
        y = jnp.where(live, y1, y)
        vx = jnp.where(advance, vx2, jnp.int32(0))
        vy = jnp.where(advance, vy2 + 1, vy)
        return x, y, vx, vy, count1

    def body(carry):
        # Manual unroll: under vmap, XLA materializes while-loop carries in
        # HBM each trip, so batching several masked iterations per trip cuts
        # that traffic proportionally.  Finished lanes are frozen by the
        # masks, so running a few extra sub-iterations past a lane's exit is
        # a no-op; live lanes see exactly the reference iteration sequence.
        for _ in range(unroll or _UNROLL):
            carry = one_iteration(carry)
        return carry

    # Fast exit baked into the vx == 0 encoding: a lane starting with vx == 0
    # can never change x, so its result is its start x and it never iterates.
    # This removes the worst case where a ball trapped bouncing on the
    # net-pillar top (necessarily vx == 0) would drag every batch lane
    # through the full 1000-iteration cap; it also short-circuits the common
    # just-served state.  Power-hit lanes always have |vx| >= 10.
    init = (x, y, vx, vy, jnp.int32(0))
    result, *_ = jax.lax.while_loop(cond, body, init)
    return result


def landing_sims_any(ball_x: jnp.ndarray, ball_y: jnp.ndarray,
                     ball_vx: jnp.ndarray, ball_vy: jnp.ndarray,
                     unroll: int = 0) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Shape-generic 7-lane landing simulation.

    Inputs may be scalars or arrays of any shape S; returns
    ``(expected_landing_point_x with shape S, candidates with shape (6,)+S)``.
    Uses only iota-built constants and elementwise ops, so the same function
    runs under jit/vmap AND inside Pallas kernels (which cannot capture array
    constants).

    The true-ball lane and the six power-hit candidate lanes run in SEPARATE
    while loops: the candidates launch at |vx| in {10, 20} and land within a
    few dozen iterations, while the true ball's tail (low |vx| net-band
    bounce cycles) runs ~150-220 iterations per frame at large batch — split
    loops keep the six wide lanes from paying for that tail, cutting the
    dominant while-loop carry traffic ~4x.  Per-lane iteration sequences are
    unchanged (each lane is independent), so results are bit-identical.
    """
    shape = jnp.shape(ball_x)
    lane_shape = (6,) + tuple(1 for _ in shape)
    if shape:
        lane = jax.lax.broadcasted_iota(jnp.int32, lane_shape, 0)
    else:
        # 1-D iota is fine outside pallas; scalars never occur inside it.
        lane = jnp.arange(6, dtype=jnp.int32).reshape(lane_shape)
    bx = jnp.asarray(ball_x).astype(jnp.int32)
    by = jnp.asarray(ball_y).astype(jnp.int32)

    # True-ball lane: full net rule, shape S.
    expected = _sim_loop(bx, by,
                         jnp.asarray(ball_vx).astype(jnp.int32),
                         jnp.asarray(ball_vy).astype(jnp.int32),
                         full_rule=True, unroll=unroll)

    # Candidate tables from arithmetic: lane k has |x_dir| = (k < 3) and
    # y_dir = (k % 3) - 1 (canonical order "A").
    cand_abs_xd = (lane < 3).astype(jnp.int32)
    cand_yd = (lane % 3) - 1
    x = jnp.broadcast_to(bx, (6,) + shape)
    y = jnp.broadcast_to(by, (6,) + shape)
    # Power-hit candidate initial velocities (physics.py:841-845).
    speed = (cand_abs_xd + 1) * 10
    cand_vx = jnp.where(bx < C.GROUND_HALF_WIDTH, speed, -speed)
    cand_vy = jnp.abs(jnp.asarray(ball_vy).astype(jnp.int32)) * cand_yd * 2
    candidates = _sim_loop(x, y, cand_vx, cand_vy, full_rule=False,
                           unroll=unroll)

    return expected, candidates


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


_CANARY_VERDICT: bool | None = None


def _pallas_embed_canary_ok() -> bool:
    """Guard the first kernel-path compile with a killable subprocess canary.

    A round-2-era remote-compile service hung ~45 min on programs embedding
    the Mosaic landing kernel; the hazard cleared, but a recurrence used to
    need a human to export ``PIKAZOO_PREDICTOR=lax``.  Now ``auto`` first
    compiles a tiny production-shaped program (``core._pallas_canary``) in a
    subprocess under a hard timeout and falls back to lax automatically if
    it hangs or fails.  The verdict is cached in-process and on disk (6 h on
    success, 1 h on failure so recovery is retried); set
    ``PIKAZOO_PALLAS_CANARY=0`` to skip the canary entirely (trust pallas).
    """
    global _CANARY_VERDICT
    if _CANARY_VERDICT is not None:
        return _CANARY_VERDICT
    import json
    import os
    import subprocess
    import sys
    import tempfile
    import time
    import warnings

    if os.environ.get("PIKAZOO_PALLAS_CANARY", "auto") in ("0", "off",
                                                           "skip"):
        _CANARY_VERDICT = True
        return True
    cache = os.path.join(tempfile.gettempdir(), "pikazoo_pallas_canary.json")
    now = time.time()
    try:
        with open(cache) as f:
            rec = json.load(f)
        if now - float(rec["ts"]) < (6 * 3600 if rec["ok"] else 3600):
            _CANARY_VERDICT = bool(rec["ok"])
            return _CANARY_VERDICT
    except (OSError, ValueError, KeyError, TypeError):
        pass
    timeout = float(os.environ.get("PIKAZOO_PALLAS_CANARY_TIMEOUT", "150"))
    try:
        out = subprocess.run(
            [sys.executable, "-m", "pikazoo_tpu.core._pallas_canary"],
            timeout=timeout, capture_output=True, text=True)
        ok = out.returncode == 0 and "CANARY_OK" in out.stdout
    except (subprocess.TimeoutExpired, OSError):
        ok = False
    try:
        with open(cache, "w") as f:
            json.dump({"ok": ok, "ts": now}, f)
    except OSError:
        pass
    if not ok:
        warnings.warn(
            "pikazoo_tpu: embedded Pallas landing-kernel compile canary "
            "failed or timed out; falling back to the lax predictor for "
            "this process (retry in <=1 h, or force PIKAZOO_PREDICTOR).",
            RuntimeWarning, stacklevel=2)
    _CANARY_VERDICT = ok
    return ok


@landing_sims.def_vmap
def _landing_sims_vmap_rule(axis_size, in_batched, ball: BallState):
    del axis_size
    import os

    assert all(jax.tree.leaves(in_batched)), \
        "landing_sims expects a fully batched BallState under vmap"
    impl = os.environ.get("PIKAZOO_PREDICTOR", "auto")
    # "auto" = the VMEM-resident Pallas kernel on any TPU backend.  (A
    # round-2 era axon remote-compile service hung on programs embedding
    # this kernel, so "auto" used to fall back to lax under the tunnel;
    # re-verified 2026-08-19: the embedded compile completes in ~6s, the
    # kernel-vs-lax step evolution is bit-equal on hardware over 300 AI
    # self-play frames, and the AI step runs 64.6M vs 44.8M env-steps/s at
    # B=65536.  A subprocess compile canary now guards the first dispatch —
    # see _pallas_embed_canary_ok; PIKAZOO_PREDICTOR=lax stays the manual
    # escape hatch.)
    use_pallas = (impl == "pallas"
                  or (impl == "auto" and jax.default_backend() == "tpu"
                      and _pallas_embed_canary_ok()))
    if use_pallas:
        from pikazoo_tpu.core.predict_pallas import landing_sims_batched
        expected, candidates = landing_sims_batched(
            ball.x, ball.y, ball.x_velocity, ball.y_velocity)
    else:
        expected, candidates = jax.vmap(_landing_sims_impl)(ball)
    return (expected, candidates), (True, True)
