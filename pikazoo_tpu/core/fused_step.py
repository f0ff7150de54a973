"""Fused multi-frame environment kernel — T frames per HBM round trip.

The scanned env step is bandwidth-bound: every frame round-trips the whole
(B, ~54-field) int32 state through HBM (~0.6ms/frame at B=262144, ~4x off
speed-of-light).  This Pallas kernel keeps a block of environments resident
in VMEM and advances it ``frames`` frames per grid step, so HBM sees the
state exactly twice (load + store) regardless of T — and the rule-AI path's
landing simulations run VMEM-resident for free (same win as
``predict_pallas``).

It is the same physics code: the kernel body calls ``physics_step`` /
``round_init_*`` / ``decode_action_arith`` / ``landing_sims_any`` on
``(BLOCK_ROWS, 128)``-shaped leaves — explicit SIMD instead of ``vmap``, no
forked semantics.  Actions are sampled in-kernel from the shared threefry PRF
(``core.rng``), using the exact stream a host-side caller can reproduce
(:func:`fused_actions`), so fused-vs-scanned equality is testable bit-for-bit
(see ``tests/test_fused_step.py``).  Draw-slot RNG runs in production mode
(oracle replay stays on the unfused path).

Limitations (by design, v1): no per-frame observations/rewards are emitted —
this is the engine for benchmark, self-play data-generation and AI-vs-AI
rollouts; training rollouts need per-frame policy calls and use the scanned
path.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pikazoo_tpu.core.input import decode_action_arith
from pikazoo_tpu.core.rng import DrawState, threefry2x32
from pikazoo_tpu.core.state import BallState, PlayerState
from pikazoo_tpu.envs.pika_volley import EnvConfig, EnvState, env_frame

BLOCK_ROWS = 8
LANES = 128
BLOCK_ENVS = BLOCK_ROWS * LANES

ACTION_TAG = 2  # threefry word-1 tag for the action stream (seat adds 0/1)

_PLAYER_FIELDS = list(PlayerState._fields)
_BALL_FIELDS = list(BallState._fields)
# Scalar game fields in pack order (after p1/p2/ball blocks).
_GAME_FIELDS = ["latch1", "latch2", "score1", "score2", "is_player2_serve",
                "round_ended", "game_ended", "step_count", "draw_counter",
                "rng_lo", "rng_hi", "akey_lo", "akey_hi"]
NFIELDS = 2 * len(_PLAYER_FIELDS) + len(_BALL_FIELDS) + len(_GAME_FIELDS)


class _Fields(NamedTuple):
    p1: PlayerState
    p2: PlayerState
    ball: BallState
    game: dict  # field name -> (BLOCK_ROWS, LANES) int32


def _split(state_block):
    """(NFIELDS, R, L) -> structured view."""
    np1 = len(_PLAYER_FIELDS)
    nb = len(_BALL_FIELDS)
    p1 = PlayerState(*[state_block[i] for i in range(np1)])
    p2 = PlayerState(*[state_block[np1 + i] for i in range(np1)])
    ball = BallState(*[state_block[2 * np1 + i] for i in range(nb)])
    game = {name: state_block[2 * np1 + nb + i]
            for i, name in enumerate(_GAME_FIELDS)}
    return p1, p2, ball, game


def _join(p1, p2, ball, game):
    return tuple(p1) + tuple(p2) + tuple(ball) + \
        tuple(game[name] for name in _GAME_FIELDS)


def sample_action(akey: jnp.ndarray, t: jnp.ndarray, seat: int,
                  num_actions: int = 18) -> jnp.ndarray:
    """Uniform action from the shared PRF: reproducible host-side.  ``t`` is
    the env's cumulative step_count, so the stream continues correctly
    across consecutive ``fused_rollout`` calls."""
    bits, _ = threefry2x32(akey, jnp.asarray(t).astype(jnp.uint32),
                           jnp.uint32(ACTION_TAG + seat))
    return (bits % jnp.uint32(num_actions)).astype(jnp.int32)


def _fused_frame(cfg: EnvConfig, p1, p2, ball, game):
    """One env step on (R, L)-shaped leaves: in-kernel action sampling and
    decode, then the SAME shared env-frame logic as PikaZoo.step
    (envs/pika_volley.py:env_frame)."""
    # int32 -> uint32 astype is a mod-2^32 reinterpret (XLA convert), i.e.
    # exactly the stored bit pattern.
    rng_key = jnp.stack([game["rng_lo"].astype(jnp.uint32),
                         game["rng_hi"].astype(jnp.uint32)], axis=-1)
    ds = DrawState(key=rng_key, counter=game["draw_counter"], oracle=None)

    akey = jnp.stack([game["akey_lo"].astype(jnp.uint32),
                      game["akey_hi"].astype(jnp.uint32)], axis=-1)
    a1 = sample_action(akey, game["step_count"], 0)
    a2 = sample_action(akey, game["step_count"], 1)
    inp1, latch1 = decode_action_arith(a1, game["latch1"])
    inp2, latch2 = decode_action_arith(a2, game["latch2"])

    from pikazoo_tpu.core.predict import _landing_sims_impl
    fr = env_frame(cfg, ds, p1, p2, ball, game["score1"], game["score2"],
                   game["is_player2_serve"], game["round_ended"],
                   game["game_ended"], inp1, inp2,
                   landing_fn=_landing_sims_impl)

    game = dict(game, latch1=latch1, latch2=latch2, score1=fr.score1,
                score2=fr.score2, is_player2_serve=fr.is_player2_serve,
                round_ended=fr.round_ended, game_ended=fr.game_ended,
                step_count=game["step_count"] + 1,
                draw_counter=fr.draw_counter)
    return fr.p1, fr.p2, fr.ball, game


def _make_kernel(cfg: EnvConfig, frames: int):
    def kernel(state_ref, out_ref):
        fields = tuple(state_ref[i] for i in range(NFIELDS))

        def body(_, carry):
            p1, p2, ball, game = _split(carry)
            p1, p2, ball, game = _fused_frame(cfg, p1, p2, ball, game)
            return _join(p1, p2, ball, game)

        fields = jax.lax.fori_loop(0, frames, body, fields)
        for i in range(NFIELDS):
            out_ref[i] = fields[i]

    return kernel


def pack_state(state: EnvState, action_key: jnp.ndarray) -> jnp.ndarray:
    """Batched EnvState -> (NFIELDS, B) int32 (plus per-env action keys)."""
    B = state.scores.shape[0]
    akey = jax.vmap(
        lambda i: _fold_action_key(action_key, i))(jnp.arange(B))
    rng = state.rng_key.astype(jnp.uint32).view(jnp.int32)
    cols = ([getattr(state.p1, f) for f in _PLAYER_FIELDS] +
            [getattr(state.p2, f) for f in _PLAYER_FIELDS] +
            [getattr(state.ball, f) for f in _BALL_FIELDS] +
            [state.power_hit_key_down_prev[:, 0],
             state.power_hit_key_down_prev[:, 1],
             state.scores[:, 0], state.scores[:, 1],
             state.is_player2_serve, state.round_ended, state.game_ended,
             state.step_count, state.draw_counter,
             rng[:, 0], rng[:, 1], akey[:, 0], akey[:, 1]])
    return jnp.stack([c.astype(jnp.int32) for c in cols])


def unpack_state(matrix: jnp.ndarray, like: EnvState) -> EnvState:
    np1 = len(_PLAYER_FIELDS)
    nb = len(_BALL_FIELDS)
    p1 = like.p1._replace(**{f: matrix[i] for i, f in enumerate(_PLAYER_FIELDS)})
    p2 = like.p2._replace(**{f: matrix[np1 + i]
                             for i, f in enumerate(_PLAYER_FIELDS)})
    ball = like.ball._replace(**{f: matrix[2 * np1 + i]
                                 for i, f in enumerate(_BALL_FIELDS)})
    g = matrix[2 * np1 + nb:]
    return like._replace(
        p1=p1, p2=p2, ball=ball,
        power_hit_key_down_prev=jnp.stack([g[0], g[1]], axis=-1),
        scores=jnp.stack([g[2], g[3]], axis=-1),
        is_player2_serve=g[4], round_ended=g[5], game_ended=g[6],
        step_count=g[7], draw_counter=g[8],
        rng_key=jnp.stack([g[9], g[10]], axis=-1).view(jnp.uint32),
    )


def _fold_action_key(base: jnp.ndarray, env_index: jnp.ndarray) -> jnp.ndarray:
    from pikazoo_tpu.core.rng import fold_key, key_from_jax
    return fold_key(key_from_jax(base), env_index).view(jnp.int32)


def fused_actions(action_key: jnp.ndarray, batch: int, frames: int,
                  num_actions: int = 18, start: int = 0) -> jnp.ndarray:
    """Host-side reproduction of the in-kernel action stream:
    (frames, batch, 2) int32 — for equality tests and scanned comparisons.
    ``start`` is the envs' step_count at the first frame (the kernel keys
    actions on cumulative step_count, not a per-call counter)."""
    akeys = jax.vmap(lambda i: _fold_action_key(action_key, i))(
        jnp.arange(batch)).view(jnp.uint32)
    t = jnp.arange(start, start + frames, dtype=jnp.uint32)

    def per_env(akey):
        a1 = jax.vmap(lambda tt: sample_action(akey, tt, 0, num_actions))(t)
        a2 = jax.vmap(lambda tt: sample_action(akey, tt, 1, num_actions))(t)
        return jnp.stack([a1, a2], axis=-1)  # (T, 2)

    return jnp.moveaxis(jax.vmap(per_env)(akeys), 0, 1)  # (T, B, 2)


@functools.partial(jax.jit,
                   static_argnames=("config", "frames", "interpret"))
def fused_rollout(state: EnvState, action_key: jnp.ndarray,
                  config: EnvConfig, frames: int,
                  interpret: bool = False) -> EnvState:
    """Advance a batched EnvState ``frames`` frames entirely in VMEM.

    Batch must be a multiple of ``BLOCK_ENVS`` (= 1024)."""
    packed = pack_state(state, action_key)  # (NFIELDS, B)
    B = packed.shape[1]
    assert B % BLOCK_ENVS == 0, f"batch must be a multiple of {BLOCK_ENVS}"
    rows = B // LANES
    grid = rows // BLOCK_ROWS
    mat = packed.reshape(NFIELDS, rows, LANES)

    out = pl.pallas_call(
        _make_kernel(config, frames),
        grid=(grid,),
        in_specs=[pl.BlockSpec((NFIELDS, BLOCK_ROWS, LANES),
                               lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((NFIELDS, BLOCK_ROWS, LANES),
                               lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NFIELDS, rows, LANES), jnp.int32),
        interpret=interpret,
    )(mat)

    return unpack_state(out.reshape(NFIELDS, B), state)
