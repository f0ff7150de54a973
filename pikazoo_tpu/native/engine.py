"""ctypes bindings and state packing for the native C++ engine.

Builds ``pika_engine.cc`` on first use (g++, -O3, OpenMP when available) and
exposes :class:`NativeEngine` with the same step semantics as the JAX env over
a packed ``(B, NFIELDS)`` int32 state matrix.  Conversion helpers map to/from
the :class:`~pikazoo_tpu.envs.pika_volley.EnvState` pytree (minus the threefry
key — the native engine is oracle-only: RNG values come from a caller-provided
draw buffer indexed by the same draw counter, which is also what makes it a
bit-comparable second implementation for fuzz parity).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile
from typing import Optional, Tuple

import numpy as np

# Must match enum Field in pika_engine.cc.
_PLAYER_FIELDS = ["x", "y", "y_velocity", "state", "frame_number",
                  "normal_status_arm_swing_direction",
                  "delay_before_next_frame", "diving_direction",
                  "lying_down_duration_left", "is_collision_with_ball_happened",
                  "computer_boldness", "computer_where_to_stand_by",
                  "is_winner", "game_ended"]
_BALL_FIELDS = ["x", "y", "x_velocity", "y_velocity", "previous_x",
                "previous_y", "previous_previous_x", "previous_previous_y",
                "is_power_hit", "expected_landing_point_x", "rotation",
                "fine_rotation", "punch_effect_x", "punch_effect_y",
                "punch_effect_radius"]
_GAME_FIELDS = ["key1", "key2", "score1", "score2", "is_player2_serve",
                "round_ended", "game_ended", "step_count", "draw_counter",
                "rng_lo", "rng_hi"]
FIELDS = ([f"p1.{f}" for f in _PLAYER_FIELDS] +
          [f"p2.{f}" for f in _PLAYER_FIELDS] +
          [f"ball.{f}" for f in _BALL_FIELDS] + _GAME_FIELDS)
NFIELDS = len(FIELDS)

_SERVE_MODES = {"winner": 0, "alternate": 1, "random": 2}

_lib = None
_build_error: Optional[str] = None


def _build_and_load():
    global _lib, _build_error
    if _lib is not None or _build_error is not None:
        return
    src = os.path.join(os.path.dirname(__file__), "pika_engine.cc")
    cache_dir = os.environ.get(
        "PIKAZOO_NATIVE_CACHE",
        os.path.join(tempfile.gettempdir(), "pikazoo_native"))
    os.makedirs(cache_dir, exist_ok=True)
    so_path = os.path.join(cache_dir, "pika_engine.so")
    if (not os.path.exists(so_path)
            or os.path.getmtime(so_path) < os.path.getmtime(src)):
        for extra in (["-fopenmp"], []):
            cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                   *extra, src, "-o", so_path]
            try:
                subprocess.run(cmd, check=True, capture_output=True)
                break
            except (subprocess.CalledProcessError, FileNotFoundError) as e:
                err = getattr(e, "stderr", b"") or str(e).encode()
                _build_error = err.decode(errors="replace")[:2000]
        else:
            return
        _build_error = None
    lib = ctypes.CDLL(so_path)
    assert lib.pika_nfields() == NFIELDS, \
        "C++/Python state layout out of sync"
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    lib.pika_step_batch.argtypes = [i32p, i32p, i32p, i32p, u8p] + \
        [ctypes.c_int] * 7
    lib.pika_run_batch.argtypes = [i32p, i32p, i32p, i32p, u8p] + \
        [ctypes.c_int] * 8
    _lib = lib


def native_available() -> bool:
    _build_and_load()
    return _lib is not None


class NativeEngine:
    """Batched host engine with the JAX env's exact step semantics.

    ``state`` is a ``(B, NFIELDS)`` int32 matrix; use :meth:`pack` /
    :meth:`unpack` to convert to and from the JAX ``EnvState``.
    """

    def __init__(self, winning_score: int = 15, serve: str = "winner",
                 is_player1_computer: bool = False,
                 is_player2_computer: bool = False, auto_reset: bool = True):
        _build_and_load()
        if _lib is None:
            raise RuntimeError(f"native engine unavailable: {_build_error}")
        self.winning_score = winning_score
        self.serve_mode = _SERVE_MODES[serve]
        self.p1_cpu = int(is_player1_computer)
        self.p2_cpu = int(is_player2_computer)
        self.auto_reset = int(auto_reset)

    # ---------------------------------------------------------- conversion --
    @staticmethod
    def pack(env_state) -> np.ndarray:
        """EnvState pytree (possibly batched) -> (B, NFIELDS) int32."""
        p1, p2, b = env_state.p1, env_state.p2, env_state.ball
        cols = ([np.asarray(getattr(p1, f)) for f in _PLAYER_FIELDS] +
                [np.asarray(getattr(p2, f)) for f in _PLAYER_FIELDS] +
                [np.asarray(getattr(b, f)) for f in _BALL_FIELDS])
        latch = np.asarray(env_state.power_hit_key_down_prev)
        scores = np.asarray(env_state.scores)
        batched = latch.ndim == 2
        if not batched:
            latch = latch[None]
            scores = scores[None]
            cols = [np.asarray(c)[None] for c in cols]
        else:
            cols = [np.asarray(c) for c in cols]
        rng_key = np.asarray(env_state.rng_key, np.uint32).view(np.int32)
        if rng_key.ndim == 1:
            rng_key = rng_key[None]
        cols += [latch[:, 0], latch[:, 1], scores[:, 0], scores[:, 1],
                 np.asarray(env_state.is_player2_serve).reshape(-1),
                 np.asarray(env_state.round_ended).reshape(-1),
                 np.asarray(env_state.game_ended).reshape(-1),
                 np.asarray(env_state.step_count).reshape(-1),
                 np.asarray(env_state.draw_counter).reshape(-1),
                 rng_key[:, 0], rng_key[:, 1]]
        return np.ascontiguousarray(np.stack(cols, axis=1).astype(np.int32))

    @staticmethod
    def unpack(matrix: np.ndarray, like) -> "object":
        """(B, NFIELDS) int32 -> EnvState shaped like ``like`` (keeps its
        rng_key)."""
        m = matrix
        i = [0]

        def take(n):
            sl = m[:, i[0]:i[0] + n]
            i[0] += n
            return sl

        p1_cols = take(len(_PLAYER_FIELDS))
        p2_cols = take(len(_PLAYER_FIELDS))
        ball_cols = take(len(_BALL_FIELDS))
        rest = take(len(_GAME_FIELDS))
        squeeze = np.asarray(like.round_ended).ndim == 0

        def arr(x):
            return x[0] if squeeze else x

        p1 = like.p1._replace(**{f: arr(p1_cols[:, j])
                                 for j, f in enumerate(_PLAYER_FIELDS)})
        p2 = like.p2._replace(**{f: arr(p2_cols[:, j])
                                 for j, f in enumerate(_PLAYER_FIELDS)})
        ball = like.ball._replace(**{f: arr(ball_cols[:, j])
                                     for j, f in enumerate(_BALL_FIELDS)})
        return like._replace(
            p1=p1, p2=p2, ball=ball,
            power_hit_key_down_prev=arr(rest[:, 0:2]),
            scores=arr(rest[:, 2:4]),
            is_player2_serve=arr(rest[:, 4]),
            round_ended=arr(rest[:, 5]),
            game_ended=arr(rest[:, 6]),
            step_count=arr(rest[:, 7]),
            draw_counter=arr(rest[:, 8]),
            rng_key=arr(np.ascontiguousarray(rest[:, 9:11]).view(np.uint32)),
        )

    # ----------------------------------------------------------------- run --
    @staticmethod
    def _oracle_or_production(oracle, B):
        """``oracle=None`` selects production mode: draws come from the
        state's threefry key (bit-identical to the JAX env)."""
        if oracle is None:
            return np.zeros((B, 1), np.int32), 0
        return np.ascontiguousarray(oracle, np.int32), oracle.shape[1]

    def step(self, state: np.ndarray, actions: np.ndarray,
             oracle: Optional[np.ndarray] = None
             ) -> Tuple[np.ndarray, np.ndarray]:
        """One frame in place.  ``actions`` (B, 2); ``oracle`` (B, CAP) or
        None for production RNG.  Returns (rewards (B, 2), flags (B,)
        bitmask: 1 term | 2 round | 4 touched)."""
        B = state.shape[0]
        rewards = np.empty((B, 2), np.int32)
        flags = np.empty((B,), np.uint8)
        oracle, cap = self._oracle_or_production(oracle, B)
        _lib.pika_step_batch(state, np.ascontiguousarray(actions, np.int32),
                             oracle, rewards, flags, B, self.winning_score,
                             self.serve_mode, self.p1_cpu, self.p2_cpu,
                             self.auto_reset, cap)
        return rewards, flags

    def run(self, state: np.ndarray, actions: np.ndarray,
            oracle: Optional[np.ndarray] = None
            ) -> Tuple[np.ndarray, np.ndarray]:
        """Many frames in place: ``actions`` (T, B, 2)."""
        T, B = actions.shape[:2]
        rewards = np.empty((B, 2), np.int32)
        flags = np.empty((B,), np.uint8)
        oracle, cap = self._oracle_or_production(oracle, B)
        _lib.pika_run_batch(state, np.ascontiguousarray(actions, np.int32),
                            oracle, rewards, flags, B, T, self.winning_score,
                            self.serve_mode, self.p1_cpu, self.p2_cpu,
                            self.auto_reset, cap)
        return rewards, flags
