"""Native C++ engine: build, behavior, and fuzz parity vs the JAX kernel.

Both implementations consume identical oracle draw streams, so any state
divergence over thousands of random frames is a logic bug in one of them —
this is the scale-out complement to the recorded-reference parity suite.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pikazoo_tpu.envs import EnvConfig, PikaZoo
from pikazoo_tpu.native import NativeEngine, NFIELDS, native_available

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="g++ toolchain unavailable")

ORACLE_CAP = 1 << 13


def make_envs(B, seed=0, **cfg_kw):
    """Matching JAX env state + packed native state + shared oracle."""
    cfg = EnvConfig(**cfg_kw)
    env = PikaZoo(cfg)
    rng = np.random.default_rng(seed)
    oracle_np = rng.integers(0, 2, size=(B, ORACLE_CAP)).astype(np.int32)
    # Draw values must be valid for every site: integers(0, n) with n in
    # {2, 3, 5, 20}; use per-column max 2 so all sites accept them.
    state_rows = []
    for i in range(B):
        s, _ = env.reset(jax.random.key(seed + i), counter=0,
                         oracle=jnp.asarray(oracle_np[i]))
        state_rows.append(s)
    jax_state = jax.tree.map(lambda *xs: jnp.stack(xs), *state_rows)
    native = NativeEngine(
        winning_score=cfg.winning_score, serve=cfg.serve,
        is_player1_computer=cfg.is_player1_computer,
        is_player2_computer=cfg.is_player2_computer,
        auto_reset=cfg.auto_reset)
    packed = NativeEngine.pack(jax_state)
    assert packed.shape == (B, NFIELDS)
    return env, jax_state, native, packed, oracle_np


def _assert_states_match(jax_state, packed, t):
    repacked = NativeEngine.pack(jax_state)
    if not np.array_equal(repacked, packed):
        bad = np.argwhere(repacked != packed)
        from pikazoo_tpu.native import FIELDS
        b, f = bad[0]
        raise AssertionError(
            f"state divergence at frame {t}, env {b}, field {FIELDS[f]}: "
            f"jax={repacked[b, f]} native={packed[b, f]} "
            f"({len(bad)} total mismatches)")


@pytest.mark.parametrize("cfg_kw", [
    dict(auto_reset=True),
    dict(auto_reset=True, serve="random"),
    dict(auto_reset=True, winning_score=3,
         is_player1_computer=True, is_player2_computer=True),
    dict(auto_reset=True, is_player2_computer=True),
])
def test_fuzz_parity_native_vs_jax(cfg_kw):
    B, T = 16, 600
    env, jax_state, native, packed, oracle_np = make_envs(B, seed=42, **cfg_kw)
    oracle_j = jnp.asarray(oracle_np)
    step = jax.jit(jax.vmap(env.step))
    rng = np.random.default_rng(7)
    for t in range(T):
        acts = rng.integers(0, 18, size=(B, 2)).astype(np.int32)
        jax_state, ts = step(jax_state, jnp.asarray(acts), oracle_j)
        rewards, flags = native.step(packed, acts, oracle_np)
        _assert_states_match(jax_state, packed, t)
        np.testing.assert_array_equal(np.asarray(ts.rewards), rewards)
        np.testing.assert_array_equal(
            np.asarray(ts.terminated), (flags & 1).astype(np.int32))


def test_native_run_multiframe_matches_stepwise():
    B, T = 8, 200
    _, _, native, packed, oracle_np = make_envs(B, seed=1, auto_reset=True)
    packed2 = packed.copy()
    rng = np.random.default_rng(3)
    acts = rng.integers(0, 18, size=(T, B, 2)).astype(np.int32)
    for t in range(T):
        native.step(packed, acts[t], oracle_np)
    native.run(packed2, acts, oracle_np)
    np.testing.assert_array_equal(packed, packed2)


def test_native_throughput_smoke():
    """Not a benchmark — just proves the multicore path moves."""
    import time
    B, T = 512, 200
    _, _, native, packed, oracle_np = make_envs(B, seed=2, auto_reset=True)
    acts = np.random.default_rng(0).integers(
        0, 18, size=(T, B, 2)).astype(np.int32)
    t0 = time.perf_counter()
    native.run(packed, acts, oracle_np)
    dt = time.perf_counter() - t0
    assert B * T / dt > 100_000  # comfortably above the reference's 53k
