"""Production RNG: threefry2x32 bit-equality across JAX, C++, and spec KAT,
plus full production-mode fuzz parity (no oracle) between the two engines."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pikazoo_tpu.core.rng import fold_key, site_value, threefry2x32
from pikazoo_tpu.envs import EnvConfig, PikaZoo
from pikazoo_tpu.native import NativeEngine, native_available


def test_threefry_known_answer():
    # Random123 KAT: threefry2x32, 20 rounds, zero key and counter.
    r0, r1 = threefry2x32(jnp.zeros(2, jnp.uint32), jnp.uint32(0),
                          jnp.uint32(0))
    assert int(r0) == 0x6B200159
    assert int(r1) == 0x99BA4EFE


def test_threefry_matches_jax_internal():
    from jax._src.prng import threefry_2x32 as jax_tf
    rng = np.random.default_rng(1)
    for _ in range(50):
        k = jnp.asarray(rng.integers(0, 2 ** 32, 2, dtype=np.uint32))
        c = jnp.asarray(rng.integers(0, 2 ** 32, 2, dtype=np.uint32))
        mine = threefry2x32(k, c[0], c[1])
        ref = jax_tf((k[0], k[1]), c)
        assert int(mine[0]) == int(ref[0]) and int(mine[1]) == int(ref[1])


def test_fold_key_distinct_per_env():
    base = jnp.asarray([123, 456], jnp.uint32)
    keys = jax.vmap(fold_key, in_axes=(None, 0))(base, jnp.arange(64))
    assert len({tuple(np.asarray(k)) for k in keys}) == 64


def test_site_values_in_range():
    key = fold_key(jnp.asarray([7, 8], jnp.uint32), jnp.uint32(3))
    for upper in (2, 3, 5, 20):
        vals = [int(site_value(key, jnp.int32(c), upper)) for c in range(200)]
        assert 0 <= min(vals) and max(vals) < upper
        assert len(set(vals)) > 1


@pytest.mark.skipif(not native_available(), reason="g++ unavailable")
def test_production_mode_fuzz_parity_native_vs_jax():
    """No oracle: both engines draw from the same threefry streams and must
    stay bit-identical — proves the C++ threefry and draw-site ordering."""
    B, T = 16, 800
    cfg = EnvConfig(auto_reset=True, winning_score=3, serve="random",
                    is_player1_computer=True, is_player2_computer=True)
    env = PikaZoo(cfg)
    state, _ = env.reset_batch(jax.random.key(99), B)
    native = NativeEngine(winning_score=3, serve="random",
                          is_player1_computer=True, is_player2_computer=True,
                          auto_reset=True)
    packed = NativeEngine.pack(state)
    step = jax.jit(env.step_batch)
    rng = np.random.default_rng(5)
    for t in range(T):
        acts = rng.integers(0, 18, size=(B, 2)).astype(np.int32)
        state, ts = step(state, jnp.asarray(acts))
        rewards, flags = native.step(packed, acts)
        repacked = NativeEngine.pack(state)
        if not np.array_equal(repacked, packed):
            from pikazoo_tpu.native import FIELDS
            bad = np.argwhere(repacked != packed)
            b, f = bad[0]
            raise AssertionError(
                f"production divergence at frame {t}, env {b}, "
                f"field {FIELDS[f]}: jax={repacked[b, f]} "
                f"native={packed[b, f]}")
        np.testing.assert_array_equal(np.asarray(ts.rewards), rewards)
