"""Exhaustive input-decode equivalence against the reference PikaUserInput."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pikazoo_tpu.core.input import ACTION_KEY_TABLE, decode_action, decode_keys
from pikazoo_tpu.parity import reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference repo not mounted")


def test_decode_matches_reference_over_all_actions_and_latch_states():
    import sys
    sys.path.insert(0, "/root/reference")
    from pikazoo.env.physics import PikaUserInput

    decode = jax.jit(decode_action)
    for latch in (0, 1):
        for action in range(18):
            ref = PikaUserInput()
            ref.power_hit_key_is_down_previous = bool(latch)
            ref.get_input(np.asarray(ACTION_KEY_TABLE[action], np.int8))

            inp, new_latch = decode(jnp.int32(action), jnp.int32(latch))
            assert int(inp.x_direction) == ref.x_direction, (action, latch)
            assert int(inp.y_direction) == ref.y_direction, (action, latch)
            assert int(inp.power_hit) == ref.power_hit, (action, latch)
            assert int(new_latch) == int(ref.power_hit_key_is_down_previous)


@pytest.mark.parametrize("width", [5, 6])
def test_decode_keys_matches_reference_exhaustively(width):
    """Engine-level key-vector decode, incl. the vestigial 6th down_right
    key (reference physics.py:78-93), over every key combination and both
    latch states."""
    import sys
    sys.path.insert(0, "/root/reference")
    from pikazoo.env.physics import PikaUserInput

    decode = jax.jit(decode_keys)
    for latch in (0, 1):
        for bits in range(2 ** width):
            keys = [(bits >> i) & 1 for i in range(width)]
            ref = PikaUserInput()
            ref.power_hit_key_is_down_previous = bool(latch)
            ref.get_input(np.asarray(keys, np.int8))

            inp, new_latch = decode(jnp.asarray(keys, jnp.int32),
                                    jnp.int32(latch))
            assert int(inp.x_direction) == ref.x_direction, (keys, latch)
            assert int(inp.y_direction) == ref.y_direction, (keys, latch)
            assert int(inp.power_hit) == ref.power_hit, (keys, latch)
            assert int(new_latch) == int(ref.power_hit_key_is_down_previous)


def test_decode_keys_equals_decode_action_on_env_rows():
    """The 18 env action rows decode identically through both entry points."""
    for latch in (0, 1):
        for action in range(18):
            via_keys, lk = decode_keys(
                jnp.asarray(ACTION_KEY_TABLE[action], jnp.int32),
                jnp.int32(latch))
            via_action, la = decode_action(jnp.int32(action), jnp.int32(latch))
            assert jax.tree.map(int, via_keys) == jax.tree.map(int, via_action)
            assert int(lk) == int(la)


def test_decode_sequences_edge_detection():
    """Held power key fires once; released-then-pressed fires again."""
    decode = jax.jit(decode_action)
    latch = jnp.int32(0)
    fires = []
    for action in (1, 1, 1, 0, 1):
        inp, latch = decode(jnp.int32(action), latch)
        fires.append(int(inp.power_hit))
    assert fires == [1, 0, 0, 0, 1]
