"""Exhaustive input-decode equivalence against the reference PikaUserInput."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pikazoo_tpu.core.input import ACTION_KEY_TABLE, decode_action
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


def test_decode_sequences_edge_detection():
    """Held power key fires once; released-then-pressed fires again."""
    decode = jax.jit(decode_action)
    latch = jnp.int32(0)
    fires = []
    for action in (1, 1, 1, 0, 1):
        inp, latch = decode(jnp.int32(action), latch)
        fires.append(int(inp.power_hit))
    assert fires == [1, 0, 0, 0, 1]
