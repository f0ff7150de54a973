"""State-envelope validation over long random rollouts."""

import jax
import jax.numpy as jnp
import pytest

from pikazoo_tpu.envs import EnvConfig, PikaZoo
from pikazoo_tpu.utils import validate_state


def test_states_stay_in_envelope_over_rollout():
    env = PikaZoo(EnvConfig(auto_reset=True))
    state, _ = env.reset_batch(jax.random.key(0), 64)

    def body(carry, _):
        st, key = carry
        key, sub = jax.random.split(key)
        acts = jax.random.randint(sub, (64, 2), 0, 18, jnp.int32)
        st, _ts = env.step_batch(st, acts)
        return (st, key), None

    (state, _), _ = jax.jit(
        lambda s, k: jax.lax.scan(body, (s, k), None, length=1500))(
            state, jax.random.key(1))
    validate_state(state)


def test_validation_catches_corruption():
    env = PikaZoo(EnvConfig())
    state, _ = env.reset(jax.random.key(0))
    bad = state._replace(ball=state.ball._replace(x=jnp.int32(-500)))
    with pytest.raises(AssertionError, match="ball.x"):
        validate_state(bad)
