"""Wrapper-stack parity (BASELINE config 3) against the reference wrappers."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pikazoo_tpu.envs import EnvConfig, PikaZoo
from pikazoo_tpu.parity import record_reference_trace, reference_available
from pikazoo_tpu.wrappers import (NormalizeObservation, RewardByBallPosition,
                                  RewardInNormalState, SimplifyAction)

from helpers import pad_oracle

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference repo not mounted")

SHAPING = (0.5, -0.25, 0.125, 0.0, 0.0, 0.125, -0.25, 0.5)


def _reference_wrap(env):
    import pikazoo.wrappers as ref_wrappers
    return ref_wrappers.SimplifyAction(
        ref_wrappers.RewardByBallPosition(env, additional_reward=SHAPING))


def test_parity_simplify_and_ball_position_rewards():
    trace = record_reference_trace(
        21, 4000, lambda t, rng: rng.integers(0, 13, size=2),
        serve="random", wrap=_reference_wrap)

    env = SimplifyAction(RewardByBallPosition(
        PikaZoo(EnvConfig(auto_reset=False, serve="random")),
        additional_reward=SHAPING))
    oracle = pad_oracle(trace.draws)
    state, ts = env.reset(jax.random.key(0), oracle=oracle)
    step = jax.jit(env.step)
    np.testing.assert_array_equal(np.asarray(ts.obs), trace.obs[0])
    for t in range(trace.actions.shape[0]):
        state, ts = step(state, jnp.asarray(trace.actions[t]), oracle)
        np.testing.assert_array_equal(np.asarray(ts.obs), trace.obs[t + 1],
                                      err_msg=f"obs mismatch at {t}")
        np.testing.assert_allclose(np.asarray(ts.rewards),
                                   trace.rewards[t].astype(np.float64),
                                   rtol=0, atol=1e-6,
                                   err_msg=f"reward mismatch at {t}")
        assert bool(ts.terminated) == bool(trace.terminations[t])


def test_reward_in_normal_state():
    env = RewardInNormalState(PikaZoo(EnvConfig()), reward=-0.01)
    state, ts = env.reset(jax.random.key(0))
    state, ts = jax.jit(env.step)(state, jnp.zeros(2, jnp.int32))
    np.testing.assert_allclose(np.asarray(ts.rewards), [-0.01, -0.01])


def test_normalize_observation_bounds():
    env = NormalizeObservation(PikaZoo(EnvConfig()))
    state, ts = env.reset(jax.random.key(0))
    obs = np.asarray(ts.obs)
    assert obs.dtype == np.float32
    assert (obs >= 0).all() and (obs <= 1).all()
    # Cross-check one dim against the reference formula: player x = 36 in
    # [32, 400] -> (36-32)/368.
    np.testing.assert_allclose(obs[0, 0], (36 - 32) / 368, rtol=1e-6)
