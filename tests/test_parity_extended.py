"""Extended parity: normalized-obs wrapper stack and long fuzz (slow-marked)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pikazoo_tpu.envs import EnvConfig, PikaZoo
from pikazoo_tpu.parity import record_reference_trace, reference_available
from pikazoo_tpu.wrappers import NormalizeObservation, RewardInNormalState

from helpers import pad_oracle

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference repo not mounted")


def _ref_norm_stack(env):
    import pikazoo.wrappers as ref_wrappers
    return ref_wrappers.NormalizeObservation(
        ref_wrappers.RewardInNormalState(env, reward=-0.005))


def test_parity_normalize_and_fill_rewards_stack():
    trace = record_reference_trace(
        31, 2500, lambda t, rng: rng.integers(0, 18, size=2),
        wrap=_ref_norm_stack)
    env = NormalizeObservation(RewardInNormalState(
        PikaZoo(EnvConfig(auto_reset=False)), reward=-0.005))
    oracle = pad_oracle(trace.draws)
    state, ts = env.reset(jax.random.key(0), oracle=oracle)
    step = jax.jit(env.step)
    np.testing.assert_allclose(np.asarray(ts.obs), trace.obs[0], atol=1e-6)
    for t in range(trace.actions.shape[0]):
        state, ts = step(state, jnp.asarray(trace.actions[t]), oracle)
        np.testing.assert_allclose(np.asarray(ts.obs), trace.obs[t + 1],
                                   atol=1e-6, err_msg=f"obs @ {t}")
        np.testing.assert_allclose(np.asarray(ts.rewards), trace.rewards[t],
                                   atol=1e-6, err_msg=f"rew @ {t}")


@pytest.mark.slow
@pytest.mark.parametrize("seed", [101, 202, 303])
def test_parity_long_fuzz_computer_games(seed):
    from helpers import replay_and_compare
    trace = record_reference_trace(
        seed, 25000, lambda t, rng: rng.integers(0, 18, size=2),
        is_player1_computer=(seed % 2 == 0),
        is_player2_computer=True, serve="random")
    replay_and_compare(trace, EnvConfig(
        auto_reset=False, serve="random",
        is_player1_computer=(seed % 2 == 0), is_player2_computer=True))
