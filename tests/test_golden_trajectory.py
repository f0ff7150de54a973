"""Golden production trajectory: the full stack (env + AI + production
threefry streams) must reproduce a committed 400-frame recording bit-for-bit.

This pins determinism across refactors beyond what reference parity covers:
the reference gate uses oracle RNG, while this trajectory exercises the
production draw/key derivation (threefry2x32 spec in ``core/rng.py``), the
computer AI, serve=random, and auto-reset — any change to those streams or to
batching/key-folding shows up here first.  Regenerate deliberately (see the
recording snippet in the round-1 history) only when the stream is *meant* to
change, and say so in the commit message.
"""

import os

import numpy as np

import jax
import jax.numpy as jnp

from pikazoo_tpu.envs import EnvConfig, PikaZoo

GOLDEN = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "golden_trajectory.npz")


def test_golden_production_trajectory():
    data = np.load(GOLDEN)
    cfg = EnvConfig(auto_reset=True, winning_score=3, serve="random",
                    is_player1_computer=True, is_player2_computer=True)
    env = PikaZoo(cfg)
    B, T = 4, 400
    state, _ = env.reset_batch(jax.random.key(2026), B)
    step = jax.jit(env.step_batch)
    rng = np.random.default_rng(816)
    for t in range(T):
        acts = jnp.asarray(rng.integers(0, 18, size=(B, 2)), jnp.int32)
        state, ts = step(state, acts)
        np.testing.assert_array_equal(np.asarray(ts.obs), data["obs"][t],
                                      err_msg=f"obs diverged at frame {t}")
        np.testing.assert_array_equal(np.asarray(ts.rewards),
                                      data["rewards"][t],
                                      err_msg=f"rewards diverged at frame {t}")
    np.testing.assert_array_equal(np.asarray(state.scores),
                                  data["final_scores"])
    np.testing.assert_array_equal(np.asarray(state.draw_counter),
                                  data["final_draws"])
