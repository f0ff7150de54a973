"""Frame-by-frame parity against the reference PettingZoo env.

Covers BASELINE.md configs 1-3: human-vs-human defaults, full computer
self-play 15-point games (the hardest path: landing predictor + rule AI +
conditional RNG), and serve=random.  Draw-counter equality at every frame
additionally proves the draw-slot masking consumes RNG exactly when the
reference does.
"""

import numpy as np
import pytest

from pikazoo_tpu.envs import EnvConfig
from pikazoo_tpu.parity import record_reference_trace, reference_available

from helpers import replay_and_compare

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference repo not mounted")


def random_actions(t, rng):
    return rng.integers(0, 18, size=2)


def noop_actions(t, rng):
    return np.zeros(2, np.int64)


@pytest.mark.parametrize("seed", [0, 7])
def test_parity_human_vs_human(seed):
    trace = record_reference_trace(seed, 4000, random_actions)
    replay_and_compare(trace, EnvConfig(auto_reset=False))
    # A full game must actually have been played out.
    assert trace.terminations[-1]


@pytest.mark.parametrize("seed", [3])
def test_parity_computer_self_play_full_game(seed):
    trace = record_reference_trace(
        seed, 20000, noop_actions,
        is_player1_computer=True, is_player2_computer=True)
    assert trace.terminations[-1], "computer self-play game should finish"
    replay_and_compare(
        trace,
        EnvConfig(auto_reset=False, is_player1_computer=True,
                  is_player2_computer=True))


def test_parity_mixed_computer_random_opponent():
    trace = record_reference_trace(
        11, 6000, random_actions, is_player2_computer=True)
    replay_and_compare(
        trace, EnvConfig(auto_reset=False, is_player2_computer=True))


def test_parity_computer_player1_only():
    """Left-seat AI exercises the is_player2=False AI boundary arithmetic."""
    trace = record_reference_trace(
        13, 6000, random_actions, is_player1_computer=True)
    replay_and_compare(
        trace, EnvConfig(auto_reset=False, is_player1_computer=True))


def test_parity_serve_random():
    trace = record_reference_trace(
        5, 4000, random_actions, serve="random")
    replay_and_compare(
        trace, EnvConfig(auto_reset=False, serve="random"))


def test_parity_serve_alternate_short_game():
    trace = record_reference_trace(
        9, 6000, random_actions, serve="alternate", winning_score=5)
    replay_and_compare(
        trace,
        EnvConfig(auto_reset=False, serve="alternate", winning_score=5))
