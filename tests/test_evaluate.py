"""Evaluation harness: random policy vs rule AI should lose badly."""

import jax
import numpy as np

from pikazoo_tpu.envs import EnvConfig, PikaZoo
from pikazoo_tpu.train import ActorCritic
from pikazoo_tpu.train.evaluate import evaluate_vs_computer


def test_random_policy_loses_to_rule_ai():
    network = ActorCritic(hidden=(16,))
    env = PikaZoo(EnvConfig())
    _, ts = env.reset(jax.random.key(0))
    params = network.init(jax.random.key(1), ts.obs)

    result = evaluate_vs_computer(
        network, params, num_envs=32, max_frames=4000, winning_score=2,
        greedy=False, seed=0)
    games = int(result.games)
    assert games >= 16, "most matches should finish"
    # An untrained policy should rarely beat the rule AI.
    assert float(result.win_rate) < 0.4
    assert float(result.mean_score_diff) < 0


def test_bradley_terry_elo_recovers_ordering():
    """Synthetic league with known strengths: the fit recovers the order,
    pins the anchor, and matches the analytic pairwise Elo gap."""
    import numpy as np

    from pikazoo_tpu.train.evaluate import bradley_terry_elo

    # True strengths on the Elo scale: 400 Elo apart => p(win) ~= 0.909.
    true_elo = np.array([800.0, 1000.0, 1200.0, 1600.0])
    n = len(true_elo)
    rng = np.random.default_rng(0)
    games = np.zeros((n, n))
    wins = np.zeros((n, n))
    for i in range(n):
        for j in range(i + 1, n):
            g = 4000
            p_i = 1.0 / (1.0 + 10 ** ((true_elo[j] - true_elo[i]) / 400.0))
            w = rng.binomial(g, p_i)
            games[i, j] = games[j, i] = g
            wins[i, j] = w
            wins[j, i] = g - w
    elo = bradley_terry_elo(wins, games, anchor=1, anchor_elo=1000.0)
    assert abs(elo[1] - 1000.0) < 1e-9          # anchor pinned exactly
    assert list(np.argsort(elo)) == [0, 1, 2, 3]  # ordering recovered
    np.testing.assert_allclose(elo, true_elo, atol=25)  # ~sampling noise


def test_bradley_terry_elo_finite_for_undefeated():
    """A member that never loses (or never wins) must still get a finite
    rating thanks to the prior pseudo-games."""
    import numpy as np

    from pikazoo_tpu.train.evaluate import bradley_terry_elo

    games = np.array([[0.0, 100.0], [100.0, 0.0]])
    wins = np.array([[0.0, 100.0], [0.0, 0.0]])  # player 0 undefeated
    elo = bradley_terry_elo(wins, games, anchor=1, anchor_elo=1000.0)
    assert np.isfinite(elo).all()
    assert elo[0] > 1000.0
