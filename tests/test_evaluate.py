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
