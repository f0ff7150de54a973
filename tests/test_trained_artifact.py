"""The committed trained-policy artifact really beats the rule AI."""

import os

import jax
import numpy as np
import pytest

from pikazoo_tpu.envs import EnvConfig, PikaZoo
from pikazoo_tpu.train import PPOConfig, make_ppo_trainer
from pikazoo_tpu.train import checkpoint as ckpt
from pikazoo_tpu.train.evaluate import evaluate_vs_computer

ARTIFACT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "artifacts", "vs_ai_policy")


@pytest.mark.slow
@pytest.mark.skipif(not os.path.isdir(ARTIFACT),
                    reason="trained artifact not present")
def test_trained_policy_beats_rule_ai():
    pytest.importorskip("orbax.checkpoint")
    env = PikaZoo(EnvConfig(winning_score=15, auto_reset=True,
                            is_player2_computer=True))
    cfg = PPOConfig(num_envs=8192, rollout_length=128, num_minibatches=8,
                    update_epochs=4, hidden=(256, 256), entropy_coef=0.01,
                    learner_seats="p1", learning_rate=5e-4)
    init_fn, _, network = make_ppo_trainer(env, cfg)
    runner = ckpt.restore(ARTIFACT, init_fn(jax.random.key(0)))

    result = evaluate_vs_computer(
        network, runner.params, num_envs=16, max_frames=8000,
        winning_score=5, greedy=False, seed=3)
    games = int(result.games)
    assert games >= 8
    assert float(result.win_rate) > 0.9, \
        f"trained artifact win rate {float(result.win_rate)} over {games} games"
