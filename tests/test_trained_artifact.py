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


@pytest.mark.slow
@pytest.mark.skipif(not os.path.isdir(ARTIFACT),
                    reason="trained artifact not present")
def test_trained_policy_beats_random_init_head_to_head():
    """Head-to-head evaluator: the trained checkpoint crushes a random
    init, and a mirror match of the same params lands near 50%."""
    pytest.importorskip("orbax.checkpoint")
    from pikazoo_tpu.train.evaluate import evaluate_head_to_head

    env = PikaZoo(EnvConfig(winning_score=15, auto_reset=True,
                            is_player2_computer=True))
    cfg = PPOConfig(num_envs=8192, rollout_length=128, num_minibatches=8,
                    update_epochs=4, hidden=(256, 256), entropy_coef=0.01,
                    learner_seats="p1", learning_rate=5e-4)
    init_fn, _, network = make_ppo_trainer(env, cfg)
    fresh = init_fn(jax.random.key(0))
    trained = ckpt.restore(ARTIFACT, fresh)

    r = evaluate_head_to_head(network, trained.params, network, fresh.params,
                              num_envs=16, max_frames=6000, winning_score=3,
                              greedy=False, seed=5)
    assert int(r.games) >= 8
    # winning_score=3 with SAMPLED actions is a noisy format — a random
    # init occasionally takes short games (measured ~0.87 over 500+ games).
    assert float(r.win_rate) > 0.75, \
        f"trained vs random head-to-head {float(r.win_rate)}"
    assert float(r.mean_score_diff) > 0

    # Symmetry control: a mirror match of the seat-agnostic RANDOM params
    # must land near 50% (measured 0.507 over ~490 games) — this pins the
    # evaluator itself as unbiased.  NOTE the trained artifact is a seat-1
    # SPECIALIST (learner_seats="p1"); in ITS mirror match seat 1 wins
    # ~95% because the same weights are out-of-distribution on seat 2 —
    # a property of the artifact, not the harness.
    m = evaluate_head_to_head(network, fresh.params, network,
                              fresh.params, num_envs=16, max_frames=6000,
                              winning_score=3, greedy=False, seed=6)
    assert int(m.games) >= 50
    assert 0.35 < float(m.win_rate) < 0.65, float(m.win_rate)


SELFPLAY = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "artifacts", "selfplay_policy")


@pytest.mark.slow
@pytest.mark.skipif(not os.path.isdir(SELFPLAY),
                    reason="self-play artifact not present")
def test_selfplay_artifact_strength():
    """The committed SYMMETRIC self-play policy (learner_seats="both",
    600 updates x 8192 envs, pure self-play — never saw the rule AI in
    training): beats the rule AI, crushes a random init head-to-head, and
    its mirror match is roughly seat-balanced (hardware eval 2026-08-20:
    0.965 / 1.000 / 0.595)."""
    pytest.importorskip("orbax.checkpoint")
    from pikazoo_tpu.train.evaluate import evaluate_head_to_head

    env = PikaZoo(EnvConfig(auto_reset=True))
    cfg = PPOConfig(num_envs=8192, rollout_length=128)
    init_fn, _, network = make_ppo_trainer(env, cfg)
    fresh = init_fn(jax.random.key(0))
    runner = ckpt.restore(SELFPLAY, fresh)

    r = evaluate_vs_computer(network, runner.params, num_envs=16,
                             max_frames=8000, winning_score=5,
                             greedy=False, seed=31,
                             env_config=EnvConfig(winning_score=5,
                                                  is_player2_computer=True,
                                                  auto_reset=True))
    assert int(r.games) >= 8
    assert float(r.win_rate) > 0.8, float(r.win_rate)

    h = evaluate_head_to_head(network, runner.params, network, fresh.params,
                              num_envs=16, max_frames=8000, winning_score=5,
                              greedy=False, seed=32)
    assert int(h.games) >= 8
    assert float(h.win_rate) > 0.9, float(h.win_rate)


XL = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "artifacts", "selfplay_policy_xl")


@pytest.mark.slow
@pytest.mark.skipif(not os.path.isdir(XL),
                    reason="XL self-play artifact not present")
def test_selfplay_xl_artifact_strength():
    """The round-5 flagship: 2000 updates x 65536 envs (16.8B env steps)
    of pure symmetric self-play via the production CLI.  Hardware eval
    2026-08-20: a PERFECT 2090/2090 vs the rule AI, 1855 Elo in the
    anchored league (artifacts/selfplay_league.json), and it beats the
    previous committed artifact 92/8 head-to-head."""
    pytest.importorskip("orbax.checkpoint")
    from pikazoo_tpu.train.evaluate import evaluate_head_to_head

    env = PikaZoo(EnvConfig(auto_reset=True))
    cfg = PPOConfig(num_envs=8192, rollout_length=128)
    init_fn, _, network = make_ppo_trainer(env, cfg)
    fresh = init_fn(jax.random.key(0))
    runner = ckpt.restore(XL, fresh)

    r = evaluate_vs_computer(network, runner.params, num_envs=16,
                             max_frames=8000, winning_score=5,
                             greedy=False, seed=33)
    assert int(r.games) >= 8
    assert float(r.win_rate) > 0.9, float(r.win_rate)

    if os.path.isdir(SELFPLAY):
        prev = ckpt.restore(SELFPLAY, fresh)
        m = evaluate_head_to_head(network, runner.params, network,
                                  prev.params, num_envs=16, max_frames=8000,
                                  winning_score=3, greedy=False, seed=34)
        assert int(m.games) >= 20
        assert float(m.win_rate) > 0.6, float(m.win_rate)


XXL = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "artifacts", "selfplay_policy_xxl")


@pytest.mark.slow
@pytest.mark.skipif(not (os.path.isdir(XXL) and os.path.isdir(XL)),
                    reason="XXL artifact not present")
def test_selfplay_xxl_artifact_strength():
    """The resume-trained flagship: XL's checkpoint continued for another
    2000 updates through the CLI resume path (4000 total = 33.6B env
    steps).  Hardware eval 2026-08-20: perfect 3521/3521 vs the rule AI,
    beats XL ~80% over 3.5k games (both seat orders), 2017 league Elo —
    the league separates policies the saturated vs-AI metric cannot."""
    pytest.importorskip("orbax.checkpoint")
    from pikazoo_tpu.train.evaluate import evaluate_head_to_head

    env = PikaZoo(EnvConfig(auto_reset=True))
    cfg = PPOConfig(num_envs=8192, rollout_length=128)
    init_fn, _, network = make_ppo_trainer(env, cfg)
    fresh = init_fn(jax.random.key(0))
    runner = ckpt.restore(XXL, fresh)
    assert int(runner.update_index) == 4000

    r = evaluate_vs_computer(network, runner.params, num_envs=16,
                             max_frames=8000, winning_score=5,
                             greedy=False, seed=41)
    assert int(r.games) >= 8
    assert float(r.win_rate) > 0.9, float(r.win_rate)

    xl = ckpt.restore(XL, fresh)
    # Near-peer games run long rallies (~2k frames/point), so the window
    # must be generous for enough games to finish.
    m = evaluate_head_to_head(network, runner.params, network, xl.params,
                              num_envs=128, max_frames=24000,
                              winning_score=3, greedy=False, seed=42)
    assert int(m.games) >= 15
    assert float(m.win_rate) > 0.55, float(m.win_rate)


P8K = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "artifacts", "selfplay_policy_8000")


@pytest.mark.slow
@pytest.mark.skipif(not os.path.isdir(P8K),
                    reason="8000-update artifact not present")
def test_selfplay_8000_artifact_strength():
    """The 8000-update run (67.1B env steps; XXL resumed again through the
    CLI).  Field-wide Bradley-Terry rates it highest (2077 league Elo —
    it crushes every weaker member harder than XXL does), but its direct
    pairing with XXL is SEAT-SPLIT: the seat-2 defender won BOTH seat
    orders of the 40k-frame hardware eval (83%/60%) — self-play
    non-transitivity that only the round-robin league surfaces, and why
    the league (not 'latest checkpoint') picks flagships."""
    pytest.importorskip("orbax.checkpoint")
    env = PikaZoo(EnvConfig(auto_reset=True))
    cfg = PPOConfig(num_envs=8192, rollout_length=128)
    init_fn, _, network = make_ppo_trainer(env, cfg)
    runner = ckpt.restore(P8K, init_fn(jax.random.key(0)))
    assert int(runner.update_index) == 8000
    r = evaluate_vs_computer(network, runner.params, num_envs=16,
                             max_frames=8000, winning_score=5,
                             greedy=False, seed=51)
    assert int(r.games) >= 8
    assert float(r.win_rate) > 0.9, float(r.win_rate)
