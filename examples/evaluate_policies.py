"""Evaluate trained policies: vs the rule AI, head-to-head, and as Elo.

Shows the evaluation surface end to end on the committed artifacts:
restore checkpoints, measure vs-rule-AI strength, play two policies
head-to-head (both seat orders — near-peer matchups can be
seat-sensitive), and turn a small result matrix into anchored Elo with
``bradley_terry_elo``.  The full round-robin version of this is
``tools/selfplay_league.py`` -> ``artifacts/selfplay_league.json``.

Usage: python examples/evaluate_policies.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from pikazoo_tpu.envs import EnvConfig, PikaZoo
from pikazoo_tpu.train import PPOConfig, make_ppo_trainer
from pikazoo_tpu.train import checkpoint as ckpt
from pikazoo_tpu.train.evaluate import (bradley_terry_elo,
                                        evaluate_head_to_head,
                                        evaluate_vs_computer)

ART = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "artifacts")


def main():
    env = PikaZoo(EnvConfig(auto_reset=True))
    init_fn, _, network = make_ppo_trainer(
        env, PPOConfig(num_envs=8192, rollout_length=128))
    fresh = init_fn(jax.random.key(0))

    names, policies = [], []
    for name in ("selfplay_policy", "selfplay_policy_xl"):
        path = os.path.join(ART, name)
        if os.path.isdir(path):
            names.append(name)
            policies.append(ckpt.restore(path, fresh).params)
    if not policies:
        print("no committed artifacts found; train one with "
              "python -m pikazoo_tpu.train.run")
        return

    # 1. Strength vs the reference's rule AI.
    for name, params in zip(names, policies):
        r = evaluate_vs_computer(network, params, num_envs=128,
                                 max_frames=10_000, winning_score=5,
                                 greedy=False, seed=1)
        print(f"{name}: {float(r.win_rate):.3f} vs rule AI "
              f"over {int(r.games)} games")

    # 2. Head-to-head, BOTH seat orders (near-peer matchups can be
    #    seat-sensitive; see evaluate_head_to_head's docstring).
    wins = np.zeros((3, 3))
    games = np.zeros((3, 3))
    if len(policies) == 2:
        for a, b in ((0, 1), (1, 0)):
            m = evaluate_head_to_head(network, policies[a],
                                      network, policies[b], num_envs=128,
                                      max_frames=20_000, winning_score=3,
                                      greedy=False, seed=2 + a)
            g, w = float(m.games), float(m.policy_wins)
            print(f"{names[a]} (seat 1) vs {names[b]}: "
                  f"{w:.0f}/{g:.0f} ({w / max(g, 1):.3f})")
            wins[a, b] += w
            wins[b, a] += g - w
            games[a, b] += g
            games[b, a] += g

    # 3. Elo from the matrix, anchored at the rule AI (= member 2) via the
    #    vs-AI results above.
    for i, params in enumerate(policies):
        r = evaluate_vs_computer(network, params, num_envs=128,
                                 max_frames=10_000, winning_score=5,
                                 greedy=False, seed=5 + i)
        g, w = float(r.games), float(r.policy_wins)
        wins[i, 2] += w
        wins[2, i] += g - w
        games[i, 2] += g
        games[2, i] += g
    elo = bradley_terry_elo(wins, games, anchor=2, anchor_elo=1000.0)
    print("\nElo (rule-ai anchored at 1000):")
    for name, e in sorted(zip(names + ["rule-ai"], elo),
                          key=lambda kv: -kv[1]):
        print(f"  {name:24s} {e:7.0f}")


if __name__ == "__main__":
    main()
