"""Self-play league: checkpoint round-robin with a Bradley-Terry/Elo table.

Extends the round-4 strength ladder (``tools/selfplay_ladder.py``) into a
reusable league artifact (round-4 verdict item 7): train symmetric self-play
(``learner_seats="both"``), snapshot every SNAP updates, then play a FULL
round-robin — every snapshot vs every other snapshot head-to-head
(``evaluate_head_to_head``), every snapshot vs the rule AI
(``evaluate_vs_computer``), plus the committed ``artifacts/selfplay_policy``
as a league member when present (same default network).  The rule AI is a
league member too, anchoring the rating scale.

Ratings: Bradley-Terry strengths fit by the standard MM fixed point over the
aggregate win matrix, reported as Elo (400*log10 scale) anchored at
rule-ai = 1000.  Output: artifacts/selfplay_league.json (members, games/wins
matrices, Elo table) — a reusable strength benchmark for future policies.

Env knobs: UPDATES (default 600), SNAP (150), PPO_ENVS (8192), PPO_T (128),
EVAL_ENVS (256), OUT.
"""
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from pikazoo_tpu.envs import EnvConfig, PikaZoo
from pikazoo_tpu.train import PPOConfig, make_ppo_trainer
from pikazoo_tpu.train import checkpoint as ckpt
from pikazoo_tpu.train.evaluate import (evaluate_head_to_head,
                                        evaluate_vs_computer)

UPDATES = int(os.environ.get("UPDATES", 600))
SNAP = int(os.environ.get("SNAP", 150))
B = int(os.environ.get("PPO_ENVS", 8192))
T = int(os.environ.get("PPO_T", 128))
EVAL_ENVS = int(os.environ.get("EVAL_ENVS", 256))
_ART = os.path.join(os.path.dirname(__file__), "..", "artifacts")
OUT = os.environ.get("OUT", os.path.join(_ART, "selfplay_league.json"))
SELFPLAY_ARTIFACT = os.path.join(_ART, "selfplay_policy")

env = PikaZoo(EnvConfig(auto_reset=True))
cfg = PPOConfig(num_envs=B, rollout_length=T, learner_seats="both")
init_fn, train_step, network = make_ppo_trainer(env, cfg)
runner = init_fn(jax.random.key(23))
step = jax.jit(train_step, donate_argnums=0)

members = [("ck0", jax.device_get(runner.params))]
t0 = time.perf_counter()
for update in range(1, UPDATES + 1):
    runner, metrics = step(runner)
    if update % SNAP == 0:
        _ = float(metrics.total_loss)  # host sync
        members.append((f"ck{update}", jax.device_get(runner.params)))
        print(f"[snap] update={update} loss={float(metrics.total_loss):.5f} "
              f"t={time.perf_counter() - t0:.0f}s", flush=True)

if os.path.isdir(SELFPLAY_ARTIFACT):
    restored = ckpt.restore(SELFPLAY_ARTIFACT, init_fn(jax.random.key(0)))
    members.append(("committed_selfplay_policy",
                    jax.device_get(restored.params)))

# Extra league members: EXTRA_CKPTS="name=/path/to/ckpt,name2=/path2"
# (default-architecture checkpoints, e.g. a CLI training run's
# checkpoint-dir/latest).
for spec in filter(None, os.environ.get("EXTRA_CKPTS", "").split(",")):
    name, _, path = spec.partition("=")
    restored = ckpt.restore(path, init_fn(jax.random.key(0)))
    members.append((name.strip(), jax.device_get(restored.params)))

names = [n for n, _ in members] + ["rule-ai"]
n = len(names)
wins = np.zeros((n, n))    # wins[i][j] = games i beat j
games = np.zeros((n, n))

# Round-robin among the policy members (row = seat 1).
for i, (name_i, p_i) in enumerate(members):
    for j, (name_j, p_j) in enumerate(members):
        if i >= j:
            continue
        r = evaluate_head_to_head(network, p_i, network, p_j,
                                  num_envs=EVAL_ENVS, max_frames=20_000,
                                  winning_score=5, greedy=False,
                                  seed=1000 + 37 * i + j)
        g, w = float(r.games), float(r.policy_wins)
        wins[i, j] += w
        wins[j, i] += g - w
        games[i, j] += g
        games[j, i] += g
        print(f"[h2h] {name_i} vs {name_j}: {w:.0f}/{g:.0f} "
              f"({w / max(g, 1):.3f})", flush=True)

# Every policy vs the anchoring rule AI.
ai = n - 1
for i, (name_i, p_i) in enumerate(members):
    r = evaluate_vs_computer(network, p_i, num_envs=EVAL_ENVS,
                             max_frames=20_000, winning_score=5,
                             greedy=False, seed=2000 + i)
    g, w = float(r.games), float(r.policy_wins)
    wins[i, ai] += w
    wins[ai, i] += g - w
    games[i, ai] += g
    games[ai, i] += g
    print(f"[vs-ai] {name_i}: {w:.0f}/{g:.0f} ({w / max(g, 1):.3f})",
          flush=True)

from pikazoo_tpu.train.evaluate import bradley_terry_elo  # noqa: E402

elo = bradley_terry_elo(wins, games, anchor=ai, anchor_elo=1000.0)
order = np.argsort(-elo)
print("\nLeague table (Elo, rule-ai anchored at 1000):")
for k in order:
    vs_ai = wins[k, ai] / games[k, ai] if games[k, ai] else float("nan")
    print(f"  {names[k]:28s} {elo[k]:7.0f}   vs-ai "
          f"{'--' if math.isnan(vs_ai) else f'{vs_ai:.3f}'}", flush=True)

payload = {
    "date": time.strftime("%Y-%m-%d"),
    "harness": "tools/selfplay_league.py (round-robin evaluate_head_to_head"
               " + evaluate_vs_computer; Bradley-Terry MM -> Elo,"
               " rule-ai = 1000)",
    "training": {"updates": UPDATES, "snap_every": SNAP, "num_envs": B,
                 "rollout_length": T, "learner_seats": "both"},
    "eval": {"num_envs_per_pair": EVAL_ENVS, "winning_score": 5,
             "greedy": False},
    "members": names,
    "games": games.astype(int).tolist(),
    "wins": wins.astype(int).tolist(),
    "elo": {names[k]: round(float(elo[k])) for k in range(n)},
}
os.makedirs(os.path.dirname(OUT), exist_ok=True)
with open(OUT, "w") as f:
    json.dump(payload, f, indent=1)
print(f"\nwrote {OUT}", flush=True)
