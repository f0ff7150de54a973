"""Self-play strength ladder: symmetric PPO self-play, checkpoints
head-to-head.

Trains from scratch with ``learner_seats="both"`` (one shared policy, both
seats feed the learner), snapshots params every SNAP updates, then plays
every snapshot (a) against the rule AI and (b) head-to-head against the
PREVIOUS snapshot and against snapshot 0 — the round-4
``evaluate_head_to_head`` harness.  Symmetric checkpoints are directly
comparable in mirror format (the seat-specialist caveat in
``train/evaluate.py`` does not apply).

Output: artifacts/selfplay_ladder.jsonl (one line per snapshot).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from pikazoo_tpu.envs import EnvConfig, PikaZoo
from pikazoo_tpu.train import PPOConfig, make_ppo_trainer
from pikazoo_tpu.train.evaluate import (evaluate_head_to_head,
                                        evaluate_vs_computer)

UPDATES = int(os.environ.get("UPDATES", 600))
SNAP = int(os.environ.get("SNAP", 100))
B = int(os.environ.get("PPO_ENVS", 8192))
T = int(os.environ.get("PPO_T", 128))
OUT = os.environ.get("OUT", os.path.join(os.path.dirname(__file__), "..",
                                         "artifacts", "selfplay_ladder.jsonl"))

env = PikaZoo(EnvConfig(auto_reset=True))
cfg = PPOConfig(num_envs=B, rollout_length=T, learner_seats="both")
init_fn, train_step, network = make_ppo_trainer(env, cfg)
runner = init_fn(jax.random.key(11))
step = jax.jit(train_step, donate_argnums=0)

snaps = [(0, jax.device_get(runner.params))]
t0 = time.perf_counter()
for update in range(1, UPDATES + 1):
    runner, metrics = step(runner)
    if update % SNAP == 0:
        _ = float(metrics.total_loss)  # host sync
        snaps.append((update, jax.device_get(runner.params)))
        print(f"[snap] update={update} loss={float(metrics.total_loss):.5f} "
              f"t={time.perf_counter() - t0:.0f}s", flush=True)

out = open(OUT, "w")
EVAL = dict(num_envs=128, max_frames=12_000, winning_score=5, greedy=False)
for i, (upd, params) in enumerate(snaps):
    vs_ai = evaluate_vs_computer(network, params, seed=21, **EVAL)
    rec = {"update": upd, "env_steps": upd * B * T,
           "vs_ai_win_rate": round(float(vs_ai.win_rate), 4),
           "vs_ai_games": int(vs_ai.games)}
    if i > 0:
        prev_upd, prev = snaps[i - 1]
        h = evaluate_head_to_head(network, params, network, prev,
                                  seed=22, **EVAL)
        rec["vs_prev_win_rate"] = round(float(h.win_rate), 4)
        rec["vs_prev_games"] = int(h.games)
        h0 = evaluate_head_to_head(network, params, network, snaps[0][1],
                                   seed=23, **EVAL)
        rec["vs_init_win_rate"] = round(float(h0.win_rate), 4)
        rec["vs_init_games"] = int(h0.games)
    out.write(json.dumps(rec) + "\n")
    out.flush()
    print(rec, flush=True)
out.close()
