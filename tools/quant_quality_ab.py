"""Training-quality A/B: int8 MXU modes in the fused PPO update.

tools/fm_variants_probe.py (2026-08-20, v5e) measures the int8 modes at
+3% (int8fwd) / -4% (int8) end-to-end and the interpret-mode tests pin
per-tensor gradient cosine >= 0.99 — but PPO compounds gradient noise over
hundreds of updates, so the decisive gate is a from-scratch vs-rule-AI
training run per mode with the same seed and schedule (the protocol of
tools/epochs_quality_ab.py).

Output: artifacts/quant_ab.jsonl (one line per eval point).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from pikazoo_tpu.envs import EnvConfig, PikaZoo
from pikazoo_tpu.train import PPOConfig, make_ppo_trainer
from pikazoo_tpu.train.evaluate import evaluate_vs_computer

MODES = os.environ.get("MODES", "none,int8fwd,int8").split(",")
UPDATES = int(os.environ.get("UPDATES", 300))
EVAL_EVERY = int(os.environ.get("EVAL_EVERY", 25))
B = int(os.environ.get("PPO_ENVS", 4096))
T = int(os.environ.get("PPO_T", 128))
OUT = os.environ.get("OUT", os.path.join(os.path.dirname(__file__), "..",
                                         "artifacts", "quant_ab.jsonl"))

env = PikaZoo(EnvConfig(auto_reset=True, is_player2_computer=True))
out = open(OUT, "a")
print(f"[0] modes={MODES} updates={UPDATES} B={B} T={T}", flush=True)

for mode in MODES:
    cfg = PPOConfig(num_envs=B, rollout_length=T, learner_seats="p1",
                    fused_update="fm", update_quant=mode)
    init_fn, train_step, network = make_ppo_trainer(env, cfg)
    runner = init_fn(jax.random.key(7))
    step = jax.jit(train_step, donate_argnums=0)
    t_train = 0.0
    for update in range(1, UPDATES + 1):
        t0 = time.perf_counter()
        runner, metrics = step(runner)
        _ = float(metrics.total_loss)  # host sync
        t_train += time.perf_counter() - t0
        if update % EVAL_EVERY == 0 or update == UPDATES:
            r = evaluate_vs_computer(network, runner.params, num_envs=256,
                                     winning_score=5, seed=11)
            rec = {
                "quant": mode,
                "update": update,
                "env_steps": update * B * T,
                "win_rate": round(float(r.win_rate), 4),
                "games": int(r.games),
                "score_diff": round(float(r.mean_score_diff), 3),
                "train_s": round(t_train, 2),
                "loss": round(float(metrics.total_loss), 5),
            }
            out.write(json.dumps(rec) + "\n")
            out.flush()
            print(rec, flush=True)
out.close()
