"""CAREFUL probe: can a full XLA program embedding the Mosaic landing-sim
kernel compile under the axon tunnel today?

Round-2 observed (2x) that this compile HANGS the remote-compile service and
wedges the TPU terminal ~45 min (recovery automatic).  The fused-update
Mosaic kernel embeds in the (much larger) train-step program without issue,
so the hazard may be stale or specific to this kernel's while-loops.
Escalation: tiny program (B=1024, T=2) -> bench shape; run under a hard
timeout and health-check the service afterwards.

STAGE env var: 1 = tiny embed, 2 = bench-shape embed, h = health check.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

STAGE = os.environ.get("STAGE", "1")

if STAGE == "h":
    t0 = time.perf_counter()
    v = int(jnp.arange(4).sum())
    print(f"[h] service healthy: sum={v} in {time.perf_counter() - t0:.1f}s",
          flush=True)
    sys.exit(0)

from pikazoo_tpu.core.input import decode_action
from pikazoo_tpu.core.predict_pallas import landing_sims_batched
from pikazoo_tpu.core.rng import DrawState
from pikazoo_tpu.envs import EnvConfig, PikaZoo
from pikazoo_tpu.envs.pika_volley import env_frame

B = 1024 if STAGE == "1" else int(os.environ.get("PPO_ENVS", 65536))
T = 2 if STAGE == "1" else int(os.environ.get("PPO_T", 256))
ITERS = int(os.environ.get("ITERS", 5))

env = PikaZoo(EnvConfig(auto_reset=True, is_player1_computer=True,
                        is_player2_computer=True))
state0, _ = env.reset_batch(jax.random.key(0), B)
print(f"[0] B={B} T={T} — compiling EMBEDDED pallas landing kernel",
      flush=True)


def one_batched(st):
    """One frame over the whole batch with the pallas sims called ONCE
    per frame at batch level (not per-lane under vmap)."""
    exp, cand = landing_sims_batched(
        st.ball.x, st.ball.y, st.ball.x_velocity, st.ball.y_velocity)
    cand_t = jnp.moveaxis(cand, 1, 0)  # (6, B)

    def scalar_frame(st, exp_i, cand_i):
        ds = DrawState(key=st.rng_key, counter=st.draw_counter, oracle=None)
        inp1, l1 = decode_action(jnp.int32(0), st.power_hit_key_down_prev[0])
        inp2, l2 = decode_action(jnp.int32(0), st.power_hit_key_down_prev[1])
        fr = env_frame(env.config, ds, st.p1, st.p2, st.ball,
                       st.scores[0], st.scores[1], st.is_player2_serve,
                       st.round_ended, st.game_ended, inp1, inp2,
                       landing_fn=lambda ball: (exp_i, cand_i))
        return st._replace(
            p1=fr.p1, p2=fr.p2, ball=fr.ball,
            power_hit_key_down_prev=jnp.stack([l1, l2]),
            scores=jnp.stack([fr.score1, fr.score2]),
            is_player2_serve=fr.is_player2_serve,
            round_ended=fr.round_ended, game_ended=fr.game_ended,
            draw_counter=fr.draw_counter)

    return jax.vmap(scalar_frame, in_axes=(0, 0, 1))(st, exp, cand_t)


@jax.jit
def run(state):
    state, _ = jax.lax.scan(lambda st, _: (one_batched(st), None),
                            state, None, length=T)
    return state


t0 = time.perf_counter()
out = run(state0)
_ = int(jax.device_get(out.scores).reshape(-1)[0])
print(f"[1] EMBEDDED COMPILE OK: compile+first "
      f"{time.perf_counter() - t0:.1f}s", flush=True)

best = float("inf")
for _ in range(ITERS):
    t0 = time.perf_counter()
    out = run(out)
    _ = int(jax.device_get(out.scores).reshape(-1)[0])
    best = min(best, time.perf_counter() - t0)
print(f"[2] embedded pallas step {best * 1e3:9.1f} ms "
      f"({B * T / best / 1e6:8.2f}M steps/s, {best / T * 1e6:7.1f} us/frame)"
      f"  min of {ITERS}", flush=True)
