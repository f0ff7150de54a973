"""Sweep the landing-sim while-loop unroll factor inside the full AI step.

The AI step's cost is ~86% landing sims (tools/ai_path_decompose.py); the
sims' wall time at large batch is dominated by while-loop TRIPS (per-trip
carry HBM round trip + dispatch), and the true-ball lane's slow tail runs
~150-220 reference iterations per frame.  More sub-iterations per trip
trade wasted masked work (cheap VPU) for fewer trips.  Interleaved
min-of-N, one process — cross-process timings on this tunnel are noise.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("PPO_DECOMP_CPU") == "1":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from pikazoo_tpu.core.input import decode_action
from pikazoo_tpu.core.predict import landing_sims_any
from pikazoo_tpu.core.rng import DrawState
from pikazoo_tpu.envs import EnvConfig, PikaZoo
from pikazoo_tpu.envs.pika_volley import env_frame

B = int(os.environ.get("PPO_ENVS", 65536))
T = int(os.environ.get("PPO_T", 256))
ITERS = int(os.environ.get("ITERS", 5))
UNROLLS = [int(u) for u in os.environ.get("UNROLLS", "8,16,32,64").split(",")]

env = PikaZoo(EnvConfig(auto_reset=True, is_player1_computer=True,
                        is_player2_computer=True))
state0, _ = env.reset_batch(jax.random.key(0), B)
print(f"[0] B={B} T={T} unrolls={UNROLLS}", flush=True)


def make_step(unroll):
    def landing_fn(ball):
        return landing_sims_any(ball.x, ball.y, ball.x_velocity,
                                ball.y_velocity, unroll=unroll)

    def one(st):
        ds = DrawState(key=st.rng_key, counter=st.draw_counter, oracle=None)
        inp1, l1 = decode_action(jnp.int32(0), st.power_hit_key_down_prev[0])
        inp2, l2 = decode_action(jnp.int32(0), st.power_hit_key_down_prev[1])
        fr = env_frame(env.config, ds, st.p1, st.p2, st.ball,
                       st.scores[0], st.scores[1], st.is_player2_serve,
                       st.round_ended, st.game_ended, inp1, inp2,
                       landing_fn=landing_fn)
        return st._replace(
            p1=fr.p1, p2=fr.p2, ball=fr.ball,
            power_hit_key_down_prev=jnp.stack([l1, l2]),
            scores=jnp.stack([fr.score1, fr.score2]),
            is_player2_serve=fr.is_player2_serve,
            round_ended=fr.round_ended, game_ended=fr.game_ended,
            draw_counter=fr.draw_counter)

    @jax.jit
    def run(state):
        state, _ = jax.lax.scan(lambda st, _: (jax.vmap(one)(st), None),
                                state, None, length=T)
        return state

    return run


from _bench_util import sync  # noqa: E402  (single-source sync idiom)


fns = {u: make_step(u) for u in UNROLLS}
state = {u: state0 for u in UNROLLS}
best = {u: float("inf") for u in UNROLLS}
for u, fn in fns.items():
    t0 = time.perf_counter()
    state[u] = fn(state[u])
    sync(state[u])
    print(f"[c] unroll={u}: compile+first {time.perf_counter() - t0:.1f}s",
          flush=True)
for r in range(ITERS):
    for u, fn in fns.items():
        t0 = time.perf_counter()
        state[u] = fn(state[u])
        sync(state[u])
        best[u] = min(best[u], time.perf_counter() - t0)
for u in UNROLLS:
    dt = best[u]
    print(f"[1] unroll={u:3d} {dt * 1e3:9.1f} ms ({B * T / dt / 1e6:8.2f}M "
          f"steps/s, {dt / T * 1e6:7.1f} us/frame)  min of {ITERS}",
          flush=True)
