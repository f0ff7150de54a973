"""Decompose the computer-AI self-play step (BASELINE config 2) on the chip.

The AI path runs at ~40M env-steps/s vs the human path's ~700M; the delta is
dominated by the landing-sim while loops (`core/predict.py`).  Variants:

  [1] full AI self-play scan (the config-2 bench shape)
  [2] same step but landing_fn stubbed to constants — everything BUT the sims
  [3] the 7-lane landing sims alone, chained through ball state

Env knobs: PIKAZOO_SIM_UNROLL (sub-iterations per while trip, default 8) —
run the script once per value to sweep; B (PPO_ENVS), T (PPO_T), ITERS.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("PPO_DECOMP_CPU") == "1":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from pikazoo_tpu.core.predict import landing_sims
from pikazoo_tpu.envs import EnvConfig, PikaZoo

B = int(os.environ.get("PPO_ENVS", 65536))
T = int(os.environ.get("PPO_T", 256))
ITERS = int(os.environ.get("ITERS", 3))
ONLY = os.environ.get("ONLY", "123")
from pikazoo_tpu.core import predict as _predict

print(f"[0] B={B} T={T} unroll={_predict._UNROLL}", flush=True)

env = PikaZoo(EnvConfig(auto_reset=True, is_player1_computer=True,
                        is_player2_computer=True))
state0, _ = env.reset_batch(jax.random.key(0), B)
acts = jnp.zeros((B, 2), jnp.int32)


from _bench_util import sync  # noqa: E402  (single-source sync idiom)


def timed(label, fn, carry):
    t0 = time.perf_counter()
    out = fn(carry)
    sync(out)
    print(f"{label}: compile+first {time.perf_counter() - t0:.1f}s",
          flush=True)
    best = float("inf")
    for _ in range(ITERS):
        t0 = time.perf_counter()
        out = fn(out)
        sync(out)
        best = min(best, (time.perf_counter() - t0))
    dt = best
    print(f"{label:34s} {dt * 1e3:9.1f} ms ({B * T / dt / 1e6:8.2f}M "
          f"steps/s, {dt / T * 1e6:7.1f} us/frame)  min of {ITERS}",
          flush=True)
    return out


if "1" in ONLY:
    @jax.jit
    def full(state):
        def body(st, _):
            st, ts = env.step_batch(st, acts)
            return st, None
        state, _ = jax.lax.scan(body, state, None, length=T)
        return state

    timed("[1] full AI step", full, state0)

if "2" in ONLY:
    def stub_landing(ball):
        expected = ball.x
        cands = jnp.broadcast_to(ball.x, (6,) + ball.x.shape)
        return expected, cands

    from pikazoo_tpu.envs.pika_volley import env_frame
    from pikazoo_tpu.core.rng import DrawState
    from pikazoo_tpu.core.input import decode_action

    @jax.jit
    def nosims(state):
        def one(st):
            ds = DrawState(key=st.rng_key, counter=st.draw_counter,
                           oracle=None)
            inp1, l1 = decode_action(jnp.int32(0),
                                     st.power_hit_key_down_prev[0])
            inp2, l2 = decode_action(jnp.int32(0),
                                     st.power_hit_key_down_prev[1])
            fr = env_frame(env.config, ds, st.p1, st.p2, st.ball,
                           st.scores[0], st.scores[1], st.is_player2_serve,
                           st.round_ended, st.game_ended, inp1, inp2,
                           landing_fn=stub_landing)
            return st._replace(
                p1=fr.p1, p2=fr.p2, ball=fr.ball,
                power_hit_key_down_prev=jnp.stack([l1, l2]),
                scores=jnp.stack([fr.score1, fr.score2]),
                is_player2_serve=fr.is_player2_serve,
                round_ended=fr.round_ended, game_ended=fr.game_ended,
                draw_counter=fr.draw_counter)

        def body(st, _):
            return jax.vmap(one)(st), None

        state, _ = jax.lax.scan(body, state, None, length=T)
        return state

    timed("[2] AI step, sims stubbed", nosims, state0)

if "3" in ONLY:
    @jax.jit
    def sims_only(state):
        def body(ball, _):
            expected, cands = landing_sims(ball)
            # chain: perturb ball x by a data-dependent bit so the scan
            # cannot be collapsed
            ball = ball._replace(
                x=jnp.clip(ball.x + (expected & 1), 20, 412))
            return ball, None
        ball, _ = jax.lax.scan(body, state.ball, None, length=T)
        return state._replace(ball=ball)

    timed("[3] landing sims alone", sims_only, state0)
