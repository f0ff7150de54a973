"""Minimal usage: batched random self-play on the default backend."""

import sys
import time

import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from pikazoo_tpu import EnvConfig, PikaZoo


def main(batch: int = 8192, frames: int = 1000):
    env = PikaZoo(EnvConfig(auto_reset=True))
    state, _ = env.reset_batch(jax.random.key(0), batch)

    def body(carry, _):
        st, key = carry
        key, sub = jax.random.split(key)
        actions = jax.random.randint(sub, (batch, 2), 0, 18, jnp.int32)
        st, ts = env.step_batch(st, actions)
        return (st, key), ts.rewards[:, 0] != 0

    rollout = jax.jit(
        lambda s, k: jax.lax.scan(body, (s, k), None, length=frames))
    (state, _), scoring = rollout(state, jax.random.key(1))
    jax.block_until_ready(state)

    t0 = time.perf_counter()
    (state, _), scoring = rollout(state, jax.random.key(2))
    jax.block_until_ready(state)
    dt = time.perf_counter() - t0

    print(f"{batch} envs x {frames} frames on {jax.default_backend()}: "
          f"{batch * frames / dt / 1e6:.1f}M env-steps/s")
    print(f"rounds scored this window: {int(scoring.sum())}")
    print(f"score spread: {jnp.bincount(state.scores.reshape(-1), length=16)}")


if __name__ == "__main__":
    main()
