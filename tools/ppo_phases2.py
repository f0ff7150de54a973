"""Phase timings for the round-2 PPO train step (fast-path rollout,
associative GAE, fused-vs-XLA update) — all in ONE process so tunnel-state
variance between runs cannot masquerade as a code effect.

[1] rollout alone (step_batch_learner fast path)
[2] full train_step, fused_update=off   (XLA autodiff update)
[3] full train_step, fused_update=on    (Pallas fused update)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("PPO_DECOMP_CPU") == "1":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from pikazoo_tpu.envs import EnvConfig, PikaZoo
from pikazoo_tpu.train import PPOConfig, make_ppo_trainer

B = int(os.environ.get("PPO_ENVS", 65536))
T = int(os.environ.get("PPO_T", 128))
ITERS = int(os.environ.get("ITERS", 3))

env = PikaZoo(EnvConfig(auto_reset=True))
print(f"[0] init B={B} T={T} ({B * T / 1e6:.2f}M steps/train-step)",
      flush=True)


def bench_full(label, fused):
    cfg = PPOConfig(num_envs=B, rollout_length=T, fused_update=fused)
    init_fn, train_step, _ = make_ppo_trainer(env, cfg)
    runner = init_fn(jax.random.key(0))
    step = jax.jit(train_step, donate_argnums=0)
    t0 = time.perf_counter()
    runner, metrics = step(runner)
    print(f"{label}: compile+first {time.perf_counter() - t0:.1f}s "
          f"(loss={float(metrics.total_loss):.4f})", flush=True)
    best = float("inf")
    for _ in range(ITERS):
        t0 = time.perf_counter()
        runner, metrics = step(runner)
        _ = float(metrics.total_loss)  # host sync (block_until_ready is a
        best = min(best, time.perf_counter() - t0)  # no-op on axon)
    print(f"{label:38s} {best * 1e3:9.1f} ms ({B * T / best / 1e6:8.2f}M "
          f"env-steps/s)  min of {ITERS}", flush=True)


def bench_rollout():
    cfg = PPOConfig(num_envs=B, rollout_length=T)
    init_fn, _, network = make_ppo_trainer(env, cfg)
    runner = init_fn(jax.random.key(0))

    @jax.jit
    def roll(params, state, norm_obs, key):
        def step(carry, _):
            state, norm_obs, key = carry
            key, akey = jax.random.split(key)
            logits, value = network.apply(params, norm_obs,
                                          pre_normalized=True)
            action = jax.random.categorical(akey, logits).astype(jnp.int32)
            one_hot = jax.nn.one_hot(action, 18, dtype=logits.dtype)
            log_prob = (jax.nn.log_softmax(logits) * one_hot).sum(-1)
            state, next_norm, r1, term = env.step_batch_learner(
                state, action[:B], action[B:])
            ys = (norm_obs, action, log_prob, value,
                  jnp.concatenate([r1, -r1]).astype(jnp.float32))
            return (state, next_norm, key), ys

        (state, norm_obs, key), ys = jax.lax.scan(
            step, (state, norm_obs, key), None, length=T)
        return state, norm_obs, ys[1][-1]

    from pikazoo_tpu.train.networks import normalize_obs
    norm0 = jnp.concatenate([normalize_obs(runner.last_obs[:, 0]),
                             normalize_obs(runner.last_obs[:, 1])],
                            axis=0).astype(jnp.bfloat16)
    state, norm_obs = runner.env_state, norm0
    t0 = time.perf_counter()
    state, norm_obs, act = roll(runner.params, state, norm_obs,
                                jax.random.key(1))
    print(f"[1] rollout compile+first {time.perf_counter() - t0:.1f}s",
          flush=True)
    best = float("inf")
    for _ in range(ITERS):
        t0 = time.perf_counter()
        state, norm_obs, act = roll(runner.params, state, norm_obs,
                                    jax.random.key(1))
        _ = int(act[0])  # host sync
        best = min(best, time.perf_counter() - t0)
    print(f"{'[1] rollout (fast path)':38s} {best * 1e3:9.1f} ms "
          f"({B * T / best / 1e6:8.2f}M env-steps/s)  min of {ITERS}",
          flush=True)


bench_rollout()
bench_full("[2] train_step fused=off", "off")
bench_full("[3] train_step fused=auto", "auto")
