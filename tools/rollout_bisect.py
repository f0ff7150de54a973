"""Bisect the PPO rollout scan's per-frame cost on the real chip.

Round-2 finding: a chained rollout (policy MLP + env step + trajectory ys in
one scan body) costs ~25-44 ms PER FRAME almost independent of batch size,
~70x the sum of its parts (env-only scans run at ~0.1 ms/frame, the MLP
forward alone ~0.4 ms/frame).  Variants below isolate which combination
triggers it.  All timings are CHAINED (output feeds next input) so remote
execution caching cannot fake them.  All big arrays are passed as jit
ARGUMENTS (closed-over device constants blow the axon remote-compile's
request-size limit: HTTP 413).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("PPO_DECOMP_CPU") == "1":  # smoke-test hook
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from pikazoo_tpu.envs import EnvConfig, PikaZoo
from pikazoo_tpu.train.networks import ActorCritic, normalize_obs

B = int(os.environ.get("PPO_ENVS", 65536))
T = int(os.environ.get("PPO_T", 128))
ITERS = 3
network = ActorCritic(num_actions=18, hidden=(256, 256))
env = PikaZoo(EnvConfig(auto_reset=True))
state, ts = env.reset_batch(jax.random.key(0), B)
params = network.init(jax.random.key(1), ts.obs)
obs0 = ts.obs
print(f"[0] init done B={B} T={T}", flush=True)


def timed(label, fn, carry):
    carry = fn(carry)
    jax.block_until_ready(carry)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        carry = fn(carry)
    jax.block_until_ready(carry)
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{label:44s} {dt*1e3:9.1f} ms ({B*T/dt/1e6:8.2f}M steps/s)",
          flush=True)


# [1] env only (reference point; should be ~0.1 ms/frame).
def env_only(carry):
    def body(c, _):
        st, key = c
        key, sub = jax.random.split(key)
        acts = jax.random.randint(sub, (B, 2), 0, 18, jnp.int32)
        st, _ = env.step_batch(st, acts)
        return (st, key), None
    return jax.lax.scan(body, carry, None, length=T)[0]


timed("[1] env only", jax.jit(env_only), (state, jax.random.key(1)))


# [2] policy only, chained through the action (no env).
def policy_only(carry):
    def body(c, _):
        act_prev, key = c
        key, akey = jax.random.split(key)
        obs = obs0 + act_prev[:, :, None]  # real dependency on prev action
        norm_obs = normalize_obs(obs).astype(jnp.bfloat16).reshape(-1, 35)
        logits, value = network.apply(params, norm_obs, pre_normalized=True)
        action = jax.random.categorical(akey, logits).astype(jnp.int32)
        return (action.reshape(B, 2), key), None
    return jax.lax.scan(body, carry, None, length=T)[0]


timed("[2] policy only (chained, no env)", jax.jit(policy_only),
      (jnp.zeros((B, 2), jnp.int32), jax.random.key(1)))


# [3] policy + env, no trajectory outputs.
def pol_env(carry):
    def body(c, _):
        st, obs, key = c
        key, akey = jax.random.split(key)
        norm_obs = normalize_obs(obs).astype(jnp.bfloat16).reshape(-1, 35)
        logits, value = network.apply(params, norm_obs, pre_normalized=True)
        action = jax.random.categorical(akey, logits).astype(jnp.int32)
        st, ts = env.step_batch(st, action.reshape(B, 2))
        return (st, ts.obs, key), None
    return jax.lax.scan(body, carry, None, length=T)[0]


timed("[3] policy + env, no ys", jax.jit(pol_env),
      (state, obs0, jax.random.key(1)))


# [4] policy + env + full trajectory ys (the real rollout body).
def pol_env_ys(carry):
    def body(c, _):
        st, obs, key = c
        key, akey = jax.random.split(key)
        norm_obs = normalize_obs(obs).astype(jnp.bfloat16).reshape(-1, 35)
        logits, value = network.apply(params, norm_obs, pre_normalized=True)
        action = jax.random.categorical(akey, logits).astype(jnp.int32)
        one_hot = jax.nn.one_hot(action, 18, dtype=logits.dtype)
        log_prob = (jax.nn.log_softmax(logits) * one_hot).sum(-1)
        st, ts = env.step_batch(st, action.reshape(B, 2))
        done = (ts.terminated == 1).astype(jnp.float32)
        ys = (norm_obs, action, log_prob, value,
              ts.rewards.astype(jnp.float32).reshape(-1),
              jnp.repeat(done, 2))
        return (st, ts.obs, key), ys
    carry, ys = jax.lax.scan(body, carry, None, length=T)
    return carry


timed("[4] policy + env + ys (real rollout)", jax.jit(pol_env_ys),
      (state, obs0, jax.random.key(1)))


# [5] env + ys but NO policy (random actions, trajectory still written).
def env_ys(carry):
    def body(c, _):
        st, obs, key = c
        key, akey = jax.random.split(key)
        action = jax.random.randint(akey, (B, 2), 0, 18, jnp.int32)
        norm_obs = normalize_obs(obs).astype(jnp.bfloat16).reshape(-1, 35)
        st, ts = env.step_batch(st, action)
        done = (ts.terminated == 1).astype(jnp.float32)
        ys = (norm_obs, action.reshape(-1),
              ts.rewards.astype(jnp.float32).reshape(-1), jnp.repeat(done, 2))
        return (st, ts.obs, key), ys
    carry, ys = jax.lax.scan(body, carry, None, length=T)
    return carry


timed("[5] env + ys, no policy", jax.jit(env_ys),
      (state, obs0, jax.random.key(1)))
