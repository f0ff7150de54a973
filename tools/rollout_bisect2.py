"""Round 2 of the rollout bisect: why does materializing the trajectory ys
cost ~5.4 s when the same scan WITHOUT ys runs in 175 ms?

Variants (all chained, B=65536, T=128):
  [6] big-buffer identity chain — sanity that a 1.17 GB program output is
      not itself slow on this backend
  [7] policy+env RETURNING full ys, unsharded (the real rollout, no mesh)
  [8] like [7] but obs stored FEATURE-MAJOR (35, 2B): full-tile lane writes
      (2B divisible by 128) instead of a 35-wide minor dim padded to 128
      lanes with read-modify-write partial-tile stores
  [9] like [7] plus the per-frame with_sharding_constraint of the mesh path
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
from pikazoo_tpu.parallel import env_sharding, make_env_mesh, shard_batch
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
    out = fn(carry)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(out if not isinstance(out, tuple) else out[0])
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{label:44s} {dt*1e3:9.1f} ms ({B*T/dt/1e6:8.2f}M steps/s)",
          flush=True)


# [6] chained identity on a trajectory-sized buffer.
big = jnp.zeros((T, 2 * B, 35), jnp.bfloat16)
f6 = jax.jit(lambda x: x + jnp.bfloat16(1))
out = f6(big)
jax.block_until_ready(out)
t0 = time.perf_counter()
for _ in range(ITERS):
    out = f6(out)
jax.block_until_ready(out)
print(f"{'[6] 1.17GB buffer chained +1':44s} "
      f"{(time.perf_counter()-t0)/ITERS*1e3:9.1f} ms", flush=True)


def mk_rollout(obs_major: str, constrain):
    def roll(carry):
        st, obs, key = carry

        def body(c, _):
            st, obs, key = c
            key, akey = jax.random.split(key)
            norm_obs = normalize_obs(obs).astype(jnp.bfloat16).reshape(-1, 35)
            logits, value = network.apply(params, norm_obs,
                                          pre_normalized=True)
            action = jax.random.categorical(akey, logits).astype(jnp.int32)
            one_hot = jax.nn.one_hot(action, 18, dtype=logits.dtype)
            log_prob = (jax.nn.log_softmax(logits) * one_hot).sum(-1)
            st, ts = env.step_batch(st, action.reshape(B, 2))
            if constrain is not None:
                st = constrain(st)
            done = (ts.terminated == 1).astype(jnp.float32)
            stored_obs = norm_obs.T if obs_major == "feature" else norm_obs
            ys = (stored_obs, action, log_prob, value,
                  ts.rewards.astype(jnp.float32).reshape(-1),
                  jnp.repeat(done, 2))
            return (st, ts.obs, key), ys

        (st, obs, key), ys = jax.lax.scan(body, (st, obs, key), None,
                                          length=T)
        return (st, obs, key), ys

    return roll


def timed_roll(label, fn, carry):
    carry2, ys = fn(carry)
    jax.block_until_ready(ys[0])
    t0 = time.perf_counter()
    for _ in range(ITERS):
        carry2, ys = fn(carry2)
    jax.block_until_ready(ys[0])
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{label:44s} {dt*1e3:9.1f} ms ({B*T/dt/1e6:8.2f}M steps/s)",
          flush=True)


timed_roll("[7] policy+env+ys returned (unsharded)",
           jax.jit(mk_rollout("batch", None)),
           (state, obs0, jax.random.key(1)))

timed_roll("[8] like 7, obs stored feature-major",
           jax.jit(mk_rollout("feature", None)),
           (state, obs0, jax.random.key(1)))

if os.environ.get("SKIP_MESH_VARIANT") == "1":
    sys.exit(0)

mesh = make_env_mesh()
sstate = shard_batch(state, mesh)
sobs = jax.device_put(obs0, env_sharding(mesh))
constrain = lambda st: jax.lax.with_sharding_constraint(
    st, env_sharding(mesh))
timed_roll("[9] like 7 + mesh sharding constraint",
           jax.jit(mk_rollout("batch", constrain)),
           (sstate, sobs, jax.random.key(1)))
