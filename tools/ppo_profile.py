"""Phase-level timing of the PPO train step at the bench config: rollout
(policy inference + env), GAE, and the update epochs, each jitted separately
with identical inputs, plus the monolithic step for reference."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from pikazoo_tpu.envs import EnvConfig, PikaZoo
from pikazoo_tpu.parallel import env_sharding, make_env_mesh, shard_batch
from pikazoo_tpu.train import PPOConfig, make_ppo_trainer
from pikazoo_tpu.train.networks import ActorCritic

B = int(os.environ.get("PPO_PROFILE_ENVS", 65536))
T = 128
cfg = PPOConfig(num_envs=B, rollout_length=T)
mesh = make_env_mesh()
env = PikaZoo(EnvConfig(auto_reset=True))
init_fn, train_step, network = make_ppo_trainer(env, cfg, mesh=mesh)
runner = init_fn(jax.random.key(0))
runner = runner._replace(
    env_state=shard_batch(runner.env_state, mesh),
    last_obs=jax.device_put(runner.last_obs, env_sharding(mesh)))


def timeit(label, fn, *args, iters=3):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{label:30s} {dt*1e3:9.1f} ms  ({B*T/dt/1e6:8.2f}M steps/s)",
          flush=True)
    return out


# Rollout alone (policy sample + env step, scanned).
def rollout_only(params, env_state, obs, key):
    def step(carry, _):
        env_state, obs, key = carry
        key, akey = jax.random.split(key)
        logits, value = network.apply(params, obs)
        action = jax.random.categorical(akey, logits).astype(jnp.int32)
        env_state, ts = env.step_batch(env_state, action)
        return (env_state, ts.obs, key), (obs, action, value,
                                          ts.rewards.astype(jnp.float32))
    return jax.lax.scan(step, (env_state, obs, key), None, length=T)


# Policy inference alone (no env), same shapes.
def policy_only(params, obs, key):
    def step(carry, _):
        obs, key = carry
        key, akey = jax.random.split(key)
        logits, value = network.apply(params, obs)
        action = jax.random.categorical(akey, logits).astype(jnp.int32)
        return (obs, key), (action, value)
    return jax.lax.scan(step, (obs, key), None, length=T)


# Env alone.
def env_only(env_state, key):
    def step(carry, _):
        env_state, key = carry
        key, akey = jax.random.split(key)
        acts = jax.random.randint(akey, (B, 2), 0, 18, jnp.int32)
        env_state, ts = env.step_batch(env_state, acts)
        return (env_state, key), None
    return jax.lax.scan(step, (env_state, key), None, length=T)


print(f"B={B} T={T} hidden={cfg.hidden}", flush=True)
timeit("env only", jax.jit(env_only), runner.env_state, jax.random.key(1))
timeit("policy only", jax.jit(policy_only), runner.params, runner.last_obs,
       jax.random.key(1))
timeit("rollout (policy+env)", jax.jit(rollout_only), runner.params,
       runner.env_state, runner.last_obs, jax.random.key(1))
step = jax.jit(train_step, donate_argnums=0)
r2, m = step(runner)
jax.block_until_ready(m.total_loss)
t0 = time.perf_counter()
r2, m = step(r2)
jax.block_until_ready(m.total_loss)
dt = time.perf_counter() - t0
print(f"{'full train step':30s} {dt*1e3:9.1f} ms  ({B*T/dt/1e6:8.2f}M steps/s)",
      flush=True)
