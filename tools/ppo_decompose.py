"""Chained phase decomposition of the PPO train step on the real chip.

Every timing CHAINS its jitted fn (output feeds the next call's input), so a
remote backend that caches or pipelines identical executions cannot fake the
number (the round-1 32.7B fused reading was exactly that artifact).

Phases, each its own jit, numbered prints so a partial log still localizes a
hang: (1) rollout, (2) GAE+update exactly as train_step, (3) 16 scan-free
grad steps on one fixed minibatch (isolates scan machinery from the math),
(4) update with the time-permutation replaced by identity (isolates the
gather).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("PPO_DECOMP_CPU") == "1":  # smoke-test hook
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import optax

from pikazoo_tpu.envs import EnvConfig, PikaZoo
from pikazoo_tpu.parallel import env_sharding, make_env_mesh, shard_batch
from pikazoo_tpu.train import PPOConfig, make_ppo_trainer
from pikazoo_tpu.train.networks import normalize_obs
from pikazoo_tpu.train.ppo import Transition

B = int(os.environ.get("PPO_ENVS", 65536))
T = 128
cfg = PPOConfig(num_envs=B, rollout_length=T)
# Match bench.measure_ppo: no mesh on a single device (a 1-device mesh only
# adds GSPMD partitioning overhead — that's what the phase timings would
# otherwise misattribute).  PPO_DECOMP_MESH=1 forces it for comparison.
use_mesh = (len(jax.devices()) > 1
            or os.environ.get("PPO_DECOMP_MESH") == "1")
mesh = make_env_mesh() if use_mesh else None
env = PikaZoo(EnvConfig(auto_reset=True))
init_fn, train_step, network = make_ppo_trainer(env, cfg, mesh=mesh)
runner = init_fn(jax.random.key(0))
if mesh is not None:
    runner = runner._replace(env_state=shard_batch(runner.env_state, mesh),
                             last_obs=jax.device_put(runner.last_obs,
                                                     env_sharding(mesh)))
print("[0] init done", flush=True)


def policy_sample(params, norm_obs, key):
    logits, value = network.apply(params, norm_obs, pre_normalized=True)
    action = jax.random.categorical(key, logits)
    one_hot = jax.nn.one_hot(action, cfg.num_actions, dtype=logits.dtype)
    log_prob = (jax.nn.log_softmax(logits) * one_hot).sum(-1)
    return action.astype(jnp.int32), log_prob, value


def rollout(params, env_state, obs, key):
    def step(carry, _):
        env_state, obs, key = carry
        key, akey = jax.random.split(key)
        norm_obs = normalize_obs(obs).astype(jnp.bfloat16).reshape(-1, 35)
        action, log_prob, value = policy_sample(params, norm_obs, akey)
        env_state, ts = env.step_batch(env_state, action.reshape(-1, 2))
        done = (ts.terminated == 1).astype(jnp.float32)
        tr = Transition(obs=norm_obs, action=action, log_prob=log_prob,
                        value=value,
                        reward=ts.rewards.astype(jnp.float32).reshape(-1),
                        done=jnp.repeat(done, 2))
        return (env_state, ts.obs, key), tr
    return jax.lax.scan(step, (env_state, obs, key), None, length=T)


roll_j = jax.jit(rollout)
carry = (runner.env_state, runner.last_obs, runner.key)
(carry), traj = roll_j(runner.params, *carry)
jax.block_until_ready(traj.obs)
t0 = time.perf_counter()
ITERS = 3
for _ in range(ITERS):
    carry, traj = roll_j(runner.params, *carry)
jax.block_until_ready(traj.obs)
dt = (time.perf_counter() - t0) / ITERS
print(f"[1] rollout (chained): {dt*1e3:9.1f} ms "
      f"({B*T/dt/1e6:.2f}M steps/s)", flush=True)
env_state2, last_obs, key2 = carry

tx = optax.chain(optax.clip_by_global_norm(cfg.max_grad_norm),
                 optax.adam(cfg.learning_rate))


def loss_fn(params, batch, adv, tgt):
    logits, value = network.apply(params, batch.obs, pre_normalized=True)
    log_probs = jax.nn.log_softmax(logits)
    one_hot = jax.nn.one_hot(batch.action, cfg.num_actions,
                             dtype=log_probs.dtype)
    log_prob = (log_probs * one_hot).sum(-1)
    ratio = jnp.exp(log_prob - batch.log_prob)
    a = (adv - adv.mean()) / (adv.std() + 1e-8)
    policy_loss = -jnp.minimum(ratio * a,
                               jnp.clip(ratio, 0.8, 1.2) * a).mean()
    vc = batch.value + jnp.clip(value - batch.value, -0.2, 0.2)
    value_loss = 0.5 * jnp.maximum((value - tgt) ** 2, (vc - tgt) ** 2).mean()
    entropy = -(jnp.exp(log_probs) * log_probs).sum(-1).mean()
    return policy_loss + 0.5 * value_loss - 0.01 * entropy


def gae_update(params, opt_state, traj, last_obs, key, use_perm=True):
    _, last_value = network.apply(params, last_obs.reshape(-1, 35))

    def scan_fn(c, tr):
        g, nv = c
        nd = 1.0 - tr.done
        delta = tr.reward + cfg.gamma * nv * nd - tr.value
        g = delta + cfg.gamma * cfg.gae_lambda * nd * g
        return (g, tr.value), g

    (_, _), adv = jax.lax.scan(scan_fn,
                               (jnp.zeros_like(last_value), last_value),
                               traj, reverse=True)
    targets = adv + traj.value

    key, perm_key = jax.random.split(key)
    perm = (jax.random.permutation(perm_key, T) if use_perm
            else jnp.arange(T))
    batch = jax.tree.map(lambda x: x[perm], (traj, adv, targets))

    def epoch(c, _):
        def minibatch(c, mb):
            params, opt_state = c
            mtraj, madv, mtarget = mb
            loss, grads = jax.value_and_grad(loss_fn)(params, mtraj, madv,
                                                      mtarget)
            updates, opt_state = tx.update(grads, opt_state, params)
            return (optax.apply_updates(params, updates), opt_state), loss

        mbs = jax.tree.map(
            lambda x: x.reshape(cfg.num_minibatches,
                                T // cfg.num_minibatches, *x.shape[1:]),
            batch)
        return jax.lax.scan(minibatch, c, mbs)

    (params, opt_state), losses = jax.lax.scan(
        epoch, (params, opt_state), None, length=cfg.update_epochs)
    return params, opt_state, losses.mean()


def timed_update(label, fn):
    params, opt_state = runner.params, runner.opt_state
    params, opt_state, loss = fn(params, opt_state, traj, last_obs, key2)
    jax.block_until_ready(loss)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        params, opt_state, loss = fn(params, opt_state, traj, last_obs, key2)
    jax.block_until_ready(loss)
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{label} {dt*1e3:9.1f} ms ({B*T/dt/1e6:.2f}M steps/s equiv)",
          flush=True)


timed_update("[2] GAE+update (as train_step):",
             jax.jit(lambda p, o, tr, lo, k: gae_update(p, o, tr, lo, k,
                                                        True)))

# [3] scan-free: 16 chained grad steps on one fixed minibatch slice.
mb = jax.tree.map(lambda x: x[:T // cfg.num_minibatches],
                  (traj, jnp.ones((T, 2 * B), jnp.float32),
                   jnp.ones((T, 2 * B), jnp.float32)))
mtraj, madv, mtarget = mb


@jax.jit
def one_grad_step(params, opt_state, mtraj, madv, mtarget):
    # Big arrays are ARGUMENTS: closed-over device constants get embedded in
    # the serialized program and blow the axon remote-compile size limit
    # (HTTP 413).
    loss, grads = jax.value_and_grad(loss_fn)(params, mtraj, madv, mtarget)
    updates, opt_state = tx.update(grads, opt_state, params)
    return optax.apply_updates(params, updates), opt_state, loss


params, opt_state = runner.params, runner.opt_state
params, opt_state, loss = one_grad_step(params, opt_state, mtraj, madv,
                                        mtarget)
jax.block_until_ready(loss)
t0 = time.perf_counter()
for _ in range(16):
    params, opt_state, loss = one_grad_step(params, opt_state, mtraj, madv,
                                            mtarget)
jax.block_until_ready(loss)
dt = time.perf_counter() - t0
print(f"[3] 16 scan-free grad steps:   {dt*1e3:9.1f} ms "
      f"(minibatch rows={mtraj.obs.shape[0] * mtraj.obs.shape[1]})",
      flush=True)

timed_update("[4] GAE+update (identity perm):",
             jax.jit(lambda p, o, tr, lo, k: gae_update(p, o, tr, lo, k,
                                                        False)))


# [5] fwd-only loss on the same minibatch (splits fwd from bwd cost).
@jax.jit
def loss_only(params, bias, mtraj, madv, mtarget):
    return loss_fn(jax.tree.map(lambda p: p + bias, params),
                   mtraj, madv, mtarget)


loss = loss_only(runner.params, jnp.float32(0), mtraj, madv, mtarget)
jax.block_until_ready(loss)
t0 = time.perf_counter()
for i in range(16):
    loss = loss_only(runner.params, loss * 1e-9, mtraj, madv, mtarget)
jax.block_until_ready(loss)
print(f"[5] 16 chained fwd-only losses: {(time.perf_counter()-t0)*1e3:9.1f} ms",
      flush=True)

# [6] same grad step with a relu MLP (isolates tanh transcendental cost;
# param shapes are identical so the tanh params are reused).
from pikazoo_tpu.train.networks import ActorCritic

relu_net = ActorCritic(num_actions=cfg.num_actions, hidden=cfg.hidden,
                       activation="relu")


def loss_fn_relu(params, batch, adv, tgt):
    logits, value = relu_net.apply(params, batch.obs, pre_normalized=True)
    log_probs = jax.nn.log_softmax(logits)
    one_hot = jax.nn.one_hot(batch.action, cfg.num_actions,
                             dtype=log_probs.dtype)
    log_prob = (log_probs * one_hot).sum(-1)
    ratio = jnp.exp(log_prob - batch.log_prob)
    a = (adv - adv.mean()) / (adv.std() + 1e-8)
    policy_loss = -jnp.minimum(ratio * a, jnp.clip(ratio, 0.8, 1.2) * a).mean()
    vc = batch.value + jnp.clip(value - batch.value, -0.2, 0.2)
    value_loss = 0.5 * jnp.maximum((value - tgt) ** 2, (vc - tgt) ** 2).mean()
    entropy = -(jnp.exp(log_probs) * log_probs).sum(-1).mean()
    return policy_loss + 0.5 * value_loss - 0.01 * entropy


@jax.jit
def one_grad_step_relu(params, opt_state, mtraj, madv, mtarget):
    loss, grads = jax.value_and_grad(loss_fn_relu)(params, mtraj, madv,
                                                   mtarget)
    updates, opt_state = tx.update(grads, opt_state, params)
    return optax.apply_updates(params, updates), opt_state, loss


params, opt_state = runner.params, runner.opt_state
params, opt_state, loss = one_grad_step_relu(params, opt_state, mtraj, madv,
                                             mtarget)
jax.block_until_ready(loss)
t0 = time.perf_counter()
for _ in range(16):
    params, opt_state, loss = one_grad_step_relu(params, opt_state, mtraj,
                                                 madv, mtarget)
jax.block_until_ready(loss)
print(f"[6] 16 scan-free RELU grad steps: {(time.perf_counter()-t0)*1e3:9.1f}"
      " ms", flush=True)
