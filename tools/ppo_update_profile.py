"""Isolate the PPO update phase: time value_and_grad+adam minibatch steps on
synthetic trajectories, varying minibatch shape and width, to find where the
18.6 s (of a 18.7 s train step) goes."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import optax

from pikazoo_tpu.train import PPOConfig
from pikazoo_tpu.train.networks import ActorCritic
from pikazoo_tpu.train.ppo import Transition

B = 65536
T = 128


def bench_update(hidden, epochs, minibatches, seats=2):
    cfg = PPOConfig(num_envs=B, rollout_length=T, hidden=hidden,
                    update_epochs=epochs, num_minibatches=minibatches)
    network = ActorCritic(num_actions=18, hidden=cfg.hidden)
    tx = optax.chain(optax.clip_by_global_norm(0.5), optax.adam(3e-4))
    key = jax.random.key(0)
    obs = jax.random.randint(key, (T, B, seats, 35), 0, 400, jnp.int32)
    traj = Transition(
        obs=obs,
        action=jax.random.randint(key, (T, B, seats), 0, 18, jnp.int32),
        log_prob=jnp.zeros((T, B, seats), jnp.float32),
        value=jnp.zeros((T, B, seats), jnp.float32),
        reward=jnp.zeros((T, B, seats), jnp.float32),
        done=jnp.zeros((T, B), jnp.float32))
    advantages = jnp.ones((T, B, seats), jnp.float32)
    targets = jnp.ones((T, B, seats), jnp.float32)
    params = network.init(key, obs[0])
    opt_state = tx.init(params)

    def loss_fn(params, batch, adv, tgt):
        logits, value = network.apply(params, batch.obs)
        log_probs = jax.nn.log_softmax(logits)
        log_prob = jnp.take_along_axis(
            log_probs, batch.action[..., None], axis=-1)[..., 0]
        ratio = jnp.exp(log_prob - batch.log_prob)
        a = (adv - adv.mean()) / (adv.std() + 1e-8)
        policy_loss = -jnp.minimum(
            ratio * a, jnp.clip(ratio, 0.8, 1.2) * a).mean()
        value_loss = 0.5 * ((value - tgt) ** 2).mean()
        entropy = -(jnp.exp(log_probs) * log_probs).sum(-1).mean()
        return policy_loss + 0.5 * value_loss - 0.01 * entropy

    def update(params, opt_state, batch):
        def epoch(carry, _):
            def minibatch(carry, mb):
                params, opt_state = carry
                mtraj, madv, mtarget = mb
                loss, grads = jax.value_and_grad(loss_fn)(
                    params, mtraj, madv, mtarget)
                updates, opt_state = tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state), loss

            mbs = jax.tree.map(
                lambda x: x.reshape(minibatches, T // minibatches,
                                    *x.shape[1:]), batch)
            return jax.lax.scan(minibatch, carry, mbs)

        (params, opt_state), losses = jax.lax.scan(
            epoch, (params, opt_state), None, length=epochs)
        return params, opt_state, losses.mean()

    fn = jax.jit(update)
    batch = (traj, advantages, targets)
    p, o, loss = fn(params, opt_state, batch)
    jax.block_until_ready(loss)
    t0 = time.perf_counter()
    p, o, loss = fn(params, opt_state, batch)
    jax.block_until_ready(loss)
    dt = time.perf_counter() - t0
    samples = T * B * seats * epochs
    print(f"hidden={hidden} epochs={epochs} mbs={minibatches}: "
          f"{dt*1e3:8.1f} ms  ({samples/dt/1e6:7.1f}M samples/s)", flush=True)


bench_update((256, 256), 1, 4)
bench_update((256, 256), 4, 4)
bench_update((64, 64), 1, 4)
bench_update((256, 256), 1, 16)
