"""Hardware A/B of the fused Pallas PPO gradient vs the XLA autodiff path.

Timing methodology (hard-won): on the axon remote backend, a Python loop of
small chained jit calls reports physically impossible numbers (a 26 GB-of-
traffic program "ran" in 0.62 ms; a 2.2 TFLOP matmul chain clocked 45,921
TFLOP/s — block_until_ready returns before the work is real).  The only
trustworthy pattern is K chained steps INSIDE ONE jit (lax.scan), timed over
few outer calls, with a host fetch of a result scalar.  The earlier
`ppo_decompose.py` numbers (942 ms GAE+update) used exactly this shape.

Stages:
  [1] XLA value_and_grad + adam, scan of K steps in one jit
  [2] fused Pallas grads + adam, scan of K steps in one jit
Gate with STOP_AFTER; stage [2] is the Mosaic-in-scanned-program compile
whose failure mode under this tunnel is a ~45 min service wedge.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("PPO_DECOMP_CPU") == "1":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import optax

from pikazoo_tpu.train.fused_update import fused_ppo_grads
from pikazoo_tpu.train.networks import ActorCritic

B = int(os.environ.get("PPO_ENVS", 65536))
T_MB = int(os.environ.get("PPO_T_MB", 32))      # rollout_length 128 / 4 mbs
M = 2 * B * T_MB
A, F, HIDDEN = 18, 35, (256, 256)
CLIP, VCOEF, ECOEF = 0.2, 0.5, 0.01
K = int(os.environ.get("K_STEPS", 8))           # grad steps per jit
ITERS = int(os.environ.get("ITERS", 3))
STOP_AFTER = int(os.environ.get("STOP_AFTER", 2))

net = ActorCritic(num_actions=A, hidden=HIDDEN)
params = net.init(jax.random.key(0), jnp.zeros((4, F), jnp.int32))
k = jax.random.key(1)
obs = jax.random.uniform(k, (M, F)).astype(jnp.bfloat16)
action = jax.random.randint(k, (M,), 0, A, jnp.int32)
logp_old = -jnp.log(jnp.float32(A)) + 0.1 * jax.random.normal(k, (M,))
value_old = jax.random.normal(k, (M,))
adv = jax.random.normal(k, (M,))
adv_n = (adv - adv.mean()) / (adv.std() + 1e-8)
target = jax.random.normal(k, (M,))
tx = optax.chain(optax.clip_by_global_norm(0.5), optax.adam(3e-4))
opt_state = tx.init(params)
args = (obs, action, logp_old, value_old, adv_n, target)
print(f"[0] init done M={M} ({M / 1e6:.2f}M rows/minibatch), K={K}",
      flush=True)


def xla_loss(p, obs, action, logp_old, value_old, adv_n, target):
    logits, value = net.apply(p, obs, pre_normalized=True)
    log_probs = jax.nn.log_softmax(logits)
    one_hot = jax.nn.one_hot(action, A, dtype=log_probs.dtype)
    log_prob = (log_probs * one_hot).sum(-1)
    ratio = jnp.exp(log_prob - logp_old)
    unclipped = ratio * adv_n
    clipped = jnp.clip(ratio, 1 - CLIP, 1 + CLIP) * adv_n
    policy_loss = -jnp.minimum(unclipped, clipped).mean()
    vclip = value_old + jnp.clip(value - value_old, -CLIP, CLIP)
    value_loss = 0.5 * jnp.maximum((value - target) ** 2,
                                   (vclip - target) ** 2).mean()
    entropy = -(jnp.exp(log_probs) * log_probs).sum(-1).mean()
    return policy_loss + VCOEF * value_loss - ECOEF * entropy


kw = dict(num_actions=A, activation="tanh", clip_eps=CLIP, value_coef=VCOEF,
          entropy_coef=ECOEF,
          interpret=jax.default_backend() != "tpu")


def make_k_steps(use_fused):
    # The minibatch data must be jit ARGUMENTS: closing over them embeds
    # ~600 MB of constants in the serialized program and the axon
    # remote-compile service rejects it (HTTP 413 length limit).
    @jax.jit
    def k_steps(p, o, *data):
        def one(carry, _):
            p, o = carry
            if use_fused:
                grads, losses = fused_ppo_grads(p, *data, **kw)
                loss = losses[0]
            else:
                loss, grads = jax.value_and_grad(xla_loss)(p, *data)
            updates, o = tx.update(grads, o, p)
            return (optax.apply_updates(p, updates), o), loss

        (p, o), losses = jax.lax.scan(one, (p, o), None, length=K)
        return p, o, losses[-1]

    return k_steps


def run(label, fn):
    p, o = params, opt_state
    t0 = time.perf_counter()
    p, o, loss = fn(p, o, *args)
    print(f"{label}: compile+first in {time.perf_counter() - t0:.1f}s "
          f"(loss={float(loss):.4f})", flush=True)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        p, o, loss = fn(p, o, *args)
    _ = float(loss)   # host fetch: cannot be faked by async completion
    dt = (time.perf_counter() - t0) / (ITERS * K)
    print(f"{label:34s} {dt * 1e3:9.2f} ms/grad-step "
          f"({M / dt / 1e6:9.1f}M rows/s)", flush=True)


if os.environ.get("SKIP_XLA_STAGE") != "1":
    run("[1] XLA grad+adam (scan K in-jit)", make_k_steps(False))
    if STOP_AFTER <= 1:
        sys.exit(0)
run("[2] fused grad+adam (scan K in-jit)", make_k_steps(True))
print("all stages ok", flush=True)
