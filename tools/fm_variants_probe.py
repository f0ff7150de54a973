"""Interleaved min-of-N benchmark of fused_ppo_grads_fm variants on the chip.

The axon tunnel's timing varies up to ~3x BETWEEN processes, so only
same-process, interleaved, min-of-N comparisons are meaningful.  Variants
share one process and one set of live buffers; each is a K-step scan of
(fused gradient [+ optax adam+clip]) with the loss forced to host per trial.

Env knobs: PPO_2B, PPO_T_MB, ITERS (rounds), K_STEPS, WITH_ADAM=1.
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

from pikazoo_tpu.train.fused_update import fused_ppo_grads_fm
from pikazoo_tpu.train.networks import ActorCritic

B2 = int(os.environ.get("PPO_2B", 2 * 65536))
T_MB = int(os.environ.get("PPO_T_MB", 32))
ITERS = int(os.environ.get("ITERS", 6))
K = int(os.environ.get("K_STEPS", 8))
WITH_ADAM = os.environ.get("WITH_ADAM", "1") == "1"
A = 18
M = T_MB * B2
INTERP = jax.default_backend() != "tpu"

network = ActorCritic(num_actions=A, hidden=(256, 256))
params = network.init(jax.random.key(0), jnp.zeros((4, 35), jnp.int32))
obs = jax.random.uniform(jax.random.key(4),
                         (T_MB, 35, B2)).astype(jnp.bfloat16)
action = jax.random.randint(jax.random.key(5), (T_MB, B2), 0, A, jnp.int32)
lpold = -jnp.log(jnp.float32(A)) + 0.1 * jax.random.normal(
    jax.random.key(6), (T_MB, B2))
vold = jax.random.normal(jax.random.key(7), (T_MB, B2))
adv = jax.random.normal(jax.random.key(8), (T_MB, B2))
adv = (adv - adv.mean()) / (adv.std() + 1e-8)
tgt = jax.random.normal(jax.random.key(9), (T_MB, B2))
data = (obs, action, lpold, vold, adv, tgt)
print(f"[0] M={M / 1e6:.2f}M rows  adam={WITH_ADAM}", flush=True)

tx = optax.chain(optax.clip_by_global_norm(0.5), optax.adam(3e-4))
opt_state0 = tx.init(params)

VARIANTS = {
    "C=512 f32bwd": dict(cols_per_cell=512, bwd_bf16=False),
    "C=1024 f32bwd": dict(cols_per_cell=1024, bwd_bf16=False),
    "C=1024 bf16bwd": dict(cols_per_cell=1024, bwd_bf16=True),
    "C=2048 f32bwd": dict(cols_per_cell=2048, bwd_bf16=False),
    "C=512 int8": dict(cols_per_cell=512, quant="int8"),
    "C=1024 int8": dict(cols_per_cell=1024, quant="int8"),
    "C=2048 int8": dict(cols_per_cell=2048, quant="int8"),
    "C=1024 int8fwd": dict(cols_per_cell=1024, quant="int8fwd"),
    "C=2048 int8fwd": dict(cols_per_cell=2048, quant="int8fwd"),
}
if os.environ.get("ONLY"):
    keys = [k for k in VARIANTS if os.environ["ONLY"] in k]
    VARIANTS = {k: VARIANTS[k] for k in keys}


def make_fn(kw):
    # NB: the minibatch is a jit ARGUMENT — a closed-over device constant
    # blows the axon remote-compile request-size limit (HTTP 413).
    @jax.jit
    def k_steps(p, o, *data):
        def one(carry, _):
            p, o = carry
            grads, losses = fused_ppo_grads_fm(
                p, *data, num_actions=A, activation="tanh", clip_eps=0.2,
                value_coef=0.5, entropy_coef=0.01, interpret=INTERP, **kw)
            if WITH_ADAM:
                updates, o2 = tx.update(grads, o, p)
                p = optax.apply_updates(p, updates)
                return (p, o2), losses[0]
            return (jax.tree.map(lambda a, g: a - 1e-9 * g, p, grads),
                    o), losses[0]

        (p, o), losses = jax.lax.scan(one, (p, o), None, length=K)
        return p, o, losses[-1]

    return k_steps


fns = {name: make_fn(kw) for name, kw in VARIANTS.items()}
state = {name: (params, opt_state0) for name in fns}
best = {name: float("inf") for name in fns}
for name, fn in fns.items():
    t0 = time.perf_counter()
    p, o, loss = fn(*state[name], *data)
    _ = float(loss)
    state[name] = (p, o)
    print(f"[c] {name}: compile+first {time.perf_counter() - t0:.1f}s "
          f"loss={float(loss):.4f}", flush=True)
for r in range(ITERS):
    for name, fn in fns.items():
        t0 = time.perf_counter()
        p, o, loss = fn(*state[name], *data)
        _ = float(loss)
        state[name] = (p, o)
        best[name] = min(best[name], (time.perf_counter() - t0) / K)
for name in fns:
    dt = best[name]
    print(f"[1] {name:16s} {dt * 1e3:8.2f} ms/grad-step "
          f"({M / dt / 1e6:8.1f}M rows/s)  min of {ITERS}", flush=True)
