"""Actor-critic network for self-play PPO.

A small MLP over the 35-dim integer observation (normalized to [0,1] with the
env's Box bounds).  Both seats share one policy: observations are mirrored
per agent by the env, so a single network plays either side — self-play comes
free.  Matmuls run in bfloat16 (MXU-native) with float32 parameters and
outputs.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from pikazoo_tpu.envs.observations import OBS_HIGH, OBS_LOW

_LOW = jnp.asarray(OBS_LOW, jnp.float32)
_SPAN = jnp.asarray(np.asarray(OBS_HIGH) - np.asarray(OBS_LOW), jnp.float32)


def normalize_obs(obs: jnp.ndarray) -> jnp.ndarray:
    return (obs.astype(jnp.float32) - _LOW) / _SPAN


class ActorCritic(nn.Module):
    num_actions: int = 18
    hidden: Sequence[int] = (256, 256)
    compute_dtype: jnp.dtype = jnp.bfloat16
    activation: str = "tanh"  # "tanh" (PPO convention) or "relu"

    @nn.compact
    def __call__(self, obs: jnp.ndarray, pre_normalized: bool = False
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """obs: (..., 35) raw int32 -> (logits (..., A), value (...,)).

        ``pre_normalized=True`` accepts already-normalized (e.g. bfloat16)
        observations — the PPO update phase stores those in its trajectory
        buffer to halve HBM traffic and keep rollout/update log-probs
        computed from bit-identical inputs."""
        if pre_normalized:
            x = obs.astype(self.compute_dtype)
        else:
            x = normalize_obs(obs).astype(self.compute_dtype)
        for width in self.hidden:
            x = nn.Dense(width, dtype=self.compute_dtype,
                         kernel_init=nn.initializers.orthogonal(np.sqrt(2)),
                         bias_init=nn.initializers.zeros)(x)
            x = nn.relu(x) if self.activation == "relu" else nn.tanh(x)
        # Heads compute in bf16 too: upcasting the (..., 256) hidden state to
        # f32 first materializes two full-width f32 copies of the activations
        # (gigabytes per PPO minibatch at learner scale); the (..., 18)/(...,1)
        # head OUTPUTS are what need f32 (softmax/GAE numerics), and casting
        # those is ~14x cheaper.  Params stay f32 (flax param_dtype default).
        logits = nn.Dense(self.num_actions, dtype=self.compute_dtype,
                          kernel_init=nn.initializers.orthogonal(0.01),
                          bias_init=nn.initializers.zeros)(x)
        value = nn.Dense(1, dtype=self.compute_dtype,
                         kernel_init=nn.initializers.orthogonal(1.0),
                         bias_init=nn.initializers.zeros)(x)
        return logits.astype(jnp.float32), \
            jnp.squeeze(value, -1).astype(jnp.float32)


def dense_layers(params):
    """ActorCritic layer-ordering contract, in one place: returns
    ``(names, L, kernels, biases)`` where the first L entries are the hidden
    layers in creation order, entry L is the policy head and entry L+1 the
    value head (flax names Dense_0..Dense_{L+1} in ``__call__`` order).
    Shared by the feature-major forward pass and both fused gradient
    kernels so a renaming/reordering of the module breaks one helper, not
    three transcriptions."""
    dense = params["params"]
    names = sorted(dense, key=lambda s: int(s.rsplit("_", 1)[1]))
    w = [dense[n]["kernel"] for n in names]
    b = [dense[n]["bias"] for n in names]
    return names, len(names) - 2, w, b


def apply_fm(params, x_fm: jnp.ndarray, activation: str = "tanh"
             ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """FEATURE-MAJOR forward pass: ``x_fm`` (F, N) normalized bf16 ->
    ``(logits (A, N) f32, value (N,) f32)``.

    Same parameters and same bf16-operand/f32-accumulate arithmetic as
    ``ActorCritic.__call__`` but every matmul runs transposed
    (``h = act(W^T x)``), keeping the batch on the 128-wide vector lanes so
    per-action reductions downstream (softmax, sampling, log-prob select)
    are cheap sublane ops instead of padded cross-lane ones.  This is the
    rollout-side complement of ``fused_update.fused_ppo_grads_fm``.
    """
    _, L, w, b = dense_layers(params)
    bf, f32 = jnp.bfloat16, jnp.float32
    c00 = (((0,), (0,)), ((), ()))  # contract the input-feature dims
    h = x_fm.astype(bf)
    for l in range(L):
        pre = jax.lax.dot_general(w[l].astype(bf), h, c00,
                                  preferred_element_type=bf) \
            + b[l].astype(bf)[:, None]
        h = jnp.maximum(pre, 0) if activation == "relu" else jnp.tanh(pre)
    # Merged policy+value head: one (H, A+1) matmul.  A separate value dot
    # costs a full M-padded MXU pass (~22% of the rollout's matmul blocks)
    # just to produce 1 output row; concatenated, the value row rides the
    # policy matmul's padding for free.  Per-column accumulation is
    # unchanged, so logits and value are bit-identical to the split form.
    wpv = jnp.concatenate([w[L].astype(bf), w[L + 1].astype(bf)], axis=1)
    bpv = jnp.concatenate([b[L].astype(bf), b[L + 1].astype(bf)])
    heads = jax.lax.dot_general(wpv, h, c00,
                                preferred_element_type=bf) + bpv[:, None]
    return heads[:-1].astype(f32), heads[-1].astype(f32)
