"""Empirical MXU roofline for the feature-major fused PPO gradient kernel.

Runs a Pallas kernel with the SAME grid/blocks/matmul sequence as
``train/fused_update.py::_fm_kernel`` but with all elementwise loss math
stripped to bare casts — the gradient signal is fabricated from the logits.
The delta between this and the full kernel is the VPU/elementwise cost; the
matmul-only time is the in-layout hardware floor for the op mix.

Variants (env vars):
  FM_FT / FM_C     tile shape (default 8 x 512)
  MM_ONLY=0        also run the full fm kernel via fused_update for the delta
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B2 = int(os.environ.get("PPO_2B", 2 * 65536))
T_MB = int(os.environ.get("PPO_T_MB", 32))
FT = int(os.environ.get("FM_FT", 8))
C = int(os.environ.get("FM_C", 512))
A, F, H = 18, 35, 256
ITERS = int(os.environ.get("ITERS", 3))
K = int(os.environ.get("K_STEPS", 8))
M = T_MB * B2

kseq = [jax.random.key(i) for i in range(8)]
W1 = 0.3 * jax.random.normal(kseq[0], (F, H))
W2 = 0.3 * jax.random.normal(kseq[1], (H, H))
Wp = 0.05 * jax.random.normal(kseq[2], (H, A))
obs = jax.random.uniform(kseq[3], (T_MB, F, B2)).astype(jnp.bfloat16)
print(f"[0] M={M/1e6:.2f}M rows  grid=({T_MB // FT},{B2 // C})", flush=True)


def _mm_kernel(MODE, FT, C, obs_ref, w1_ref, w2_ref, wp_ref,
               dw1_ref, dw2_ref, dwp_ref):
    @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
    def _zero():
        for r in (dw1_ref, dw2_ref, dwp_ref):
            r[...] = jnp.zeros_like(r)

    f32 = jnp.float32
    c00 = (((0,), (0,)), ((), ()))
    c10 = (((1,), (0,)), ((), ()))
    c11 = (((1,), (1,)), ((), ()))

    def fwd(f):
        x = obs_ref[f]                                    # (F, C) bf16
        h1 = jax.lax.dot_general(w1_ref[...], x, c00,
                                 preferred_element_type=f32)
        h1b = h1.astype(jnp.bfloat16)
        h2 = jax.lax.dot_general(w2_ref[...], h1b, c00,
                                 preferred_element_type=f32)
        h2b = h2.astype(jnp.bfloat16)
        logits = jax.lax.dot_general(wp_ref[...], h2b, c00,
                                     preferred_element_type=f32)
        # fabricated upstream gradient: bare cast, no loss math
        dlb = logits.astype(jnp.bfloat16)                 # (A, C)
        return x, h1b, h2b, dlb

    def bwd(x, h1b, h2b, dlb):
        dwp_ref[...] += jax.lax.dot_general(h2b, dlb, c11,
                                            preferred_element_type=f32)
        dh2 = jax.lax.dot_general(wp_ref[...], dlb, c10,
                                  preferred_element_type=f32)
        dpre2b = dh2.astype(jnp.bfloat16)
        dw2_ref[...] += jax.lax.dot_general(h1b, dpre2b, c11,
                                            preferred_element_type=f32)
        dh1 = jax.lax.dot_general(w2_ref[...], dpre2b, c10,
                                  preferred_element_type=f32)
        dpre1b = dh1.astype(jnp.bfloat16)
        dw1_ref[...] += jax.lax.dot_general(x, dpre1b, c11,
                                            preferred_element_type=f32)

    if MODE == "phased":
        # All forwards first (independent chains across frames), then all
        # backwards — gives the scheduler cross-frame ILP to hide MXU
        # latency, at the cost of keeping FT frames' activations live.
        acts = [fwd(f) for f in range(FT)]
        for a in acts:
            bwd(*a)
    else:
        for f in range(FT):
            bwd(*fwd(f))


def make_k_mm(mode, ft, c):
    def mm_grads(obs, W1, W2, Wp):
        bf = jnp.bfloat16

        def whole(shape):
            nd = len(shape)
            return pl.BlockSpec(shape, (lambda i, j: (0,) * nd),
                                memory_space=pltpu.VMEM)

        obs_spec = pl.BlockSpec((ft, F, c), lambda i, j: (i, 0, j),
                                memory_space=pltpu.VMEM)
        w_in = [W1.astype(bf), W2.astype(bf), Wp.astype(bf)]
        out_shapes = [jax.ShapeDtypeStruct(W1.shape, jnp.float32),
                      jax.ShapeDtypeStruct(W2.shape, jnp.float32),
                      jax.ShapeDtypeStruct(Wp.shape, jnp.float32)]
        return pl.pallas_call(
            functools.partial(_mm_kernel, mode, ft, c),
            grid=(T_MB // ft, B2 // c),
            in_specs=[obs_spec] + [whole(x.shape) for x in w_in],
            out_specs=[whole(s.shape) for s in out_shapes],
            out_shape=out_shapes,
            interpret=jax.default_backend() != "tpu",
        )(obs, *w_in)

    @jax.jit
    def k_mm(obs, W1, W2, Wp):
        def one(carry, _):
            W1, W2, Wp = carry
            outs = mm_grads(obs, W1, W2, Wp)
            # feed grads back so the scan has a real dependency chain
            return (W1 - 1e-9 * outs[0], W2 - 1e-9 * outs[1],
                    Wp - 1e-9 * outs[2]), outs[2][0, 0]

        (W1, W2, Wp), losses = jax.lax.scan(one, (W1, W2, Wp), None,
                                            length=K)
        return W1, losses[-1]

    return k_mm


# Variants interleaved in one process, min-of-N: the tunnel/chip timing
# varies up to 2x between runs, so only same-process relative minima are
# trustworthy.
VARIANTS = [("chain", 8, 512), ("phased", 8, 512), ("phased", 8, 1024),
            ("chain", 8, 1024)]
fns = {v: make_k_mm(*v) for v in VARIANTS}
best = {v: float("inf") for v in VARIANTS}
# Chain each variant's W1 into its next invocation: identical-input repeats
# can be served from the tunnel's remote cache (see SKILL.md).
w1s = {v: W1 for v in VARIANTS}
for v, fn in fns.items():
    t0 = time.perf_counter()
    w1s[v], loss = fn(obs, w1s[v], W2, Wp)
    _ = float(loss)
    print(f"[c] {v} compile+first {time.perf_counter() - t0:.1f}s",
          flush=True)
for r in range(ITERS):
    for v, fn in fns.items():
        t0 = time.perf_counter()
        w1s[v], loss = fn(obs, w1s[v], W2, Wp)
        _ = float(loss)
        dt = (time.perf_counter() - t0) / K
        best[v] = min(best[v], dt)
for v in VARIANTS:
    dt = best[v]
    print(f"[1] mm-only {str(v):24s} {dt * 1e3:9.2f} ms/grad-step "
          f"({M / dt / 1e6:9.1f}M rows/s)  min of {ITERS}", flush=True)
