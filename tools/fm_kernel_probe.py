"""Prototype probe: FEATURE-MAJOR fused PPO gradient kernel.

Motivation (measured, 2026-08-17): the row-major fused kernel ships per-row
scalars as (G, R, 1) blocks whose HBM layout pads the 1-lane dim 128x; in the
full train step those padded reads made the Pallas path SLOWER than XLA
(1244 ms vs 988 ms).  Feature-major kills all padding:

  obs     (T, 35, 2B) bf16  -> block (FT, 35, C)   [35 pads only to 40 subl.]
  scalars (T, 2B)     f32   -> block (FT, C)       [native (8,128) tiling]
  grid    (T/FT, 2B/C), FT=8 frames x C=512 env-columns per cell
  matmuls run transposed: h = act(W^T x), dW = x dh^T -> (35, H) etc.

This probe checks (a) Mosaic compiles/lowers it, (b) numerics vs a jnp
transcription, (c) per-grad-step time vs the XLA autodiff path at bench
shapes.  Success gate: <= ~25 ms/grad-step at M = 4.19M rows.
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("PPO_DECOMP_CPU") == "1":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B2 = int(os.environ.get("PPO_2B", 2 * 65536))     # 2B env columns
T_MB = int(os.environ.get("PPO_T_MB", 32))
FT = int(os.environ.get("FM_FT", 8))
C = int(os.environ.get("FM_C", 512))
A, F, H = 18, 35, 256
CLIP, VCOEF, ECOEF = 0.2, 0.5, 0.01
ITERS = int(os.environ.get("ITERS", 2))
K = int(os.environ.get("K_STEPS", 8))
INTERP = jax.default_backend() != "tpu"
M = T_MB * B2
INV_M = 1.0 / M

k = jax.random.key(0)
W1 = 0.3 * jax.random.normal(k, (F, H))
b1 = jnp.zeros((H,))
W2 = 0.3 * jax.random.normal(jax.random.key(1), (H, H))
b2 = jnp.zeros((H,))
Wp = 0.05 * jax.random.normal(jax.random.key(2), (H, A))
bp = jnp.zeros((A,))
Wv = 0.5 * jax.random.normal(jax.random.key(3), (H, 1))
bv = jnp.zeros((1,))
params = (W1, b1, W2, b2, Wp, bp, Wv, bv)

obs = jax.random.uniform(jax.random.key(4), (T_MB, F, B2)).astype(jnp.bfloat16)
action = jax.random.randint(jax.random.key(5), (T_MB, B2), 0, A, jnp.int32)
lpold = -jnp.log(jnp.float32(A)) + 0.1 * jax.random.normal(
    jax.random.key(6), (T_MB, B2))
vold = jax.random.normal(jax.random.key(7), (T_MB, B2))
adv = jax.random.normal(jax.random.key(8), (T_MB, B2))
adv = (adv - adv.mean()) / (adv.std() + 1e-8)
tgt = jax.random.normal(jax.random.key(9), (T_MB, B2))
print(f"[0] init M={M / 1e6:.2f}M rows  grid=({T_MB // FT},{B2 // C})",
      flush=True)


def _kernel(obs_ref, act_ref, lpold_ref, vold_ref, adv_ref, tgt_ref,
            w1_ref, b1_ref, w2_ref, b2_ref, wp_ref, bp_ref, wv_ref, bv_ref,
            dw1_ref, db1_ref, dw2_ref, db2_ref, dwp_ref, dbp_ref, dwv_ref,
            dbv_ref, loss_ref):
    @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
    def _zero():
        for r in (dw1_ref, db1_ref, dw2_ref, db2_ref, dwp_ref, dbp_ref,
                  dwv_ref, dbv_ref, loss_ref):
            r[...] = jnp.zeros_like(r)

    f32 = jnp.float32
    rowsum = functools.partial(jnp.sum, axis=0, keepdims=True)  # over A/H
    colsum = functools.partial(jnp.sum, axis=1, keepdims=True)  # over C
    c00 = (((0,), (0,)), ((), ()))   # contract dim0 x dim0
    c11 = (((1,), (1,)), ((), ()))   # contract dim1 x dim1

    pol_s = 0.0
    val_s = 0.0
    ent_s = 0.0
    kl_s = 0.0
    for f in range(FT):
        x = obs_ref[f]                                   # (F, C) bf16
        pre1 = jax.lax.dot_general(w1_ref[...], x, c00,
                                   preferred_element_type=f32) \
            + b1_ref[...]                                # (H, C)
        # Keep ONLY the bf16 activation and re-derive f32 where needed:
        # holding both f32 tanh and its bf16 round triggers a Mosaic
        # verifier bug (bf16->f32 'vector.broadcast' with equal shapes).
        h1b = jnp.tanh(pre1).astype(jnp.bfloat16)
        pre2 = jax.lax.dot_general(w2_ref[...], h1b, c00,
                                   preferred_element_type=f32) + b2_ref[...]
        h2b = jnp.tanh(pre2).astype(jnp.bfloat16)
        logits = jax.lax.dot_general(wp_ref[...], h2b, c00,
                                     preferred_element_type=f32) \
            + bp_ref[...]                                # (A, C)
        # Value head as elementwise f32 multiply + reduce: Mosaic's lowering
        # of degenerate (1-row/col) dot_generals emits a dtype-invalid
        # vector.broadcast.  bf16 products are exact in f32, so this matches
        # MXU semantics bit-for-bit up to summation order.
        h2f = h2b.astype(f32)
        wvf = wv_ref[...].astype(f32)                    # (H, 1)
        value = jnp.sum(wvf * h2f, axis=0, keepdims=True) \
            + bv_ref[...]                                # (1, C)

        m = jnp.max(logits, axis=0, keepdims=True)
        ex = jnp.exp(logits - m)
        sumex = rowsum(ex)
        logp_all = logits - (jnp.log(sumex) + m)
        p = ex / sumex
        act_row = act_ref[f:f + 1, :]                    # (1, C) i32
        onehot = (jax.lax.broadcasted_iota(jnp.int32, logits.shape, 0)
                  == act_row).astype(f32)
        lp_new = rowsum(logp_all * onehot)               # (1, C)

        lpo = lpold_ref[f:f + 1, :]
        ad = adv_ref[f:f + 1, :]
        vo = vold_ref[f:f + 1, :]
        tg = tgt_ref[f:f + 1, :]
        ratio = jnp.exp(lp_new - lpo)
        unclipped = ratio * ad
        clipped = jnp.clip(ratio, 1 - CLIP, 1 + CLIP) * ad
        pol_s += -jnp.sum(jnp.minimum(unclipped, clipped))
        entropy_row = -rowsum(p * logp_all)              # (1, C)
        ent_s += jnp.sum(entropy_row)
        vclip = vo + jnp.clip(value - vo, -CLIP, CLIP)
        e1 = value - tg
        e2 = vclip - tg
        val_s += 0.5 * jnp.sum(jnp.maximum(e1 * e1, e2 * e2))
        kl_s += jnp.sum((ratio - 1.0) - jnp.log(ratio))

        inside_r = ((ratio > 1 - CLIP) & (ratio < 1 + CLIP)).astype(f32)
        dmin = jnp.where(unclipped <= clipped, ad, ad * inside_r)
        dlp = -INV_M * dmin * ratio                      # (1, C)
        dlogits = (dlp * (onehot - p)
                   + (ECOEF * INV_M) * p * (logp_all + entropy_row))
        inside_v = ((value - vo > -CLIP) & (value - vo < CLIP)).astype(f32)
        dvalue = (VCOEF * INV_M) * jnp.where(e1 * e1 >= e2 * e2, e1,
                                             e2 * inside_v)  # (1, C)

        dlb = dlogits.astype(jnp.bfloat16)
        dwp_ref[...] += jax.lax.dot_general(h2b, dlb, c11,
                                            preferred_element_type=f32)
        dbp_ref[...] += colsum(dlogits)                  # (A, 1)
        # Value-head grads without degenerate dots (see forward note):
        # dWv = h2 dvalue^T -> sum over C; dh2 += Wv dvalue (outer product).
        dwv_ref[...] += colsum(h2f * dvalue)             # (H, 1)
        dbv_ref[...] += colsum(dvalue)                   # (1, 1)

        # dh2 = Wp @ dlogits + Wv @ dvalue: contract the head OUTPUT dim
        # (Wp dim1) with the gradient's row dim (dim0).
        c10 = (((1,), (0,)), ((), ()))
        dh2 = (jax.lax.dot_general(wp_ref[...], dlb, c10,
                                   preferred_element_type=f32)
               + wvf * dvalue)                           # (H, C)
        dpre2 = dh2 * (1.0 - h2f * h2f)
        dpre2b = dpre2.astype(jnp.bfloat16)
        dw2_ref[...] += jax.lax.dot_general(h1b, dpre2b, c11,
                                            preferred_element_type=f32)
        db2_ref[...] += colsum(dpre2)                    # (H, 1)
        # dh1 = W2 @ dpre2: W2 is (H_in, H_out) -> contract dim1 x dim0.
        dh1 = jax.lax.dot_general(w2_ref[...], dpre2b,
                                  (((1,), (0,)), ((), ())),
                                  preferred_element_type=f32)     # (H, C)
        h1f = h1b.astype(f32)
        dpre1 = dh1 * (1.0 - h1f * h1f)
        dpre1b = dpre1.astype(jnp.bfloat16)
        dw1_ref[...] += jax.lax.dot_general(x, dpre1b, c11,
                                            preferred_element_type=f32)
        db1_ref[...] += colsum(dpre1)                    # (H, 1)

    col = jax.lax.broadcasted_iota(jnp.int32, (1, 8), 1)
    loss_ref[...] += (jnp.where(col == 0, pol_s, 0.0)
                      + jnp.where(col == 1, val_s, 0.0)
                      + jnp.where(col == 2, ent_s, 0.0)
                      + jnp.where(col == 3, kl_s, 0.0))


def fm_grads(params, obs, action, lpold, vold, adv, tgt):
    W1, b1, W2, b2, Wp, bp, Wv, bv = params
    gT, gC = T_MB // FT, B2 // C
    bf = jnp.bfloat16

    def whole(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, (lambda i, j: (0,) * nd),
                            memory_space=pltpu.VMEM)

    obs_spec = pl.BlockSpec((FT, F, C), lambda i, j: (i, 0, j),
                            memory_space=pltpu.VMEM)
    sc_spec = pl.BlockSpec((FT, C), lambda i, j: (i, j),
                           memory_space=pltpu.VMEM)
    w_in = [W1.astype(bf), b1.reshape(H, 1), W2.astype(bf),
            b2.reshape(H, 1), Wp.astype(bf), bp.reshape(A, 1),
            Wv.astype(bf), bv.reshape(1, 1)]
    out_shapes = [jax.ShapeDtypeStruct(W1.shape, jnp.float32),
                  jax.ShapeDtypeStruct((H, 1), jnp.float32),
                  jax.ShapeDtypeStruct(W2.shape, jnp.float32),
                  jax.ShapeDtypeStruct((H, 1), jnp.float32),
                  jax.ShapeDtypeStruct(Wp.shape, jnp.float32),
                  jax.ShapeDtypeStruct((A, 1), jnp.float32),
                  jax.ShapeDtypeStruct(Wv.shape, jnp.float32),
                  jax.ShapeDtypeStruct((1, 1), jnp.float32),
                  jax.ShapeDtypeStruct((1, 8), jnp.float32)]
    outs = pl.pallas_call(
        _kernel,
        grid=(gT, gC),
        in_specs=[obs_spec, sc_spec, sc_spec, sc_spec, sc_spec, sc_spec]
        + [whole(x.shape) for x in w_in],
        out_specs=[whole(s.shape) for s in out_shapes],
        out_shape=out_shapes,
        interpret=INTERP,
    )(obs, action, lpold, vold, adv, tgt, *w_in)
    return outs


# bias add inside kernel: b1_ref is (H, 1) and broadcasts over (H, C). OK.

def ref_loss(params, obs, action, lpold, vold, adv, tgt):
    W1, b1, W2, b2, Wp, bp, Wv, bv = params
    x = obs.astype(jnp.bfloat16)                     # (T, F, 2B)
    c = (((1,), (0,)), ((), ()))

    def dg(w, x):
        # x (T, F, C): contract F with w's dim0 -> (T, C, H) -> transpose
        y = jax.lax.dot_general(x, w.astype(jnp.bfloat16),
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        return jnp.swapaxes(y, 1, 2)                 # (T, H, C)

    h1 = jnp.tanh(dg(W1, x) + b1[None, :, None])
    h2 = jnp.tanh(dg(W2, h1.astype(jnp.bfloat16)) + b2[None, :, None])
    logits = dg(Wp, h2.astype(jnp.bfloat16)) + bp[None, :, None]  # (T,A,2B)
    value = (dg(Wv, h2.astype(jnp.bfloat16)) + bv[None, :, None])[:, 0]
    logp_all = jax.nn.log_softmax(logits, axis=1)
    onehot = jax.nn.one_hot(action, A, dtype=jnp.float32, axis=1)
    lp = (logp_all * onehot).sum(1)
    ratio = jnp.exp(lp - lpold)
    pol = -jnp.minimum(ratio * adv,
                       jnp.clip(ratio, 1 - CLIP, 1 + CLIP) * adv).mean()
    vclip = vold + jnp.clip(value - vold, -CLIP, CLIP)
    vl = 0.5 * jnp.maximum((value - tgt) ** 2, (vclip - tgt) ** 2).mean()
    ent = -(jnp.exp(logp_all) * logp_all).sum(1).mean()
    return pol + VCOEF * vl - ECOEF * ent


if os.environ.get("FM_CHECK", "1") == "1":
    outs = fm_grads(params, obs, action, lpold, vold, adv, tgt)
    sums = outs[-1]
    total = (sums[0, 0] + VCOEF * sums[0, 1] - ECOEF * sums[0, 2]) * INV_M
    ref = ref_loss(params, obs, action, lpold, vold, adv, tgt)
    print(f"[1] loss fused={float(total):.6f} ref={float(ref):.6f}",
          flush=True)
    ref_grads = jax.grad(ref_loss)(params, obs, action, lpold, vold, adv,
                                   tgt)
    import numpy as np
    labels = ["dW1", "db1", "dW2", "db2", "dWp", "dbp", "dWv", "dbv"]
    ok = True
    for i, (g, r) in enumerate(zip(outs[:8], ref_grads)):
        g = np.asarray(g, np.float64).reshape(-1)
        r = np.asarray(r, np.float64).reshape(-1)
        cos = g @ r / ((np.linalg.norm(g) * np.linalg.norm(r)) + 1e-30)
        rel = np.linalg.norm(g - r) / (np.linalg.norm(r) + 1e-30)
        flag = "ok" if (cos > 0.999 and rel < 0.05) else "BAD"
        ok = ok and flag == "ok"
        print(f"    {labels[i]}: cos={cos:.6f} rel={rel:.4f} {flag}",
              flush=True)
    print(f"[1] grads {'OK' if ok else 'MISMATCH'}", flush=True)

if os.environ.get("FM_BENCH", "1") == "1":
    import optax
    tx = optax.adam(3e-4)
    flat_params = params
    opt_state = tx.init(flat_params)

    @jax.jit
    def k_steps(p, o, obs, action, lpold, vold, adv, tgt):
        def one(carry, _):
            p, o = carry
            outs = fm_grads(p, obs, action, lpold, vold, adv, tgt)
            grads = (outs[0], outs[1].reshape(-1), outs[2],
                     outs[3].reshape(-1), outs[4], outs[5].reshape(-1),
                     outs[6], outs[7].reshape(-1))
            updates, o = tx.update(grads, o, p)
            return (optax.apply_updates(p, updates), o), outs[-1][0, 0]

        (p, o), losses = jax.lax.scan(one, (p, o), None, length=K)
        return p, o, losses[-1]

    t0 = time.perf_counter()
    p, o, loss = k_steps(flat_params, opt_state, obs, action, lpold, vold,
                         adv, tgt)
    print(f"[2] compile+first {time.perf_counter() - t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        p, o, loss = k_steps(p, o, obs, action, lpold, vold, adv, tgt)
    _ = float(loss)
    dt = (time.perf_counter() - t0) / (ITERS * K)
    print(f"[2] fm fused grad+adam {dt * 1e3:9.2f} ms/grad-step "
          f"({M / dt / 1e6:9.1f}M rows/s)", flush=True)
