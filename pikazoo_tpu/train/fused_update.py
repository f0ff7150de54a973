"""Fused PPO minibatch gradient as a single Pallas TPU kernel.

Why: the XLA update phase is HBM-bound — every Dense layer's activations
(`(M, 256)` at learner scale, M ~ 4.2M rows/minibatch) make an HBM round
trip in the forward pass and two more in the backward pass, ~26 GB of
traffic per minibatch gradient step (measured 52 ms; 16 such steps dominate
the 0.94 s update phase of the PPO train step — `tools/ppo_decompose.py`).

This kernel computes the complete clipped-PPO gradient (forward MLP, loss,
manual backward, weight-gradient accumulation, loss partial sums) for a tile
of R rows entirely in VMEM, so the only HBM traffic is one read of the
(bf16) observation tile and the per-row scalars: ~0.3 GB/minibatch instead
of ~26 GB.  The MXU does the same matmul FLOPs either way; the kernel removes
the memory wall, not the math.

Parity note: the XLA path (`flax` ``Dense(dtype=bfloat16)``) keeps
activations in bfloat16 end-to-end; this kernel accumulates every matmul in
float32 (``preferred_element_type``) and applies tanh in float32, i.e. it is
slightly MORE precise than the XLA path.  The two paths agree to bf16
tolerance (see ``tests/test_fused_update.py``) but are not bitwise equal;
``PPOConfig.fused_update`` is therefore an explicit opt-in ("auto" enables
it on TPU only).

Loss definition mirrors ``ppo.make_ppo_trainer.loss_fn`` exactly
(reference semantics: clipped surrogate + clipped value loss + entropy
bonus; the reference repo has no learner at all — SURVEY.md §2.2 N7).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Rows per grid step.  VMEM budget at R=1024, hidden=(256, 256): ~8 MB of
# activations/temporaries + ~0.6 MB of weight/grad accumulators.
# PIKAZOO_FUSED_ROWS overrides for tile-size sweeps.
import os as _os

_DEFAULT_ROWS = int(_os.environ.get("PIKAZOO_FUSED_ROWS", 1024))


def _act(x: jnp.ndarray, activation: str) -> jnp.ndarray:
    return jnp.maximum(x, 0.0) if activation == "relu" else jnp.tanh(x)


def _dact(h: jnp.ndarray, activation: str) -> jnp.ndarray:
    # Derivative expressed through the POST-activation value h.
    if activation == "relu":
        return (h > 0.0).astype(h.dtype)
    return 1.0 - h * h


def _kernel(num_hidden: int, num_actions: int, activation: str,
            clip_eps: float, value_coef: float, entropy_coef: float,
            inv_m: float, *refs):
    """Grid step: one R-row tile -> accumulate grads + loss partials.

    refs layout (flat, in order):
      inputs:  obs, action, logp_old, value_old, adv, target,
               w_0..w_{L-1}, b_0..b_{L-1}  (hidden layers, bf16/f32),
               wp, bp, wv, bv
      outputs: dw_0..dw_{L-1}, db_0..db_{L-1}, dwp, dbp, dwv, dbv, losses
    """
    L = num_hidden
    (obs_ref, act_ref, lpold_ref, vold_ref, adv_ref, tgt_ref) = refs[:6]
    w_refs = refs[6:6 + L]
    b_refs = refs[6 + L:6 + 2 * L]
    wp_ref, bp_ref, wv_ref, bv_ref = refs[6 + 2 * L:10 + 2 * L]
    out = refs[10 + 2 * L:]
    dw_refs = out[:L]
    db_refs = out[L:2 * L]
    dwp_ref, dbp_ref, dwv_ref, dbv_ref, loss_ref = out[2 * L:]

    @pl.when(pl.program_id(0) == 0)
    def _zero_accumulators():
        for r in (*dw_refs, *db_refs, dwp_ref, dbp_ref, dwv_ref, dbv_ref,
                  loss_ref):
            r[...] = jnp.zeros_like(r)

    f32 = jnp.float32

    # Per-row quantities are (R, 1) COLUMN VECTORS throughout: Mosaic
    # requires block shapes with the last two dims divisible by (8, 128) or
    # equal to the array dims, so 1-D (M,) inputs are shipped as (G, R, 1).
    # ---- forward ----------------------------------------------------------
    x = obs_ref[0]  # (R, F) bf16
    hs_b = []       # post-activation, bf16 (matmul operands)
    hs = []         # post-activation, f32 (for activation derivative)
    h_b = x
    for l in range(L):
        pre = jnp.dot(h_b, w_refs[l][...],
                      preferred_element_type=f32) + b_refs[l][0]
        h = _act(pre, activation)
        h_b = h.astype(jnp.bfloat16)
        hs.append(h)
        hs_b.append(h_b)

    logits = jnp.dot(h_b, wp_ref[...],
                     preferred_element_type=f32) + bp_ref[0]      # (R, A)
    value = jnp.dot(h_b, wv_ref[...],
                    preferred_element_type=f32) + bv_ref[0]       # (R, 1)

    # ---- loss (sums over the tile; mean scaling via inv_m) ---------------
    m = jnp.max(logits, axis=1, keepdims=True)
    ex = jnp.exp(logits - m)
    sumex = jnp.sum(ex, axis=1, keepdims=True)
    logp_all = logits - (jnp.log(sumex) + m)                       # (R, A)
    p = ex / sumex
    onehot = (jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
              == act_ref[0]).astype(f32)                           # (R, A)
    lp_new = jnp.sum(logp_all * onehot, axis=1, keepdims=True)     # (R, 1)

    ratio = jnp.exp(lp_new - lpold_ref[0])                         # (R, 1)
    adv = adv_ref[0]                                               # (R, 1)
    unclipped = ratio * adv
    clipped = jnp.clip(ratio, 1.0 - clip_eps, 1.0 + clip_eps) * adv
    policy_sum = -jnp.sum(jnp.minimum(unclipped, clipped))

    entropy_row = -jnp.sum(p * logp_all, axis=1, keepdims=True)    # (R, 1)
    entropy_sum = jnp.sum(entropy_row)

    vold = vold_ref[0]                                             # (R, 1)
    tgt = tgt_ref[0]                                               # (R, 1)
    vclip = vold + jnp.clip(value - vold, -clip_eps, clip_eps)
    e1 = value - tgt
    e2 = vclip - tgt
    value_sum = 0.5 * jnp.sum(jnp.maximum(e1 * e1, e2 * e2))
    kl_sum = jnp.sum((ratio - 1.0) - jnp.log(ratio))

    # ---- backward ---------------------------------------------------------
    # d policy / d lp_new: through min(unclipped, clipped); the clipped
    # branch only passes gradient while ratio is strictly inside the bound.
    inside_r = ((ratio > 1.0 - clip_eps)
                & (ratio < 1.0 + clip_eps)).astype(f32)
    dmin_dratio = jnp.where(unclipped <= clipped, adv, adv * inside_r)
    dlp = -inv_m * dmin_dratio * ratio                             # (R, 1)
    # d total / d logits: policy term + entropy bonus
    # (dH/dz_j = -p_j (logp_j + H); total has -entropy_coef * H_mean).
    dlogits = (dlp * (onehot - p)
               + (entropy_coef * inv_m) * p
               * (logp_all + entropy_row))                         # (R, A)
    # d total / d value: through max of clipped/unclipped squared error.
    inside_v = ((value - vold > -clip_eps)
                & (value - vold < clip_eps)).astype(f32)
    dvalue = (value_coef * inv_m) * jnp.where(e1 * e1 >= e2 * e2,
                                              e1, e2 * inside_v)   # (R, 1)

    dlogits_b = dlogits.astype(jnp.bfloat16)
    dvalue_b = dvalue.astype(jnp.bfloat16)                         # (R, 1)
    rows_contract = (((0,), (0,)), ((), ()))   # contract over the R rows
    cols_contract = (((1,), (1,)), ((), ()))   # x @ W^T

    dwp_ref[...] += jax.lax.dot_general(hs_b[-1], dlogits_b, rows_contract,
                                        preferred_element_type=f32)
    dbp_ref[...] += jnp.sum(dlogits, axis=0, keepdims=True)
    dwv_ref[...] += jax.lax.dot_general(hs_b[-1], dvalue_b, rows_contract,
                                        preferred_element_type=f32)
    dbv_ref[...] += jnp.sum(dvalue)[None, None]

    dh = (jax.lax.dot_general(dlogits_b, wp_ref[...], cols_contract,
                              preferred_element_type=f32)
          + jax.lax.dot_general(dvalue_b, wv_ref[...], cols_contract,
                                preferred_element_type=f32))       # (R, H)
    for l in range(L - 1, -1, -1):
        dpre = dh * _dact(hs[l], activation)
        dpre_b = dpre.astype(jnp.bfloat16)
        below = hs_b[l - 1] if l > 0 else x
        dw_refs[l][...] += jax.lax.dot_general(
            below, dpre_b, rows_contract, preferred_element_type=f32)
        db_refs[l][...] += jnp.sum(dpre, axis=0, keepdims=True)
        if l > 0:
            dh = jax.lax.dot_general(dpre_b, w_refs[l][...], cols_contract,
                                     preferred_element_type=f32)

    # .at[].set on traced values lowers to scatter (unsupported by Mosaic);
    # build the loss row with iota masks instead.
    col = jax.lax.broadcasted_iota(jnp.int32, (1, 8), 1)
    loss_ref[...] += (jnp.where(col == 0, policy_sum, 0.0)
                      + jnp.where(col == 1, value_sum, 0.0)
                      + jnp.where(col == 2, entropy_sum, 0.0)
                      + jnp.where(col == 3, kl_sum, 0.0))


def _pick_rows(m: int) -> int:
    for r in (_DEFAULT_ROWS, 512, 256, 128, 64, 32, 16, 8):
        if m % r == 0:
            return r
    return m


def _pack_grads(names, L, outs) -> Tuple[Dict[str, Any], Any]:
    """Kernel output list -> (grads pytree matching the params, loss sums).

    ``outs`` is [dw_0..dw_{L-1}, db_0..db_{L-1}, dwp, dbp, dwv, dbv, sums]
    with biases shaped (1, H) or (H, 1) — flattened back to (H,)."""
    dw = list(outs[:L])
    db = [x.reshape(-1) for x in outs[L:2 * L]]
    dwp, dbp, dwv, dbv, sums = outs[2 * L:]
    grads_dense = {}
    for i, n in enumerate(names[:L]):
        grads_dense[n] = {"kernel": dw[i], "bias": db[i]}
    grads_dense[names[L]] = {"kernel": dwp, "bias": dbp.reshape(-1)}
    grads_dense[names[L + 1]] = {"kernel": dwv, "bias": dbv.reshape(-1)}
    return {"params": grads_dense}, sums


# ---------------------------------------------------------------------------
# FEATURE-MAJOR variant.  The row-major kernel above ships every per-row
# scalar as a (G, R, 1) block whose trailing 1-lane dim pads 128x in HBM; at
# learner scale those padded reads made the Pallas path slower than XLA in
# the full train step.  Feature-major kills all padding: scalars are (T, 2B)
# blocks with native (8, 128) tiling, obs is (T, F, 2B) (F=35 pads only the
# sublane dim to 40), and every matmul runs transposed (h = act(W^T x),
# dW = x dh^T) so the batch lives on the 128-wide lanes end to end.
# Numerics are identical to the row-major kernel (same casts, same f32
# accumulation) — orientation only.

_FM_FT = int(_os.environ.get("PIKAZOO_FM_FT", 8))     # frames per grid cell
# Env columns per cell: interleaved min-of-6 sweep on v5e (2026-08-19,
# tools/fm_variants_probe.py, grad+adam at M=4.19M rows): 512 -> 21.3 ms,
# 1024 -> 19.4 ms (9% above the matmul-only floor of 17.7 ms), 2048 -> 21.3
# (VMEM pressure).  1024 is the default.
_FM_COLS = int(_os.environ.get("PIKAZOO_FM_C", 1024))
# bf16 hidden-layer gradient chain: same sweep measured 19.95 ms vs f32's
# 19.36 — the kernel is MXU-bound, so halving VPU backward bytes buys
# nothing and f32 keeps the extra mantissa.  Off by default; kept as a knob.
_FM_BWD_BF16 = _os.environ.get("PIKAZOO_FM_BWD_BF16", "0") == "1"
# int8 matmul operands ("int8") vs bf16 ("none"): the v5e MXU runs int8 at
# 2x bf16 throughput, and the kernel is MXU-bound (the roofline audit in
# docs/ppo_roofline.md).  Every dot feeds int8 operands with int32
# accumulation; all loss math, bias grads and weight-grad accumulators stay
# f32.  Scales: obs lives in [0, 1] (normalize_obs) and tanh activations in
# [-1, 1], so forward activations use the static scale 127; weights get one
# dynamic per-tensor scale per grad step (quantized outside the kernel);
# backward activation gradients get one dynamic per-tile max-abs scale.
_FM_QUANT = _os.environ.get("PIKAZOO_FM_QUANT", "none")


def _fm_kernel(num_hidden: int, num_actions: int, activation: str,
               clip_eps: float, value_coef: float, entropy_coef: float,
               inv_m: float, ft: int, bwd_bf16: bool, quant: bool, *refs):
    """Grid cell: ft frames x C env-columns -> accumulate grads + losses.

    refs layout: obs + 5 scalar inputs, hidden weights/biases, then the
    MERGED head (wpv (H, A+1) bf16, bpv (A+1, 1) f32 — policy columns then
    the value column), [quant only: sw (1, 8) f32 per-weight dequant
    scales], then outputs (hidden grads, dwpv, dbpv, losses).
    Every block is feature-major: obs (ft, F, C), scalars (ft, C).

    The merged head runs policy logits and the value in ONE (A+1)-row
    matmul — the value row rides the policy matmul's lane padding for free
    and removes the elementwise value-head workaround that the Mosaic
    degenerate-dot bug used to force (see git history for the split form).
    Row A of the head output is the value; softmax/entropy mask it out via
    the row iota.

    ``quant`` (int8 mode): the weight refs hold int8 tensors (dequant scale
    ``sw[0, l]``), every dot runs int8 x int8 -> int32 on the MXU, and the
    forward/backward activations are requantized per use (static scale 127
    forward — obs in [0, 1], tanh in [-1, 1]; dynamic per-tile max-abs
    scale backward).  Loss math, bias grads and all accumulators stay f32.
    """
    L = num_hidden
    (obs_ref, act_ref, lpold_ref, vold_ref, adv_ref, tgt_ref) = refs[:6]
    w_refs = refs[6:6 + L]
    b_refs = refs[6 + L:6 + 2 * L]
    wpv_ref, bpv_ref = refs[6 + 2 * L:8 + 2 * L]
    n_in = 8 + 2 * L
    sw_ref = refs[n_in] if quant else None
    extra = 1 if quant else 0
    if quant == "fwd":
        # fwd-only mode ships the bf16 weights too (~90 KB) so the stock
        # bf16 backward runs untouched on real-valued operands.
        wbf_refs = refs[n_in + 1:n_in + 1 + L]
        wpvbf_ref = refs[n_in + 1 + L]
        extra = 2 + L
    else:
        wbf_refs, wpvbf_ref = w_refs, wpv_ref
    out = refs[n_in + extra:]
    dw_refs = out[:L]
    db_refs = out[L:2 * L]
    dwpv_ref, dbpv_ref, loss_ref = out[2 * L:]

    @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
    def _zero_accumulators():
        for r in (*dw_refs, *db_refs, dwpv_ref, dbpv_ref, loss_ref):
            r[...] = jnp.zeros_like(r)

    f32 = jnp.float32
    rowsum = functools.partial(jnp.sum, axis=0, keepdims=True)  # over A/H
    colsum = functools.partial(jnp.sum, axis=1, keepdims=True)  # over C
    c00 = (((0,), (0,)), ((), ()))   # W^T x: contract input dims
    c10 = (((1,), (0,)), ((), ()))   # W dY: contract output dim with rows
    c11 = (((1,), (1,)), ((), ()))   # x dh^T: contract the C columns

    i32 = jnp.int32
    s_in = 1.0 / 127.0           # static dequant scale of fwd activations
    inv127sq = 1.0 / (127.0 * 127.0)
    col8 = jax.lax.broadcasted_iota(jnp.int32, (1, 8), 1)

    def _sw(l):
        """Per-weight dequant scale, (1, 1) f32, from the (1, 8) scales row."""
        return jnp.sum(jnp.where(col8 == l, sw_ref[...], 0.0),
                       axis=1, keepdims=True)

    def _dyn_q(t):
        """Dynamic per-tile symmetric int8: (t_q, dequant (1,1) = amax/127)."""
        sa = jnp.maximum(jnp.max(jnp.abs(t), axis=(0, 1), keepdims=True),
                         1e-30)
        return jnp.round(t * (127.0 / sa)).astype(jnp.int8), sa * s_in

    policy_s = 0.0
    value_s = 0.0
    entropy_s = 0.0
    kl_s = 0.0
    for f in range(ft):
        x = obs_ref[f]                                    # (F, C) bf16
        # Keep ONLY the bf16 activation and re-derive f32 where needed:
        # holding both the f32 activation and its bf16 round triggers a
        # Mosaic verifier bug (bf16->f32 'vector.broadcast' @ equal shapes).
        hs_b = []
        if quant:
            # Forward, int8 operands: obs is in [0, 1] and tanh activations
            # in [-1, 1], so the static scale 127 loses nothing; the weight
            # dequant scale rides the bias add.  hs_b holds int8 tiles in
            # full-int8 mode, bf16 tiles in fwd-only mode (the backward
            # then runs the stock bf16 chain on them).
            fwd_only = quant == "fwd"

            def _q127(v):
                # Clamp before the int8 cast: the static scale assumes
                # [-1, 1] inputs (normalized obs / tanh), but an observation
                # marginally outside OBS_LOW/HIGH or a non-tanh activation
                # would otherwise hit out-of-range f32->int8 conversion,
                # which is implementation-defined.
                return jnp.clip(jnp.round(v * 127.0),
                                -127.0, 127.0).astype(jnp.int8)

            h_q = _q127(x.astype(f32))
            x_q = h_q
            for l in range(L):
                acc = jax.lax.dot_general(w_refs[l][...], h_q, c00,
                                          preferred_element_type=i32)
                pre = acc.astype(f32) * (_sw(l) * s_in) + b_refs[l][...]
                h_f = _act(pre, activation)
                h_q = _q127(h_f)
                hs_b.append(h_f.astype(jnp.bfloat16) if fwd_only else h_q)
            heads = jax.lax.dot_general(wpv_ref[...], h_q, c00,
                                        preferred_element_type=i32) \
                .astype(f32) * (_sw(L) * s_in) + bpv_ref[...]
        else:
            h_b = x
            for l in range(L):
                pre = jax.lax.dot_general(w_refs[l][...], h_b, c00,
                                          preferred_element_type=f32) \
                    + b_refs[l][...]                      # (H, C)
                h_b = _act(pre, activation).astype(jnp.bfloat16)
                hs_b.append(h_b)
            heads = jax.lax.dot_general(wpv_ref[...], h_b, c00,
                                        preferred_element_type=f32) \
                + bpv_ref[...]                            # (A+1, C)
        row = jax.lax.broadcasted_iota(jnp.int32, heads.shape, 0)
        is_logit = row < num_actions                      # value row = A
        value = rowsum(jnp.where(is_logit, 0.0, heads))   # (1, C)

        # Masked softmax over the A logit rows only.
        m = jnp.max(jnp.where(is_logit, heads, -jnp.inf), axis=0,
                    keepdims=True)
        ex = jnp.where(is_logit, jnp.exp(heads - m), 0.0)
        sumex = rowsum(ex)
        logp_all = heads - (jnp.log(sumex) + m)           # row A: garbage,
        p = ex / sumex                                    #   p there is 0
        act_row = act_ref[f:f + 1, :]                     # (1, C) i32
        onehot = (row == act_row).astype(f32)             # never row A
        lp_new = rowsum(logp_all * onehot)                # (1, C)

        lpo = lpold_ref[f:f + 1, :]
        adv = adv_ref[f:f + 1, :]
        vold = vold_ref[f:f + 1, :]
        tgt = tgt_ref[f:f + 1, :]
        ratio = jnp.exp(lp_new - lpo)
        unclipped = ratio * adv
        clipped = jnp.clip(ratio, 1.0 - clip_eps, 1.0 + clip_eps) * adv
        policy_s += -jnp.sum(jnp.minimum(unclipped, clipped))
        entropy_row = -rowsum(jnp.where(is_logit, p * logp_all, 0.0))
        entropy_s += jnp.sum(entropy_row)
        vclip = vold + jnp.clip(value - vold, -clip_eps, clip_eps)
        e1 = value - tgt
        e2 = vclip - tgt
        value_s += 0.5 * jnp.sum(jnp.maximum(e1 * e1, e2 * e2))
        kl_s += jnp.sum((ratio - 1.0) - jnp.log(ratio))

        inside_r = ((ratio > 1.0 - clip_eps)
                    & (ratio < 1.0 + clip_eps)).astype(f32)
        dmin = jnp.where(unclipped <= clipped, adv, adv * inside_r)
        dlp = -inv_m * dmin * ratio                       # (1, C)
        dlogits = (dlp * (onehot - p)
                   + (entropy_coef * inv_m) * p * (logp_all + entropy_row))
        inside_v = ((value - vold > -clip_eps)
                    & (value - vold < clip_eps)).astype(f32)
        dvalue = (value_coef * inv_m) * jnp.where(e1 * e1 >= e2 * e2, e1,
                                                  e2 * inside_v)   # (1, C)
        # Merged upstream gradient: policy rows carry dlogits (p is 0 on the
        # value row, so the formula is exactly 0 there), row A carries dvalue.
        dheads = jnp.where(is_logit, dlogits, dvalue)     # (A+1, C)

        if quant == "full":
            # Backward: the two HEAD dots stay bf16 — they are K=A+1 (tiny
            # MXU share), and dheads mixes the large value-row entries with
            # the ~50x smaller policy-row entries, so one shared dynamic
            # scale would crush the policy gradient (measured cos 0.20 at
            # learner scale).  The heavy (H, H, C) dpre chain runs int8
            # with per-tile dynamic scales; weight-grad ACCUMULATORS stay
            # f32 (each int32 partial dot is dequantized before the add)
            # and bias grads are exact f32.
            dheads_b = dheads.astype(jnp.bfloat16)
            h_top = (hs_b[-1].astype(jnp.bfloat16)
                     * jnp.bfloat16(s_in))                # dequant tanh out
            dwpv_ref[...] += jax.lax.dot_general(
                h_top, dheads_b, c11, preferred_element_type=f32)
            dbpv_ref[...] += colsum(dheads)               # (A+1, 1)
            dh = jax.lax.dot_general(
                wpv_ref[...].astype(jnp.bfloat16), dheads_b, c10,
                preferred_element_type=f32) * _sw(L)      # (H, C)
            for l in range(L - 1, -1, -1):
                h_f = hs_b[l].astype(f32) * s_in          # dequant tanh out
                dpre = dh * _dact(h_f, activation)
                dp_q, k_dp = _dyn_q(dpre)
                below = hs_b[l - 1] if l > 0 else x_q     # int8, scale 1/127
                dw_refs[l][...] += jax.lax.dot_general(
                    below, dp_q, c11,
                    preferred_element_type=i32).astype(f32) * (k_dp * s_in)
                db_refs[l][...] += colsum(dpre)           # (H, 1)
                if l > 0:
                    dh = jax.lax.dot_general(
                        w_refs[l][...], dp_q, c10,
                        preferred_element_type=i32).astype(f32) \
                        * (_sw(l) * k_dp)
            continue

        dheads_b = dheads.astype(jnp.bfloat16)
        dwpv_ref[...] += jax.lax.dot_general(hs_b[-1], dheads_b, c11,
                                             preferred_element_type=f32)
        dbpv_ref[...] += colsum(dheads)                   # (A+1, 1)

        if bwd_bf16:
            # Optional bf16 hidden-layer gradient chain — halves the VPU
            # bytes of the backward elementwise work.  MXU accumulation is
            # ALWAYS f32 (Mosaic rejects bf16 matmul accumulators: 'Expected
            # matmul acc to be 32-bit'); the bf16 part is the dh->dpre
            # elementwise chain, entered via an explicit cast.
            bf = jnp.bfloat16
            dh_b = jax.lax.dot_general(
                wpvbf_ref[...], dheads_b, c10,
                preferred_element_type=f32).astype(bf)
            for l in range(L - 1, -1, -1):
                dpre_b = dh_b * _dact(hs_b[l], activation)
                below = hs_b[l - 1] if l > 0 else x
                dw_refs[l][...] += jax.lax.dot_general(
                    below, dpre_b, c11, preferred_element_type=f32)
                db_refs[l][...] += colsum(dpre_b.astype(f32))
                if l > 0:
                    dh_b = jax.lax.dot_general(
                        wbf_refs[l][...], dpre_b, c10,
                        preferred_element_type=f32).astype(bf)
        else:
            dh = jax.lax.dot_general(wpvbf_ref[...], dheads_b, c10,
                                     preferred_element_type=f32)   # (H, C)
            for l in range(L - 1, -1, -1):
                h_f = hs_b[l].astype(f32)
                dpre = dh * _dact(h_f, activation)
                dpre_b = dpre.astype(jnp.bfloat16)
                below = hs_b[l - 1] if l > 0 else x
                dw_refs[l][...] += jax.lax.dot_general(
                    below, dpre_b, c11, preferred_element_type=f32)
                db_refs[l][...] += colsum(dpre)           # (H, 1)
                if l > 0:
                    dh = jax.lax.dot_general(wbf_refs[l][...], dpre_b, c10,
                                             preferred_element_type=f32)

    col = jax.lax.broadcasted_iota(jnp.int32, (1, 8), 1)
    loss_ref[...] += (jnp.where(col == 0, policy_s, 0.0)
                      + jnp.where(col == 1, value_s, 0.0)
                      + jnp.where(col == 2, entropy_s, 0.0)
                      + jnp.where(col == 3, kl_s, 0.0))


def _pick_tile(n: int, want: int, floor: int = 8) -> int:
    t = want
    while t > floor and n % t != 0:
        t //= 2
    return t if n % t == 0 else n


@functools.partial(jax.jit, static_argnames=(
    "num_actions", "activation", "clip_eps", "value_coef", "entropy_coef",
    "interpret", "total_rows", "frames_per_cell", "cols_per_cell",
    "bwd_bf16", "quant"))
def fused_ppo_grads_fm(params: Dict[str, Any], obs: jnp.ndarray,
                       action: jnp.ndarray, logp_old: jnp.ndarray,
                       value_old: jnp.ndarray, adv_norm: jnp.ndarray,
                       target: jnp.ndarray, *, num_actions: int,
                       activation: str, clip_eps: float, value_coef: float,
                       entropy_coef: float, interpret: bool = False,
                       total_rows: int = 0,
                       frames_per_cell: Optional[int] = None,
                       cols_per_cell: Optional[int] = None,
                       bwd_bf16: Optional[bool] = None,
                       quant: Optional[str] = None
                       ) -> Tuple[Dict[str, Any], jnp.ndarray]:
    """Feature-major fused PPO minibatch gradient.

    Same contract as :func:`fused_ppo_grads` but the minibatch keeps its
    (T, 2B) shape: ``obs`` is (T, F, 2B) bf16 pre-normalized FEATURE-MAJOR
    (the layout the rollout's ``step_batch_learner_fm`` emits), the per-row
    arrays are (T, 2B).  Returns ``(grads, losses)`` identically.

    ``frames_per_cell``/``cols_per_cell``/``bwd_bf16``/``quant`` override
    the module-level tile/precision defaults (PIKAZOO_FM_FT / PIKAZOO_FM_C
    / PIKAZOO_FM_BWD_BF16 / PIKAZOO_FM_QUANT) per call — the probe tooling
    sweeps them.  ``quant="int8"`` runs every matmul with int8 operands on
    the MXU (2x bf16 throughput on v5e); requires ``activation="tanh"``
    (the static forward scale assumes [-1, 1] activations).
    """
    from pikazoo_tpu.train.networks import dense_layers

    names, L, w, b = dense_layers(params)
    t_mb, b2 = action.shape
    f = obs.shape[1]
    ft = _pick_tile(t_mb, frames_per_cell or _FM_FT, floor=1)
    c = _pick_tile(b2, cols_per_cell or _FM_COLS, floor=128)
    if bwd_bf16 is None:
        bwd_bf16 = _FM_BWD_BF16
    if quant is None:
        quant = _FM_QUANT
    if quant not in ("none", "int8", "int8fwd"):
        raise ValueError(f"unknown quant mode {quant!r}")
    use_q = quant != "none"
    kq = False if not use_q else ("full" if quant == "int8" else "fwd")
    if use_q and activation != "tanh":
        raise ValueError("int8 quant requires activation='tanh' (the "
                         "static forward scale assumes [-1, 1] outputs)")
    inv_m = 1.0 / (total_rows or t_mb * b2)

    obs_fm = obs.astype(jnp.bfloat16)                      # (T, F, 2B)
    sc = lambda a: a.astype(jnp.float32)
    w_b = [x.astype(jnp.bfloat16) for x in w]
    b_c = [x.astype(jnp.float32).reshape(-1, 1) for x in b]  # (F_out, 1)
    # Merged head: policy columns then the value column (kernel docstring).
    wpv = jnp.concatenate([w_b[L], w_b[L + 1]], axis=1)    # (H, A+1) bf16
    bpv = jnp.concatenate([b_c[L], b_c[L + 1]], axis=0)    # (A+1, 1) f32
    sw = None
    bf_extra = []                   # fwd-only mode: bf16 weights for the bwd
    if use_q:
        # Per-tensor symmetric int8 weights, quantized from the f32 params
        # (not their bf16 casts); dequant scales ship as one (1, 8) row.
        def _qw(t):
            t = t.astype(jnp.float32)
            s = jnp.maximum(jnp.max(jnp.abs(t)), 1e-30) / 127.0
            return jnp.round(t / s).astype(jnp.int8), s

        if L + 1 > 8:
            raise ValueError(
                f"int8 quant supports at most 7 hidden layers ({L} given): "
                "the dequant scales ship as one (1, 8) VMEM row")
        wpv_f = jnp.concatenate([w[L].astype(jnp.float32),
                                 w[L + 1].astype(jnp.float32)], axis=1)
        qs = [_qw(t) for t in [*w[:L], wpv_f]]
        if kq == "fwd":
            bf_extra = [*w_b[:L], wpv]
        w_b = [q for q, _ in qs[:L]]                       # int8 hidden w
        wpv = qs[L][0]                                     # int8 merged head
        sw = jnp.zeros((1, 8), jnp.float32)
        sw = sw.at[0, :L + 1].set(jnp.stack([s for _, s in qs]))

    obs_spec = pl.BlockSpec((ft, f, c), lambda i, j: (i, 0, j),
                            memory_space=pltpu.VMEM)
    sc_spec = pl.BlockSpec((ft, c), lambda i, j: (i, j),
                           memory_space=pltpu.VMEM)

    def whole(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, (lambda i, j: (0,) * nd),
                            memory_space=pltpu.VMEM)

    in_specs = ([obs_spec, sc_spec, sc_spec, sc_spec, sc_spec, sc_spec]
                + [whole(x.shape) for x in w_b[:L]]
                + [whole(x.shape) for x in b_c[:L]]
                + [whole(wpv.shape), whole(bpv.shape)]
                + ([whole((1, 8))] if use_q else [])
                + [whole(x.shape) for x in bf_extra])
    a1 = num_actions + 1
    out_shapes = ([jax.ShapeDtypeStruct(x.shape, jnp.float32)
                   for x in w[:L]]
                  + [jax.ShapeDtypeStruct((x.shape[0], 1), jnp.float32)
                     for x in b[:L]]
                  + [jax.ShapeDtypeStruct((w[L].shape[0], a1), jnp.float32),
                     jax.ShapeDtypeStruct((a1, 1), jnp.float32),
                     jax.ShapeDtypeStruct((1, 8), jnp.float32)])
    out_specs = [whole(s.shape) for s in out_shapes]

    kernel = functools.partial(_fm_kernel, L, num_actions, activation,
                               clip_eps, value_coef, entropy_coef, inv_m,
                               ft, bwd_bf16, kq)
    # The int8 kernel's extra temporaries (quantized copies + dequant
    # products) overflow the default 16 MB scoped-vmem budget at C=1024 by
    # ~3%; raise the per-kernel limit (v5e has 128 MB of VMEM) instead of
    # shrinking the tile — C=512 measurably regresses the matmul floor.
    extra = {}
    if use_q and not interpret:
        extra["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024)
    outs = pl.pallas_call(
        kernel,
        grid=(t_mb // ft, b2 // c),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
        **extra,
    )(obs_fm, action.astype(jnp.int32), sc(logp_old), sc(value_old),
      sc(adv_norm), sc(target), *w_b[:L], *b_c[:L], wpv, bpv,
      *([sw] if use_q else []), *bf_extra)

    # Split the merged-head grads back to the params layout expected by
    # _pack_grads: dwpv (H, A+1) -> dwp | dwv, dbpv (A+1, 1) -> dbp | dbv.
    dwpv, dbpv, sums_out = outs[2 * L], outs[2 * L + 1], outs[2 * L + 2]
    outs = (list(outs[:2 * L])
            + [dwpv[:, :num_actions], dbpv[:num_actions],
               dwpv[:, num_actions:], dbpv[num_actions:], sums_out])

    grads, sums = _pack_grads(names, L, outs)

    policy_loss = sums[0, 0] * inv_m
    value_loss = sums[0, 1] * inv_m
    entropy = sums[0, 2] * inv_m
    approx_kl = sums[0, 3] * inv_m
    total = policy_loss + value_coef * value_loss - entropy_coef * entropy
    losses = jnp.stack([total, policy_loss, value_loss, entropy, approx_kl])
    return grads, losses


@functools.partial(jax.jit, static_argnames=(
    "num_actions", "activation", "clip_eps", "value_coef", "entropy_coef",
    "interpret", "total_rows"))
def fused_ppo_grads(params: Dict[str, Any], obs: jnp.ndarray,
                    action: jnp.ndarray, logp_old: jnp.ndarray,
                    value_old: jnp.ndarray, adv_norm: jnp.ndarray,
                    target: jnp.ndarray, *, num_actions: int,
                    activation: str, clip_eps: float, value_coef: float,
                    entropy_coef: float, interpret: bool = False,
                    total_rows: int = 0
                    ) -> Tuple[Dict[str, Any], jnp.ndarray]:
    """Fused PPO minibatch gradient.

    Args: ``params`` — flax ActorCritic variables (``{'params': {'Dense_0':
    ...}}``, L hidden layers then policy/value heads); ``obs`` — (M, F)
    bf16 pre-normalized; 1-D per-row arrays of shape (M,); ``adv_norm``
    must already be minibatch-normalized (the caller owns mean/std, matching
    ``loss_fn``).  ``total_rows``: global minibatch size when called on a
    SHARD inside ``shard_map`` (0 = single-device, use ``obs.shape[0]``);
    with it set, grads/losses come out scaled for a plain ``psum`` across
    the mesh.

    Returns ``(grads, losses)`` with ``grads`` matching the params pytree
    and ``losses = [total, policy, value, entropy, approx_kl]`` (means).
    """
    from pikazoo_tpu.train.networks import dense_layers

    names, L, w, b = dense_layers(params)
    m_rows = obs.shape[0]
    r = _pick_rows(m_rows)
    g = m_rows // r
    f = obs.shape[1]
    inv_m = 1.0 / (total_rows or m_rows)

    obs_t = obs.astype(jnp.bfloat16).reshape(g, r, f)
    act_t = action.astype(jnp.int32).reshape(g, r, 1)
    row = lambda a: a.astype(jnp.float32).reshape(g, r, 1)
    w_b = [x.astype(jnp.bfloat16) for x in w]
    b_f = [x.astype(jnp.float32).reshape(1, -1) for x in b]

    def tile3(_: int):
        return pl.BlockSpec((1, r, f), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    def tile2():
        return pl.BlockSpec((1, r, 1), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    def whole(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, (lambda i: (0,) * nd),
                            memory_space=pltpu.VMEM)

    in_specs = ([tile3(0), tile2(), tile2(), tile2(), tile2(), tile2()]
                + [whole(x.shape) for x in w_b[:L]]
                + [whole(x.shape) for x in b_f[:L]]
                + [whole(w_b[L].shape), whole(b_f[L].shape),
                   whole(w_b[L + 1].shape), whole(b_f[L + 1].shape)])
    out_shapes = ([jax.ShapeDtypeStruct(x.shape, jnp.float32)
                   for x in w[:L]]
                  + [jax.ShapeDtypeStruct((1, x.shape[0]), jnp.float32)
                     for x in b[:L]]
                  + [jax.ShapeDtypeStruct(w[L].shape, jnp.float32),
                     jax.ShapeDtypeStruct((1, b[L].shape[0]), jnp.float32),
                     jax.ShapeDtypeStruct(w[L + 1].shape, jnp.float32),
                     jax.ShapeDtypeStruct((1, 1), jnp.float32),
                     jax.ShapeDtypeStruct((1, 8), jnp.float32)])
    out_specs = [whole(s.shape) for s in out_shapes]

    kernel = functools.partial(_kernel, L, num_actions, activation,
                               clip_eps, value_coef, entropy_coef, inv_m)
    outs = pl.pallas_call(
        kernel,
        grid=(g,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(obs_t, act_t, row(logp_old), row(value_old), row(adv_norm),
      row(target), *w_b[:L], *b_f[:L], w_b[L], b_f[L], w_b[L + 1],
      b_f[L + 1])

    grads, sums = _pack_grads(names, L, outs)

    policy_loss = sums[0, 0] * inv_m
    value_loss = sums[0, 1] * inv_m
    entropy = sums[0, 2] * inv_m
    approx_kl = sums[0, 3] * inv_m
    total = policy_loss + value_coef * value_loss - entropy_coef * entropy
    losses = jnp.stack([total, policy_loss, value_loss, entropy, approx_kl])
    return grads, losses
