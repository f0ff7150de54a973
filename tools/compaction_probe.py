"""Measure the live-lane compaction lever for the landing sims (round 5).

The round-3/4 audits (docs/landing_sim_audit.md) left ONE lever open for
BASELINE config 2: the landing kernel's cost is sum-over-blocks(block-max
iterations) x ~40ns, and reaching sum-of-iterations cost needs live-lane
compaction.  In-kernel DMA bucketing needs cross-lane data movement Mosaic
does not expose cheaply; this probe measures the XLA-side alternative:

  **ETA-sort**: before the kernel, sort the lanes by a closed-form
  time-to-ground estimate (the free-flight parabola root — wall bounces do
  not change y-dynamics, so the estimate is exact for most lanes).  Lanes
  with similar iteration counts then share grid blocks, so block-max ~=
  block-mean and the while-kernel's masked-tail waste collapses — without
  any in-kernel data movement.  A pure permutation: bit-exact trivially.

Variants (all chained min-of-N, host-transfer sync, one process):

  A  production kernel (landing_sims_batched, env-layout (6, rows, 128))
  B  flat-lane kernels, natural order (true B lanes + candidate 6B lanes;
     block-max taken over 1024 flat lanes instead of 6144)
  C  flat-lane kernels, ETA-sorted end-to-end (key + sort + kernel + unsort)
  D  C without the sort cost (kernel on pre-sorted lanes) — the ceiling

STAGE=prim measures the sort/gather/scatter primitives alone (the costs
that killed earlier designs); STAGE=kern runs A-D on live self-play states.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("PROBE_CPU") == "1":
    jax.config.update("jax_platforms", "cpu")

import functools

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from _bench_util import sync  # noqa: E402

from pikazoo_tpu.core import constants as C  # noqa: E402
from pikazoo_tpu.core.predict import _sim_loop  # noqa: E402
from pikazoo_tpu.core.predict_pallas import landing_sims_batched  # noqa: E402
from pikazoo_tpu.envs import EnvConfig, PikaZoo  # noqa: E402

B = int(os.environ.get("PROBE_B", 65536))
T = int(os.environ.get("PROBE_T", 64))       # kernel calls per dispatch
ITERS = int(os.environ.get("ITERS", 5))
STAGE = os.environ.get("STAGE", "kern")
ROLL_T = int(os.environ.get("ROLL_T", 512))  # warmup frames for live states

f32 = jnp.float32


def timed(label, fn, carry):
    t0 = time.perf_counter()
    out = fn(carry)
    sync(out)
    print(f"  {label}: compile+first {time.perf_counter() - t0:.1f}s",
          flush=True)
    best = float("inf")
    for _ in range(ITERS):
        t0 = time.perf_counter()
        out = fn(out)
        sync(out)
        best = min(best, time.perf_counter() - t0)
    return best, out


# ---------------------------------------------------------------- lanes --
def candidate_lanes(x, y, vx, vy):
    """(B,) ball state -> flat (6B,) candidate-lane initial states, lane
    k of env b at index k*B + b (canonical order A)."""
    lane = jnp.arange(6, dtype=jnp.int32)[:, None]
    speed = (jnp.int32(lane < 3) + 1) * 10
    cvx = jnp.where(x[None, :] < C.GROUND_HALF_WIDTH, speed, -speed)
    cvy = jnp.abs(vy)[None, :] * ((lane % 3) - 1) * 2
    cx = jnp.broadcast_to(x, (6, B))
    cy = jnp.broadcast_to(y, (6, B))
    return (cx.reshape(-1), cy.reshape(-1), cvx.reshape(-1), cvy.reshape(-1))


# (The end-to-end in-graph sorted variant — eta key + lax.sort + kernel +
# scatter unsort — is NOT raced as its own variant: its cost is exactly
# D's kernel time plus the primitive costs STAGE=prim measures directly,
# and those primitives alone exceed the whole frame budget.)


# ------------------------------------------------------------ flat kernel --
def _flat_kernel(unroll, full_rule, x_ref, y_ref, vx_ref, vy_ref, out_ref):
    out_ref[:] = _sim_loop(x_ref[:], y_ref[:], vx_ref[:], vy_ref[:],
                           full_rule=full_rule, unroll=unroll)


@functools.partial(jax.jit, static_argnames=("full_rule", "rows", "unroll"))
def flat_sims(x, y, vx, vy, full_rule, rows=8, unroll=32):
    n = x.shape[0]
    block = rows * 128
    padded = (n + block - 1) // block * block

    def prep(a):
        # Pad with vx == 0 lanes: 0 iterations, a dead tail block exits at
        # the first cond.
        return jnp.pad(a, (0, padded - n)).reshape(-1, 128)

    out = pl.pallas_call(
        functools.partial(_flat_kernel, unroll, full_rule),
        grid=(padded // block,),
        in_specs=[pl.BlockSpec((rows, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)] * 4,
        out_specs=pl.BlockSpec((rows, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((padded // 128, 128), jnp.int32),
    )(prep(x), prep(y), prep(vx), prep(vy))
    return out.reshape(-1)[:n]


def sims_flat_natural(x, y, vx, vy):
    expected = flat_sims(x, y, vx, vy, full_rule=True)
    cx, cy, cvx, cvy = candidate_lanes(x, y, vx, vy)
    cand = flat_sims(cx, cy, cvx, cvy, full_rule=False)
    return expected, jnp.moveaxis(cand.reshape(6, B), 0, 1)


# -------------------------------------------------------------- live state --
def live_ball(seed=0):
    print(f"collecting live ball states: B={B}, {ROLL_T} AI frames...",
          flush=True)
    env = PikaZoo(EnvConfig(auto_reset=True, is_player1_computer=True,
                            is_player2_computer=True))
    state, _ = env.reset_batch(jax.random.key(seed), B)
    acts = jnp.zeros((B, 2), jnp.int32)

    @jax.jit
    def roll(st):
        return jax.lax.scan(lambda s, _: (env.step_batch(s, acts)[0], None),
                            st, None, length=ROLL_T)[0]

    state = roll(state)
    sync(state)
    b = state.ball
    return (np.asarray(b.x), np.asarray(b.y),
            np.asarray(b.x_velocity), np.asarray(b.y_velocity))


# ------------------------------------------------------------------ stages --
if STAGE == "prim":
    for n in (B, 6 * B):
        key0 = jax.random.normal(jax.random.key(0), (n,), f32)
        vals = [jax.random.randint(jax.random.key(i), (n,), 0, 400,
                                   jnp.int32) for i in range(1, 5)]
        # A real (non-identity) permutation: XLA can elide an iota gather.
        idx = jnp.asarray(np.random.default_rng(0).permutation(n)
                          .astype(np.int32))

        @jax.jit
        def sort6(key, a, b, c, d):
            return jax.lax.sort((key, a, b, c, d,
                                 jnp.arange(key.shape[0], dtype=jnp.int32)),
                                num_keys=1)

        @jax.jit
        def argsort_take(key, a, b, c, d):
            perm = jnp.argsort(key)
            return tuple(v[perm] for v in (a, b, c, d)) + (perm,)

        @jax.jit
        def scatter1(perm, a):
            return jnp.zeros_like(a).at[perm].set(
                a, unique_indices=True, mode="promise_in_bounds")

        @jax.jit
        def take1(perm, a):
            # Applying an already-known permutation to ONE field — the
            # irreducible cost floor of ANY reordering scheme, even one
            # whose ordering itself is free.
            return a[perm]

        def loop(fn, arity):
            @jax.jit
            def run(carry):
                key, a = carry
                def body(c, _):
                    k, x = c
                    if arity == 6:
                        out = fn(k, x, *vals[1:])
                        k = k + out[1].astype(f32) * 1e-6
                        x = out[1]
                    else:
                        x = fn(idx, x)
                        k = k + x.astype(f32) * 1e-6
                    return (k, x), None
                return jax.lax.scan(body, carry, None, length=T)[0]
            return run

        for label, fn, arity in (("lax.sort 1key+5payload", sort6, 6),
                                 ("argsort+4x take", argsort_take, 6),
                                 ("scatter 1 field", scatter1, 2),
                                 ("take 1 field", take1, 2)):
            dt, _ = timed(f"n={n:7d} {label}", loop(fn, arity),
                          (key0, vals[0]))
            print(f"n={n:7d} {label:24s} {dt / T * 1e6:8.1f} us/call",
                  flush=True)
    sys.exit(0)

ball = live_ball()
ball_j = tuple(jnp.asarray(a) for a in ball)

# Flat lane arrays (host): true lanes (B,) and candidate lanes (6B,).
x, y, vx, vy = ball
cx, cy, cvx, cvy = (np.asarray(a) for a in candidate_lanes(*ball_j))


def eta_np(y_, vx_, vy_):
    disc = np.maximum(vy_.astype(np.float32) ** 2
                      + 2.0 * (253.0 - y_.astype(np.float32)), 0.0)
    k = -vy_.astype(np.float32) + np.sqrt(disc)
    return np.where(vx_ == 0, np.float32(-1.0), k)


perm_t = np.argsort(eta_np(y, vx, vy), kind="stable")
perm_c = np.argsort(eta_np(cy, cvx, cvy), kind="stable")
true_nat = tuple(jnp.asarray(a) for a in (x, y, vx, vy))
cand_nat = tuple(jnp.asarray(a) for a in (cx, cy, cvx, cvy))
true_srt = tuple(jnp.asarray(a[perm_t]) for a in (x, y, vx, vy))
cand_srt = tuple(jnp.asarray(a[perm_c]) for a in (cx, cy, cvx, cvy))


def chain_flat(full_rule):
    """T chained flat-kernel calls; the x +-1 perturbation leaves y/vy (the
    ETA key) untouched, so pre-sorted inputs STAY sorted through the chain."""
    @jax.jit
    def run(lanes):
        def body(carry, _):
            lx, ly, lvx, lvy = carry
            res = flat_sims(lx, ly, lvx, lvy, full_rule=full_rule)
            lx = jnp.clip(lx + (res & 1), 20, 412)
            return (lx, ly, lvx, lvy), None
        return jax.lax.scan(body, lanes, None, length=T)[0]
    return run


def chain_prod():
    @jax.jit
    def run(b):
        def body(carry, _):
            bx, by, bvx, bvy = carry
            expected, cands = landing_sims_batched(bx, by, bvx, bvy)
            bx = jnp.clip(bx + (expected & 1), 20, 412)
            return (bx, by, bvx, bvy), None
        return jax.lax.scan(body, b, None, length=T)[0]
    return run


# Variant E: keep the production env-layout kernel (with its 6-way
# cross-tile ILP) but PRE-SORT THE ENVS by their worst-lane ETA — measures
# what a free env-granularity ordering would buy without the flat layout.
env_key = np.maximum(eta_np(y, vx, vy),
                     eta_np(cy, cvx, cvy).reshape(6, B).max(axis=0))
perm_e = np.argsort(env_key, kind="stable")
ball_esrt = tuple(jnp.asarray(a[perm_e]) for a in (x, y, vx, vy))

only = os.environ.get("ONLY", "ABDE")

# Correctness: flat kernels bit-equal to the production kernel.
exp_a, cand_a = jax.jit(landing_sims_batched)(*ball_j)
exp_b, cand_b = jax.jit(sims_flat_natural)(*ball_j)
assert (np.asarray(exp_a) == np.asarray(exp_b)).all(), "expected mismatch"
assert (np.asarray(cand_a) == np.asarray(cand_b)).all(), "cand mismatch"
print(f"  flat kernels bit-equal to production on {B} live states",
      flush=True)
# Sorted inputs: same results permuted.
res_srt = np.asarray(jax.jit(
    lambda a, b, c, d: flat_sims(a, b, c, d, full_rule=False))(*cand_srt))
assert (res_srt == np.asarray(cand_a).T.reshape(-1)[perm_c]).all(), \
    "sorted candidate results mismatch"
print("  eta-sorted kernel results match (permutation only)", flush=True)

results = {}
runs = [
    ("A production (true+cand)", None),
    ("B.t flat true natural", (chain_flat(True), true_nat)),
    ("B.c flat cand natural", (chain_flat(False), cand_nat)),
    ("D.t flat true SORTED", (chain_flat(True), true_srt)),
    ("D.c flat cand SORTED", (chain_flat(False), cand_srt)),
    ("E production env-SORTED", (chain_prod(), ball_esrt)),
]
for name, spec in runs:
    if name[0] not in only:
        continue
    if spec is None:
        dt, _ = timed(name, chain_prod(), ball_j)
    else:
        dt, _ = timed(name, *spec)
    results[name] = dt / T * 1e6
    print(f"{name:28s} {dt / T * 1e6:8.1f} us/call  (min of {ITERS}, "
          f"T={T} chained)", flush=True)

if "B.t flat true natural" in results and "B.c flat cand natural" in results:
    print(f"B total {results['B.t flat true natural'] + results['B.c flat cand natural']:.1f} us "
          f"vs A {results.get('A production (true+cand)', float('nan')):.1f} us",
          flush=True)
if "D.t flat true SORTED" in results and "D.c flat cand SORTED" in results:
    print(f"D total (free-sort ceiling) "
          f"{results['D.t flat true SORTED'] + results['D.c flat cand SORTED']:.1f} us",
          flush=True)
print({k: round(v, 1) for k, v in results.items()}, flush=True)
