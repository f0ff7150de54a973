"""Settle the fused-kernel throughput: prove iterations ran, verify bitwise
at benchmark scale, then time cleanly."""
import sys, time
import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
import numpy as np
from pikazoo_tpu.envs import EnvConfig, PikaZoo
from pikazoo_tpu.core.fused_step import fused_rollout, fused_actions

cfg = EnvConfig(auto_reset=True)
env = PikaZoo(cfg)
B, T = 65536, 1000
state, _ = env.reset_batch(jax.random.key(0), B)
akey = jax.random.key(1)

out = fused_rollout(state, akey, cfg, T)
jax.block_until_ready(out.scores)
sc = np.asarray(out.step_count)
print(f"step_count after one T={T} call: min={sc.min()} max={sc.max()} (expect {T})", flush=True)

# Bitwise check at benchmark scale vs the scanned env.
actions = fused_actions(akey, B, T)
def body(carry, a):
    st, = carry
    st, _ts = env.step_batch(st, a)
    return (st,), None
scan_fn = jax.jit(lambda s, a: jax.lax.scan(body, (s,), a))
(scanned,), _ = scan_fn(state, actions)
jax.block_until_ready(scanned.scores)
ok = True
for f in scanned._fields:
    a, b = np.asarray(getattr(scanned, f)), np.asarray(getattr(out, f))
    if a.dtype == np.uint32: a, b = a.view(np.int32), b.view(np.int32)
    if not np.array_equal(a, b):
        ok = False
        print(f"MISMATCH {f}: {(np.asarray(a)!=np.asarray(b)).sum()}", flush=True)
print("benchmark-scale bitwise:", "EXACT" if ok else "FAILED", flush=True)

# Clean timing: single calls, blocked individually.
times = []
o = out
for i in range(6):
    jax.block_until_ready(o.scores)
    t0 = time.perf_counter()
    o = fused_rollout(o, akey, cfg, T)
    jax.block_until_ready(o.scores)
    times.append(time.perf_counter() - t0)
med = sorted(times)[len(times)//2]
print(f"fused per-call (T={T}, B={B}): median {med*1e3:.2f} ms -> {B*T/med/1e6:.0f}M steps/s", flush=True)
print("per-call times:", [f"{t*1e3:.2f}" for t in times], flush=True)

# step_count advanced through all calls (proves every call really ran).
sc = np.asarray(o.step_count)
print(f"final step_count: {sc.min()}..{sc.max()} (expect {7*T})", flush=True)

# And the scanned baseline timing for the same shape:
t0 = time.perf_counter()
(s2,), _ = scan_fn(state, actions)
jax.block_until_ready(s2.scores)
print(f"scanned per-call: {(time.perf_counter()-t0)*1e3:.1f} ms -> {B*T/(time.perf_counter()-t0)/1e6:.0f}M steps/s", flush=True)
