#!/usr/bin/env python
"""Benchmark: aggregate env-steps/s of the batched self-play env on TPU.

Measures BASELINE config 4 (vectorized self-play with auto-reset, random
18-way actions sampled on-device each frame) as a scanned, jitted rollout on
the default backend (the real TPU chip under the driver).  Prints ONE JSON
line: ``{"metric", "value", "unit", "vs_baseline"}`` where ``vs_baseline`` is
the multiple of the reference implementation's measured single-env CPU
throughput on this host (53,237 steps/s — see BASELINE.md).

Flags: ``--batch N`` (default 262144), ``--steps T`` (default 1000),
``--iters K`` (default 3), ``--computer`` (bench the rule-AI path instead).
"""

import argparse
import json
import sys
import time

import os
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REFERENCE_CPU_STEPS_PER_S = 53_237.0  # measured: reference env, batch=1, this host
REFERENCE_CPU_STEPS_PER_S_AI = 19_742.0


def _await_device_health(max_wait_s: float = 600.0) -> bool:
    """The remote-TPU tunnel on this host can wedge (hung compiles block every
    program, recovery is automatic after ~45 min).  Probe with short-lived
    subprocesses so a wedged device can't hang the bench itself."""
    import subprocess
    deadline = time.monotonic() + max_wait_s
    probe = ("import jax, jax.numpy as jnp;"
             "print(int(jnp.arange(4).sum()))")
    while True:
        try:
            out = subprocess.run([sys.executable, "-c", probe], timeout=60,
                                 capture_output=True)
            if out.returncode == 0 and b"6" in out.stdout:
                return True
        except subprocess.TimeoutExpired:
            pass
        if time.monotonic() > deadline:
            return False
        time.sleep(30)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=262_144)
    parser.add_argument("--steps", type=int, default=1000)
    parser.add_argument("--iters", type=int, default=3)
    parser.add_argument("--computer", action="store_true",
                        help="bench computer-AI self-play (config 2 path)")
    parser.add_argument("--ppo", action="store_true",
                        help="bench the full PPO actor-learner train step "
                             "(config 5 single-host path)")
    args = parser.parse_args()

    if not _await_device_health():
        # Device never became healthy; report a failed (zero) measurement
        # rather than hanging the driver.
        print(json.dumps({
            "metric": "env_steps_per_s_aggregate_1chip",
            "value": 0, "unit": "env-steps/s", "vs_baseline": 0.0,
        }))
        return

    import jax
    import jax.numpy as jnp

    from pikazoo_tpu.envs import EnvConfig, PikaZoo

    if args.ppo:
        return bench_ppo(args)

    env = PikaZoo(EnvConfig(auto_reset=True,
                            is_player1_computer=args.computer,
                            is_player2_computer=args.computer))
    B, T = args.batch, args.steps
    state, _ = env.reset_batch(jax.random.key(0), B)

    def body(carry, _):
        st, key = carry
        key, sub = jax.random.split(key)
        acts = jax.random.randint(sub, (B, 2), 0, 18, jnp.int32)
        st, _ts = env.step_batch(st, acts)
        return (st, key), None

    @jax.jit
    def rollout(state, key):
        (state, key), _ = jax.lax.scan(body, (state, key), None, length=T)
        return state, key

    # Warm-up (compile) — not timed.
    state, key = rollout(state, jax.random.key(1))
    jax.block_until_ready(state)

    t0 = time.perf_counter()
    for _ in range(args.iters):
        state, key = rollout(state, key)
    jax.block_until_ready(state)
    elapsed = time.perf_counter() - t0

    steps_per_s = B * T * args.iters / elapsed
    baseline = (REFERENCE_CPU_STEPS_PER_S_AI if args.computer
                else REFERENCE_CPU_STEPS_PER_S)
    print(json.dumps({
        "metric": "env_steps_per_s_aggregate_1chip"
                  + ("_computer_ai" if args.computer else ""),
        "value": round(steps_per_s),
        "unit": "env-steps/s",
        "vs_baseline": round(steps_per_s / baseline, 2),
    }))


def bench_ppo(args):
    """Full self-play actor-learner: rollout + GAE + clipped epochs, one jit,
    on the device mesh.  env-steps/s counts environment frames collected."""
    import jax

    from pikazoo_tpu.envs import EnvConfig, PikaZoo
    from pikazoo_tpu.parallel import env_sharding, make_env_mesh, shard_batch
    from pikazoo_tpu.train import PPOConfig, make_ppo_trainer

    num_envs = min(args.batch, 65_536)
    cfg = PPOConfig(num_envs=num_envs, rollout_length=128)
    mesh = make_env_mesh()
    env = PikaZoo(EnvConfig(auto_reset=True))
    init_fn, train_step, _ = make_ppo_trainer(env, cfg, mesh=mesh)
    runner = init_fn(jax.random.key(0))
    runner = runner._replace(
        env_state=shard_batch(runner.env_state, mesh),
        last_obs=jax.device_put(runner.last_obs, env_sharding(mesh)))
    step = jax.jit(train_step)

    runner, metrics = step(runner)  # compile
    jax.block_until_ready(metrics.total_loss)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        runner, metrics = step(runner)
    jax.block_until_ready(metrics.total_loss)
    elapsed = time.perf_counter() - t0

    steps_per_s = cfg.num_envs * cfg.rollout_length * args.iters / elapsed
    print(json.dumps({
        "metric": "ppo_env_steps_per_s_full_train_step_1chip",
        "value": round(steps_per_s),
        "unit": "env-steps/s",
        "vs_baseline": round(steps_per_s / REFERENCE_CPU_STEPS_PER_S, 2),
    }))


if __name__ == "__main__":
    main()
