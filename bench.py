#!/usr/bin/env python
"""Benchmark: aggregate env-steps/s of the batched self-play env on TPU.

Measures BASELINE config 4 (vectorized self-play with auto-reset, random
18-way actions sampled on-device each frame) as a scanned, jitted rollout on
the default backend (the real TPU chip under the driver).  Prints ONE JSON
line: ``{"metric", "value", "unit", "vs_baseline"}`` where ``vs_baseline`` is
the multiple of the reference implementation's measured single-env CPU
throughput on this host (53,237 steps/s — see BASELINE.md).

Robustness: this host's remote-TPU tunnel can wedge (a hung compile blocks
every program for ~45 min; recovery is automatic).  The default entry point
therefore orchestrates the actual measurement in killable subprocesses,
falling back from large to small configurations, and emits a zero measurement
rather than hanging if the device never cooperates.

Flags: ``--batch N`` ``--steps T`` ``--iters K`` (direct single measurement),
``--computer`` (rule-AI path), ``--ppo`` (full actor-learner train step).
"""

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REFERENCE_CPU_STEPS_PER_S = 53_237.0  # measured: reference env, batch=1, this host
REFERENCE_CPU_STEPS_PER_S_AI = 19_742.0

# (batch, steps) ladder for the orchestrated default run — SMALL FIRST: a
# quick cheap rung locks in a valid measurement before the bigger compiles
# (killing a child mid-compile appears to be what wedges the terminal, so
# never risk a big rung without a number already in hand).
_LADDER = [(16_384, 200), (65_536, 500), (262_144, 1000)]
_ATTEMPT_TIMEOUT_S = 480
_HEALTH_WAIT_S = 420


def _await_device_health(max_wait_s: float = _HEALTH_WAIT_S) -> bool:
    deadline = time.monotonic() + max_wait_s
    probe = "import jax, jax.numpy as jnp; print(int(jnp.arange(4).sum()))"
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


def measure_env(batch: int, steps: int, iters: int, computer: bool) -> float:
    import jax
    import jax.numpy as jnp

    from pikazoo_tpu.envs import EnvConfig, PikaZoo

    env = PikaZoo(EnvConfig(auto_reset=True,
                            is_player1_computer=computer,
                            is_player2_computer=computer))
    state, _ = env.reset_batch(jax.random.key(0), batch)

    def body(carry, _):
        st, key = carry
        key, sub = jax.random.split(key)
        acts = jax.random.randint(sub, (batch, 2), 0, 18, jnp.int32)
        st, _ts = env.step_batch(st, acts)
        return (st, key), None

    @jax.jit
    def rollout(state, key):
        (state, key), _ = jax.lax.scan(body, (state, key), None, length=steps)
        return state, key

    state, key = rollout(state, jax.random.key(1))  # compile, not timed
    jax.block_until_ready(state)
    t0 = time.perf_counter()
    for _ in range(iters):
        state, key = rollout(state, key)
    jax.block_until_ready(state)
    return batch * steps * iters / (time.perf_counter() - t0)


def measure_ppo(batch: int, iters: int) -> float:
    import jax

    from pikazoo_tpu.envs import EnvConfig, PikaZoo
    from pikazoo_tpu.parallel import env_sharding, make_env_mesh, shard_batch
    from pikazoo_tpu.train import PPOConfig, make_ppo_trainer

    cfg = PPOConfig(num_envs=min(batch, 65_536), rollout_length=128)
    mesh = make_env_mesh()
    env = PikaZoo(EnvConfig(auto_reset=True))
    init_fn, train_step, _ = make_ppo_trainer(env, cfg, mesh=mesh)
    runner = init_fn(jax.random.key(0))
    runner = runner._replace(
        env_state=shard_batch(runner.env_state, mesh),
        last_obs=jax.device_put(runner.last_obs, env_sharding(mesh)))
    step = jax.jit(train_step, donate_argnums=0)

    runner, metrics = step(runner)  # compile
    jax.block_until_ready(metrics.total_loss)
    t0 = time.perf_counter()
    for _ in range(iters):
        runner, metrics = step(runner)
    jax.block_until_ready(metrics.total_loss)
    return cfg.num_envs * cfg.rollout_length * iters / (time.perf_counter() - t0)


def _emit(metric: str, steps_per_s: float, baseline: float) -> None:
    print(json.dumps({
        "metric": metric,
        "value": round(steps_per_s),
        "unit": "env-steps/s",
        "vs_baseline": round(steps_per_s / baseline, 2),
    }))


def _run_direct(args) -> None:
    if args.ppo:
        _emit("ppo_env_steps_per_s_full_train_step_1chip",
              measure_ppo(args.batch, args.iters), REFERENCE_CPU_STEPS_PER_S)
    else:
        baseline = (REFERENCE_CPU_STEPS_PER_S_AI if args.computer
                    else REFERENCE_CPU_STEPS_PER_S)
        metric = "env_steps_per_s_aggregate_1chip" + \
            ("_computer_ai" if args.computer else "")
        _emit(metric, measure_env(args.batch, args.steps, args.iters,
                                  args.computer), baseline)


def _ladder_pass(args):
    """One walk of the ladder small -> large in killable children; returns
    the best completed measurement (or None), stopping at the first hang."""
    best = None
    for batch, steps in _LADDER:
        if not _await_device_health():
            break
        cmd = [sys.executable, os.path.abspath(__file__), "--_direct",
               "--batch", str(batch), "--steps", str(steps),
               "--iters", str(args.iters)]
        if args.computer:
            cmd.append("--computer")
        if args.ppo:
            cmd.append("--ppo")
        try:
            out = subprocess.run(cmd, timeout=_ATTEMPT_TIMEOUT_S,
                                 capture_output=True, text=True)
        except subprocess.TimeoutExpired:
            break  # hung compile — keep whatever we already measured
        result = None
        for line in out.stdout.splitlines():
            if line.startswith("{"):
                result = json.loads(line)
        if result is None:
            break
        if best is None or result["value"] > best["value"]:
            best = result
    return best


def _orchestrate(args) -> None:
    best = _ladder_pass(args)
    if best is None:
        # A wedged tunnel typically recovers in ~30-45 min; one cool-down and
        # retry gives the measurement a second chance within a bounded run.
        time.sleep(600)
        best = _ladder_pass(args)
    if best is not None:
        print(json.dumps(best))
    else:
        _emit("env_steps_per_s_aggregate_1chip", 0.0, REFERENCE_CPU_STEPS_PER_S)


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
    parser.add_argument("--_direct", action="store_true",
                        help="internal: run one measurement in-process")
    args = parser.parse_args()
    if args._direct:
        _run_direct(args)
    else:
        _orchestrate(args)


if __name__ == "__main__":
    main()
