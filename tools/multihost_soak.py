"""Sustained multi-process PPO soak over real ``jax.distributed``.

The single-step multihost tests prove the shard_map train step compiles and
agrees bit-for-bit across processes; this soak proves the distributed
runtime HOLDS UP over many updates: N processes (1 virtual CPU device each)
run UPDATES sharded train steps back to back, assert finite losses
throughout and the same replicated loss on every process at checkpoints,
and record the run to ``artifacts/multihost_soak.json``.

Usage:
    python tools/multihost_soak.py [--procs 2] [--updates 200]
    python tools/multihost_soak.py --_child <pid> <nproc> <port> ...
"""
import argparse
import json
import os
import socket
import subprocess
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def child(pid: int, nproc: int, port: int, updates: int,
          envs_per_proc: int) -> None:
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=1")
    sys.path.insert(0, _REPO)
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                               num_processes=nproc, process_id=pid)
    import numpy as np

    from pikazoo_tpu.envs import EnvConfig, PikaZoo
    from pikazoo_tpu.parallel import env_sharding, make_env_mesh
    from pikazoo_tpu.train import PPOConfig, make_ppo_trainer

    mesh = make_env_mesh(jax.devices())
    cfg = PPOConfig(num_envs=envs_per_proc * nproc, rollout_length=32,
                    num_minibatches=2, update_epochs=2, hidden=(64, 64))
    env = PikaZoo(EnvConfig(auto_reset=True))
    init_fn, train_step, _ = make_ppo_trainer(env, cfg, mesh=mesh)
    runner = init_fn(jax.random.key(0))
    sharding = env_sharding(mesh)

    def to_global(x):
        return jax.make_array_from_callback(
            x.shape, sharding, lambda idx: np.asarray(x)[idx])

    runner = runner._replace(
        env_state=jax.tree.map(to_global, runner.env_state),
        last_obs=to_global(runner.last_obs))
    step = jax.jit(train_step, donate_argnums=0)

    t0 = time.perf_counter()
    losses = []
    for u in range(updates):
        runner, metrics = step(runner)
        if (u + 1) % max(1, updates // 10) == 0 or u == updates - 1:
            loss = float(metrics.total_loss)  # host sync + replication probe
            assert np.isfinite(loss), f"non-finite loss at update {u}"
            losses.append((u + 1, loss))
    dt = time.perf_counter() - t0
    if pid == 0:
        print(json.dumps({
            "procs": nproc, "updates": updates,
            "num_envs": cfg.num_envs, "rollout_length": cfg.rollout_length,
            "env_steps": updates * cfg.num_envs * cfg.rollout_length,
            "wall_s": round(dt, 1),
            "env_steps_per_s": round(updates * cfg.num_envs
                                     * cfg.rollout_length / dt),
            "loss_checkpoints": [[u, round(v, 8)] for u, v in losses],
        }), flush=True)
    else:
        # Every process prints its checkpoint losses; the parent asserts
        # bit-identity across processes.
        print("LOSSES " + json.dumps([[u, round(v, 8)] for u, v in losses]),
              flush=True)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--procs", type=int, default=2)
    p.add_argument("--updates", type=int, default=200)
    p.add_argument("--envs-per-proc", type=int, default=256)
    p.add_argument("--timeout", type=int, default=1800)
    p.add_argument("--out", default=os.path.join(_REPO, "artifacts",
                                                 "multihost_soak.json"))
    p.add_argument("--_child", nargs=3, type=int, metavar="X")
    args = p.parse_args()
    if args._child:
        child(*args._child, args.updates, args.envs_per_proc)
        return
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    procs = [subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--_child", str(pid),
         str(args.procs), str(port), "--updates", str(args.updates),
         "--envs-per-proc", str(args.envs_per_proc)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for pid in range(args.procs)]
    outs = []
    try:
        for proc in procs:
            out, _ = proc.communicate(timeout=args.timeout)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for proc in procs:
            if proc.poll() is None:
                proc.kill()
                proc.communicate()
        raise SystemExit("soak timed out")
    for pid, (proc, out) in enumerate(zip(procs, outs)):
        if proc.returncode != 0:
            raise SystemExit(f"process {pid} failed:\n{out[-3000:]}")
    record = None
    loss_sets = []
    for out in outs:
        for line in out.splitlines():
            if line.startswith("{"):
                record = json.loads(line)
                loss_sets.append(record["loss_checkpoints"])
            elif line.startswith("LOSSES "):
                loss_sets.append(json.loads(line[7:]))
    assert record is not None, "no record from process 0"
    assert all(ls == loss_sets[0] for ls in loss_sets), \
        "replicated losses diverged across processes"
    record["date"] = time.strftime("%Y-%m-%d")
    record["loss_identical_across_processes"] = True
    record["harness"] = ("tools/multihost_soak.py — real jax.distributed, "
                         "1 CPU device/process, shard_map rollout+update")
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(record, f, indent=1)
    print(json.dumps(record), flush=True)
    print(f"wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
