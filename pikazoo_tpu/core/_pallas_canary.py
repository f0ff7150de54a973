"""Compile canary for the embedded Mosaic landing kernel.

A round-2-era remote-compile service hung ~45 min on any XLA program
embedding ``core.predict_pallas.landing_sims_batched`` (the hazard cleared
by 2026-08-19, but recovery previously required a human to export
``PIKAZOO_PREDICTOR=lax``).  Before ``predict.landing_sims``'s ``auto`` mode
commits a production program to the kernel path, it runs THIS module in a
killable subprocess under a hard timeout: a tiny (B=256, T=2) but
structurally production-shaped program — the kernel embedded inside the
scanned computer-AI ``step_batch`` — so a recurrence downgrades to the lax
fallback automatically instead of wedging the caller.

Run directly: ``python -m pikazoo_tpu.core._pallas_canary`` — prints
``CANARY_OK`` on success, anything else (or a hang) is a failure.
"""
import os

# Force the kernel path inside this subprocess regardless of the parent's
# dispatch state (the parent only launches us when impl == "auto").
os.environ["PIKAZOO_PREDICTOR"] = "pallas"

import jax
import jax.numpy as jnp

from pikazoo_tpu.envs import EnvConfig, PikaZoo

_B = int(os.environ.get("PIKAZOO_PALLAS_CANARY_B", "256"))


def main() -> None:
    env = PikaZoo(EnvConfig(auto_reset=True, is_player1_computer=True,
                            is_player2_computer=True))
    state, _ = env.reset_batch(jax.random.key(0), _B)
    acts = jnp.zeros((_B, 2), jnp.int32)

    @jax.jit
    def roll(st):
        def body(s, _):
            s, _ts = env.step_batch(s, acts)
            return s, None
        return jax.lax.scan(body, st, None, length=2)[0]

    out = roll(state)
    # Host transfer is the only trustworthy sync on this backend.
    val = int(jax.device_get(out.scores).reshape(-1)[0])
    print(f"CANARY_OK scores0={val}", flush=True)


if __name__ == "__main__":
    main()
