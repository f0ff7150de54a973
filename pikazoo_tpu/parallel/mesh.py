"""Device-mesh sharding of the environment batch.

The env step is embarrassingly parallel over matches, so the scaling design
is one named mesh axis, ``env``: the batch dimension of every state leaf is
sharded across all devices of the slice (ICI within a host, DCN across
hosts), parameters are replicated, and the only collectives in the system are
the gradient all-reduces XLA inserts for the learner (see ``train/ppo.py``).
No hand-written transport: ``jax.distributed.initialize`` + ``Mesh`` +
``NamedSharding`` under ``jit`` is the whole communication backend (the
reference is single-process Python and has no counterpart — SURVEY.md N3/N4).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

ENV_AXIS = "env"


def init_distributed(**kwargs) -> None:
    """Initialize the multi-host JAX runtime (no-op on a single host).

    Call once at program start on every host of the pod slice; coordinator
    address etc. are picked up from the TPU environment or can be passed
    through ``kwargs`` (forwarded to ``jax.distributed.initialize``)."""
    try:
        jax.distributed.initialize(**kwargs)
    except (ValueError, RuntimeError):
        # Already initialized, or single-process environment.
        pass


def make_env_mesh(devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """1-D mesh over all (global) devices with the ``env`` axis."""
    devices = list(devices) if devices is not None else jax.devices()
    # Auto axis type = classic GSPMD: sharding constraints are hints and the
    # compiler propagates/inserts collectives (jax>=0.9 defaults to Explicit).
    return jax.make_mesh((len(devices),), (ENV_AXIS,), devices=devices,
                         axis_types=(jax.sharding.AxisType.Auto,))


def env_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for batch-leading arrays: dim 0 split over the env axis."""
    return NamedSharding(mesh, P(ENV_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(tree, mesh: Mesh):
    """Place a batch-leading pytree (EnvState, actions, ...) onto the mesh,
    sharded along dim 0 of every leaf."""
    sharding = env_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
