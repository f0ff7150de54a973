"""Test configuration: force the CPU backend with 8 virtual devices.

Multi-chip sharding is validated on a virtual host-platform mesh (the driver
separately dry-runs the real multi-chip path via ``__graft_entry__``).  The
axon sitecustomize registers the TPU plugin and programmatically overrides
``JAX_PLATFORMS``, so the CPU pin must go through ``jax.config`` after import,
while ``XLA_FLAGS`` must be set before first backend use.
"""

import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
)

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
