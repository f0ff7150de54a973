"""Shared measurement discipline for the probe tools.

On the axon remote-TPU tunnel ``jax.block_until_ready`` is NOT a reliable
fence (observed returning with work still in flight) and repeated calls with
bit-identical inputs can be served from a remote cache — so every probe must
(a) sync via a host transfer and (b) chain outputs into the next call's
inputs.  This module is the single source of that idiom; ``bench.py`` has
its own copy (it must stay a standalone file for the driver).
"""

from __future__ import annotations


def sync(tree) -> None:
    """Force completion via a host transfer of one element of ``tree``."""
    import jax
    import numpy as np

    leaf = jax.tree.leaves(tree)[0]
    _ = np.asarray(jax.device_get(leaf)).reshape(-1)[:1]
