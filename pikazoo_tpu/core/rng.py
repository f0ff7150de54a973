"""Draw-slot RNG subsystem.

The reference threads a single ``np.random.Generator`` through physics, AI and
serve selection, drawing *conditionally* inside data-dependent branches
(SURVEY.md section 2.3 lists every draw site).  A traced TPU program evaluates
both sides of every branch, so conditional host-style consumption cannot be
expressed directly.  Instead each potential draw site evaluates a value from a
counted threefry stream and advances the counter only when the reference would
actually have drawn:

    value_i = randint(fold_in(key, counter), 0, upper)
    counter += consume_i            # masked, per environment

The observable value *sequence* therefore depends only on the sequence of
draws actually consumed — exactly the reference's semantics, with threefry in
place of PCG64.

For bitwise trajectory parity against the reference (whose PCG64 stream we
cannot cheaply reproduce on-device), ``DrawState`` supports an *oracle* mode:
``oracle[counter]`` supplies each value from a pre-recorded stream of the
reference generator's outputs (see ``pikazoo_tpu.parity``).  Counter semantics
are identical in both modes, so a trajectory validated in oracle mode
validates the masking/ordering machinery used in production mode.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp


class DrawState(NamedTuple):
    """Carries the RNG stream through one step: a threefry key (constant for
    the step), the masked cumulative draw counter, and an optional oracle
    buffer of pre-recorded draw values."""

    key: jax.Array
    counter: jnp.ndarray  # int32
    oracle: Optional[jax.Array] = None  # (capacity,) int32 or None


def draw(ds: DrawState, consume: jnp.ndarray, upper: int) -> Tuple[jnp.ndarray, DrawState]:
    """One potential draw site: uniform integer in ``[0, upper)``.

    ``consume`` is a traced bool/int mask; the counter advances only where it
    is set, and the returned value is 0 where it is not (callers gate use of
    the value on the same condition).  ``upper`` must be static.
    """
    consume = consume.astype(jnp.bool_)
    if ds.oracle is not None:
        cap = ds.oracle.shape[-1]
        idx = jnp.clip(ds.counter, 0, cap - 1)
        value = jax.lax.dynamic_index_in_dim(ds.oracle, idx, keepdims=False)
    else:
        site_key = jax.random.fold_in(ds.key, ds.counter)
        value = jax.random.randint(site_key, (), 0, upper, dtype=jnp.int32)
    value = jnp.where(consume, value, jnp.int32(0))
    return value, ds._replace(counter=ds.counter + consume.astype(jnp.int32))
