"""Pallas TPU kernel for the batched landing simulation — the hot op.

Why: under ``vmap``, the ``lax.while_loop`` landing sim carries seven
``(B, 7)`` int32 arrays, and XLA materializes while-loop carries in HBM — at
B=65536 every iteration streams ~26MB, and the loop runs to the *batch max*
iteration count (~110 for live self-play states), costing ~16ms/frame.  This
kernel keeps the entire loop state in VMEM: HBM traffic drops to 4 input
words + 7 output words per env *total*, and each grid block of envs only runs
to its own block-max iterations.

Layout: envs are padded to blocks of ``BLOCK_ROWS x 128`` lanes (int32 native
tile) and the 7 simulation lanes (main predictor + 6 power-hit candidates,
see ``core.predict``) ride a leading dimension of the VMEM working set —
``(7, BLOCK_ROWS, 128)`` ~= 28KB per array, far under the VMEM budget.

Semantics are identical to ``core.predict.landing_sims`` (same quirky net
rules, same 1000-iteration cap, same vx==0 fast exit); equality is enforced
by tests in interpret mode on CPU and on real TPU by the parity suite.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pikazoo_tpu.core import constants as C

BLOCK_ROWS = 8
LANES = 128
BLOCK_ENVS = BLOCK_ROWS * LANES


def _landing_kernel(x_ref, y_ref, vx_ref, vy_ref, exp_ref, cand_ref):
    x0 = x_ref[:]  # (BLOCK_ROWS, 128) int32
    y0 = y_ref[:]
    vx0 = vx_ref[:]
    vy0 = vy_ref[:]

    # Candidate tables built from iota (pallas kernels cannot capture array
    # constants): |x_dir| = [1,1,1,0,0,0] = (k < 3), y_dir = (k % 3) - 1,
    # matching core.predict.CANDIDATE_{X,Y}_DIRECTION.
    k = jax.lax.broadcasted_iota(jnp.int32, (6, 1, 1), 0)
    cand_xd = (k < 3).astype(jnp.int32)
    cand_yd = (k % 3) - 1
    speed = (cand_xd + 1) * 10
    cvx = jnp.where(x0[None] < C.GROUND_HALF_WIDTH, speed, -speed)
    cvy = jnp.abs(vy0)[None] * cand_yd * 2

    x = jnp.broadcast_to(x0[None], (7, BLOCK_ROWS, LANES))
    y = jnp.broadcast_to(y0[None], (7, BLOCK_ROWS, LANES))
    vx = jnp.concatenate([vx0[None], cvx], axis=0)
    vy = jnp.concatenate([vy0[None], cvy], axis=0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (7, BLOCK_ROWS, LANES), 0)
    full_rule = lane == 0

    # vx == 0 lanes can never move in x: finish instantly (see core.predict).
    # The done mask is carried as int32 — Mosaic cannot legalize i1 vectors
    # in while-loop carries (scf.yield).
    done0 = (vx == 0).astype(jnp.int32)

    def cond(carry):
        _, _, _, _, _, done_i, _ = carry
        return jnp.any(done_i == 0)

    def body(carry):
        n, x, y, vx, vy, done_i, result = carry
        done = done_i == 1
        n1 = n + 1
        future_x = x + vx
        vx1 = jnp.where((future_x < C.BALL_RADIUS) | (future_x > C.GROUND_WIDTH),
                        -vx, vx)
        vy1 = jnp.where(y + vy < 0, jnp.int32(1), vy)
        at_net = (jnp.abs(x - C.GROUND_HALF_WIDTH) < C.NET_PILLAR_HALF_WIDTH) \
            & (y > C.NET_PILLAR_TOP_TOP_Y_COORD)
        on_top = y < C.NET_PILLAR_TOP_BOTTOM_Y_COORD
        flip_vy = at_net & (vy1 > 0) & (~full_rule | on_top)
        vy2 = jnp.where(flip_vy, -vy1, vy1)
        side_vx = jnp.where(x < C.GROUND_HALF_WIDTH, -jnp.abs(vx1),
                            jnp.abs(vx1))
        vx2 = jnp.where(at_net & full_rule & ~on_top, side_vx, vx1)

        y1 = y + vy2
        finished = (y1 > C.BALL_TOUCHING_GROUND_Y_COORD) | \
                   (n1 >= C.INFINITE_LOOP_LIMIT)
        live = ~done
        result = jnp.where(live & finished, x, result)
        x = jnp.where(live & ~finished, x + vx2, x)
        y = jnp.where(live, y1, y)
        vx = jnp.where(live, vx2, vx)
        vy = jnp.where(live & ~finished, vy2 + 1, jnp.where(live, vy2, vy))
        return (n1, x, y, vx, vy,
                jnp.where(done | finished, jnp.int32(1), jnp.int32(0)), result)

    init = (jnp.int32(0), x, y, vx, vy, done0, x)
    *_, result = jax.lax.while_loop(cond, body, init)
    exp_ref[:] = result[0]
    cand_ref[:] = result[1:]


@functools.partial(jax.jit, static_argnames=("interpret",))
def landing_sims_batched(x: jnp.ndarray, y: jnp.ndarray, vx: jnp.ndarray,
                         vy: jnp.ndarray, interpret: bool = False
                         ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(B,) ball state -> (expected (B,), candidates (B, 6))."""
    B = x.shape[0]
    padded = (B + BLOCK_ENVS - 1) // BLOCK_ENVS * BLOCK_ENVS
    rows = padded // LANES

    def prep(a, fill):
        return jnp.pad(a, (0, padded - B),
                       constant_values=fill).reshape(rows, LANES)

    # Padding envs start beyond the ground (y > 252): done on iteration 1.
    xp, yp = prep(x, 216), prep(y, 10_000)
    vxp, vyp = prep(vx, 0), prep(vy, 0)

    grid = rows // BLOCK_ROWS
    exp, cand = pl.pallas_call(
        _landing_kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec((BLOCK_ROWS, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)] * 4,
        out_specs=[
            pl.BlockSpec((BLOCK_ROWS, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((6, BLOCK_ROWS, LANES), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rows, LANES), jnp.int32),
            jax.ShapeDtypeStruct((6, rows, LANES), jnp.int32),
        ],
        interpret=interpret,
    )(xp, yp, vxp, vyp)

    expected = exp.reshape(-1)[:B]
    candidates = jnp.moveaxis(cand.reshape(6, -1)[:, :B], 0, 1)  # (B, 6)
    return expected, candidates
