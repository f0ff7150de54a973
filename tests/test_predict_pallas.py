"""Pallas landing kernel == lax reference (interpret mode on CPU)."""

import numpy as np

import jax
import jax.numpy as jnp

from pikazoo_tpu.core.predict import _landing_sims_impl
from pikazoo_tpu.core.predict_pallas import landing_sims_batched
from pikazoo_tpu.core.state import init_ball_construction


def random_ball_states(n, seed):
    rng = np.random.default_rng(seed)
    return (rng.integers(20, 433, n).astype(np.int32),
            rng.integers(0, 253, n).astype(np.int32),
            rng.integers(-20, 21, n).astype(np.int32),
            rng.integers(-60, 61, n).astype(np.int32))


def test_pallas_kernel_matches_lax_reference():
    n = 300  # deliberately not a multiple of the 1024-env block
    x, y, vx, vy = random_ball_states(n, 0)
    exp_p, cand_p = landing_sims_batched(
        jnp.asarray(x), jnp.asarray(y), jnp.asarray(vx), jnp.asarray(vy),
        interpret=True)

    base = init_ball_construction()
    balls = jax.tree.map(
        lambda leaf: jnp.broadcast_to(leaf, (n,)), base)._replace(
            x=jnp.asarray(x), y=jnp.asarray(y),
            x_velocity=jnp.asarray(vx), y_velocity=jnp.asarray(vy))
    exp_l, cand_l = jax.jit(jax.vmap(_landing_sims_impl))(balls)

    np.testing.assert_array_equal(np.asarray(exp_p), np.asarray(exp_l))
    np.testing.assert_array_equal(np.asarray(cand_p), np.asarray(cand_l))


def test_pallas_kernel_net_trap_states():
    """Adversarial states: net-column, vx=0 fast-exit, cap-hitting cycles."""
    cases = np.array([
        [216, 180, 0, 1],    # pure net trap (fast exit)
        [216, 192, 0, 0],    # boundary of the strict < 192 band
        [200, 177, 3, 10],   # in-column moving
        [230, 190, -1, -5],
        [56, 0, 0, 1],       # fresh serve
        [432, 100, 20, -60],  # wall-hugging lob
    ], np.int32)
    x, y, vx, vy = cases.T
    exp_p, cand_p = landing_sims_batched(
        jnp.asarray(x), jnp.asarray(y), jnp.asarray(vx), jnp.asarray(vy),
        interpret=True)
    base = init_ball_construction()
    balls = jax.tree.map(lambda leaf: jnp.broadcast_to(leaf, (len(cases),)),
                         base)._replace(
        x=jnp.asarray(x), y=jnp.asarray(y),
        x_velocity=jnp.asarray(vx), y_velocity=jnp.asarray(vy))
    exp_l, cand_l = jax.jit(jax.vmap(_landing_sims_impl))(balls)
    np.testing.assert_array_equal(np.asarray(exp_p), np.asarray(exp_l))
    np.testing.assert_array_equal(np.asarray(cand_p), np.asarray(cand_l))
