"""Differential tests: the event-leaping and hybrid landing loops are
bit-identical to the frame-by-frame reference loop.

The leap/hyb algorithms (``core/predict.py::_leap_loop`` / ``_hyb_loop``)
advance in closed form over spans proven free of wall/ceiling/net/ground
events; any overestimated span would silently corrupt the landing point, so
this suite fuzzes them against ``_sim_loop`` (the straight port of
``physics.py:655-685`` / ``:850-884``) over state boxes far wider than the
reachable game states, plus live self-play states, plus the exact net-band
boundary lattice.  The ``split="ydir"`` candidate grouping is checked for
bit-equality too (grouping must not change per-lane sequences).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pikazoo_tpu.core.predict import (_hyb_loop, _leap_loop, _sim_loop,
                                      landing_sims_any)


def _state_corpus(seed: int, n: int) -> tuple:
    rng = np.random.default_rng(seed)

    def box(m, xlo, xhi, ylo, yhi, vlo, vhi, wlo, whi):
        return (rng.integers(xlo, xhi, m), rng.integers(ylo, yhi, m),
                rng.integers(vlo, vhi, m), rng.integers(wlo, whi, m))

    cases = [
        # broad reachable superset
        box(n, 0, 453, -300, 253, -64, 65, -128, 129),
        # in/near the net band, low velocities (the cycle-heavy regime)
        box(n, 180, 253, 150, 253, -6, 7, -12, 13),
        # walls / ground / ceiling neighborhoods
        box(n // 2, 0, 45, -50, 253, -30, 31, -40, 41),
        box(n // 2, 408, 453, -50, 253, -30, 31, -40, 41),
        box(n // 2, 0, 453, 230, 260, -20, 21, -30, 31),
        box(n // 2, 0, 453, -10, 15, -20, 21, -30, 31),
        # iteration-cap trajectories (extreme |vy|)
        box(n // 4, 0, 453, -10_000, 253, -64, 65, -2000, 2001),
    ]
    # exact band-boundary lattice
    xs = np.tile(np.array([191, 192, 193, 215, 216, 217, 239, 240, 241]), 500)
    cases.append((xs, rng.integers(170, 200, xs.size),
                  rng.integers(-4, 5, xs.size), rng.integers(-8, 9, xs.size)))
    return tuple(np.concatenate([c[i] for c in cases]).astype(np.int32)
                 for i in range(4))


@pytest.mark.parametrize("full_rule", [True, False])
@pytest.mark.parametrize("algo_fn", [_leap_loop, _hyb_loop],
                         ids=["leap", "hyb"])
def test_leap_matches_iter_fuzz(full_rule, algo_fn):
    x, y, vx, vy = _state_corpus(seed=0, n=20_000)
    ref = jax.jit(lambda *a: _sim_loop(*a, full_rule=full_rule))(x, y, vx, vy)
    got = jax.jit(lambda *a: algo_fn(*a, full_rule=full_rule))(x, y, vx, vy)
    bad = np.nonzero(np.asarray(ref) != np.asarray(got))[0]
    assert bad.size == 0, \
        f"first mismatch at state {(x[bad[0]], y[bad[0]], vx[bad[0]], vy[bad[0]])}"


@pytest.mark.parametrize("algo", ["leap", "hyb", "leap,iter"])
def test_landing_sims_any_algos_agree(algo):
    x, y, vx, vy = _state_corpus(seed=1, n=4_000)
    e0, c0 = jax.jit(lambda *a: landing_sims_any(*a, algo="iter"))(x, y, vx, vy)
    e1, c1 = jax.jit(lambda *a: landing_sims_any(*a, algo=algo))(x, y, vx, vy)
    assert (np.asarray(e0) == np.asarray(e1)).all()
    assert (np.asarray(c0) == np.asarray(c1)).all()


def test_ydir_split_bit_equal():
    x, y, vx, vy = _state_corpus(seed=2, n=4_000)
    e0, c0 = jax.jit(lambda *a: landing_sims_any(*a, split="none"))(x, y, vx, vy)
    e1, c1 = jax.jit(lambda *a: landing_sims_any(*a, split="ydir"))(x, y, vx, vy)
    assert (np.asarray(e0) == np.asarray(e1)).all()
    assert (np.asarray(c0) == np.asarray(c1)).all()


def test_leap_on_live_selfplay_states():
    """Leap/hyb vs iter on states reached by actual AI self-play."""
    from pikazoo_tpu.envs import EnvConfig, PikaZoo

    B, T = 256, 120
    env = PikaZoo(EnvConfig(auto_reset=True, is_player1_computer=True,
                            is_player2_computer=True))
    state, _ = env.reset_batch(jax.random.key(0), B)

    @jax.jit
    def roll(state):
        def body(st, _):
            st, _ts = env.step_batch(st, jnp.zeros((B, 2), jnp.int32))
            return st, (st.ball.x, st.ball.y, st.ball.x_velocity,
                        st.ball.y_velocity)
        return jax.lax.scan(body, state, None, length=T)[1]

    bx, by, bvx, bvy = [np.asarray(r).reshape(-1) for r in roll(state)]
    e0, c0 = jax.jit(lambda *a: landing_sims_any(*a, algo="iter"))(
        bx, by, bvx, bvy)
    for algo in ("leap", "hyb"):
        e1, c1 = jax.jit(lambda *a, _g=algo: landing_sims_any(*a, algo=_g))(
            bx, by, bvx, bvy)
        assert (np.asarray(e0) == np.asarray(e1)).all()
        assert (np.asarray(c0) == np.asarray(c1)).all()
