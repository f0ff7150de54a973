"""Native C++ engine: build, behavior, and fuzz parity vs the JAX kernel.

Both implementations consume identical oracle draw streams, so any state
divergence over thousands of random frames is a logic bug in one of them —
this is the scale-out complement to the recorded-reference parity suite.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pikazoo_tpu.envs import EnvConfig, PikaZoo
from pikazoo_tpu.native import NativeEngine, NFIELDS, native_available

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="g++ toolchain unavailable")

ORACLE_CAP = 1 << 13


def make_envs(B, seed=0, **cfg_kw):
    """Matching JAX env state + packed native state + shared oracle."""
    cfg = EnvConfig(**cfg_kw)
    env = PikaZoo(cfg)
    rng = np.random.default_rng(seed)
    oracle_np = rng.integers(0, 2, size=(B, ORACLE_CAP)).astype(np.int32)
    # Draw values must be valid for every site: integers(0, n) with n in
    # {2, 3, 5, 20}; use per-column max 2 so all sites accept them.
    state_rows = []
    for i in range(B):
        s, _ = env.reset(jax.random.key(seed + i), counter=0,
                         oracle=jnp.asarray(oracle_np[i]))
        state_rows.append(s)
    jax_state = jax.tree.map(lambda *xs: jnp.stack(xs), *state_rows)
    native = NativeEngine(
        winning_score=cfg.winning_score, serve=cfg.serve,
        is_player1_computer=cfg.is_player1_computer,
        is_player2_computer=cfg.is_player2_computer,
        auto_reset=cfg.auto_reset)
    packed = NativeEngine.pack(jax_state)
    assert packed.shape == (B, NFIELDS)
    return env, jax_state, native, packed, oracle_np


def _assert_states_match(jax_state, packed, t):
    repacked = NativeEngine.pack(jax_state)
    if not np.array_equal(repacked, packed):
        bad = np.argwhere(repacked != packed)
        from pikazoo_tpu.native import FIELDS
        b, f = bad[0]
        raise AssertionError(
            f"state divergence at frame {t}, env {b}, field {FIELDS[f]}: "
            f"jax={repacked[b, f]} native={packed[b, f]} "
            f"({len(bad)} total mismatches)")


@pytest.mark.parametrize("cfg_kw", [
    dict(auto_reset=True),
    dict(auto_reset=True, serve="random"),
    dict(auto_reset=True, winning_score=3,
         is_player1_computer=True, is_player2_computer=True),
    dict(auto_reset=True, is_player2_computer=True),
])
def test_fuzz_parity_native_vs_jax(cfg_kw):
    B, T = 16, 600
    env, jax_state, native, packed, oracle_np = make_envs(B, seed=42, **cfg_kw)
    oracle_j = jnp.asarray(oracle_np)
    step = jax.jit(jax.vmap(env.step))
    rng = np.random.default_rng(7)
    for t in range(T):
        acts = rng.integers(0, 18, size=(B, 2)).astype(np.int32)
        jax_state, ts = step(jax_state, jnp.asarray(acts), oracle_j)
        rewards, flags = native.step(packed, acts, oracle_np)
        _assert_states_match(jax_state, packed, t)
        np.testing.assert_array_equal(np.asarray(ts.rewards), rewards)
        np.testing.assert_array_equal(
            np.asarray(ts.terminated), (flags & 1).astype(np.int32))


def test_native_run_multiframe_matches_stepwise():
    B, T = 8, 200
    _, _, native, packed, oracle_np = make_envs(B, seed=1, auto_reset=True)
    packed2 = packed.copy()
    rng = np.random.default_rng(3)
    acts = rng.integers(0, 18, size=(T, B, 2)).astype(np.int32)
    for t in range(T):
        native.step(packed, acts[t], oracle_np)
    native.run(packed2, acts, oracle_np)
    np.testing.assert_array_equal(packed, packed2)


def test_native_throughput_smoke():
    """Not a benchmark — just proves the multicore path moves."""
    import time
    B, T = 512, 200
    _, _, native, packed, oracle_np = make_envs(B, seed=2, auto_reset=True)
    acts = np.random.default_rng(0).integers(
        0, 18, size=(T, B, 2)).astype(np.int32)
    t0 = time.perf_counter()
    native.run(packed, acts, oracle_np)
    dt = time.perf_counter() - t0
    assert B * T / dt > 100_000  # comfortably above the reference's 53k


def test_native_obs_matches_jax():
    """C++ pika_obs_batch == assemble_obs along a stepped trajectory."""
    B, T = 16, 300
    env, jax_state, native, packed, oracle_np = make_envs(
        B, seed=11, auto_reset=True)
    oracle_j = jnp.asarray(oracle_np)
    step = jax.jit(jax.vmap(env.step))
    rng = np.random.default_rng(13)
    for t in range(T):
        acts = rng.integers(0, 18, size=(B, 2)).astype(np.int32)
        jax_state, ts = step(jax_state, jnp.asarray(acts), oracle_j)
        native.step(packed, acts, oracle_np)
        if t % 60 == 59:
            np.testing.assert_array_equal(native.obs(packed),
                                          np.asarray(ts.obs),
                                          err_msg=f"obs diverged at frame {t}")


def test_native_reset_matches_jax_reset_with_carry():
    """pika_reset_batch == envs reset(key, carry=state), production RNG."""
    from pikazoo_tpu.core.rng import key_from_jax

    env, jax_state, native, packed, _ = make_envs(4, seed=21, auto_reset=True)
    # Advance with production draws so the carried state is mid-game.
    rng = np.random.default_rng(2)
    step = jax.jit(jax.vmap(env.step))
    for _ in range(150):
        acts = rng.integers(0, 18, size=(4, 2)).astype(np.int32)
        jax_state, _ts = step(jax_state, jnp.asarray(acts))
        native.step(packed, acts)
    key = jax.random.key(99)
    keys = jax.vmap(jax.random.fold_in, (None, 0))(key, jnp.arange(4))
    states = [env.reset(keys[i],
                        carry=jax.tree.map(lambda x, i=i: x[i], jax_state))[0]
              for i in range(4)]
    expected = NativeEngine.pack(
        jax.tree.map(lambda *xs: jnp.stack(xs), *states))
    native.reset(packed, rng_key=np.stack(
        [np.asarray(key_from_jax(keys[i])) for i in range(4)]))
    np.testing.assert_array_equal(packed, expected)


@pytest.mark.parametrize("cfg_kw", [
    dict(winning_score=3),
    dict(winning_score=2, serve="random"),
    dict(winning_score=2, is_player1_computer=True,
         is_player2_computer=True),
])
def test_compat_native_backend_matches_jax_backend(cfg_kw):
    """raw_env(backend='native') is frame-exact vs backend='jax' across
    episodes (obs, rewards, terminations, scores, agent lifecycle)."""
    from pikazoo_tpu.compat.parallel_env import raw_env

    e1 = raw_env(seed=123, **cfg_kw)
    e2 = raw_env(seed=123, backend="native", **cfg_kw)
    rng = np.random.default_rng(5)
    for _ep in range(2):
        o1, _ = e1.reset()
        o2, _ = e2.reset()
        for a in o1:
            np.testing.assert_array_equal(o1[a], o2[a])
        while e1.agents:
            acts = {a: int(rng.integers(0, 18)) for a in e1.agents}
            obs1, rew1, term1, _tr1, _i1 = e1.step(acts)
            obs2, rew2, term2, _tr2, _i2 = e2.step(dict(acts))
            for a in ("player_1", "player_2"):
                np.testing.assert_array_equal(obs1[a], obs2[a])
                assert rew1[a] == rew2[a]
                assert term1[a] == term2[a]
            assert e1.scores == e2.scores
            assert e1.agents == e2.agents


def test_single_stepper_flags_and_views():
    env, jax_state, native, packed, _ = make_envs(1, seed=31, auto_reset=True)
    native.auto_reset = 0
    stepper = native.single_stepper(np.ascontiguousarray(packed))
    obs0 = stepper.observe().copy()
    assert obs0.shape == (2, 35)
    # Mirror property: my-block and opponent-block swap between the rows.
    np.testing.assert_array_equal(obs0[0, :13], obs0[1, 13:26])
    np.testing.assert_array_equal(obs0[0, 13:26], obs0[1, :13])
    terminated = False
    for _ in range(20000):
        rew, flags = stepper.step(int(np.random.randint(18)),
                                  int(np.random.randint(18)))
        assert rew[0] == -rew[1]
        if flags & 2:  # round ended -> scoring frame pays the zero-sum point
            assert abs(int(rew[0])) == 1
        if flags & 1:
            terminated = True
            break
    assert terminated, "random self-play should finish a 15-point game"


def test_fastpath_matches_python_adapter():
    """The C-extension dict-API step (native/fastpath.c) must produce the
    exact dicts the Python assembly produces — including the reference's
    shared-mutable infos["score"] list semantics (pikazoo_env.py:573-574)."""
    from pikazoo_tpu.compat.parallel_env import raw_env
    from pikazoo_tpu.native.engine import fastpath_available

    if not fastpath_available():
        import pytest
        pytest.skip("fastpath extension unavailable on this host")

    e_fast = raw_env(seed=77, backend="native", winning_score=2)
    e_py = raw_env(seed=77, backend="native", winning_score=2)
    assert e_fast._fast is not None
    e_py._fast = None  # force the Python assembly path
    rng = np.random.default_rng(9)
    e_fast.reset()
    e_py.reset()
    infos_seen = None
    for _ in range(20000):
        acts = {"player_1": int(rng.integers(0, 18)),
                "player_2": int(rng.integers(0, 18))}
        o1, r1, t1, u1, i1 = e_fast.step(acts)
        o2, r2, t2, u2, i2 = e_py.step(dict(acts))
        for a in ("player_1", "player_2"):
            np.testing.assert_array_equal(o1[a], o2[a])
            assert o1[a].dtype == np.int32
            assert (r1[a], t1[a], u1[a]) == (r2[a], t2[a], u2[a])
            assert i1[a]["score"] == i2[a]["score"]
            # Shared mutable list: the SAME object every step, like the
            # reference's infos (consumers must copy).
            assert i1[a]["score"] is e_fast.scores
        assert e_fast.agents == e_py.agents
        infos_seen = i1
        if not e_fast.agents:
            break
    assert not e_fast.agents, "a 2-point game should have terminated"
    # Terminal infos still reference the live scores list.
    assert max(infos_seen["player_1"]["score"]) == 2


def test_fastpath_action_conversion_matches_python_fallback():
    """Action coercion parity (advisor round-3): the C fast path must apply
    the same ``int(x)`` semantics as the Python assembly's
    ``int(actions[...])`` — floats truncate, numpy scalars pass, and
    non-convertible values raise on BOTH paths — so step behavior never
    depends on whether the extension built."""
    import pytest

    from pikazoo_tpu.compat.parallel_env import raw_env
    from pikazoo_tpu.native.engine import fastpath_available

    if not fastpath_available():
        pytest.skip("fastpath extension unavailable on this host")

    e_fast = raw_env(seed=5, backend="native", winning_score=2)
    e_py = raw_env(seed=5, backend="native", winning_score=2)
    assert e_fast._fast is not None
    e_py._fast = None
    e_fast.reset()
    e_py.reset()
    # int(7.9) == 7, numpy float scalar likewise, numpy int passes through.
    cases = [
        {"player_1": 7.9, "player_2": np.float64(3.2)},
        {"player_1": np.int64(11), "player_2": np.int32(0)},
        {"player_1": True, "player_2": 17},
    ]
    for acts in cases:
        o1, r1, t1, u1, _ = e_fast.step(dict(acts))
        o2, r2, t2, u2, _ = e_py.step(dict(acts))
        for a in ("player_1", "player_2"):
            np.testing.assert_array_equal(o1[a], o2[a])
            assert (r1[a], t1[a], u1[a]) == (r2[a], t2[a], u2[a])
    # int()-convertible strings convert on both paths (int("3") == 3)...
    o1, r1, t1, u1, _ = e_fast.step({"player_1": "3", "player_2": 0})
    o2, r2, t2, u2, _ = e_py.step({"player_1": "3", "player_2": 0})
    np.testing.assert_array_equal(o1["player_1"], o2["player_1"])
    # ...and non-convertible values raise the same exception class.
    for bad, exc in (({"player_1": "x", "player_2": 0}, ValueError),
                     ({"player_1": None, "player_2": 0}, TypeError)):
        with pytest.raises(exc):
            e_fast.step(dict(bad))
        with pytest.raises(exc):
            e_py.step(dict(bad))


def test_post_termination_rewards_match_jax():
    """Out-of-contract steps past game end must stay bit-identical across
    implementations: the JAX env masks the terminal reward on already-ended
    lanes (env_frame's game_ended_at_entry guard) and the C++ engine mirrors
    it — this drill steps 10 frames past termination on both."""
    import jax
    import jax.numpy as jnp

    from pikazoo_tpu.envs import EnvConfig, PikaZoo
    from pikazoo_tpu.native.engine import NativeEngine, native_available

    if not native_available():
        import pytest
        pytest.skip("native engine unavailable")

    env = PikaZoo(EnvConfig(winning_score=1, auto_reset=False))
    state, _ = env.reset(jax.random.key(21))
    eng = NativeEngine(winning_score=1, auto_reset=False)
    matrix = NativeEngine.pack(state)
    step = jax.jit(env.step)
    rng = np.random.default_rng(4)
    terminated = False
    for t in range(8000):
        acts = rng.integers(0, 18, size=2).astype(np.int32)
        state, ts = step(state, jnp.asarray(acts))
        rewards, flags = eng.step(matrix, acts[None])
        np.testing.assert_array_equal(
            np.asarray(jnp.stack([ts.rewards[0], ts.rewards[1]])),
            rewards[0], err_msg=f"reward mismatch at t={t}")
        assert bool(ts.terminated) == bool(flags[0] & 1), f"t={t}"
        if terminated:
            assert rewards[0, 0] == 0 and rewards[0, 1] == 0, \
                "post-termination steps must not re-emit rewards"
        if bool(ts.terminated):
            if terminated:
                post += 1
                if post >= 10:
                    break
            else:
                terminated = True
                post = 0
    assert terminated and post >= 10


def test_compile_atomic_success_and_failure(tmp_path):
    """The atomic builder: success lands the artifact via rename (no torn
    intermediate at the final path), failure returns the captured error and
    leaves no temp droppings."""
    from pikazoo_tpu.native.engine import _compile_atomic

    out = str(tmp_path / "x.so")

    def good(dest):
        yield ["sh", "-c", f"echo hi > {dest}"]

    assert _compile_atomic(good, out) is None
    assert open(out).read() == "hi\n"

    out2 = str(tmp_path / "y.so")

    def bad(dest):
        yield ["sh", "-c", "echo boom >&2; exit 1"]

    err = _compile_atomic(bad, out2)
    assert err is not None and "boom" in err
    assert not os.path.exists(out2)
    assert not [f for f in os.listdir(tmp_path) if ".tmp." in f]


def test_corrupt_cached_so_self_heals(tmp_path, monkeypatch):
    """A corrupt cached engine .so (the round-4 silent-degradation class)
    must be rebuilt from source on load failure, not poison the process."""
    import importlib

    from pikazoo_tpu.native import engine as ne

    if not ne.native_available():
        pytest.skip("g++ toolchain unavailable")
    monkeypatch.setenv("PIKAZOO_NATIVE_CACHE", str(tmp_path))
    with open(tmp_path / "pika_engine.so", "wb") as f:
        f.write(b"\x7fELF this is not a real shared object")
    # Fresh module state in an isolated cache dir: the corrupt file mtime
    # is NEWER than the source, so the stale-check alone would load it.
    ne2 = importlib.reload(ne)
    try:
        assert ne2.native_available(), ne2.build_errors()
        assert ne2.build_errors()["engine"] is None
        assert os.path.getsize(tmp_path / "pika_engine.so") > 1000
    finally:
        monkeypatch.undo()
        importlib.reload(ne)
