"""PettingZoo ParallelEnv API conformance of the compat adapter.

Mirrors the reference's own API test (which delegates to
``pettingzoo.test.parallel_api_test``); the cycle count is reduced from the
reference's 1M since the adapter dispatches a jitted step per host call.
"""

import numpy as np
import pytest

pettingzoo = pytest.importorskip("pettingzoo")

from pettingzoo.test import parallel_api_test  # noqa: E402

from pikazoo_tpu import compat  # noqa: E402
from pikazoo_tpu.compat import wrappers as cw  # noqa: E402


def test_parallel_api_conformance():
    env = compat.env(seed=0)
    parallel_api_test(env, num_cycles=3000)


def test_compat_seeded_reproducibility():
    def rollout(seed):
        env = compat.env(seed=seed)
        obs, _ = env.reset()
        rng = np.random.default_rng(0)
        frames = []
        for _ in range(200):
            acts = {a: int(rng.integers(0, 18)) for a in env.agents}
            obs, rew, term, trunc, infos = env.step(acts)
            frames.append(np.concatenate([obs["player_1"], obs["player_2"]]))
            if term["player_1"]:
                break
        return np.asarray(frames)

    a, b, c = rollout(7), rollout(7), rollout(8)
    np.testing.assert_array_equal(a, b)
    assert a.shape != c.shape or not np.array_equal(a, c)


def test_compat_wrapper_stack_runs():
    env = cw.SimplifyAction(cw.RewardByBallPosition(
        compat.env(seed=1), additional_reward=(0.1,) * 8))
    obs, infos = env.reset()
    assert env.action_space("player_1").n == 13
    rng = np.random.default_rng(1)
    for _ in range(50):
        acts = {a: int(rng.integers(0, 13)) for a in env.agents}
        obs, rews, term, trunc, infos = env.step(acts)
        assert rews["player_1"] + rews["player_2"] == pytest.approx(0.2)


def test_compat_single_agent_and_stats():
    env = cw.RecordEpisodeStatistics(compat.env(seed=2, winning_score=1))
    single = cw.ConvertSingleAgent(env, side="player_1", opponent_seed=0)
    obs, info = single.reset()
    assert obs.shape == (35,)
    rng = np.random.default_rng(2)
    for _ in range(3000):
        obs, rew, term, trunc, info = single.step(int(rng.integers(0, 18)))
        if term:
            assert "episode" in info
            assert abs(info["episode"]["r"]) == 1
            assert info["episode"]["l"] > 0
            return
    pytest.fail("episode did not finish")


def test_compat_render_rgb_array():
    env = compat.env(seed=3, render_mode="rgb_array")
    env.reset()
    frame = env.render()
    assert frame.shape == (304, 432, 3) and frame.dtype == np.uint8
    # Scene sanity: sky at top, court colors at the bottom rows.
    assert frame[300].std() >= 0  # bottom rows drawn
    assert not np.array_equal(frame[0, 0], frame[290, 0])
    env.step({"player_1": 0, "player_2": 0})
    frame2 = env.render()
    assert frame2.shape == (304, 432, 3)
    env.close()


def test_parallel_api_conformance_native_backend():
    """The native-engine adapter (C fast path when it builds, Python
    assembly otherwise) must satisfy the same ParallelEnv contract."""
    from pikazoo_tpu.native import native_available
    if not native_available():
        pytest.skip("g++ toolchain unavailable")
    env = compat.env(seed=0, backend="native")
    parallel_api_test(env, num_cycles=3000)


def test_parallel_api_conformance_native_backend_soak():
    """Long-duration lifecycle soak, mirroring the reference's own
    ``parallel_api_test(env, num_cycles=1_000_000)`` gate
    (``/root/reference/tests/test_parallel_api.py:7``) at the SAME cycle
    count.  ``num_cycles`` is a PER-EPISODE cap and the harness breaks at
    the first termination, so 1M cycles means "let both MAX_RESETS
    episodes run to natural 15-point completion under random actions"
    (~500k frames each) — exactly the reference's lifecycle semantics,
    where the shorter default would cut the game off before termination
    ever exercises the agent-list-emptying path.  The C fast path serves
    this in ~2.5 s."""
    from pikazoo_tpu.native import native_available
    if not native_available():
        pytest.skip("g++ toolchain unavailable")
    env = compat.env(seed=0, backend="native")
    parallel_api_test(env, num_cycles=1_000_000)


def test_compat_render_rgb_array_native_backend():
    from pikazoo_tpu.native import native_available
    if not native_available():
        pytest.skip("g++ toolchain unavailable")
    # Native and JAX backends render identical frames from the same seed.
    e1 = compat.env(seed=3, render_mode="rgb_array")
    e2 = compat.env(seed=3, render_mode="rgb_array", backend="native")
    e1.reset(), e2.reset()
    np.testing.assert_array_equal(e1.render(), e2.render())
    for _ in range(30):
        acts = {"player_1": 5, "player_2": 2}
        e1.step(acts), e2.step(dict(acts))
    np.testing.assert_array_equal(e1.render(), e2.render())
    e1.close(), e2.close()


def test_compat_wrappers_over_native_backend():
    from pikazoo_tpu.native import native_available
    if not native_available():
        pytest.skip("g++ toolchain unavailable")
    # The PettingZoo-level wrappers are backend-agnostic: identical stacked
    # trajectories over the native and jax backends.
    def stack(backend):
        env = cw.SimplifyAction(cw.RewardByBallPosition(
            compat.env(seed=11, backend=backend),
            additional_reward=(0.1, 0.2, -0.1, -0.2, -0.1, -0.2, 0.1, 0.2)))
        obs, _ = env.reset()
        rng = np.random.default_rng(4)
        rows = []
        for _ in range(120):
            acts = {a: int(rng.integers(0, 13)) for a in env.agents}
            obs, rews, term, trunc, _ = env.step(acts)
            rows.append((obs["player_1"].copy(), obs["player_2"].copy(),
                         rews["player_1"], term["player_1"]))
        return rows

    for (o1a, o2a, ra, ta), (o1b, o2b, rb, tb) in zip(stack("jax"),
                                                      stack("native")):
        np.testing.assert_array_equal(o1a, o1b)
        np.testing.assert_array_equal(o2a, o2b)
        assert ra == rb and ta == tb


def test_aec_conversion_conformance():
    """PettingZoo's AEC API via the stock parallel_to_aec conversion: the
    adapter satisfies the AEC contract too (the reference ships only the
    ParallelEnv surface; AEC users reach it exactly this way)."""
    from pettingzoo.test import api_test
    from pettingzoo.utils.conversions import parallel_to_aec

    for backend in ("jax", "native"):
        if backend == "native":
            from pikazoo_tpu.native import native_available
            if not native_available():
                continue
        aec = parallel_to_aec(compat.env(seed=0, backend=backend))
        api_test(aec, num_cycles=1000)
