"""Unit and invariant tests of the functional env (no reference needed)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pikazoo_tpu.envs import (NUM_ACTIONS, OBS_HIGH, OBS_LOW, EnvConfig,
                              PikaZoo)
from pikazoo_tpu.wrappers import ConvertSingleAgent, RecordEpisodeStatistics


def test_reset_initial_observation_values():
    env = PikaZoo(EnvConfig())
    _, ts = env.reset(jax.random.key(0))
    obs = np.asarray(ts.obs)
    # Player 1 at x=36 y=244, player 2 mirrored at 396, ball above server.
    assert obs[0][0] == 36 and obs[0][1] == 244
    assert obs[0][13] == 396 and obs[1][0] == 396
    assert obs[0][26] == 56 and obs[0][27] == 0


def test_observation_mirror_symmetry_through_game():
    """Reference test_env_observation_symmetry, ported: computer self-play,
    obs[p1][0:13] == obs[p2][13:26] and vice versa every frame."""
    env = PikaZoo(EnvConfig(is_player1_computer=True,
                            is_player2_computer=True, auto_reset=False))
    state, ts = env.reset(jax.random.key(1))
    step = jax.jit(env.step)
    for _ in range(2000):
        state, ts = step(state, jnp.zeros(2, jnp.int32))
        obs = np.asarray(ts.obs)
        np.testing.assert_array_equal(obs[0][0:13], obs[1][13:26])
        np.testing.assert_array_equal(obs[0][13:26], obs[1][0:13])
        if bool(ts.terminated):
            break


def test_observations_within_bounds():
    env = PikaZoo(EnvConfig(auto_reset=True))
    state, ts = env.reset_batch(jax.random.key(2), 64)
    key = jax.random.key(3)
    step = jax.jit(env.step_batch)
    for _ in range(500):
        key, sub = jax.random.split(key)
        acts = jax.random.randint(sub, (64, 2), 0, NUM_ACTIONS, jnp.int32)
        state, ts = step(state, acts)
    obs = np.asarray(ts.obs)
    assert (obs >= OBS_LOW).all(), np.argwhere(obs < OBS_LOW)
    assert (obs <= OBS_HIGH).all(), np.argwhere(obs > OBS_HIGH)


def test_rewards_zero_sum_and_on_scoring_frames_only():
    env = PikaZoo(EnvConfig(auto_reset=True))
    state, _ = env.reset_batch(jax.random.key(4), 32)

    def body(carry, _):
        st, key = carry
        key, sub = jax.random.split(key)
        acts = jax.random.randint(sub, (32, 2), 0, NUM_ACTIONS, jnp.int32)
        st, ts = env.step_batch(st, acts)
        return (st, key), (ts.rewards, ts.round_ended)

    (_, _), (rews, rounds) = jax.jit(
        lambda s, k: jax.lax.scan(body, (s, k), None, length=2000))(
            state, jax.random.key(5))
    rews = np.asarray(rews)
    rounds = np.asarray(rounds)
    assert (rews.sum(-1) == 0).all(), "rewards must be zero-sum"
    assert (np.abs(rews[..., 0]) == rounds).all(), \
        "+-1 reward exactly on round-end frames"
    assert rounds.sum() > 0, "some rounds should have ended"


def test_auto_reset_full_game_cycle():
    env = PikaZoo(EnvConfig(winning_score=2, auto_reset=True))
    state, _ = env.reset(jax.random.key(6))
    step = jax.jit(env.step)
    key = jax.random.key(7)
    seen_term = 0
    for _ in range(5000):
        key, sub = jax.random.split(key)
        a = jax.random.randint(sub, (2,), 0, NUM_ACTIONS, jnp.int32)
        state, ts = step(state, a)
        if bool(ts.terminated):
            seen_term += 1
            assert np.asarray(ts.scores).max() == 2
        if seen_term >= 3:
            break
    assert seen_term >= 3, "auto-reset should let multiple games complete"


def test_no_reward_after_termination_without_auto_reset():
    """Out-of-contract guard: with auto_reset=False, stepping a lane past
    game_ended=1 must emit zero rewards (the reference avoids this state by
    emptying ``agents``; the raw functional API needs the explicit mask)."""
    env = PikaZoo(EnvConfig(winning_score=1, auto_reset=False))
    state, _ = env.reset(jax.random.key(42))
    step = jax.jit(env.step)
    key = jax.random.key(43)
    terminal_ts = None
    for _ in range(5000):
        key, sub = jax.random.split(key)
        a = jax.random.randint(sub, (2,), 0, NUM_ACTIONS, jnp.int32)
        state, ts = step(state, a)
        if bool(ts.terminated):
            terminal_ts = ts
            break
    assert terminal_ts is not None, "game should terminate"
    # The terminal (scoring) frame itself carries the +-1 reward.
    assert abs(int(np.asarray(terminal_ts.rewards)[0])) == 1
    # Every further (out-of-contract) step: zero reward, still terminated,
    # scores frozen.
    frozen_scores = np.asarray(state.scores).copy()
    for _ in range(10):
        key, sub = jax.random.split(key)
        a = jax.random.randint(sub, (2,), 0, NUM_ACTIONS, jnp.int32)
        state, ts = step(state, a)
        assert np.asarray(ts.rewards).tolist() == [0, 0]
        assert bool(ts.terminated)
        np.testing.assert_array_equal(np.asarray(state.scores), frozen_scores)


@pytest.mark.parametrize("computer", [False, True])
def test_vmap_batch_matches_single_env(computer):
    """Lane i of a vmapped batch equals an unbatched env given the same
    per-env key (derived exactly as reset_batch derives it), including the
    full state — the computer variant exercises every RNG-consuming path."""
    from pikazoo_tpu.core.rng import fold_key, key_from_jax
    env = PikaZoo(EnvConfig(auto_reset=True, winning_score=3,
                            is_player1_computer=computer,
                            is_player2_computer=computer))
    B = 4
    bstate, bts = env.reset_batch(jax.random.key(8), B)
    base = key_from_jax(jax.random.key(8))
    sstates = []
    for i in range(B):
        s, ts = env.reset(fold_key(base, jnp.uint32(i)))
        sstates.append(s)
        np.testing.assert_array_equal(np.asarray(ts.obs),
                                      np.asarray(bts.obs)[i])
    rng = np.random.default_rng(0)
    bstep = jax.jit(env.step_batch)
    sstep = jax.jit(env.step)
    for t in range(300):
        acts = rng.integers(0, NUM_ACTIONS, size=(B, 2)).astype(np.int32)
        bstate, bts = bstep(bstate, jnp.asarray(acts))
        for i in range(B):
            sstates[i], sts = sstep(sstates[i], jnp.asarray(acts[i]))
            np.testing.assert_array_equal(np.asarray(sts.obs),
                                          np.asarray(bts.obs)[i])
    # Full-state equality, not just observations.
    for i in range(B):
        for name in sstates[i]._fields:
            a, b = np.asarray(getattr(sstates[i], name)), \
                np.asarray(jax.tree.map(lambda x: x[i], bstate)._asdict()[name])
            if a.dtype == np.uint32:
                a, b = a.view(np.int32), b.view(np.int32)
            np.testing.assert_array_equal(a, b, err_msg=f"lane {i} {name}")


def test_record_episode_statistics():
    env = RecordEpisodeStatistics(PikaZoo(EnvConfig(winning_score=1,
                                                    auto_reset=True)))
    state, _ = env.reset(jax.random.key(9))
    step = jax.jit(env.step)
    key = jax.random.key(10)
    for _ in range(3000):
        key, sub = jax.random.split(key)
        a = jax.random.randint(sub, (2,), 0, NUM_ACTIONS, jnp.int32)
        state, ts, stats = step(state, a)
        if bool(stats.done):
            r = np.asarray(stats.episode_return)
            length = np.asarray(stats.episode_length)
            assert abs(r[0]) == 1 and r[0] == -r[1]
            assert length[0] == length[1] > 0
            # Accumulators must be cleared for the next episode.
            assert np.asarray(state.episode_length).sum() == 0
            return
    pytest.fail("no episode completed")


def test_convert_single_agent():
    env = ConvertSingleAgent(PikaZoo(EnvConfig()), side="player_2")
    state, ts = env.reset(jax.random.key(11))
    assert np.asarray(ts.obs).shape == (35,)
    # Player 2's own view leads with its x = 396.
    assert np.asarray(ts.obs)[0] == 396
    state, ts = jax.jit(env.step)(state, jnp.int32(3))
    assert np.asarray(ts.obs).shape == (35,)
    assert np.asarray(ts.rewards).shape == ()


def test_draw_counter_semantics():
    """Counter advances only on consumed draws: 2 boldness (+1 serve when
    random) at reset and at each round re-init, none on ordinary frames."""
    env = PikaZoo(EnvConfig())
    state, _ = env.reset(jax.random.key(12))
    assert int(state.draw_counter) == 2
    state, _ = jax.jit(env.step)(state, jnp.zeros(2, jnp.int32))
    assert int(state.draw_counter) == 2

    env_r = PikaZoo(EnvConfig(serve="random"))
    state, _ = env_r.reset(jax.random.key(13))
    assert int(state.draw_counter) == 3


def test_step_batch_learner_matches_step_batch():
    """The learner fast path must evolve state identically to step_batch and
    emit exactly normalize(obs) in seat-blocked row order."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pikazoo_tpu.envs import EnvConfig, PikaZoo
    from pikazoo_tpu.train.networks import normalize_obs

    env = PikaZoo(EnvConfig(auto_reset=True))
    B = 16
    state_a, ts = env.reset_batch(jax.random.key(5), B)
    state_b = state_a
    key = jax.random.key(6)
    for _ in range(40):
        key, sub = jax.random.split(key)
        acts = jax.random.randint(sub, (B, 2), 0, 18, jnp.int32)
        state_a, ts = env.step_batch(state_a, acts)
        state_b, norm_obs, reward1, terminated = env.step_batch_learner(
            state_b, acts[:, 0], acts[:, 1])
        for la, lb in zip(jax.tree.leaves(state_a), jax.tree.leaves(state_b)):
            np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
        expect = jnp.concatenate(
            [normalize_obs(ts.obs[:, 0]), normalize_obs(ts.obs[:, 1])],
            axis=0).astype(jnp.bfloat16)
        np.testing.assert_array_equal(np.asarray(norm_obs),
                                      np.asarray(expect))
        np.testing.assert_array_equal(np.asarray(reward1),
                                      np.asarray(ts.rewards[:, 0]))
        np.testing.assert_array_equal(np.asarray(terminated),
                                      np.asarray(ts.terminated))


def test_step_batch_learner_fm_is_transpose():
    """The feature-major learner path is exactly the blocked path's obs
    transposed, with identical state/reward/termination evolution."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pikazoo_tpu.envs import EnvConfig, PikaZoo

    env = PikaZoo(EnvConfig(auto_reset=True))
    B = 16
    state_a, _ = env.reset_batch(jax.random.key(5), B)
    state_b = state_a
    key = jax.random.key(6)
    for _ in range(40):
        key, sub = jax.random.split(key)
        acts = jax.random.randint(sub, (B, 2), 0, 18, jnp.int32)
        state_a, blocked, r_a, t_a = env.step_batch_learner(
            state_a, acts[:, 0], acts[:, 1])
        state_b, fm, r_b, t_b = env.step_batch_learner_fm(
            state_b, acts[:, 0], acts[:, 1])
        assert fm.shape == (35, 2 * B) and fm.dtype == jnp.bfloat16
        np.testing.assert_array_equal(np.asarray(fm), np.asarray(blocked).T)
        np.testing.assert_array_equal(np.asarray(r_a), np.asarray(r_b))
        np.testing.assert_array_equal(np.asarray(t_a), np.asarray(t_b))
        for la, lb in zip(jax.tree.leaves(state_a), jax.tree.leaves(state_b)):
            np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
