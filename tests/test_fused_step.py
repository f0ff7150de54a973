"""Fused multi-frame kernel == scanned env steps, bit for bit (interpret)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pikazoo_tpu.core.fused_step import (BLOCK_ENVS, fused_actions,
                                         fused_rollout)
from pikazoo_tpu.envs import EnvConfig, PikaZoo


def _compare(cfg, frames, seed):
    env = PikaZoo(cfg)
    B = BLOCK_ENVS
    state, _ = env.reset_batch(jax.random.key(seed), B)
    action_key = jax.random.key(seed + 7)

    fused = fused_rollout(state, action_key, cfg, frames, interpret=True)

    actions = fused_actions(action_key, B, frames)
    step = jax.jit(env.step_batch)
    scanned = state
    for t in range(frames):
        scanned, _ = step(scanned, actions[t])

    for name in scanned._fields:
        a = np.asarray(getattr(scanned, name))
        b = np.asarray(getattr(fused, name))
        if a.dtype == np.uint32:
            a, b = a.view(np.int32), b.view(np.int32)
        if not np.array_equal(a, b):
            bad = np.argwhere(np.asarray(a) != np.asarray(b))
            raise AssertionError(
                f"field {name}: {len(bad)} mismatches, first at {bad[0]} "
                f"scanned={a[tuple(bad[0])]} fused={b[tuple(bad[0])]}")


def test_fused_matches_scanned_human():
    _compare(EnvConfig(auto_reset=True, winning_score=2), frames=80, seed=0)


def test_fused_matches_scanned_serve_random():
    _compare(EnvConfig(auto_reset=True, winning_score=2, serve="random"),
             frames=60, seed=1)


def test_fused_matches_scanned_serve_alternate():
    _compare(EnvConfig(auto_reset=True, winning_score=1, serve="alternate"),
             frames=60, seed=3)


@pytest.mark.slow
def test_fused_matches_scanned_computer_ai():
    _compare(EnvConfig(auto_reset=True, winning_score=2,
                       is_player1_computer=True, is_player2_computer=True),
             frames=50, seed=2)


def test_fused_rollout_continues_action_stream_across_calls():
    """Two consecutive fused calls == one long call (actions keyed on the
    cumulative step_count, not a per-call counter)."""
    cfg = EnvConfig(auto_reset=True, winning_score=2)
    env = PikaZoo(cfg)
    state, _ = env.reset_batch(jax.random.key(5), BLOCK_ENVS)
    akey = jax.random.key(6)

    once = fused_rollout(state, akey, cfg, 60, interpret=True)
    twice = fused_rollout(
        fused_rollout(state, akey, cfg, 30, interpret=True),
        akey, cfg, 30, interpret=True)
    for name in once._fields:
        a, b = np.asarray(getattr(once, name)), np.asarray(getattr(twice, name))
        if a.dtype == np.uint32:
            a, b = a.view(np.int32), b.view(np.int32)
        np.testing.assert_array_equal(a, b, err_msg=name)


def test_fused_actions_are_uniformish():
    acts = np.asarray(fused_actions(jax.random.key(0), 256, 40))
    assert acts.shape == (40, 256, 2)
    assert acts.min() >= 0 and acts.max() < 18
    counts = np.bincount(acts.reshape(-1), minlength=18)
    assert counts.min() > 0.5 * counts.mean()
