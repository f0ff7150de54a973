"""Evaluation harness: win rate of a policy against the built-in rule AI.

The classic pika-zoo benchmark of progress: seat the learned policy as
player 1 and let the reference's rule-based computer control player 2
(``is_player2_computer=True`` makes physics overwrite player 2's input, so the
action fed for that seat is irrelevant).  Batched, auto-resetting, fully
jitted: one scan plays ``num_envs`` matches for ``max_frames`` and tallies
terminations by winner.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from pikazoo_tpu.envs import EnvConfig, PikaZoo


class EvalResult(NamedTuple):
    games: jnp.ndarray
    policy_wins: jnp.ndarray
    win_rate: jnp.ndarray
    mean_score_diff: jnp.ndarray  # policy score - AI score at terminations


def evaluate_vs_computer(network, params, *, num_envs: int = 512,
                         max_frames: int = 20_000, winning_score: int = 5,
                         greedy: bool = True, seed: int = 0,
                         simplify_actions: bool = False,
                         env_config: Optional[EnvConfig] = None) -> EvalResult:
    """Play policy (seat 1) vs rule AI (seat 2); returns aggregate stats.

    Set ``simplify_actions=True`` for policies trained on the 13-action
    SimplifyAction space — their outputs are mapped through the seat-1
    action table before hitting the raw 18-action env."""
    cfg = env_config or EnvConfig(winning_score=winning_score,
                                  is_player2_computer=True, auto_reset=True)
    env = PikaZoo(cfg)
    from pikazoo_tpu.wrappers.transforms import SIMPLIFY_P1

    def run(key):
        ekey, akey = jax.random.split(jax.random.fold_in(key, 1))
        state, ts = env.reset_batch(ekey, num_envs)

        def body(carry, _):
            state, obs, key = carry
            key, sub = jax.random.split(key)
            logits, _ = network.apply(params, obs[:, 0])
            if greedy:
                a1 = jnp.argmax(logits, -1).astype(jnp.int32)
            else:
                a1 = jax.random.categorical(sub, logits).astype(jnp.int32)
            if simplify_actions:
                a1 = SIMPLIFY_P1[a1]
            actions = jnp.stack([a1, jnp.zeros_like(a1)], axis=1)
            state, ts = env.step_batch(state, actions)
            done = ts.terminated == 1
            p1_won = done & (ts.scores[:, 0] > ts.scores[:, 1])
            diff = jnp.where(done, ts.scores[:, 0] - ts.scores[:, 1], 0)
            return (state, ts.obs, key), (done.astype(jnp.int32),
                                          p1_won.astype(jnp.int32), diff)

        (_, _, _), (dones, wins, diffs) = jax.lax.scan(
            body, (state, ts.obs, akey), None, length=max_frames)
        games = dones.sum()
        policy_wins = wins.sum()
        return EvalResult(
            games=games,
            policy_wins=policy_wins,
            win_rate=policy_wins / jnp.maximum(games, 1),
            mean_score_diff=diffs.sum() / jnp.maximum(games, 1),
        )

    return jax.jit(run)(jax.random.key(seed))
