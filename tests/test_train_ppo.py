"""PPO trainer: smoke, determinism, learning signal, checkpoint round-trip."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pikazoo_tpu.envs import EnvConfig, PikaZoo
from pikazoo_tpu.train import PPOConfig, make_ppo_trainer
from pikazoo_tpu.train import checkpoint as ckpt


def tiny_cfg(**kw):
    base = dict(num_envs=16, rollout_length=16, num_minibatches=2,
                update_epochs=2, hidden=(32, 32))
    base.update(kw)
    return PPOConfig(**base)


def test_ppo_train_step_runs_and_is_finite():
    env = PikaZoo(EnvConfig(winning_score=2))
    init_fn, train_step, _ = make_ppo_trainer(env, tiny_cfg())
    runner = init_fn(jax.random.key(0))
    step = jax.jit(train_step)
    for _ in range(3):
        runner, metrics = step(runner)
    assert np.isfinite(float(metrics.total_loss))
    assert np.isfinite(float(metrics.entropy))
    assert float(metrics.entropy) > 0
    assert int(metrics.env_steps) == 16 * 16
    # Env actually advanced.
    assert int(np.asarray(runner.env_state.step_count).min()) == 3 * 16


def test_ppo_deterministic_given_key():
    env = PikaZoo(EnvConfig())
    init_fn, train_step, _ = make_ppo_trainer(env, tiny_cfg())
    step = jax.jit(train_step)

    r1, m1 = step(init_fn(jax.random.key(1)))
    r2, m2 = step(init_fn(jax.random.key(1)))
    assert float(m1.total_loss) == float(m2.total_loss)
    l1 = jax.tree.leaves(r1.params)
    l2 = jax.tree.leaves(r2.params)
    for a, b in zip(l1, l2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_ppo_entropy_decreases_with_training():
    """A crude learning signal: after some updates the policy should move off
    uniform (entropy drops) without diverging."""
    env = PikaZoo(EnvConfig(winning_score=2))
    cfg = tiny_cfg(num_envs=64, rollout_length=32, entropy_coef=0.0)
    init_fn, train_step, _ = make_ppo_trainer(env, cfg)
    runner = init_fn(jax.random.key(2))
    step = jax.jit(train_step)
    runner, m0 = step(runner)
    first_entropy = float(m0.entropy)
    for _ in range(15):
        runner, m = step(runner)
    assert np.isfinite(float(m.total_loss))
    assert float(m.entropy) < first_entropy


def test_checkpoint_roundtrip(tmp_path):
    pytest.importorskip("orbax.checkpoint")
    env = PikaZoo(EnvConfig())
    init_fn, train_step, _ = make_ppo_trainer(env, tiny_cfg())
    runner = init_fn(jax.random.key(3))
    runner, _ = jax.jit(train_step)(runner)

    path = str(tmp_path / "ckpt")
    ckpt.save(path, runner)
    restored = ckpt.restore(path, init_fn(jax.random.key(4)))

    # Bit-exact resume: one more step from each must agree.
    r1, m1 = jax.jit(train_step)(runner)
    r2, m2 = jax.jit(train_step)(restored)
    assert float(m1.total_loss) == float(m2.total_loss)
    np.testing.assert_array_equal(np.asarray(r1.env_state.scores),
                                  np.asarray(r2.env_state.scores))
