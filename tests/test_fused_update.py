"""Correctness of the fused Pallas PPO gradient (train/fused_update.py).

Three tiers, interpret mode on CPU (conftest forces the CPU backend):

1. vs a line-by-line jnp transcription of the kernel (same casts, same
   manual backward) — near-exact: isolates pallas-call plumbing (grid
   accumulation, BlockSpecs) from the math.
2. vs ``jax.grad`` of the transcription's FORWARD — validates the
   hand-derived backward against autodiff (looser: the kernel rounds
   upstream gradients to bf16 before the dW matmuls, autodiff does not).
3. vs the production ``loss_fn`` gradient (bf16 activations) — the
   semantic gate the trainer integration relies on.

Plus an end-to-end train-step smoke test with ``fused_update="on"``.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pikazoo_tpu.train.fused_update import fused_ppo_grads
from pikazoo_tpu.train.networks import ActorCritic

A = 18
F = 35
HIDDEN = (32, 32)
M = 512
CLIP, VCOEF, ECOEF = 0.2, 0.5, 0.01


def _make_inputs(seed=0):
    net = ActorCritic(num_actions=A, hidden=HIDDEN)
    k1, k2, k3, k4, k5 = jax.random.split(jax.random.key(seed), 5)
    params = net.init(k1, jnp.zeros((4, F), jnp.int32))
    obs = jax.random.uniform(k2, (M, F)).astype(jnp.bfloat16)
    action = jax.random.randint(k3, (M,), 0, A, jnp.int32)
    logits, value = net.apply(params, obs, pre_normalized=True)
    logp_old = jnp.take_along_axis(jax.nn.log_softmax(logits),
                                   action[:, None], 1)[:, 0]
    # Perturb so ratios leave 1.0 and both clip branches get exercised.
    logp_old = logp_old + 0.3 * jax.random.normal(k4, (M,))
    adv = jax.random.normal(k5, (M,))
    adv_n = (adv - adv.mean()) / (adv.std() + 1e-8)
    target = value + jax.random.normal(k1, (M,))
    return net, params, obs, action, logp_old, value, adv_n, target


def _transcribed_forward(params, obs, action, logp_old, value_old, adv_n,
                         target):
    """Kernel-precision forward: bf16 matmul operands, f32 accumulation."""
    dense = params["params"]
    names = sorted(dense, key=lambda s: int(s.rsplit("_", 1)[1]))
    f32 = jnp.float32
    h_b = obs.astype(jnp.bfloat16)
    for n in names[:-2]:
        pre = jnp.dot(h_b, dense[n]["kernel"].astype(jnp.bfloat16),
                      preferred_element_type=f32) + dense[n]["bias"]
        h_b = jnp.tanh(pre).astype(jnp.bfloat16)
    wp, bp = dense[names[-2]]["kernel"], dense[names[-2]]["bias"]
    wv, bv = dense[names[-1]]["kernel"], dense[names[-1]]["bias"]
    logits = jnp.dot(h_b, wp.astype(jnp.bfloat16),
                     preferred_element_type=f32) + bp
    value = (jnp.dot(h_b, wv.astype(jnp.bfloat16),
                     preferred_element_type=f32) + bv)[:, 0]
    logp_all = jax.nn.log_softmax(logits)
    p = jnp.exp(logp_all)
    onehot = jax.nn.one_hot(action, A, dtype=f32)
    lp_new = (logp_all * onehot).sum(-1)
    ratio = jnp.exp(lp_new - logp_old)
    unclipped = ratio * adv_n
    clipped = jnp.clip(ratio, 1 - CLIP, 1 + CLIP) * adv_n
    policy_loss = -jnp.minimum(unclipped, clipped).mean()
    vclip = value_old + jnp.clip(value - value_old, -CLIP, CLIP)
    value_loss = 0.5 * jnp.maximum((value - target) ** 2,
                                   (vclip - target) ** 2).mean()
    entropy = -(p * logp_all).sum(-1).mean()
    total = policy_loss + VCOEF * value_loss - ECOEF * entropy
    approx_kl = ((ratio - 1) - jnp.log(ratio)).mean()
    return total, (policy_loss, value_loss, entropy, approx_kl)


def _fused(params, obs, action, logp_old, value_old, adv_n, target):
    return fused_ppo_grads(params, obs, action, logp_old, value_old, adv_n,
                           target, num_actions=A, activation="tanh",
                           clip_eps=CLIP, value_coef=VCOEF,
                           entropy_coef=ECOEF, interpret=True)


def _flat(tree):
    return jnp.concatenate([x.ravel() for x in jax.tree.leaves(tree)])


def test_fused_losses_match_transcription():
    net, params, obs, action, logp_old, v_old, adv_n, target = _make_inputs()
    _, losses = _fused(params, obs, action, logp_old, v_old, adv_n, target)
    total, (pl_, vl, ent, kl) = _transcribed_forward(
        params, obs, action, logp_old, v_old, adv_n, target)
    ref = jnp.stack([total, pl_, vl, ent, kl])
    np.testing.assert_allclose(np.asarray(losses), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_fused_grads_match_autodiff_of_transcription():
    net, params, obs, action, logp_old, v_old, adv_n, target = _make_inputs()
    grads, _ = _fused(params, obs, action, logp_old, v_old, adv_n, target)
    ref_grads = jax.grad(
        lambda p: _transcribed_forward(p, obs, action, logp_old, v_old,
                                       adv_n, target)[0])(params)
    assert jax.tree.structure(grads) == jax.tree.structure(params)
    g, r = np.asarray(_flat(grads), np.float64), np.asarray(_flat(ref_grads),
                                                            np.float64)
    cos = g @ r / (np.linalg.norm(g) * np.linalg.norm(r))
    assert cos > 0.9995, cos
    assert abs(np.linalg.norm(g) / np.linalg.norm(r) - 1) < 0.02
    # Per-leaf agreement (kernel rounds upstream grads to bf16 for the dW
    # matmuls; autodiff keeps them f32 — allow bf16-scale relative error).
    for (path, gl), (_, rl) in zip(
            jax.tree_util.tree_flatten_with_path(grads)[0],
            jax.tree_util.tree_flatten_with_path(ref_grads)[0]):
        denom = np.linalg.norm(np.asarray(rl, np.float64)) + 1e-12
        err = np.linalg.norm(np.asarray(gl, np.float64)
                             - np.asarray(rl, np.float64)) / denom
        assert err < 0.02, (path, err)


def test_fused_grads_match_production_loss():
    """Semantic gate: same direction as the bf16 XLA loss_fn gradient."""
    net, params, obs, action, logp_old, v_old, adv_n, target = _make_inputs()
    grads, losses = _fused(params, obs, action, logp_old, v_old, adv_n,
                           target)

    def production_loss(p):
        logits, value = net.apply(p, obs, pre_normalized=True)
        log_probs = jax.nn.log_softmax(logits)
        one_hot = jax.nn.one_hot(action, A, dtype=log_probs.dtype)
        log_prob = (log_probs * one_hot).sum(-1)
        ratio = jnp.exp(log_prob - logp_old)
        unclipped = ratio * adv_n
        clipped = jnp.clip(ratio, 1 - CLIP, 1 + CLIP) * adv_n
        policy_loss = -jnp.minimum(unclipped, clipped).mean()
        vclip = v_old + jnp.clip(value - v_old, -CLIP, CLIP)
        value_loss = 0.5 * jnp.maximum((value - target) ** 2,
                                       (vclip - target) ** 2).mean()
        entropy = -(jnp.exp(log_probs) * log_probs).sum(-1).mean()
        return policy_loss + VCOEF * value_loss - ECOEF * entropy

    ref_grads = jax.grad(production_loss)(params)
    g, r = np.asarray(_flat(grads), np.float64), np.asarray(_flat(ref_grads),
                                                            np.float64)
    cos = g @ r / (np.linalg.norm(g) * np.linalg.norm(r))
    assert cos > 0.99, cos
    assert np.isfinite(np.asarray(losses)).all()
    np.testing.assert_allclose(float(losses[0]), float(production_loss(
        params)), rtol=0.05, atol=2e-3)


def test_train_step_fused_smoke():
    from pikazoo_tpu.envs import EnvConfig, PikaZoo
    from pikazoo_tpu.train import PPOConfig, make_ppo_trainer

    env = PikaZoo(EnvConfig(auto_reset=True))
    cfg = PPOConfig(num_envs=8, rollout_length=8, num_minibatches=2,
                    update_epochs=1, hidden=(32, 32), fused_update="on")
    init_fn, train_step, _ = make_ppo_trainer(env, cfg)
    runner = init_fn(jax.random.key(0))
    runner2, metrics = jax.jit(train_step)(runner)
    assert np.isfinite(float(metrics.total_loss))
    assert np.isfinite(float(metrics.approx_kl))
    before = _flat(runner.params)
    after = _flat(runner2.params)
    assert not np.allclose(np.asarray(before), np.asarray(after))


def test_train_step_fused_mesh_matches_single():
    """Mesh path (shard_map + psum of kernel partials) vs the single-device
    fused path: same seed, same trajectory -> params equal to f32 tolerance
    (only the grad-accumulation order differs)."""
    from pikazoo_tpu.envs import EnvConfig, PikaZoo
    from pikazoo_tpu.parallel import env_sharding, make_env_mesh, shard_batch
    from pikazoo_tpu.train import PPOConfig, make_ppo_trainer

    env = PikaZoo(EnvConfig(auto_reset=True))
    cfg = PPOConfig(num_envs=16, rollout_length=8, num_minibatches=2,
                    update_epochs=1, hidden=(32, 32), fused_update="on")

    init_fn, step_single, _ = make_ppo_trainer(env, cfg)
    runner = init_fn(jax.random.key(3))
    out_single, m_single = jax.jit(step_single)(runner)

    mesh = make_env_mesh()
    assert len(mesh.devices.ravel()) > 1, "conftest should provide 8 devices"
    init_fn2, step_mesh, _ = make_ppo_trainer(env, cfg, mesh=mesh)
    runner2 = init_fn2(jax.random.key(3))
    runner2 = runner2._replace(
        env_state=shard_batch(runner2.env_state, mesh),
        last_obs=jax.device_put(runner2.last_obs, env_sharding(mesh)))
    out_mesh, m_mesh = jax.jit(step_mesh)(runner2)

    np.testing.assert_allclose(float(m_single.total_loss),
                               float(m_mesh.total_loss), rtol=1e-4,
                               atol=1e-5)
    for a, b in zip(jax.tree.leaves(out_single.params),
                    jax.tree.leaves(out_mesh.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-5)


# ---------------------------------------------------------------------------
# Feature-major variant (fused_ppo_grads_fm): same math, transposed layout.

def _fm_shape(x):
    """(M, ...) row-major test inputs -> (T, B2) feature-major shape."""
    return x.reshape(4, M // 4, *x.shape[1:])


def _fused_fm(params, obs, action, logp_old, value_old, adv_n, target):
    from pikazoo_tpu.train.fused_update import fused_ppo_grads_fm
    obs_fm = jnp.swapaxes(_fm_shape(obs), 1, 2)            # (T, F, B2)
    return fused_ppo_grads_fm(
        params, obs_fm, _fm_shape(action), _fm_shape(logp_old),
        _fm_shape(value_old), _fm_shape(adv_n), _fm_shape(target),
        num_actions=A, activation="tanh", clip_eps=CLIP, value_coef=VCOEF,
        entropy_coef=ECOEF, interpret=True)


def test_fm_losses_match_transcription():
    net, params, obs, action, logp_old, v_old, adv_n, target = _make_inputs()
    _, losses = _fused_fm(params, obs, action, logp_old, v_old, adv_n,
                          target)
    total, (pl_, vl, ent, kl) = _transcribed_forward(
        params, obs, action, logp_old, v_old, adv_n, target)
    ref = jnp.stack([total, pl_, vl, ent, kl])
    np.testing.assert_allclose(np.asarray(losses), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_fm_grads_match_row_major_and_autodiff():
    net, params, obs, action, logp_old, v_old, adv_n, target = _make_inputs()
    fm_grads, fm_losses = _fused_fm(params, obs, action, logp_old, v_old,
                                    adv_n, target)
    rm_grads, rm_losses = _fused(params, obs, action, logp_old, v_old,
                                 adv_n, target)
    # vs the row-major kernel: identical math, only accumulation order and
    # the activation-derivative operand precision differ.
    np.testing.assert_allclose(np.asarray(fm_losses), np.asarray(rm_losses),
                               rtol=1e-4, atol=1e-5)
    g = np.asarray(_flat(fm_grads), np.float64)
    r = np.asarray(_flat(rm_grads), np.float64)
    cos = g @ r / (np.linalg.norm(g) * np.linalg.norm(r))
    assert cos > 0.9999, cos
    # vs autodiff of the transcription (the correctness anchor).
    ref_grads = jax.grad(
        lambda p: _transcribed_forward(p, obs, action, logp_old, v_old,
                                       adv_n, target)[0])(params)
    r2 = np.asarray(_flat(ref_grads), np.float64)
    cos2 = g @ r2 / (np.linalg.norm(g) * np.linalg.norm(r2))
    assert cos2 > 0.9995, cos2
    for (path, gl), (_, rl) in zip(
            jax.tree_util.tree_flatten_with_path(fm_grads)[0],
            jax.tree_util.tree_flatten_with_path(ref_grads)[0]):
        denom = np.linalg.norm(np.asarray(rl, np.float64)) + 1e-12
        err = np.linalg.norm(np.asarray(gl, np.float64)
                             - np.asarray(rl, np.float64)) / denom
        assert err < 0.02, (path, err)


def test_train_step_fm_smoke():
    from pikazoo_tpu.envs import EnvConfig, PikaZoo
    from pikazoo_tpu.train import PPOConfig, make_ppo_trainer

    env = PikaZoo(EnvConfig(auto_reset=True))
    # 2B = 128 rows per seat-folded batch: the fm kernel's minimum column
    # tile (floor 128) divides it.
    cfg = PPOConfig(num_envs=64, rollout_length=8, num_minibatches=2,
                    update_epochs=1, hidden=(32, 32), fused_update="fm")
    init_fn, train_step, _ = make_ppo_trainer(env, cfg)
    runner = init_fn(jax.random.key(0))
    runner2, metrics = jax.jit(train_step)(runner)
    assert np.isfinite(float(metrics.total_loss))
    before = _flat(runner.params)
    after = _flat(runner2.params)
    assert not np.allclose(np.asarray(before), np.asarray(after))


def test_train_step_fm_mesh_matches_single():
    from pikazoo_tpu.envs import EnvConfig, PikaZoo
    from pikazoo_tpu.parallel import env_sharding, make_env_mesh, shard_batch
    from pikazoo_tpu.train import PPOConfig, make_ppo_trainer

    env = PikaZoo(EnvConfig(auto_reset=True))
    # 8 devices x 128-column tile floor -> 2B = 2048 -> 1024 envs.
    cfg = PPOConfig(num_envs=1024, rollout_length=4, num_minibatches=2,
                    update_epochs=1, hidden=(32, 32), fused_update="fm")

    init_fn, step_single, _ = make_ppo_trainer(env, cfg)
    runner = init_fn(jax.random.key(3))
    out_single, m_single = jax.jit(step_single)(runner)

    mesh = make_env_mesh()
    assert len(mesh.devices.ravel()) > 1, "conftest should provide 8 devices"
    init_fn2, step_mesh, _ = make_ppo_trainer(env, cfg, mesh=mesh)
    runner2 = init_fn2(jax.random.key(3))
    runner2 = runner2._replace(
        env_state=shard_batch(runner2.env_state, mesh),
        last_obs=jax.device_put(runner2.last_obs, env_sharding(mesh)))
    out_mesh, m_mesh = jax.jit(step_mesh)(runner2)

    np.testing.assert_allclose(float(m_single.total_loss),
                               float(m_mesh.total_loss), rtol=2e-4,
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(_flat(out_single.params)),
                               np.asarray(_flat(out_mesh.params)),
                               rtol=2e-3, atol=2e-5)


# ---------------------------------------------------------------------------
# int8 quantized modes ("int8" / "int8fwd"): opt-in MXU-int8 operands.
# Hardware audit 2026-08-20 (tools/fm_variants_probe.py): the matmuls-only
# sequence runs 1.47x faster in int8 on v5e, but requantization sits on the
# matmul critical path, so end-to-end the grad step is +3% (int8fwd) / -4%
# (int8).  These tests pin the QUALITY contract: per-tensor gradient
# direction within cos >= 0.99 of the bf16 kernel and losses within 1%.

def _fused_fm_q(params, obs, action, logp_old, value_old, adv_n, target,
                quant):
    from pikazoo_tpu.train.fused_update import fused_ppo_grads_fm
    obs_fm = jnp.swapaxes(_fm_shape(obs), 1, 2)            # (T, F, B2)
    return fused_ppo_grads_fm(
        params, obs_fm, _fm_shape(action), _fm_shape(logp_old),
        _fm_shape(value_old), _fm_shape(adv_n), _fm_shape(target),
        num_actions=A, activation="tanh", clip_eps=CLIP, value_coef=VCOEF,
        entropy_coef=ECOEF, interpret=True, quant=quant)


@pytest.mark.parametrize("quant", ["int8", "int8fwd"])
def test_fm_int8_grads_track_bf16(quant):
    net, params, obs, action, logp_old, v_old, adv_n, target = _make_inputs()
    g0, l0 = _fused_fm(params, obs, action, logp_old, v_old, adv_n, target)
    g1, l1 = _fused_fm_q(params, obs, action, logp_old, v_old, adv_n,
                         target, quant)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l0), rtol=0.01,
                               atol=1e-4)
    for (path, a), (_, b) in zip(
            jax.tree_util.tree_flatten_with_path(g0)[0],
            jax.tree_util.tree_flatten_with_path(g1)[0]):
        a = np.asarray(a, np.float64).ravel()
        b = np.asarray(b, np.float64).ravel()
        cos = a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-30)
        assert cos > 0.99, (path, cos)
        rel = np.linalg.norm(b) / (np.linalg.norm(a) + 1e-30)
        assert 0.9 < rel < 1.1, (path, rel)


def test_fm_int8_requires_tanh():
    net, params, obs, action, logp_old, v_old, adv_n, target = _make_inputs()
    from pikazoo_tpu.train.fused_update import fused_ppo_grads_fm
    obs_fm = jnp.swapaxes(_fm_shape(obs), 1, 2)
    with pytest.raises(ValueError, match="tanh"):
        fused_ppo_grads_fm(
            params, obs_fm, _fm_shape(action), _fm_shape(logp_old),
            _fm_shape(v_old), _fm_shape(adv_n), _fm_shape(target),
            num_actions=A, activation="relu", clip_eps=CLIP,
            value_coef=VCOEF, entropy_coef=ECOEF, interpret=True,
            quant="int8")


def test_update_quant_requires_fm_kernel():
    # update_quant only exists in the feature-major kernel; a resolution to
    # xla/row-major must raise instead of silently running bf16 (round-4
    # advisor finding: a user could believe they were A/B-ing int8).
    import pytest

    from pikazoo_tpu.envs import EnvConfig, PikaZoo
    from pikazoo_tpu.train import PPOConfig, make_ppo_trainer

    env = PikaZoo(EnvConfig(auto_reset=True))
    cfg = PPOConfig(num_envs=64, rollout_length=8, num_minibatches=2,
                    update_epochs=1, hidden=(32, 32), fused_update="xla",
                    update_quant="int8")
    with pytest.raises(ValueError, match="feature-major"):
        make_ppo_trainer(env, cfg)


def test_train_step_provenance_attribute():
    from pikazoo_tpu.envs import EnvConfig, PikaZoo
    from pikazoo_tpu.train import PPOConfig, make_ppo_trainer

    env = PikaZoo(EnvConfig(auto_reset=True))
    cfg = PPOConfig(num_envs=64, rollout_length=8, num_minibatches=2,
                    update_epochs=1, hidden=(32, 32), fused_update="xla")
    _, train_step, _ = make_ppo_trainer(env, cfg)
    assert train_step.provenance["fused_update"] == "xla"
    assert train_step.provenance["configured"] == "xla"
    # "auto" resolves by backend; on the CPU test backend that is xla.
    import dataclasses

    _, ts_auto, _ = make_ppo_trainer(
        env, dataclasses.replace(cfg, fused_update="auto"))
    assert ts_auto.provenance["fused_update"] == "xla"
    assert ts_auto.provenance["backend"] == "cpu"


def test_train_step_int8_smoke():
    from pikazoo_tpu.envs import EnvConfig, PikaZoo
    from pikazoo_tpu.train import PPOConfig, make_ppo_trainer

    env = PikaZoo(EnvConfig(auto_reset=True))
    cfg = PPOConfig(num_envs=64, rollout_length=8, num_minibatches=2,
                    update_epochs=1, hidden=(32, 32), fused_update="fm",
                    update_quant="int8")
    init_fn, train_step, _ = make_ppo_trainer(env, cfg)
    runner = init_fn(jax.random.key(0))
    runner2, metrics = jax.jit(train_step)(runner)
    assert np.isfinite(float(metrics.total_loss))
    assert not np.allclose(np.asarray(_flat(runner.params)),
                           np.asarray(_flat(runner2.params)))
