"""Self-play PPO actor-learner on the sharded env batch (SURVEY.md N7).

One ``train_step`` = rollout ``T`` frames on ``B`` vmapped envs (both seats
share the policy; each seat contributes a trajectory, so the learner batch is
``T x 2B``), GAE, and several clipped-PPO epochs — all inside a single
``jit``.  Sharding: env state / trajectories are split along the batch axis
of the device mesh; parameters and optimizer state are replicated.  The
rollout and the fused minibatch gradient each run under ``shard_map`` with
a device-LOCAL seat-blocked layout, so the only collectives in the whole
train step are gradient/loss ``psum``s (asserted from the compiled HLO in
``tests/test_perf_contract.py``); meshed action sampling slices each
shard's columns out of the global uniform row, so meshed and single-device
training are bit-matched.

TPU layout note: all learner tensors keep the (huge) folded batch axis as
the minor-most dimension wherever there is no feature axis — a trailing
seat/feature axis of 2 would be padded to the 128-wide vector lanes and
multiply HBM traffic up to 64x (measured: the pre-fold update phase was 12x
slower).  See ``Transition``.

Minibatches are formed by shuffling and splitting the TIME axis while keeping
the (sharded) batch axis intact, so the update phase needs no resharding
communication; the per-minibatch sample diversity comes from the thousands of
independent env lanes.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh

from pikazoo_tpu.envs.pika_volley import EnvState, PikaZoo
from pikazoo_tpu.parallel.mesh import env_sharding, replicated_sharding
from pikazoo_tpu.train.networks import ActorCritic


@dataclasses.dataclass(frozen=True)
class PPOConfig:
    num_envs: int = 4096
    rollout_length: int = 128
    num_actions: int = 18  # 13 when trained through SimplifyAction
    learning_rate: float = 3e-4
    # Linear LR anneal to 0 over this many updates (None = constant LR).
    anneal_updates: Optional[int] = None
    gamma: float = 0.99
    gae_lambda: float = 0.95
    clip_eps: float = 0.2
    entropy_coef: float = 0.01
    value_coef: float = 0.5
    max_grad_norm: float = 0.5
    update_epochs: int = 4
    num_minibatches: int = 4  # splits the time axis
    hidden: Tuple[int, ...] = (256, 256)
    activation: str = "tanh"  # "relu" trades the PPO-conventional tanh for
    # a cheaper VPU op (see networks.ActorCritic)
    # "both": symmetric self-play, both seats feed the learner.
    # "p1": only seat 1's trajectory trains (e.g. vs the rule AI on seat 2 —
    # pass an env with is_player2_computer=True; the AI ignores seat-2 input).
    learner_seats: str = "both"
    # Minibatch gradients via the fused Pallas kernel (train/fused_update.py):
    # one HBM pass instead of per-layer activation round trips.  "auto" =
    # the feature-major kernel when running on TPU (measured ~2x the full
    # train step vs XLA autodiff on v5e), XLA autodiff elsewhere; "off" =
    # XLA autodiff; "fm" = feature-major always; "on" = row-major always
    # (slower on TPU — kept as the layout A/B).  Off-TPU the forced modes
    # run interpret-mode (test use only).  The fused paths accumulate
    # matmuls in f32, so they are not bitwise-identical to the bf16 XLA
    # path.
    fused_update: str = "auto"
    # int8 MXU operands inside the feature-major fused kernel: "none"
    # (bf16, default), "int8fwd" (forward dots int8, stock bf16 backward)
    # or "int8" (heavy backward dots int8 too, dynamic per-tile scales).
    # Measured on v5e (tools/fm_variants_probe.py, 2026-08-20): the MXU
    # runs int8 at 2x bf16 (matmuls-only probe 1.47x) but the per-layer
    # requantization sits on the matmul critical path, so end-to-end the
    # grad step moves 18.65 -> 18.10 ms (int8fwd, +3%) / 19.35 (int8, -4%).
    # Gradient fidelity: cos >= 0.997 per tensor vs the bf16 kernel.
    # Kept as validated opt-in modes; requires activation="tanh" and the
    # feature-major kernel.
    update_quant: str = "none"
    # Shuffle the trajectory's time axis before the minibatch split.  Each
    # minibatch already mixes T_mb frames x 2B env-seats (millions of
    # near-i.i.d. rows), so the frame-level shuffle adds no measurable
    # decorrelation at this scale — vs-AI training reaches the same 100%
    # win rate by update 250 with or without it (artifacts/
    # fm_vs_ai_training.jsonl vs noshuffle run, 2026-08-17) — while its
    # gather materializes a full trajectory copy (~1.5 GB at 65536 envs,
    # ~110 ms/update on v5e, -24% train-step throughput).  Default OFF;
    # turn on for textbook-PPO epoch semantics.
    shuffle_minibatches: bool = False


class Transition(NamedTuple):
    """Per-frame learner record with the SEAT DIMENSION FOLDED INTO BATCH:
    leaves are (2B,) / (2B, 35), seat-BLOCKED (rows [0, B) are seat 1,
    [B, 2B) seat 2 — the layout ``env.step_batch_learner`` emits; on a
    mesh the blocking is per DEVICE SHARD, since the rollout runs under
    shard_map — every consumer is column-order-agnostic).  TPU
    layouts map the minor-most dimension to the 128-wide vector lanes, so a
    trailing seat axis of 2 would pad every materialized learner buffer up
    to 64x — folding it is what lets the update phase run at memory speed."""

    obs: jnp.ndarray       # (35, 2B) normalized bfloat16, FEATURE-MAJOR
                           # (env batch on the vector lanes; fed unchanged
                           # to the feature-major fused gradient kernel)
    action: jnp.ndarray    # (2B,)
    log_prob: jnp.ndarray  # (2B,)
    value: jnp.ndarray     # (2B,)
    reward: jnp.ndarray    # (2B,) float32
    done: jnp.ndarray      # (2B,) float32 (episode end, repeated per seat)


class PPORunnerState(NamedTuple):
    params: dict
    opt_state: optax.OptState
    env_state: EnvState
    last_obs: jnp.ndarray  # (B, 2, 35)
    key: jax.Array
    update_index: jnp.ndarray


class TrainMetrics(NamedTuple):
    total_loss: jnp.ndarray
    policy_loss: jnp.ndarray
    value_loss: jnp.ndarray
    entropy: jnp.ndarray
    approx_kl: jnp.ndarray
    mean_reward: jnp.ndarray
    episodes_finished: jnp.ndarray
    env_steps: jnp.ndarray


def gae_associative(value: jnp.ndarray, reward: jnp.ndarray,
                    done: jnp.ndarray, last_value: jnp.ndarray,
                    gamma: float, lam: float
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """GAE advantages/targets over leading time axis T.

    GAE is the first-order linear recurrence
      ``gae_t = delta_t + (gamma * lam * not_done_t) * gae_{t+1}``,
    evaluated with an ASSOCIATIVE scan: a sequential lax.scan issues T tiny
    kernels over the (2B,) learner batch (measured ~100 ms of the train step
    at T=128, B=65536); the associative form is O(log T) full-buffer passes
    (~ms).  Float reassociation makes it differ from the sequential scan
    only at rounding level (tested to 1e-5 in test_train_ppo.py, which
    exercises THIS function)."""
    not_done = 1.0 - done                                  # (T, 2B)
    next_value = jnp.concatenate([value[1:], last_value[None]], axis=0)
    delta = reward + gamma * next_value * not_done - value
    coef = gamma * lam * not_done
    # Last element's recurrence term is gae_{T} = 0, so coef_T is unused;
    # flip to run the suffix recurrence as a prefix scan.
    a = jnp.flip(coef, axis=0)
    b = jnp.flip(delta, axis=0)

    def combine(left, right):
        a_l, b_l = left
        a_r, b_r = right
        return a_l * a_r, a_r * b_l + b_r

    _, y = jax.lax.associative_scan(combine, (a, b), axis=0)
    advantages = jnp.flip(y, axis=0)
    return advantages, advantages + value


def make_ppo_trainer(env: PikaZoo, cfg: PPOConfig = PPOConfig(),
                     mesh: Optional[Mesh] = None):
    """Build ``(init_fn, train_step_fn, network)``.

    ``init_fn(key) -> PPORunnerState`` and
    ``train_step_fn(runner) -> (runner, TrainMetrics)`` (jit-able; pass
    ``mesh`` to get sharding constraints for multi-device execution).
    """
    network = ActorCritic(num_actions=cfg.num_actions, hidden=cfg.hidden,
                          activation=cfg.activation)
    if cfg.anneal_updates:
        steps_per_update = cfg.update_epochs * cfg.num_minibatches
        lr = optax.linear_schedule(
            cfg.learning_rate, 0.0, cfg.anneal_updates * steps_per_update)
    else:
        lr = cfg.learning_rate
    tx = optax.chain(
        optax.clip_by_global_norm(cfg.max_grad_norm),
        optax.adam(lr),
    )

    def _constrain(tree, sharded: bool):
        if mesh is None:
            return tree
        s = env_sharding(mesh) if sharded else replicated_sharding(mesh)
        return jax.lax.with_sharding_constraint(tree, s)

    # ---------------------------------------------------------------- init --
    def init_fn(key: jax.Array) -> PPORunnerState:
        key, net_key, env_key = jax.random.split(key, 3)
        env_state, ts = env.reset_batch(env_key, cfg.num_envs)
        params = network.init(net_key, ts.obs)
        opt_state = tx.init(params)
        return PPORunnerState(params, opt_state, env_state, ts.obs, key,
                              jnp.int32(0))

    # ------------------------------------------------------------- rollout --
    def policy_sample(params, norm_obs_fm, u):
        # FEATURE-MAJOR policy step: obs (F, 2B) -> logits (A, 2B), so all
        # per-action math (softmax, sampling, log-prob select) reduces over
        # the SUBLANE axis.  The row-major layout put A=18 on the 128-wide
        # lanes — its padded cross-lane argmax alone was 27 ms of a 50 ms
        # rollout in the device profile.
        from pikazoo_tpu.train.networks import apply_fm

        logits, value = apply_fm(params, norm_obs_fm,
                                 activation=cfg.activation)
        log_probs = jax.nn.log_softmax(logits, axis=0)     # (A, 2B)
        # Inverse-CDF sampling with ONE uniform per column instead of
        # jax.random.categorical's (A, 2B) gumbel tensor (18x the bits).
        p = jnp.exp(log_probs.astype(jnp.float32))
        # Prefix-sum over the A=18 sublanes as a tiny triangular matmul:
        # jnp.cumsum lowers to reduce-window (12 ms/rollout in the device
        # profile); the (A, A) @ (A, 2B) dot rides the MXU instead.
        tri = jnp.tril(jnp.ones((cfg.num_actions, cfg.num_actions),
                                jnp.float32))
        cdf = jax.lax.dot_general(tri, p, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        # ``u`` is the (1, 2B) per-column uniform row, drawn by the caller
        # (on a mesh each shard slices its columns out of the GLOBAL row so
        # meshed and single-device sampling are bit-identical).
        # Scale by the column total (~1.0) so bf16 rounding in the logits
        # can never push u past the last bucket.
        action = jnp.sum(cdf < u * cdf[-1:, :], axis=0)
        one_hot = (jax.lax.broadcasted_iota(jnp.int32, log_probs.shape, 0)
                   == action[None, :]).astype(log_probs.dtype)
        log_prob = (log_probs * one_hot).sum(axis=0)       # (2B,)
        return action.astype(jnp.int32), log_prob, value

    def _rollout_body(params, env_state, obs, key, axis=None):
        from pikazoo_tpu.train.networks import normalize_obs

        # Learner fast path (env.step_batch_learner): the env hands back
        # normalized bf16 seat-BLOCKED (2B, 35) rows directly (stored as-is
        # in the trajectory, so update-phase log-probs recompute from
        # bit-identical network inputs).  The standard step's (B, 2, 35)
        # int32 obs tensor tile-pads ~15x on TPU and the rollout would pay
        # that twice per frame (assembly write + normalize read).
        num_envs = obs.shape[0]
        norm0 = jnp.concatenate(
            [normalize_obs(obs[:, 0]).T, normalize_obs(obs[:, 1]).T],
            axis=1).astype(jnp.bfloat16)                   # (35, 2B)

        def step(carry, _):
            env_state, norm_obs, key = carry
            key, akey = jax.random.split(key)
            if axis is None:
                u = jax.random.uniform(akey, (1, norm_obs.shape[1]),
                                       jnp.float32)
            else:
                # Every shard draws the GLOBAL uniform row from the
                # replicated key (2B floats — trivially cheap) and slices
                # its own seat-blocked columns, so meshed sampling is
                # bit-identical to the single-device run and the carry key
                # stays replicated.  Global seat-blocked layout: seat-1
                # columns [0, B) then seat-2 [B, 2B); this shard holds
                # local envs [i*b, (i+1)*b) of each seat block.
                n = mesh.shape[axis]  # static: shapes must be concrete
                b = num_envs  # local envs per shard
                u_full = jax.random.uniform(akey, (1, 2 * b * n),
                                            jnp.float32)
                i = jax.lax.axis_index(axis)
                u = jnp.concatenate([
                    jax.lax.dynamic_slice(u_full, (0, i * b), (1, b)),
                    jax.lax.dynamic_slice(u_full, (0, (n + i) * b), (1, b)),
                ], axis=1)
            action, log_prob, value = policy_sample(params, norm_obs, u)
            env_state, next_norm, reward1, terminated = \
                env.step_batch_learner_fm(env_state, action[:num_envs],
                                          action[num_envs:])
            done = (terminated == 1).astype(jnp.float32)
            reward1 = reward1.astype(jnp.float32)
            tr = Transition(obs=norm_obs, action=action, log_prob=log_prob,
                            value=value,
                            reward=jnp.concatenate([reward1, -reward1]),
                            done=jnp.concatenate([done, done]))
            return (env_state, next_norm, key), tr

        return jax.lax.scan(step, (env_state, norm0, key), None,
                            length=cfg.rollout_length)

    if mesh is None:
        rollout = _rollout_body
    else:
        # The rollout runs UNDER shard_map: each device steps its own env
        # shard with a device-local seat-blocked (35, 2B_local) layout, so
        # the program contains ZERO rollout collectives by construction.
        # (Under plain GSPMD the global seat-blocked layout put an env's
        # two seats on different devices — the [p1 | p2] column halves vs
        # the contiguous env sharding — and the compiler inserted 21
        # all-gathers + 6 collective-permutes per train step to
        # redistribute at every seat-pairing op; measured 27x rollout
        # slowdown at 2 processes on the localhost mesh.)  Globally the
        # learner columns become per-DEVICE-blocked; every consumer
        # (fused kernel, GAE, loss means) is column-order-agnostic, and
        # the seat() selector below is shard_map'd to match.
        _ax = mesh.axis_names[0]
        from jax.sharding import PartitionSpec as _P

        def rollout(params, env_state, obs, key):
            return jax.shard_map(
                functools.partial(_rollout_body, axis=_ax), mesh=mesh,
                in_specs=(_P(), _P(_ax), _P(_ax), _P()),
                out_specs=((_P(_ax), _P(None, _ax), _P()),
                           Transition(obs=_P(None, None, _ax),
                                      action=_P(None, _ax),
                                      log_prob=_P(None, _ax),
                                      value=_P(None, _ax),
                                      reward=_P(None, _ax),
                                      done=_P(None, _ax))),
                check_vma=False)(params, env_state, obs, key)

    # ----------------------------------------------------------------- GAE --
    def compute_gae(traj: Transition, last_value: jnp.ndarray):
        return gae_associative(traj.value, traj.reward, traj.done,
                               last_value, cfg.gamma, cfg.gae_lambda)

    # ---------------------------------------------------------------- loss --
    def _select_log_prob(log_probs, action):
        # One-hot contraction instead of take_along_axis: gather along the
        # minor dimension lowers poorly on TPU (and its backward is a
        # scatter) — measured 2x slower than the masked sum for the whole
        # fwd+bwd minibatch step.
        one_hot = jax.nn.one_hot(action, cfg.num_actions,
                                 dtype=log_probs.dtype)
        return (log_probs * one_hot).sum(-1)

    def loss_fn(params, batch: Transition, advantages, targets):
        # batch.obs is feature-major (..., 35, 2B); the flax module wants
        # the feature dim minor.  This path only runs with fused_update
        # off (CPU tests / explicit opt-out), so the transpose is fine.
        logits, value = network.apply(params,
                                      jnp.swapaxes(batch.obs, -2, -1),
                                      pre_normalized=True)
        log_probs = jax.nn.log_softmax(logits)
        log_prob = _select_log_prob(log_probs, batch.action)
        ratio = jnp.exp(log_prob - batch.log_prob)
        adv = (advantages - advantages.mean()) / (advantages.std() + 1e-8)
        unclipped = ratio * adv
        clipped = jnp.clip(ratio, 1 - cfg.clip_eps, 1 + cfg.clip_eps) * adv
        policy_loss = -jnp.minimum(unclipped, clipped).mean()
        value_clipped = batch.value + jnp.clip(
            value - batch.value, -cfg.clip_eps, cfg.clip_eps)
        value_loss = 0.5 * jnp.maximum(
            (value - targets) ** 2, (value_clipped - targets) ** 2).mean()
        entropy = -(jnp.exp(log_probs) * log_probs).sum(-1).mean()
        total = policy_loss + cfg.value_coef * value_loss \
            - cfg.entropy_coef * entropy
        approx_kl = ((ratio - 1) - jnp.log(ratio)).mean()
        return total, (policy_loss, value_loss, entropy, approx_kl)

    # ------------------------------------------------------ update dispatch --
    # Hoisted out of train_step so the phase probes (scaling harness) can
    # time the exact minibatch-gradient program the train step runs.
    if cfg.fused_update in ("on", "fm"):
        use_fused = True
        fused_interpret = jax.default_backend() != "tpu"
        fused_fm = cfg.fused_update == "fm"
    elif cfg.fused_update == "auto":
        # Hardware-measured (v5e, 65536 envs, 2026-08-17): the feature-
        # major kernel nearly halves the full train step vs XLA autodiff
        # (16.6M vs 8.5M env-steps/s); the row-major kernel REGRESSES it
        # (6.7M — its (G, R, 1) per-row scalar blocks pad 128x in HBM).
        # So auto = feature-major on TPU, XLA autodiff elsewhere.
        use_fused = jax.default_backend() == "tpu"
        fused_interpret = False
        fused_fm = True
    else:
        use_fused, fused_interpret, fused_fm = False, False, False
    if cfg.update_quant != "none" and not (use_fused and fused_fm):
        # int8 modes exist only in the feature-major kernel; silently
        # running bf16 would corrupt any quant-vs-bf16 A/B the user
        # believes they are running.
        raise ValueError(
            f"update_quant={cfg.update_quant!r} requires the feature-major "
            f"fused kernel, but fused_update={cfg.fused_update!r} resolved "
            f"to {'fm' if fused_fm else ('row-major' if use_fused else 'xla')}"
            f" on backend {jax.default_backend()!r}; set fused_update='fm'")

    def _fused_minibatch_grads(params, mtraj, madv, mtarget):
        from pikazoo_tpu.train.fused_update import (fused_ppo_grads,
                                                    fused_ppo_grads_fm)

        adv_n = (madv - madv.mean()) / (madv.std() + 1e-8)
        kw = dict(num_actions=cfg.num_actions,
                  activation=cfg.activation, clip_eps=cfg.clip_eps,
                  value_coef=cfg.value_coef,
                  entropy_coef=cfg.entropy_coef,
                  interpret=fused_interpret)
        if fused_fm:
            kw["quant"] = cfg.update_quant
        data = (mtraj.obs, mtraj.action, mtraj.log_prob, mtraj.value,
                adv_n, mtarget)
        total_rows = mtraj.action.shape[0] * mtraj.action.shape[1]
        # obs is feature-major (T_mb, F, 2B); the row-major kernel and
        # its (M, F) flatten need it transposed back first.
        def rm_flat(leaves):
            obs = jnp.swapaxes(leaves[0], 1, 2)
            flat = lambda x: x.reshape(-1, *x.shape[2:])
            return tuple(map(flat, (obs,) + leaves[1:]))

        if mesh is None:
            if fused_fm:
                # Feature-major path consumes the minibatch as-is; the
                # kernel grids over frames x env columns.
                return fused_ppo_grads_fm(params, *data, **kw)
            return fused_ppo_grads(params, *rm_flat(data), **kw)

        # Mesh path: the learner-batch axis (dim 1 of every (T_mb, 2B,
        # ...) leaf) is sharded; flatten LOCALLY inside shard_map (a
        # global flatten of a dim-1-sharded array would interleave
        # shards) and psum the grad/loss partials, which the kernel
        # pre-scales by 1/total_rows.
        from jax.sharding import PartitionSpec as P
        axis = mesh.axis_names[0]

        def local_grads(p, *leaves):
            if fused_fm:
                grads, losses = fused_ppo_grads_fm(
                    p, *leaves, total_rows=total_rows, **kw)
            else:
                grads, losses = fused_ppo_grads(
                    p, *rm_flat(leaves), total_rows=total_rows, **kw)
            grads = jax.tree.map(lambda x: jax.lax.psum(x, axis), grads)
            return grads, jax.lax.psum(losses, axis)

        # Every leaf shards its trailing env axis: (T_mb, 2B) scalars on
        # dim 1, the feature-major (T_mb, F, 2B) obs on dim 2.
        return jax.shard_map(
            local_grads, mesh=mesh,
            in_specs=(P(), P(None, None, axis)) + (P(None, axis),) * 5,
            out_specs=(P(), P()),
            check_vma=False)(params, *data)

    def minibatch_grads(params, mtraj, madv, mtarget):
        """The exact minibatch-gradient program train_step runs (fused
        Pallas or XLA autodiff, with the mesh psum when configured).
        Returns ``(grads, losses[5])``."""
        if use_fused:
            return _fused_minibatch_grads(params, mtraj, madv, mtarget)
        (total, aux), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, mtraj, madv, mtarget)
        return grads, jnp.stack([total, *aux])

    # ---------------------------------------------------------- train step --
    def train_step(runner: PPORunnerState
                   ) -> Tuple[PPORunnerState, TrainMetrics]:
        from pikazoo_tpu.envs.observations import assemble_obs

        (env_state, last_norm, key), traj = rollout(
            jax.lax.stop_gradient(runner.params), runner.env_state,
            runner.last_obs, runner.key)

        # Raw-obs view of the final state for PPORunnerState.last_obs (one
        # assembly per train step; the rollout itself never builds it).
        # Carrying the (35, 2B) bf16 last_norm in the runner instead would
        # also skip the next rollout's re-normalization (~1 ms/step), but
        # it changes the checkpoint pytree and breaks restore of existing
        # artifacts — deliberately not done.
        last_obs = jax.vmap(assemble_obs)(
            env_state.p1, env_state.p2, env_state.ball,
            env_state.power_hit_key_down_prev)

        from pikazoo_tpu.train.networks import apply_fm
        _, last_value = apply_fm(runner.params, last_norm,
                                 activation=cfg.activation)  # (2B,)
        advantages, targets = compute_gae(traj, last_value)

        if cfg.learner_seats == "p1":
            # Keep only seat 1's trajectory for the update phase (seat-
            # BLOCKED flat layout: seat 1 is the first half of the env
            # axis, which is the LAST dim of every leaf — (T, 2B) scalars
            # and (T, 35, 2B) feature-major obs alike).  On a mesh the
            # blocking is per DEVICE (the rollout runs under shard_map),
            # so the selector must slice each local shard, not the global
            # column range.
            def _first_half(v):
                return v[..., :v.shape[-1] // 2]

            def seat(x):
                if mesh is None:
                    return _first_half(x)
                from jax.sharding import PartitionSpec as P
                spec = P(*([None] * (x.ndim - 1)), mesh.axis_names[0])
                return jax.shard_map(_first_half, mesh=mesh, in_specs=spec,
                                     out_specs=spec, check_vma=False)(x)

            traj = Transition(*[seat(leaf) for leaf in traj])
            advantages, targets = seat(advantages), seat(targets)

        # Minibatch over the time axis: shuffle T, split into chunks.
        key, perm_key = jax.random.split(key)
        batch = (traj, advantages, targets)
        if cfg.shuffle_minibatches:
            perm = jax.random.permutation(perm_key, cfg.rollout_length)
            batch = jax.tree.map(lambda x: x[perm], batch)

        # Under a mesh a bare pallas_call would be lowered as an
        # unpartitioned custom call (replicating the minibatch), so the
        # mesh path wraps the kernel in shard_map over the learner-batch
        # axis and psums the grad/loss partials (see _fused_minibatch_grads
        # in the update-dispatch section above).
        def epoch(carry, _):
            params, opt_state = carry

            def minibatch(carry, mb):
                params, opt_state = carry
                mtraj, madv, mtarget = mb
                grads, losses = minibatch_grads(params, mtraj, madv, mtarget)
                total, aux = losses[0], tuple(losses[1:])
                updates, opt_state = tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state), (total, *aux)

            mbs = jax.tree.map(
                lambda x: x.reshape(cfg.num_minibatches,
                                    cfg.rollout_length // cfg.num_minibatches,
                                    *x.shape[1:]),
                batch)
            carry, losses = jax.lax.scan(minibatch, carry, mbs)
            return carry, losses

        (params, opt_state), losses = jax.lax.scan(
            epoch, (runner.params, runner.opt_state), None,
            length=cfg.update_epochs)
        params = _constrain(params, sharded=False)

        total, policy_loss, value_loss, entropy, approx_kl = \
            [x.mean() for x in losses]
        metrics = TrainMetrics(
            total_loss=total, policy_loss=policy_loss, value_loss=value_loss,
            entropy=entropy, approx_kl=approx_kl,
            mean_reward=traj.reward.mean(),
            # done is stored once per (env, seat); episodes are per env.
            episodes_finished=traj.done.sum() /
            (2 if cfg.learner_seats == "both" else 1),
            env_steps=jnp.int32(cfg.rollout_length * cfg.num_envs),
        )
        runner = PPORunnerState(params, opt_state, env_state, last_obs, key,
                                runner.update_index + 1)
        return runner, metrics

    # Phase probes for the scaling/throughput harness (tools/
    # multihost_scale.py): the exact rollout and minibatch-gradient programs
    # train_step runs, exposed as attributes so the harness can time each
    # phase under the same mesh without duplicating the trainer internals.
    train_step.rollout_fn = rollout
    train_step.minibatch_grads_fn = minibatch_grads
    train_step.tx = tx
    # Resolved update-dispatch provenance ("auto" is decided above at build
    # time); bench.py records this so the artifact says which kernel served.
    train_step.provenance = {
        "fused_update": ("fm" if use_fused and fused_fm
                         else "row" if use_fused else "xla"),
        "configured": cfg.fused_update,
        "update_quant": cfg.update_quant,
        "backend": jax.default_backend(),
    }
    return init_fn, train_step, network
