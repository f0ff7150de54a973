"""Render a trained policy playing the rule AI to a GIF.

Usage:
    python tools/policy_demo_gif.py [ckpt_dir] [out.gif] [n_frames]

Defaults: the committed flagship ``artifacts/selfplay_policy_xl`` (greedy
actions, seat 1) vs the reference rule AI (seat 2), 400 frames at 20 fps to
``artifacts/xl_vs_ai_demo.gif``.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from pikazoo_tpu import EnvConfig, PikaZoo
from pikazoo_tpu.render import Renderer
from pikazoo_tpu.train import PPOConfig, make_ppo_trainer
from pikazoo_tpu.train import checkpoint as ckpt

_ART = os.path.join(os.path.dirname(__file__), "..", "artifacts")


def main(ckpt_dir: str = os.path.join(_ART, "selfplay_policy_xl"),
         out: str = os.path.join(_ART, "xl_vs_ai_demo.gif"),
         n_frames: int = 400):
    env = PikaZoo(EnvConfig(is_player2_computer=True, auto_reset=True))
    init_fn, _, network = make_ppo_trainer(
        PikaZoo(EnvConfig(auto_reset=True)),
        PPOConfig(num_envs=8192, rollout_length=128))
    params = ckpt.restore(ckpt_dir, init_fn(jax.random.key(0))).params

    from pikazoo_tpu.envs.observations import assemble_obs

    @jax.jit
    def step(state):
        obs = assemble_obs(state.p1, state.p2, state.ball,
                           state.power_hit_key_down_prev)  # (2, 35)
        logits, _ = network.apply(params, obs[0][None])
        a1 = jnp.argmax(logits[0]).astype(jnp.int32)
        return env.step(state, jnp.stack([a1, jnp.int32(0)]))

    state, _ = env.reset(jax.random.key(7))
    renderer = Renderer("rgb_array")
    # Rallies against the rule AI average ~1000 frames per point, so a
    # fixed-length clip from the start usually shows no scoring.  Keep a
    # rolling buffer and emit a window straddling the first point.
    from collections import deque
    tail_after = n_frames // 4
    buf = deque(maxlen=n_frames - tail_after)
    for _ in range(20_000):
        state, ts = step(state)
        buf.append(renderer.draw(jax.device_get(state)))
        if int(np.asarray(ts.rewards)[0]) != 0:
            break
    frames = list(buf)
    for _ in range(tail_after):
        state, ts = step(state)
        frames.append(renderer.draw(jax.device_get(state)))
    scores = np.asarray(jax.device_get(state).scores)
    print(f"score in clip (policy vs rule AI): {scores[0]}-{scores[1]}")

    import imageio.v3 as iio
    iio.imwrite(out, np.stack(frames), duration=50, loop=0)
    print(f"wrote {out} ({len(frames)} frames)")


if __name__ == "__main__":
    main(*sys.argv[1:2], *sys.argv[2:3],
         *(int(a) for a in sys.argv[3:4]))
