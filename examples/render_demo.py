"""Render a rule-AI self-play match to a GIF (and PNG frames).

Usage: python examples/render_demo.py [out.gif] [n_frames]
"""

import sys

import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from pikazoo_tpu import EnvConfig, PikaZoo
from pikazoo_tpu.render import Renderer


def main(out: str = "/tmp/pikazoo_demo.gif", n_frames: int = 400):
    env = PikaZoo(EnvConfig(is_player1_computer=True,
                            is_player2_computer=True, auto_reset=True))
    state, _ = env.reset(jax.random.key(0))
    step = jax.jit(env.step)
    renderer = Renderer("rgb_array")

    frames = []
    for _ in range(n_frames):
        state, ts = step(state, jnp.zeros(2, jnp.int32))
        frames.append(renderer.draw(jax.device_get(state)))

    try:
        import imageio.v3 as iio
        iio.imwrite(out, np.stack(frames), duration=50, loop=0)
        print(f"wrote {out} ({len(frames)} frames)")
    except ImportError:
        from PIL import Image
        Image.fromarray(frames[-1]).save(out.replace(".gif", ".png"))
        print(f"imageio missing; wrote last frame as PNG")


if __name__ == "__main__":
    main(*(sys.argv[1:2] or ["/tmp/pikazoo_demo.gif"]),
         *(int(a) for a in sys.argv[2:3]))
