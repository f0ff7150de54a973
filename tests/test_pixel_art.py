"""Default pixel-art render path: sprite inventory, layout, determinism.

The default renderer output is the repo's ORIGINAL generated sprite set
(``render/pixel_art.py``), drawn through the same reference-layout
compositor (``render/sprites.py``) that user-supplied assets use
(``pikazoo_env.py:250-362`` draw order)."""

import numpy as np

import jax
import jax.numpy as jnp

from pikazoo_tpu.envs import EnvConfig, PikaZoo
from pikazoo_tpu.render import Renderer
from pikazoo_tpu.render.pixel_art import build_sprites
from pikazoo_tpu.render.sprites import _POSE_NAMES, player_sprite_index

# Reference asset dimensions the generated set must honor (layout operates
# on sprite sizes: 16px background tiling, centered blits, 8px net columns).
_EXPECT_SIZES = {
    "sky_blue": (16, 16), "mountain": (64, 432), "ground_red": (16, 16),
    "ground_line": (16, 16), "ground_line_leftmost": (16, 16),
    "ground_line_rightmost": (16, 16), "ground_yellow": (16, 16),
    "net_pillar": (8, 8), "net_pillar_top": (8, 8), "cloud": (24, 48),
    "wave": (32, 16), "shadow": (8, 32), "ball_punch": (40, 40),
    "ball_trail": (40, 40), "ball_hyper": (40, 40),
}


def test_sprite_inventory_complete_and_sized():
    s = build_sprites()
    for name, hw in _EXPECT_SIZES.items():
        assert s[name].shape == hw + (4,), name
    for i in range(5):
        assert s[f"ball_{i}"].shape == (40, 40, 4)
    for i in range(10):
        assert s[f"number_{i}"].shape == (32, 32, 4)
    for n in _POSE_NAMES:
        assert s[f"player_{n}"].shape == (64, 64, 4), n
    # every sheet index resolves to a distinct existing pose
    idx = {player_sprite_index(st, f)
           for st, nf in ((0, 5), (1, 5), (2, 5), (3, 2), (4, 1), (5, 5),
                          (6, 5)) for f in range(nf)}
    assert idx == set(range(28))
    # opaque background tiles (anything less leaks canvas garbage)
    for name in ("sky_blue", "mountain", "ground_red", "ground_yellow",
                 "ground_line", "net_pillar"):
        assert (s[name][..., 3] == 255).all(), name


def test_pixel_art_is_deterministic():
    a = build_sprites()
    build_sprites.cache_clear()
    b = build_sprites()
    for k in a:
        np.testing.assert_array_equal(a[k], b[k])


def _frame(**cfg):
    env = PikaZoo(EnvConfig(**cfg))
    state, _ = env.reset(jax.random.key(0))
    r = Renderer("rgb_array")
    return r.render(state), state


def test_default_render_is_pixel_art():
    frame, state = _frame()
    assert frame.shape == (304, 432, 3) and frame.dtype == np.uint8
    # visually richer than the flat style's dozen fills (pixel art is
    # deliberately palette-limited, so this is a floor, not a target)
    colors = np.unique(frame.reshape(-1, 3), axis=0)
    assert colors.shape[0] > 25
    # players drawn around their positions: the 64x64 sprite region differs
    # from a sky/ground-only rerender baseline
    for p in (state.p1, state.p2):
        px, py = int(p.x), int(p.y)
        patch = frame[py - 10:py + 10, px - 10:px + 10]
        assert np.unique(patch.reshape(-1, 3), axis=0).shape[0] >= 3
    # net pillar column is drawn (not sky) at the reference position
    assert not (frame[200, 214:220] == frame[100, 214:220]).all()
    # ground strata rows exist: red band at 248.., sand at 280..
    assert frame[250].std(axis=0).mean() < frame[20].std(axis=0).mean() + 100


def test_pixel_render_tracks_state():
    """Moving the ball moves the drawn ball; scores change the scoreboard."""
    env = PikaZoo(EnvConfig())
    state, _ = env.reset(jax.random.key(0))
    r = Renderer("rgb_array", seed=7)
    r2 = Renderer("rgb_array", seed=7)
    f1 = r.draw(state)
    moved = state._replace(
        ball=state.ball._replace(x=jnp.int32(100), y=jnp.int32(100)),
        scores=jnp.asarray([12, 3], jnp.int32))
    f2 = r2.draw(moved)
    # ball drawn at the new spot
    assert not (f1[90:110, 90:110] == f2[90:110, 90:110]).all()
    # tens digit appears on the left board (reference hardcodes number[1])
    assert not (f1[10:42, 14:46] == f2[10:42, 14:46]).all()


def test_flat_style_still_available():
    env = PikaZoo(EnvConfig())
    state, _ = env.reset(jax.random.key(0))
    r = Renderer("rgb_array", style="flat")
    frame = r.render(state)
    assert tuple(frame[256, 100]) == (208, 96, 88)  # flat red stratum

    import pytest
    with pytest.raises(ValueError):
        Renderer("rgb_array", style="bogus")
