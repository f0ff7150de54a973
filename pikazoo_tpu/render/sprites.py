"""Optional original-asset sprite rendering.

The reference ships 73 PNG sprites (``pikazoo/env/img/``) that are not copied
into this repo (third-party game art).  Users who have the original assets —
e.g. an installed ``pika-zoo`` checkout — can point the renderer at them
(``sprite_dir=`` or ``PIKAZOO_SPRITE_DIR``) to get pixel-faithful frames; the
draw path then follows the reference's exact layout and order
(``pikazoo_env.py:250-362``): background tiling, mountain, ground strata,
net pillar, clouds/wave, players with x-flip rules and shadows, rotation-
indexed ball with hyper/trail afterimages and the shrinking punch effect,
and the score boards (including the reference's hardcoded ``number[1]`` tens
digit, ``pikazoo_env.py:338-343``).

Without assets the renderer falls back to its procedural (stylized,
geometry-faithful) path.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from pikazoo_tpu.core import constants as C
from pikazoo_tpu.render.cloud_wave import NUM_WAVE_COLUMNS, CloudWave


def player_sprite_index(state: int, frame_number: int) -> int:
    """Sprite sheet index for a player animation frame
    (``get_frame_number_for_player_animated_sprite``, ``pikazoo_env.py:46-69``):
    states 0-2 have 5 frames, state 3 has 2, state 4 has 1, states 5-6 have 5.
    """
    if state < 4:
        return 5 * state + frame_number
    if state == 4:
        return 17 + frame_number
    return 18 + 5 * (state - 5) + frame_number


def find_sprite_dir(sprite_dir: Optional[str] = None) -> Optional[str]:
    """Resolve a usable sprite directory or None.  Accepts either the img/
    directory itself or a pika-zoo checkout root."""
    candidates = []
    if sprite_dir:
        candidates += [sprite_dir, os.path.join(sprite_dir, "pikazoo", "env",
                                                "img")]
    env_dir = os.environ.get("PIKAZOO_SPRITE_DIR")
    if env_dir:
        candidates += [env_dir, os.path.join(env_dir, "pikazoo", "env", "img")]
    for cand in candidates:
        if os.path.isfile(os.path.join(cand, "ball_0.png")):
            return cand
    return None


class SpriteSet:
    """Loads the original assets through pygame and draws reference-layout
    frames onto an offscreen surface."""

    def __init__(self, img_dir: str):
        import pygame  # noqa: PLC0415

        if not pygame.get_init():
            pygame.init()
        self._pg = pygame
        self._surface = pygame.Surface((C.GROUND_WIDTH, C.GROUND_HEIGHT))

        def load(name):
            image = pygame.image.load(os.path.join(img_dir, name + ".png"))
            sfc = pygame.Surface(image.get_size(), flags=pygame.SRCALPHA)
            sfc.blit(image, (0, 0))
            return sfc

        self.sky_blue = load("sky_blue")
        self.mountain = load("mountain")
        self.ground_red = load("ground_red")
        self.ground_line = load("ground_line")
        self.ground_line_leftmost = load("ground_line_leftmost")
        self.ground_line_rightmost = load("ground_line_rightmost")
        self.ground_yellow = load("ground_yellow")
        self.net_pillar = load("net_pillar")
        self.net_pillar_top = load("net_pillar_top")
        self.cloud = load("cloud")
        self.wave = load("wave")
        self.shadow = load("shadow")
        self.ball_hyper = load("ball_hyper")
        self.ball_trail = load("ball_trail")
        self.ball_punch = load("ball_punch")
        # Rotation 0-4 are distinct sprites; rotation 5 reuses the hyper ball
        # (reference ball tuple, pikazoo_env.py:400-407).
        self.ball = tuple(load(f"ball_{i}") for i in range(5)) + \
            (self.ball_hyper,)
        self.number = tuple(load(f"number_{i}") for i in range(10))
        names = [f"{s}_{f}" for s in range(3) for f in range(5)] + \
            ["3_0", "3_1", "4_0"] + \
            [f"{s}_{f}" for s in (5, 6) for f in range(5)]
        self.pikachu = tuple(load(f"pikachu_{n}") for n in names)

    def _blit_center(self, source, x: int, y: int) -> None:
        self._surface.blit(source, (x - source.get_width() // 2,
                                    y - source.get_height() // 2))

    def draw(self, state, cloud_wave: CloudWave, punch_radius: int,
             scalar) -> np.ndarray:
        """One frame in reference draw order (``draw``, pikazoo_env.py:250-255
        and the draw_* bodies).  ``scalar`` converts state leaves to ints;
        ``punch_radius`` is the renderer-side countdown value."""
        pg, sfc, s = self._pg, self._surface, scalar

        # Background (draw_background, pikazoo_env.py:305-333).
        for j in range(12):
            for i in range(NUM_WAVE_COLUMNS):
                sfc.blit(self.sky_blue, (16 * i, 16 * j))
        sfc.blit(self.mountain, (0, 188))
        for i in range(NUM_WAVE_COLUMNS):
            sfc.blit(self.ground_red, (16 * i, 248))
        for i in range(1, NUM_WAVE_COLUMNS - 1):
            sfc.blit(self.ground_line, (16 * i, 264))
        sfc.blit(self.ground_line_leftmost, (0, 264))
        sfc.blit(self.ground_line_rightmost, (C.GROUND_WIDTH - 16, 264))
        for j in range(2):
            for i in range(NUM_WAVE_COLUMNS):
                sfc.blit(self.ground_yellow, (16 * i, 280 + 16 * j))
        sfc.blit(self.net_pillar_top, (213, 176))
        for j in range(12):
            sfc.blit(self.net_pillar, (213, 184 + 8 * j))

        # Clouds and wave (draw_clouds_and_wave, pikazoo_env.py:345-362;
        # the dynamics step happens in the Renderer, which owns the draws).
        for (x, y, w, h) in cloud_wave.cloud_rects():
            sfc.blit(pg.transform.scale(self.cloud, (w, h)), (x, y))
        for i in range(NUM_WAVE_COLUMNS):
            sfc.blit(self.wave, (i * 16, cloud_wave.wave_y[i]))

        # Players (draw_player, pikazoo_env.py:257-278): p1 flips only when
        # diving left; p2 flips in every pose EXCEPT diving right.
        for p, is_p1 in ((state.p1, True), (state.p2, False)):
            st, fn = s(p.state), s(p.frame_number)
            sprite = self.pikachu[player_sprite_index(st, fn)]
            diving = st in (3, 4)
            dd = s(p.diving_direction)
            xflip = (diving and dd == -1) if is_p1 \
                else not (diving and dd == 1)
            if xflip:
                sprite = pg.transform.flip(sprite, True, False)
            self._blit_center(sprite, s(p.x), s(p.y))
        self._blit_center(self.shadow, s(state.p1.x), 273)
        self._blit_center(self.shadow, s(state.p2.x), 273)

        # Ball (draw_ball, pikazoo_env.py:280-302).
        ball = state.ball
        self._blit_center(self.ball[s(ball.rotation)], s(ball.x), s(ball.y))
        self._blit_center(self.shadow, s(ball.x), 273)
        if s(ball.is_power_hit):
            self._blit_center(self.ball_hyper, s(ball.previous_x),
                              s(ball.previous_y))
            self._blit_center(self.ball_trail, s(ball.previous_previous_x),
                              s(ball.previous_previous_y))
        if punch_radius > 0:
            scaled = pg.transform.scale(
                self.ball_punch, (2 * punch_radius, 2 * punch_radius))
            self._blit_center(scaled, s(ball.punch_effect_x),
                              s(ball.punch_effect_y))

        # Score boards (draw_scores_to_score_boards, pikazoo_env.py:335-343)
        # including the reference's hardcoded number[1] tens digit.
        s1, s2 = s(state.scores[0]), s(state.scores[1])
        if s1 >= 10:
            sfc.blit(self.number[1], (14, 10))
        sfc.blit(self.number[s1 % 10], (14 + 32, 10))
        if s2 >= 10:
            sfc.blit(self.number[1], (C.GROUND_WIDTH - 32 - 32 - 14, 10))
        sfc.blit(self.number[s2 % 10], (C.GROUND_WIDTH - 32 - 32 - 14 + 32, 10))

        pixels = np.array(pg.surfarray.pixels3d(sfc))
        return np.transpose(pixels, (1, 0, 2))
