"""Renderer regression tests: cloud/wave dynamics parity, render-path RNG
coupling (bitwise, vs the reference with render_mode set), sprite-asset
loading, and procedural-layout invariants."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pikazoo_tpu.envs import EnvConfig, PikaZoo
from pikazoo_tpu.parity import record_reference_trace, reference_available
from pikazoo_tpu.render import Renderer
from pikazoo_tpu.render.cloud_wave import NUM_CLOUDS, CloudWave

os.environ.setdefault("SDL_VIDEODRIVER", "dummy")

_REF_IMG = "/root/reference/pikazoo/env/img"


def _random_actions(t, rng):
    del t
    return rng.integers(0, 18, size=2)


@pytest.mark.skipif(not reference_available(),
                    reason="reference repo not mounted")
def test_cloud_wave_dynamics_match_reference():
    """Drive the reference cloud_and_wave_engine and our CloudWave from
    identical draw streams; positions/sizes/wave rows must match exactly."""
    import sys
    sys.path.insert(0, "/root/reference")
    from pikazoo.env.cloud_and_wave import Cloud, Wave, cloud_and_wave_engine

    ref_rng = np.random.default_rng(7)
    our_rng = np.random.default_rng(7)
    our_draw = lambda upper: int(our_rng.integers(0, upper))  # noqa: E731

    clouds = [Cloud(ref_rng) for _ in range(NUM_CLOUDS)]
    wave = Wave()
    ours = CloudWave(our_draw)

    for frame in range(500):
        cloud_and_wave_engine(clouds, wave, ref_rng)
        ours.step(our_draw)
        for i, c in enumerate(clouds):
            assert ours.cloud_x[i] == c.top_left_point_x, (frame, i)
            assert ours.cloud_y[i] == c.top_left_point_y, (frame, i)
            assert ours.cloud_v[i] == c.top_left_point_x_velocity, (frame, i)
            rect = list(ours.cloud_rects())[i]
            assert rect == (c.sprite_top_left_point_x,
                            c.sprite_top_left_point_y,
                            c.sprite_width, c.sprite_height), (frame, i)
        assert ours.wave_y == wave.y_coords, frame


@pytest.mark.skipif(not reference_available(),
                    reason="reference repo not mounted")
def test_render_rng_coupling_bitwise_parity():
    """Reference trajectory WITH rendering (cloud/wave draws interleaved into
    the gameplay stream) replayed bitwise through the functional env plus a
    draw-coupled CloudWave.

    The recorder rebuilds the reference's cloud array from the spied
    generator (40 draws), so the oracle stream starts with the cloud
    construction draws, then reset's boldness draws, then per-frame physics
    and render-path draws."""
    pytest.importorskip("pygame")
    trace = record_reference_trace(
        seed=11, n_steps=400, action_fn=_random_actions,
        render_each_step=True)
    oracle = jnp.asarray(np.concatenate(
        [trace.draws, np.zeros(4096, np.int32)]).astype(np.int32))

    env = PikaZoo(EnvConfig(auto_reset=False))
    counter = 0

    def oracle_draw(upper):
        nonlocal counter
        value = int(oracle[counter])
        assert 0 <= value < upper
        counter += 1
        return value

    # Reference construction order: clouds consume the first 40 spied draws,
    # THEN reset draws boldness — so the env reset starts at counter=40.
    cw = CloudWave(oracle_draw)
    assert counter == 4 * NUM_CLOUDS

    state, ts = env.reset(jax.random.key(0), counter=counter, oracle=oracle)
    counter = int(state.draw_counter)
    cw.step(oracle_draw)  # reference render() after reset
    state = state._replace(draw_counter=jnp.int32(counter))

    np.testing.assert_array_equal(np.asarray(ts.obs), trace.obs[0])
    assert counter == trace.draw_count_after_reset

    step = jax.jit(env.step)
    for t in range(trace.actions.shape[0]):
        state, ts = step(state, jnp.asarray(trace.actions[t]), oracle)
        counter = int(state.draw_counter)
        cw.step(oracle_draw)  # reference render() after each step
        state = state._replace(draw_counter=jnp.int32(counter))
        np.testing.assert_array_equal(np.asarray(ts.obs), trace.obs[t + 1],
                                      err_msg=f"obs mismatch at step {t}")
        assert counter == int(trace.draw_count_after_step[t]), \
            f"draw counter mismatch at step {t}"


@pytest.mark.skipif(not os.path.isfile(os.path.join(_REF_IMG, "ball_0.png")),
                    reason="original sprite assets not available")
def test_sprite_renderer_loads_user_supplied_assets():
    pytest.importorskip("pygame")
    env = PikaZoo(EnvConfig())
    state, _ = env.reset(jax.random.key(0))
    r = Renderer("rgb_array", sprite_dir=_REF_IMG)
    frame = r.render(state)
    assert frame.shape == (304, 432, 3) and frame.dtype == np.uint8
    # Sprite frames are visually rich: many distinct colors (procedural path
    # uses a dozen flat fills; the asset background alone exceeds that).
    colors = np.unique(frame.reshape(-1, 3), axis=0)
    assert colors.shape[0] > 50
    r.close()


def test_procedural_layout_regression():
    """Geometry-faithful positions in the flat style: ball, players, net,
    ground strata and scoreboard land on the expected pixels (reference
    layout pikazoo_env.py:250-362)."""
    env = PikaZoo(EnvConfig())
    state, _ = env.reset(jax.random.key(0))
    r = Renderer("rgb_array", style="flat")
    frame = r.render(state)
    assert frame.shape == (304, 432, 3)

    bx, by = int(state.ball.x), int(state.ball.y)
    assert tuple(frame[by, bx]) in ((232, 64, 56), (255, 255, 255))
    p1x, p1y = int(state.p1.x), int(state.p1.y)
    assert tuple(frame[p1y + 20, p1x]) == (252, 208, 56)
    p2x, p2y = int(state.p2.x), int(state.p2.y)
    assert tuple(frame[p2y + 20, p2x]) == (248, 176, 40)
    assert tuple(frame[200, 216]) == (240, 240, 240)  # net pillar
    assert tuple(frame[256, 100]) == (208, 96, 88)  # ground red stratum
    assert tuple(frame[270, 100]) == (248, 248, 248)  # ground line
    r.close()


def test_renderer_decoupled_by_default():
    """Without coupling, rendering must not perturb the trajectory."""
    from pikazoo_tpu.compat import raw_env

    plain = raw_env(seed=123)
    rendered = raw_env(seed=123, render_mode="rgb_array")
    obs_a, _ = plain.reset()
    obs_b, _ = rendered.reset()
    rng = np.random.default_rng(0)
    for _ in range(60):
        acts = {a: int(x) for a, x in
                zip(["player_1", "player_2"], rng.integers(0, 18, 2))}
        obs_a, *_ = plain.step(acts)
        obs_b, *_ = rendered.step(acts)
        rendered.render()
        np.testing.assert_array_equal(obs_a["player_1"], obs_b["player_1"])


def test_compat_coupled_render_perturbs_stream():
    """Opt-in coupling: rendering consumes draw slots, so a rendered run's
    draw counter runs ahead of an unrendered one (reference behavior)."""
    from pikazoo_tpu.compat import raw_env

    coupled = raw_env(seed=123, render_mode="rgb_array",
                      render_rng_coupled=True)
    plain = raw_env(seed=123)
    coupled.reset()
    plain.reset()
    rng = np.random.default_rng(0)
    for _ in range(30):
        acts = {a: int(x) for a, x in
                zip(["player_1", "player_2"], rng.integers(0, 18, 2))}
        coupled.step(acts)
        coupled.render()
        plain.step(acts)
    assert coupled._draw_counter_host > int(np.asarray(
        plain._state.draw_counter))
