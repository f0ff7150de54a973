"""PettingZoo ``ParallelEnv`` adapter — the reference's exact API surface.

A drop-in replacement for the reference ``pikazoo_v0.env(...)``
(``pikazoo_env.py:27-29, 72-248``): same constructor kwargs, agent names,
``Discrete(18)`` action spaces, ``Box`` int32 35-dim observation space with
the same bounds, shared-mutable ``infos["score"]`` list, and agent-list
lifecycle.  Internally it drives the jitted functional env at batch=1.

Reproduced quirks:

* ``reset(seed=...)`` **ignores its seed** — seeding happens only at
  construction (reference ``pikazoo_env.py:149-173`` never re-seeds).  Pass
  ``seed=`` to the constructor for reproducibility (an extension: the
  reference can only autoseed).
* State that the reference only initializes at construction (ball position
  history, diving_direction, input latches, ...) leaks across ``reset()``
  boundaries — the adapter carries the previous state into reset exactly as
  the reference's partially-reset objects do.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from pikazoo_tpu.envs import (NUM_ACTIONS, OBS_DIM, OBS_HIGH, OBS_LOW,
                              EnvConfig, PikaZoo)
from pikazoo_tpu.render import Renderer


def env(**kwargs):
    return raw_env(**kwargs)


class raw_env:  # noqa: N801 — matches the reference class name
    metadata = {
        "render_modes": ["human", "rgb_array"],
        "name": "pikazoo_v0",
        "render_fps": 20,
    }

    # The five reference kwargs stay positional-compatible
    # (pikazoo_env.py:79-86); everything after ``*`` is an extension of this
    # adapter and keyword-only, so adding extensions can never silently
    # reinterpret an existing caller's positional argument.
    def __init__(self, winning_score: int = 15, serve: str = "winner",
                 is_player1_computer: bool = False,
                 is_player2_computer: bool = False,
                 render_mode: Optional[str] = None, *,
                 seed: Optional[int] = None,
                 render_rng_coupled: bool = False,
                 sprite_dir: Optional[str] = None,
                 render_style: Optional[str] = None,
                 backend: str = "jax"):
        self.possible_agents = ["player_1", "player_2"]
        self.agents = self.possible_agents[:]
        self._config = EnvConfig(
            winning_score=winning_score, serve=serve,
            is_player1_computer=is_player1_computer,
            is_player2_computer=is_player2_computer,
            auto_reset=False)
        self._env = PikaZoo(self._config)
        # backend="native" serves the per-frame loop from the C++ host engine
        # (bit-identical to the JAX env — production threefry draw slots,
        # tested in tests/test_native_engine.py), and the whole dict-API
        # step runs in ONE native call when the CPython fast path builds
        # (native/fastpath.c; ~3.3x the reference's same-run per-step rate;
        # the pure-Python assembly below is the fallback at ~1.7-2x).
        # Chunked NativeEngine.run() reaches ~100x.  Batch=1 on an
        # accelerator is pure dispatch latency, so the interactive path
        # belongs on the host.
        assert backend in ("jax", "native"), backend
        self._backend = backend
        if backend == "native":
            from pikazoo_tpu.native.engine import (FIELDS,  # noqa: PLC0415
                                                   NativeEngine)
            self._eng = NativeEngine(
                winning_score=winning_score, serve=serve,
                is_player1_computer=is_player1_computer,
                is_player2_computer=is_player2_computer, auto_reset=False)
            self._matrix = None
            self._stepper = None
            self._fast = None  # C-extension dict-API stepper (built lazily)
            self._cols = tuple(FIELDS.index(f) for f in
                               ("score1", "score2", "game_ended",
                                "draw_counter"))
        self._step = jax.jit(self._env.step) if backend == "jax" else None
        if seed is None:
            seed = int(np.random.SeedSequence().entropy % (2 ** 63))
        self._key = jax.random.key(seed)
        self._episode_index = 0
        self._state = None
        self.scores = [0, 0]
        self.render_mode = render_mode
        # Perform the reference's construction-time initialization so that a
        # pre-reset step() (out of contract, but possible) sees sane state.
        # Constructed BEFORE the renderer: in coupled mode the renderer's 40
        # cloud-construction draws follow the boldness/serve draws, exactly
        # the reference's construction order (physics at pikazoo_env.py:97,
        # get_all_image clouds at :475-479).
        self._do_reset()
        # Opt-in reference-compatible render RNG coupling: cloud/wave
        # dynamics consume the env's draw-slot stream, so rendering perturbs
        # subsequent gameplay draws like the reference (cloud_and_wave.py
        # drawing from self.np_random, pikazoo_env.py:349).
        self._render_rng_coupled = bool(render_rng_coupled and render_mode)
        self._draws_dirty = False
        draw_source = self._coupled_draw if self._render_rng_coupled else None
        self._renderer = Renderer(render_mode, seed=seed & 0xFFFFFFFF,
                                  sprite_dir=sprite_dir,
                                  draw_source=draw_source,
                                  style=render_style)

    # ------------------------------------------------------------ spaces --
    @functools.lru_cache(maxsize=None)
    def observation_space(self, agent=None):
        from gymnasium import spaces  # noqa: PLC0415
        return spaces.Box(low=OBS_LOW, high=OBS_HIGH, shape=(OBS_DIM,),
                          dtype=np.int32)

    @functools.lru_cache(maxsize=None)
    def action_space(self, agent=None):
        from gymnasium import spaces  # noqa: PLC0415
        return spaces.Discrete(NUM_ACTIONS)

    # --------------------------------------------------------------- api --
    def _do_reset(self):
        """Start a new episode; returns the (2, 35) int32 reset observation."""
        key = jax.random.fold_in(self._key, self._episode_index)
        self._episode_index += 1
        if self._backend == "native":
            if self._matrix is None:
                # Episode 0: construction-time init through the (eager) JAX
                # reset, then hand the packed state to the C++ engine.  Later
                # resets run natively — bit-identical (test_native_engine.py).
                from pikazoo_tpu.native import engine as _ne  # noqa: PLC0415
                self._state, ts = self._env.reset(key)
                self._matrix = _ne.NativeEngine.pack(self._state)
                self._stepper = self._eng.single_stepper(self._matrix)
                # The CPython dict-API fast path (native/fastpath.c) serves
                # the whole PettingZoo step in ONE native call; fall back to
                # the Python assembly when the extension can't build.
                try:
                    self._fast = _ne.make_fast_stepper(
                        self._matrix, self.scores,
                        winning_score=self._config.winning_score,
                        serve_mode=self._eng.serve_mode,
                        is_p1_computer=self._eng.p1_cpu,
                        is_p2_computer=self._eng.p2_cpu, auto_reset=0)
                    self._fast_error = None
                except (RuntimeError, OSError) as e:
                    # Graceful degradation for library users, but NOT
                    # silent: the cause is kept for introspection
                    # (bench.py refuses to bench the fallback unlabeled).
                    self._fast = None
                    self._fast_error = str(e)
            else:
                from pikazoo_tpu.core.rng import key_from_jax  # noqa: PLC0415
                self._eng.reset(self._matrix,
                                rng_key=np.asarray(key_from_jax(key),
                                                   np.uint32).reshape(1, 2))
            return self._stepper.observe()
        self._state, ts = self._env.reset(key, carry=self._state)
        if getattr(self, "_render_rng_coupled", False):
            self._sync_draw_host()
        return np.asarray(ts.obs, np.int32)

    # Host-side mirror of (rng_key, draw_counter) so coupled render draws
    # cost no device round trip each; flushed back into the state pytree
    # before the next jitted step.
    def _sync_draw_host(self):
        self._rng_key_host = np.asarray(self._state.rng_key)
        self._draw_counter_host = int(np.asarray(self._state.draw_counter))
        self._draws_dirty = False

    def _flush_draw_host(self):
        if self._draws_dirty:
            self._state = self._state._replace(
                draw_counter=jnp.int32(self._draw_counter_host))
            self._draws_dirty = False

    def _coupled_draw(self, upper: int) -> int:
        from pikazoo_tpu.core.rng import site_value_host  # noqa: PLC0415
        if self._backend == "native":
            # The draw counter lives in the state matrix the C++ engine
            # steps, so host draws advance the same stream with no syncing.
            ctr_col = self._cols[3]
            key = self._matrix[0, -2:].view(np.uint32)
            value = site_value_host(key, int(self._matrix[0, ctr_col]), upper)
            self._matrix[0, ctr_col] += 1
            return value
        if not hasattr(self, "_rng_key_host"):
            self._sync_draw_host()
        value = site_value_host(self._rng_key_host, self._draw_counter_host,
                                upper)
        self._draw_counter_host += 1
        self._draws_dirty = True
        return value

    def reset(self, seed=None, options=None):
        # NOTE: ``seed`` ignored on purpose (reference quirk, see module doc).
        del seed, options
        self.agents = self.possible_agents[:]
        self.scores[0] = 0
        self.scores[1] = 0
        obs = self._do_reset()
        if self.render_mode == "human":
            self.render()
        return self._obs_dict(obs), self._infos()

    def step(self, actions: Dict[str, int]):
        if self._backend == "native" and self._fast is not None:
            out = self._fast.step(actions)
            if self.render_mode == "human":
                self.render()
            if out[5] & 1:  # terminated
                self.agents = []
            return out[:5]
        if self._backend == "native":
            obs, rew, flags = self._stepper.step_obs(
                int(actions["player_1"]), int(actions["player_2"]))
            r1 = 0
            if flags & 2:  # scores only change on round-end frames
                row = self._matrix[0]
                c_s1, c_s2, _, _ = self._cols
                self.scores[0] = int(row[c_s1])
                self.scores[1] = int(row[c_s2])
                r1 = int(rew[0])
            terminated = bool(flags & 1)
        else:
            if self._render_rng_coupled:
                self._flush_draw_host()
            acts = jnp.asarray([int(actions[a]) for a in self.agents],
                               jnp.int32)
            self._state, ts = self._step(self._state, acts)
            if self._render_rng_coupled:
                self._sync_draw_host()
            scores = np.asarray(ts.scores)
            self.scores[0] = int(scores[0])
            self.scores[1] = int(scores[1])
            obs = np.asarray(ts.obs, np.int32)
            r1 = int(np.asarray(ts.rewards)[0])
            terminated = bool(np.asarray(ts.terminated))

        if self.render_mode == "human":
            self.render()

        observations = self._obs_dict(obs)
        rewards = {self.agents[0]: r1, self.agents[1]: -r1}
        terminations = {agent: terminated for agent in self.agents}
        truncations = {agent: False for agent in self.agents}
        infos = self._infos()
        if terminated:
            self.agents = []
        return observations, rewards, terminations, truncations, infos

    def render(self):
        if self.render_mode is None:
            import gymnasium  # noqa: PLC0415
            gymnasium.logger.warn(
                "You are calling render method without specifying any "
                "render mode.")
            return None
        state = self._state
        if self._backend == "native":
            from pikazoo_tpu.native.engine import NativeEngine  # noqa: PLC0415
            state = NativeEngine.unpack(self._matrix, self._state)
        return self._renderer.render(state)

    def close(self):
        self._renderer.close()

    # ----------------------------------------------------------- helpers --
    def _obs_dict(self, obs):
        return {"player_1": np.array(obs[0]), "player_2": np.array(obs[1])}

    def _infos(self):
        # Shared mutable list, like the reference (consumers must copy).
        return {agent: {"score": self.scores} for agent in self.agents}

    # PettingZoo helpers some tools expect.
    @property
    def num_agents(self):
        return len(self.agents)

    @property
    def max_num_agents(self):
        return len(self.possible_agents)

    def state(self):
        raise NotImplementedError

    def __str__(self):
        return self.metadata["name"]

    @property
    def unwrapped(self):
        return self
