"""Breadth parity fuzz: 12 configurations x 4 seeds at winning_score=3.

The targeted parity suite (test_parity_reference.py) drives ~10 fixed seeds;
this corpus sweeps every {seat-AI combo} x {serve mode} cross so the quirk
surface (hyper-ball fine rotation, net-band edges, seat-asymmetric AI
boundaries, serve rotation under all three modes) sees 48 independent games.
``winning_score=3`` keeps a full game to a few thousand frames; the 15-point
versions stay in the targeted suite.
"""

import numpy as np
import pytest

from pikazoo_tpu.envs import EnvConfig, PikaZoo
from pikazoo_tpu.parity import record_reference_trace, reference_available

from helpers import replay_and_compare

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference repo not mounted")

SEATS = [(False, False), (True, False), (False, True), (True, True)]
SERVES = ["winner", "alternate", "random"]
# Default 4 seeds/config = 48 games (~2 min).  PIKAZOO_FUZZ_SEEDS widens the
# corpus for on-demand deep soaks (e.g. 16 -> 192 games; round-5 confidence
# pass ran 12 -> 144 games, all bitwise-equal incl. draw counters).
SEEDS_PER_CONFIG = int(__import__("os").environ.get("PIKAZOO_FUZZ_SEEDS", 4))


def random_actions(t, rng):
    return rng.integers(0, 18, size=2)


@pytest.mark.parametrize("serve", SERVES)
@pytest.mark.parametrize("p1c,p2c", SEATS)
def test_parity_fuzz(p1c, p2c, serve):
    cfg = EnvConfig(auto_reset=False, winning_score=3, serve=serve,
                    is_player1_computer=p1c, is_player2_computer=p2c)
    env = PikaZoo(cfg)  # shared across seeds: one jit cache per config
    # Distinct seed block per config cell -> 48 distinct games overall.
    base = (SEATS.index((p1c, p2c)) * len(SERVES)
            + SERVES.index(serve)) * SEEDS_PER_CONFIG + 100
    finished = 0
    for seed in range(base, base + SEEDS_PER_CONFIG):
        # Human seats act randomly; AI seats ignore input anyway.
        trace = record_reference_trace(
            seed, 8000, random_actions, winning_score=3, serve=serve,
            is_player1_computer=p1c, is_player2_computer=p2c)
        replay_and_compare(trace, cfg, env=env)
        finished += bool(trace.terminations[-1])
    # Random/AI play at winning_score=3 finishes well within 8000 frames.
    assert finished == SEEDS_PER_CONFIG, \
        f"only {finished}/{SEEDS_PER_CONFIG} games finished"
