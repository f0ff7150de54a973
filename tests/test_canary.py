"""Unit tests for the Pallas compile-canary verdict machinery.

``core.predict._pallas_embed_canary_ok`` guards the first kernel-path
compile with a subprocess canary whose verdict is cached on disk (6 h on
success, 1 h on failure) and in-process.  This logic caused or masked
incidents in rounds 3-4 (stale-fail cache poisoning, single-attempt false
negatives), so its branches get direct coverage here with the subprocess
stubbed out; the bench-side stale-fail clearing is covered in
``test_bench_contract.py``.
"""

import json
import subprocess
import time

import pytest

from pikazoo_tpu.core import predict


@pytest.fixture
def canary_env(tmp_path, monkeypatch):
    """Isolated cache dir + fresh in-process verdict + env defaults."""
    import tempfile

    monkeypatch.setattr(tempfile, "gettempdir", lambda: str(tmp_path))
    monkeypatch.setattr(predict, "_CANARY_VERDICT", None)
    monkeypatch.delenv("PIKAZOO_PALLAS_CANARY", raising=False)
    monkeypatch.setenv("PIKAZOO_PALLAS_CANARY_TIMEOUT", "5")
    return tmp_path / "pikazoo_pallas_canary.json"


def _stub_run(monkeypatch, outcomes):
    """subprocess.run stub popping one outcome per call: "ok", "fail",
    or "hang" (TimeoutExpired).  Records the number of calls."""
    calls = []

    def run(cmd, timeout=None, capture_output=None, text=None):
        outcome = outcomes.pop(0)
        calls.append(outcome)
        if outcome == "hang":
            raise subprocess.TimeoutExpired(cmd, timeout)

        class Out:
            returncode = 0 if outcome == "ok" else 1
            stdout = "CANARY_OK" if outcome == "ok" else "boom"
        return Out()

    monkeypatch.setattr(subprocess, "run", run)
    return calls


def test_off_switch_trusts_pallas(canary_env, monkeypatch):
    monkeypatch.setenv("PIKAZOO_PALLAS_CANARY", "0")
    calls = _stub_run(monkeypatch, [])
    assert predict._pallas_embed_canary_ok() is True
    assert calls == []  # no probe at all


def test_fresh_ok_cache_short_circuits(canary_env, monkeypatch):
    canary_env.write_text(json.dumps({"ok": True, "ts": time.time()}))
    calls = _stub_run(monkeypatch, [])
    assert predict._pallas_embed_canary_ok() is True
    assert calls == []


def test_fresh_fail_cache_downgrades(canary_env, monkeypatch):
    canary_env.write_text(json.dumps({"ok": False, "ts": time.time()}))
    calls = _stub_run(monkeypatch, [])
    assert predict._pallas_embed_canary_ok() is False
    assert calls == []


def test_stale_fail_cache_reprobes_and_recovers(canary_env, monkeypatch):
    # Failure verdicts age out after 1 h; a recovered canary flips to ok.
    canary_env.write_text(json.dumps({"ok": False,
                                      "ts": time.time() - 3700}))
    calls = _stub_run(monkeypatch, ["ok"])
    assert predict._pallas_embed_canary_ok() is True
    assert calls == ["ok"]
    assert json.loads(canary_env.read_text())["ok"] is True


def test_transient_timeout_gets_second_attempt(canary_env, monkeypatch):
    # Round-4 fix: ONE timeout (tunnel contention) must not cache a fail.
    calls = _stub_run(monkeypatch, ["hang", "ok"])
    assert predict._pallas_embed_canary_ok() is True
    assert calls == ["hang", "ok"]
    assert json.loads(canary_env.read_text())["ok"] is True


def test_double_failure_caches_fail_and_warns(canary_env, monkeypatch):
    calls = _stub_run(monkeypatch, ["hang", "fail"])
    with pytest.warns(RuntimeWarning, match="canary"):
        assert predict._pallas_embed_canary_ok() is False
    assert calls == ["hang", "fail"]
    assert json.loads(canary_env.read_text())["ok"] is False
    # In-process verdict sticks without re-probing.
    calls2 = _stub_run(monkeypatch, [])
    assert predict._pallas_embed_canary_ok() is False
    assert calls2 == []
