"""The bench accelerator probe must survive transient tunnel outages.

Round-4 regression being pinned: the official BENCH_r04.json recorded a
CPU-fallback headline (vs_baseline 0.863) because `_probe_device` gave
up after ONE 120 s attempt during a transient tunnel outage.  The probe
now retries with a pause over a configurable window (VERDICT round-4
item 3); these tests drive it with a stubbed subprocess so a dead and a
recovering tunnel are both exercised without hardware.
"""

import subprocess
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench  # noqa: E402


class _FakeCompleted:
    def __init__(self, stdout):
        self.returncode = 0
        self.stdout = stdout
        self.stderr = ""


@pytest.fixture
def no_jax_fallback(monkeypatch):
    """The fallback path reconfigures jax for CPU; stub it so the test
    process (which already runs on the forced-CPU conftest backend)
    is not disturbed."""
    calls = []

    class _FakeConfig:
        @staticmethod
        def update(k, v):
            calls.append((k, v))

    import jax

    monkeypatch.setattr(jax, "config", _FakeConfig())
    return calls


def test_dead_tunnel_retries_then_falls_back(monkeypatch, no_jax_fallback):
    attempts = []

    def fake_run(cmd, capture_output, text, timeout):
        attempts.append(timeout)
        raise subprocess.TimeoutExpired(cmd, timeout)

    sleeps = []
    monkeypatch.setattr(subprocess, "run", fake_run)
    monkeypatch.setattr(bench.time, "sleep", lambda s: sleeps.append(s))
    # accelerate the clock: each monotonic() call advances by the time
    # "spent" in the fake timeout/sleep calls
    clock = {"t": 0.0}

    def fake_monotonic():
        clock["t"] += 30.0  # coarse: window 300 / step 30 -> ~bounded
        return clock["t"]

    monkeypatch.setattr(bench.time, "monotonic", fake_monotonic)

    got = bench._probe_device(timeout_s=60.0, window_s=300.0, sleep_s=10.0)
    assert got == "cpu-fallback"
    assert len(attempts) >= 2, "probe must retry before falling back"
    assert sleeps, "probe must pause between attempts"
    # the fallback tag carries the evidence: attempt count + window
    assert "attempts" in bench._probe_detail
    assert str(len(attempts)) in bench._probe_detail
    assert ("jax_platforms", "cpu") in no_jax_fallback


def test_tunnel_recovers_mid_window(monkeypatch):
    state = {"n": 0}

    def fake_run(cmd, capture_output, text, timeout):
        state["n"] += 1
        if state["n"] < 3:
            raise subprocess.TimeoutExpired(cmd, timeout)
        return _FakeCompleted("tpu\n")

    monkeypatch.setattr(subprocess, "run", fake_run)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)

    got = bench._probe_device(timeout_s=60.0, window_s=600.0, sleep_s=1.0)
    assert got == "tpu"
    assert state["n"] == 3
    assert "attempt 3" in bench._probe_detail


def test_immediate_success_single_attempt(monkeypatch):
    state = {"n": 0}

    def fake_run(cmd, capture_output, text, timeout):
        state["n"] += 1
        return _FakeCompleted("tpu\n")

    monkeypatch.setattr(subprocess, "run", fake_run)
    got = bench._probe_device(timeout_s=60.0, window_s=600.0, sleep_s=1.0)
    assert got == "tpu"
    assert state["n"] == 1


def test_bench_ozaki_section_smoke(monkeypatch):
    """bench_ozaki must produce complete rows on the CPU backend at a
    tiny order: ms/gflops/spot_rel_err per variant, no FAILED strings
    (the artifact section the --ozaki flag writes)."""
    monkeypatch.setenv("GENFER_OZAKI_MIN_FLOPS", "0")
    rows = bench.bench_ozaki(orders=(48,), iters=2)
    assert set(rows) == {48}
    row = rows[48]
    assert set(row) == {
        "xla_f64_emulation", "xla_f64_staircase", "ozaki_int8_pb7",
        "ozaki_int8_pb7_nostair", "ozaki_int8_pb6", "ozaki_bf16_pb7",
    }
    for name, r in row.items():
        assert isinstance(r, dict), (name, r)
        assert r["spot_rel_err"] < 1e-11, (name, r)
        assert r["ms"] > 0
