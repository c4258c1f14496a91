"""bench.py orchestration policy, pinned with stubbed measurements.

The driver runs bench.py at every round end under ITS OWN kill budget;
BENCH_r03.json recorded rc:124 with an empty tail — the old policy (45-min
per-mode watchdogs, headline retry-after-timeout) could spend 90+ minutes
before printing anything. The policy under test now:

- a hard TOTAL deadline: the one JSON line is always emitted within
  TOTAL_DEADLINE_SECS; every attempt's watchdog is clamped to the remaining
  budget and no attempt starts with < MIN_ATTEMPT_SECS left;
- every measurement runs in a fresh subprocess (hang boundary + first-
  position timing semantics); the orchestrator never touches a JAX backend;
- headline: NO retry after a timeout (the observed tunnel hang mode freezes
  everything — a retry would hang too); one fresh-subprocess retry after a
  non-timeout crash; honest zero line otherwise;
- secondaries run native FIRST (the north-star evidence outranks fast); a
  timeout abandons all remaining modes; a crash skips just that mode; there
  is NO in-process fallback of any kind.

No TPU or measurement happens here — ``_orchestrate`` takes its measurement
function and clock as parameters precisely so this policy is testable on CPU.
"""

import subprocess
import sys
from pathlib import Path

import pytest


@pytest.fixture(scope="module")
def bench():
    root = str(Path(__file__).resolve().parents[1])
    added = root not in sys.path
    if added:
        sys.path.insert(0, root)
    import bench as b

    yield b
    if added:
        sys.path.remove(root)


def _timeout():
    return subprocess.TimeoutExpired(cmd="bench", timeout=1.0)


class _Clock:
    """Deterministic clock: each reading advances by `step` seconds."""

    def __init__(self, step=0.0, t=0.0):
        self.step, self.t = step, t

    def __call__(self):
        self.t += self.step
        return self.t


def test_happy_path_all_modes_fresh_process_native_first(bench):
    calls = []

    def sub(mode, timeout):
        calls.append((mode, timeout))
        return {"headline": 6000.0, "fast": 19500.0, "native": 41000.0}[mode]

    out = bench._orchestrate(run_sub=sub, clock=_Clock())
    assert out["value"] == 6000.0
    assert out["vs_baseline"] == round(6000.0 / 25000.0, 4)
    assert out["fast_256_segments_per_sec"] == 19500.0
    assert out["native_segments_per_sec"] == 41000.0
    assert out["native_vs_baseline"] == round(41000.0 / 25000.0, 4)
    # headline first (first-position semantics), then NATIVE before fast
    # (under deadline pressure the north-star mode must not be dropped),
    # each mode exactly once
    assert [m for m, _ in calls] == ["headline", "native", "fast"]
    # watchdogs at warm-cache scale, never above the per-mode caps
    assert calls[0][1] <= bench.MODE_TIMEOUT_SECS
    assert all(t <= bench.SECONDARY_TIMEOUT_SECS for _, t in calls[1:])
    assert not any(k.endswith("_same_process") for k in out)


def test_headline_timeout_fails_fast_no_retry(bench):
    attempts = []

    def sub(mode, timeout):
        attempts.append(mode)
        raise _timeout()

    out = bench._orchestrate(run_sub=sub, clock=_Clock())
    # exactly ONE headline attempt: the hang mode freezes the whole tunnel,
    # a retry would burn the driver's budget hanging too
    assert attempts == ["headline"]
    assert out == {
        "metric": "4s_segments_per_sec_per_chip",
        "value": 0.0,
        "unit": "segments/s",
        "vs_baseline": 0.0,
    }


def test_headline_crash_retried_once_in_fresh_subprocess(bench):
    attempts = []

    def sub(mode, timeout):
        if mode == "headline":
            attempts.append(mode)
            if len(attempts) == 1:
                raise subprocess.CalledProcessError(1, "bench")
            return 5900.0
        return {"fast": 19500.0, "native": 41000.0}[mode]

    out = bench._orchestrate(run_sub=sub, clock=_Clock())
    assert len(attempts) == 2
    assert out["value"] == 5900.0
    assert out["native_segments_per_sec"] == 41000.0


def test_headline_double_crash_yields_honest_zero_line(bench):
    attempts = []

    def sub(mode, timeout):
        attempts.append(mode)
        raise subprocess.CalledProcessError(1, "bench")

    out = bench._orchestrate(run_sub=sub, clock=_Clock())
    assert attempts == ["headline", "headline"]
    assert out["value"] == 0.0 and out["vs_baseline"] == 0.0


def test_secondary_timeout_abandons_remaining_modes(bench):
    calls = []

    def sub(mode, timeout):
        calls.append(mode)
        if mode == "headline":
            return 6000.0
        raise _timeout()

    out = bench._orchestrate(run_sub=sub, clock=_Clock())
    assert out["value"] == 6000.0
    # native timed out -> tunnel hang -> fast is NOT attempted
    assert calls == ["headline", "native"]
    assert "native_segments_per_sec" not in out
    assert "fast_256_segments_per_sec" not in out
    assert "native_vs_baseline" not in out


def test_secondary_crash_skips_mode_keeps_going_no_fallback(bench):
    calls = []

    def sub(mode, timeout):
        calls.append(mode)
        if mode == "headline":
            return 6000.0
        if mode == "native":
            raise subprocess.CalledProcessError(1, "bench")
        return 19500.0

    out = bench._orchestrate(run_sub=sub, clock=_Clock())
    assert out["value"] == 6000.0
    # crash (not timeout): native skipped, fast still measured — and no
    # in-process fallback exists (nothing is ever measured in the parent)
    assert calls == ["headline", "native", "fast"]
    assert "native_segments_per_sec" not in out
    assert out["fast_256_segments_per_sec"] == 19500.0
    assert not any(k.endswith("_same_process") for k in out)


def test_total_deadline_caps_attempts_and_watchdogs(bench):
    # each clock reading advances 400 s: headline lands well inside the
    # budget, native's watchdog must be clamped below the per-mode cap,
    # and by fast's turn the remaining budget is < MIN_ATTEMPT_SECS
    calls = []

    def sub(mode, timeout):
        calls.append((mode, timeout))
        return {"headline": 6000.0, "native": 41000.0, "fast": 19500.0}[mode]

    out = bench._orchestrate(run_sub=sub, clock=_Clock(step=400.0))
    assert out["value"] == 6000.0
    assert out["native_segments_per_sec"] == 41000.0
    modes = [m for m, _ in calls]
    assert "fast" not in modes  # budget exhausted before fast
    for _, t in calls:
        assert t <= bench.TOTAL_DEADLINE_SECS


def test_deadline_already_spent_yields_zero_line_without_attempts(bench):
    # the clock jumps a full deadline between readings: by the headline
    # budget check the whole budget is gone — no attempt, honest zero line
    calls = []

    def sub(mode, timeout):
        calls.append(mode)
        return 6000.0

    out = bench._orchestrate(
        run_sub=sub, clock=_Clock(step=bench.TOTAL_DEADLINE_SECS))
    assert calls == []
    assert out["value"] == 0.0


def test_process_group_kill_on_timeout():
    """_measure_mode_fresh_process must bound a child that spawns a helper
    holding the stdout pipe open — subprocess.run's own kill would reap only
    the direct child and block in communicate() forever."""
    import bench as b
    import time
    from unittest import mock

    # a child that spawns a grandchild inheriting the pipe, then sleeps
    code = ("import subprocess,sys,time;"
            "subprocess.Popen([sys.executable,'-c','import time;"
            "time.sleep(600)']);"
            "time.sleep(600)")
    real_popen = subprocess.Popen

    def popen_stub(cmd, **kw):
        return real_popen([sys.executable, "-c", code], **kw)

    t0 = time.monotonic()
    with mock.patch.object(subprocess, "Popen", side_effect=popen_stub):
        with pytest.raises(subprocess.TimeoutExpired):
            b._measure_mode_fresh_process("headline", timeout=2.0)
    # returns promptly despite the pipe-holding grandchild (killpg got both)
    assert time.monotonic() - t0 < 30.0
