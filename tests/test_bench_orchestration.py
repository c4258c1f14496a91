"""bench.py orchestration policy, pinned with stubbed measurements.

The driver runs bench.py at every round end; the TPU tunnel has an observed
HANG mode (host fetches freeze forever — 2026-08-17, 2026-08-19 ×2) under
which an unwatchdogged measurement never returns. The policy under test:
every measurement runs in a fresh subprocess under a timeout, the headline
gets exactly one retry then an honest zero line, and a TIMED-OUT secondary
mode is skipped outright (an in-process fallback would hang the parent and
lose the already-measured headline), while a non-timeout child crash may
fall back in-process, flagged.

No TPU or measurement happens here — ``_orchestrate`` takes its measurement
functions as parameters precisely so this policy is testable on CPU.
"""

import subprocess
import sys

import pytest


@pytest.fixture(scope="module")
def bench():
    sys.path.insert(0, ".")
    import bench as b

    return b


def _never(mode):  # a measurement hook that must not be reached
    raise AssertionError(f"unexpected in-process measurement of {mode!r}")


def _timeout():
    return subprocess.TimeoutExpired(cmd="bench", timeout=1.0)


def test_happy_path_all_modes_fresh_process(bench):
    calls = []

    def sub(mode):
        calls.append(mode)
        return {"headline": 6000.0, "fast": 19500.0, "native": 31800.0}[mode]

    out = bench._orchestrate(run_sub=sub, run_local=_never)
    assert out["value"] == 6000.0
    assert out["vs_baseline"] == round(6000.0 / 25000.0, 4)
    assert out["fast_256_segments_per_sec"] == 19500.0
    assert out["native_segments_per_sec"] == 31800.0
    assert out["native_vs_baseline"] == round(31800.0 / 25000.0, 4)
    # headline first (first-position semantics), each mode exactly once
    assert calls == ["headline", "fast", "native"]
    assert not any(k.endswith("_same_process") for k in out)


def test_headline_retried_once_after_timeout(bench):
    attempts = []

    def sub(mode):
        if mode == "headline":
            attempts.append(mode)
            if len(attempts) == 1:
                raise _timeout()
            return 5900.0
        raise _timeout()

    out = bench._orchestrate(run_sub=sub, run_local=_never)
    assert len(attempts) == 2
    assert out["value"] == 5900.0
    # timed-out secondaries are skipped entirely — _never not called
    assert "fast_256_segments_per_sec" not in out
    assert "native_segments_per_sec" not in out
    assert "native_vs_baseline" not in out


def test_headline_double_failure_yields_honest_zero_line(bench):
    attempts = []

    def sub(mode):
        attempts.append(mode)
        raise _timeout()

    out = bench._orchestrate(run_sub=sub, run_local=_never)
    # exactly two headline attempts, secondaries never tried
    assert attempts == ["headline", "headline"]
    assert out == {
        "metric": "4s_segments_per_sec_per_chip",
        "value": 0.0,
        "unit": "segments/s",
        "vs_baseline": 0.0,
    }


def test_secondary_timeout_never_falls_back_in_process(bench):
    def sub(mode):
        if mode == "headline":
            return 6000.0
        raise _timeout()

    out = bench._orchestrate(run_sub=sub, run_local=_never)  # _never: pinned
    assert out["value"] == 6000.0
    assert "fast_256_segments_per_sec" not in out
    assert "native_segments_per_sec" not in out


def test_secondary_crash_falls_back_in_process_flagged(bench):
    def sub(mode):
        if mode == "headline":
            return 6000.0
        raise subprocess.CalledProcessError(1, "bench")

    def local(mode):
        return {"fast": 19000.0, "native": 30000.0}[mode]

    out = bench._orchestrate(run_sub=sub, run_local=local)
    assert out["fast_256_segments_per_sec"] == 19000.0
    assert out["fast_256_same_process"] is True
    assert out["native_segments_per_sec"] == 30000.0
    assert out["native_same_process"] is True
    assert out["native_vs_baseline"] == round(30000.0 / 25000.0, 4)


def test_secondary_local_fallback_failure_keeps_headline(bench):
    def sub(mode):
        if mode == "headline":
            return 6000.0
        raise subprocess.CalledProcessError(1, "bench")

    def local(mode):
        raise RuntimeError("local also fails")

    out = bench._orchestrate(run_sub=sub, run_local=local)
    assert out["value"] == 6000.0
    assert "fast_256_segments_per_sec" not in out
    assert "native_segments_per_sec" not in out
