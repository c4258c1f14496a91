"""bench.py orchestration policy, pinned with stubbed measurements.

The driver runs bench.py at every round end under ITS OWN kill budget;
BENCH_r03.json recorded rc:124 with an empty tail — the old policy (45-min
per-mode watchdogs, headline retry-after-timeout) could spend 90+ minutes
before printing anything. The policy under test now:

- a hard TOTAL deadline: the one JSON line is always emitted within
  TOTAL_DEADLINE_SECS; every attempt's watchdog is clamped to the remaining
  budget and no attempt starts with < MIN_ATTEMPT_SECS left;
- every measurement runs in a fresh subprocess (hang boundary + per-process
  first-position timing); the orchestrator never touches a JAX backend;
- NATIVE measures first (the north-star evidence) and its result is
  attached to the final line even when the headline fails; a native failure
  never abandons the headline (the round record always gets its shot);
- headline: NO retry after a timeout (the observed tunnel hang mode freezes
  everything — a retry would hang too) and fast is then skipped; one
  fresh-subprocess retry after a non-timeout crash;
- there is NO in-process fallback of any kind.

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


def _host_stub(timeout):
    """Deterministic host-feed result (the real one runs a subprocess)."""
    return {"host_feed_segments_per_sec": 1031.3,
            "host_feed_segments_per_sec_per_core": 1031.3}


class _Clock:
    """Deterministic clock: each reading advances by `step` seconds."""

    def __init__(self, step=0.0, t=0.0):
        self.step, self.t = step, t

    def __call__(self):
        self.t += self.step
        return self.t


def test_happy_path_native_first_headline_is_value(bench):
    calls = []

    def sub(mode, timeout):
        calls.append((mode, timeout))
        return {"headline": 6000.0, "fast": 19500.0, "native": 41000.0}[mode]

    out = bench._orchestrate(run_sub=sub, clock=_Clock(), run_host=_host_stub)
    assert out["value"] == 6000.0
    assert out["vs_baseline"] == round(6000.0 / 25000.0, 4)
    assert out["fast_256_segments_per_sec"] == 19500.0
    assert out["native_segments_per_sec"] == 41000.0
    assert out["native_vs_baseline"] == round(41000.0 / 25000.0, 4)
    # native measures FIRST (it must not be squeezed out by a slow tunnel);
    # each mode exactly once; fast last
    assert [m for m, _ in calls] == ["native", "headline", "fast"]
    for _, t in calls:
        assert t <= bench.MODE_TIMEOUT_SECS


def test_headline_timeout_no_retry_keeps_native_evidence(bench):
    attempts = []

    def sub(mode, timeout):
        attempts.append(mode)
        if mode == "native":
            return 41000.0
        raise _timeout()

    out = bench._orchestrate(run_sub=sub, clock=_Clock(), run_host=_host_stub)
    # exactly ONE headline attempt (hang mode: a retry would hang too),
    # fast skipped, but the measured native rides the zero line
    assert attempts == ["native", "headline"]
    assert out["value"] == 0.0 and out["vs_baseline"] == 0.0
    assert out["native_segments_per_sec"] == 41000.0
    assert out["native_vs_baseline"] == round(41000.0 / 25000.0, 4)
    assert "fast_256_segments_per_sec" not in out


def test_native_timeout_does_not_abandon_headline(bench):
    calls = []

    def sub(mode, timeout):
        calls.append(mode)
        if mode == "native":
            raise _timeout()
        return {"headline": 6000.0, "fast": 19500.0}[mode]

    out = bench._orchestrate(run_sub=sub, clock=_Clock(), run_host=_host_stub)
    # the headline is the round record — it always gets its shot
    assert calls == ["native", "headline", "fast"]
    assert out["value"] == 6000.0
    assert "native_segments_per_sec" not in out
    assert out["fast_256_segments_per_sec"] == 19500.0


def test_headline_crash_retried_once_in_fresh_subprocess(bench):
    attempts = []

    def sub(mode, timeout):
        if mode == "headline":
            attempts.append(mode)
            if len(attempts) == 1:
                raise subprocess.CalledProcessError(1, "bench")
            return 5900.0
        return {"fast": 19500.0, "native": 41000.0}[mode]

    out = bench._orchestrate(run_sub=sub, clock=_Clock(), run_host=_host_stub)
    assert len(attempts) == 2
    assert out["value"] == 5900.0
    assert out["native_segments_per_sec"] == 41000.0
    assert out["fast_256_segments_per_sec"] == 19500.0


def test_headline_double_crash_yields_zero_line_with_native(bench):
    attempts = []

    def sub(mode, timeout):
        attempts.append(mode)
        if mode == "native":
            return 41000.0
        raise subprocess.CalledProcessError(1, "bench")

    out = bench._orchestrate(run_sub=sub, clock=_Clock(), run_host=_host_stub)
    assert attempts == ["native", "headline", "headline"]
    assert out["value"] == 0.0
    assert out["native_segments_per_sec"] == 41000.0
    # a crashed (not timed-out) headline still skips fast: value is zero,
    # nothing left to adorn
    assert "fast_256_segments_per_sec" not in out


def test_fast_crash_is_skipped_silently(bench):
    def sub(mode, timeout):
        if mode == "fast":
            raise subprocess.CalledProcessError(1, "bench")
        return {"headline": 6000.0, "native": 41000.0}[mode]

    out = bench._orchestrate(run_sub=sub, clock=_Clock(), run_host=_host_stub)
    assert out["value"] == 6000.0
    assert out["native_segments_per_sec"] == 41000.0
    assert "fast_256_segments_per_sec" not in out
    assert not any(k.endswith("_same_process") for k in out)


def test_total_deadline_caps_attempts_and_watchdogs(bench):
    # each clock reading advances 400 s: native + headline land inside the
    # budget, and by fast's turn the remaining budget is < MIN_ATTEMPT_SECS
    calls = []

    def sub(mode, timeout):
        calls.append((mode, timeout))
        return {"headline": 6000.0, "native": 41000.0, "fast": 19500.0}[mode]

    out = bench._orchestrate(run_sub=sub, clock=_Clock(step=400.0), run_host=_host_stub)
    assert out["value"] == 6000.0
    assert out["native_segments_per_sec"] == 41000.0
    modes = [m for m, _ in calls]
    assert "fast" not in modes  # budget exhausted before fast
    for _, t in calls:
        assert t <= bench.TOTAL_DEADLINE_SECS


def test_deadline_already_spent_yields_zero_line_without_attempts(bench):
    # the clock jumps a full deadline between readings: by the first budget
    # check the whole budget is gone — no attempt, honest zero line
    calls = []

    def sub(mode, timeout):
        calls.append(mode)
        return 6000.0

    out = bench._orchestrate(
        run_sub=sub, clock=_Clock(step=bench.TOTAL_DEADLINE_SECS),
        run_host=_host_stub)
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


def test_latency_and_host_keys_ride_the_line(bench):
    """Round-5 policy: mode children may return dicts carrying the p50
    per-clip latency halves of the BASELINE metric; the host-feed evidence
    (decode half of 'end-to-end') is attached whenever budget remains."""

    def sub(mode, timeout):
        return {
            "native": {"segments_per_sec": 41000.0,
                       "p50_latency_ms_native": 0.42},
            "headline": {"segments_per_sec": 6000.0,
                         "p50_latency_ms_512": 3.1},
            "fast": {"segments_per_sec": 23000.0},
        }[mode]

    out = bench._orchestrate(run_sub=sub, clock=_Clock(), run_host=_host_stub)
    assert out["value"] == 6000.0
    assert out["p50_latency_ms_512"] == 3.1
    assert out["native_segments_per_sec"] == 41000.0
    assert out["p50_latency_ms_native"] == 0.42
    assert out["host_feed_segments_per_sec"] == 1031.3
    assert out["host_feed_segments_per_sec_per_core"] == 1031.3
    assert out["fast_256_segments_per_sec"] == 23000.0


def test_host_feed_runs_even_after_headline_timeout(bench):
    """host_feed touches no device and no tunnel — a tunnel hang cannot
    reach it, so the zero line still carries the host evidence."""
    def sub(mode, timeout):
        if mode == "native":
            return 41000.0
        raise _timeout()

    out = bench._orchestrate(run_sub=sub, clock=_Clock(), run_host=_host_stub)
    assert out["value"] == 0.0
    assert out["host_feed_segments_per_sec"] == 1031.3
    assert "fast_256_segments_per_sec" not in out


def test_host_feed_failure_skipped_silently(bench):
    def sub(mode, timeout):
        return {"headline": 6000.0, "native": 41000.0, "fast": 23000.0}[mode]

    def bad_host(timeout):
        raise RuntimeError("no corpus")

    out = bench._orchestrate(run_sub=sub, clock=_Clock(), run_host=bad_host)
    assert out["value"] == 6000.0
    assert "host_feed_segments_per_sec" not in out
    assert out["fast_256_segments_per_sec"] == 23000.0


def test_fresh_process_parses_json_child_line():
    """Mode children print a one-line JSON dict; the parent must parse it
    (and still accept the historical bare-float protocol)."""
    import bench as b
    from unittest import mock

    real_popen = subprocess.Popen

    def popen_json(cmd, **kw):
        code = ("print('warmup noise');"
                "print('{\"segments_per_sec\": 40456.0, "
                "\"p50_latency_ms_native\": 0.43}')")
        return real_popen([sys.executable, "-c", code], **kw)

    with mock.patch.object(subprocess, "Popen", side_effect=popen_json):
        out = b._measure_mode_fresh_process("native", timeout=30.0)
    assert out == {"segments_per_sec": 40456.0, "p50_latency_ms_native": 0.43}

    def popen_float(cmd, **kw):
        return real_popen([sys.executable, "-c", "print(6295.6)"], **kw)

    with mock.patch.object(subprocess, "Popen", side_effect=popen_float):
        out = b._measure_mode_fresh_process("headline", timeout=30.0)
    assert out == {"segments_per_sec": 6295.6}
