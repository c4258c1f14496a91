"""End-to-end throughput benchmark: 4-second segments/sec/chip.

Measures the full serving path on one chip — waveform windows → fused mel
front end (GEMM DFT on the MXU) → 6-head ResNet-18 ensemble → [B, N+1]
logits — in bfloat16, mirroring BASELINE.json's north-star metric (≥25k 4-s
segments/sec/chip end-to-end). The ensemble uses the shared-backbone layout,
which is what reference-merged checkpoints actually contain (their
strict=False load only matches head.* keys, so all sub-models share one
backbone — SURVEY.md §2.2); the dense independent-backbone path is exercised
by tests and __graft_entry__.

Timing methodology: on tunneled TPU runtimes, ``block_until_ready`` can
return before execution and a host transfer carries a large fixed latency —
so wall-clocking a Python dispatch loop measures nothing. Instead the model
forward is iterated *inside* one jitted program with ``lax.fori_loop`` (each
iteration data-dependent on the last, so nothing can be elided or overlapped;
the trip count is a traced scalar so N and 1 run the identical executable),
and the per-iteration time is the difference between an N-iteration and a
1-iteration invocation, each synchronized by one scalar transfer:

    t_per_iter = (T(N) - T(1)) / (N - 1)

Prints exactly one JSON line:
    {"metric": "...", "value": N, "unit": "...", "vs_baseline": N, ...}
``value`` is the 512² REFERENCE-FIDELITY figure — its meaning is unchanged
round over round so the driver's history stays comparable; the supported
fidelity modes ride along as secondary keys (``fast_256_segments_per_sec``,
``native_segments_per_sec`` — the native mel-resolution mode measured PAST
the 25k north star, docs/PERFORMANCE.md). vs_baseline is value / 25000 (the
BASELINE.json target; the reference publishes no segments/sec figure of its
own — SURVEY.md §6).

The metric string in BASELINE.json is "end-to-end (decode→mel→ensemble);
p50 per-clip latency", so the line also carries (budget permitting):
  - ``host_feed_segments_per_sec`` (+ ``_per_core``): the MEASURED host
    half — native/sadio.cpp batch decode → window slice → int16 quantize
    (benchmarks/host_feed.py; no device, no tunnel). End-to-end rate =
    min(host feed at the deployment's core count, device rate).
  - ``p50_latency_ms_native`` / ``p50_latency_ms_512``: per-clip serving
    latency at the bucket-8 batch (the pipeline's smallest bucket — one
    4 s clip rides this program). p50 is the median over independent
    N-vs-1 differenced estimates: per-invocation wall times are
    unobservable through the tunnel (block_until_ready returns early;
    the only sync is a host transfer with ~100 s fixed latency), so the
    chained-loop difference is the honest per-batch figure and its median
    across estimates is the reported p50.
"""

from __future__ import annotations

import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

TARGET_SEGS_PER_SEC = 25_000.0
BATCH = 128
ITERS = 51  # difference against 1 → 50 timed iterations (the signal must
            # stand clear of the tunnel's scalar-fetch jitter; extra loop
            # iterations are nearly free next to a 25-100 s fetch)


def _looped(fwd):
    """One jitted program running `n_iters` serially-dependent forwards.

    ``n_iters`` is a TRACED scalar, so the N-iteration and 1-iteration
    timings run the IDENTICAL compiled program (fori_loop with dynamic
    bounds lowers to a while loop) — one remote compile per mode instead
    of two (a cold 512² compile through the tunnel was measured at 13+
    minutes; halving the count is what makes a cold round-end run fit the
    driver's budget), and the N-vs-1 difference can't be contaminated by
    the two programs compiling differently."""

    def run(variables, windows, n_iters):
        def body(_, carry):
            acc, w = carry
            out = fwd(variables, w)
            contrib = jnp.sum(out).astype(jnp.float32)
            # chain: perturb the input by an output-dependent epsilon so
            # iteration i+1 depends on iteration i (no elision / reordering)
            w = w + (contrib * 1e-30).astype(w.dtype)
            return acc + contrib, w

        acc, _ = jax.lax.fori_loop(
            0, n_iters, body, (jnp.float32(0.0), windows)
        )
        return acc

    return jax.jit(run)


def _enable_compile_cache() -> None:
    """Persistent compilation cache: repeated bench runs (and the driver's
    round-end run) reuse compiled executables instead of paying multi-minute
    remote compiles. TPU backends only — XLA:CPU AOT entries are
    machine-feature-stamped and can SIGILL when loaded under a different
    feature set (__graft_entry__ has the full note)."""
    try:
        if jax.default_backend() in ("tpu", "axon"):
            jax.config.update("jax_compilation_cache_dir",
                              "/root/repo/.jax_cache")
            jax.config.update("jax_persistent_cache_min_compile_time_secs",
                              1.0)
    except Exception:
        pass  # older jax or read-only fs: cache is an optimization only


def _looped_runner(ens, out_size: int, on_tpu: bool, batch: int):
    """Compile the one-program chained-loop runner for a fidelity mode
    (out_size 512/256; 0 = native) at the given batch. Native measures with
    the mono-folded stem, matching the serving pipeline's auto-gate (+6%
    composite win there; neutral/harmful at the square sizes —
    infer/pipeline.py). Returns (run, variables, windows)."""
    from synthetic_audio_detection_tpu.infer.pipeline import _forward_windows
    from synthetic_audio_detection_tpu.utils.config import SpectrogramConfig

    spec_cfg = SpectrogramConfig.inference(out_size=out_size)
    if out_size == 0 and on_tpu and ens.model.in_channels == 3:
        from synthetic_audio_detection_tpu.ensemble.multihead import fold_to_mono

        ens = fold_to_mono(ens)
    fwd = functools.partial(
        _forward_windows,
        ensemble=ens,
        spec_cfg=spec_cfg,
        sample_rate=32_000,
        use_gemm_dft=True,
        compute_dtype=jnp.bfloat16,
        use_pallas=on_tpu,  # fused mel kernel on TPU
        # folded-affine backbone at every size — matches the serving
        # auto-gate (with the factored-DFT mel the fast path wins at native
        # too: 41,235 fastpath-mono vs 40,076 mono, infer/pipeline.py gate)
        use_fast_backbone=on_tpu,
    )

    rng = np.random.default_rng(0)
    windows = jnp.asarray(
        rng.standard_normal((batch, 128_000)).astype(np.float32) * 0.3
    )
    variables = jax.device_put(ens.variables)
    return _looped(fwd), variables, windows


def _measure_config(ens, out_size: int, on_tpu: bool, iters: int = ITERS) -> float:
    """segments/sec for one fidelity mode at the throughput batch."""
    run, variables, windows = _looped_runner(ens, out_size, on_tpu, BATCH)
    n1 = jnp.asarray(1, jnp.int32)
    nN = jnp.asarray(iters, jnp.int32)

    # compile (one program) and absorb the first-transfer latency — a single
    # warmup covers both trip counts (same executable), and every fetch
    # matters: a scalar fetch costs 25-100 s through this tunnel
    float(run(variables, windows, nN))

    def timed(n) -> float:
        t0 = time.perf_counter()
        # scalar transfer = the only real sync
        float(run(variables, windows, n))
        return time.perf_counter() - t0

    # median of 3 to damp tunnel-latency jitter
    t1 = sorted(timed(n1) for _ in range(3))[1]
    tn = sorted(timed(nN) for _ in range(3))[1]
    per_iter = max((tn - t1) / (iters - 1), 1e-9)
    return BATCH / per_iter


LATENCY_BATCH = 8  # the serving pipeline's smallest bucket: one 4 s clip
                   # rides this program (infer/pipeline.py bucketing)


def _measure_latency_p50_ms(ens, out_size: int, on_tpu: bool,
                            iters: int = ITERS, estimates: int = 3) -> float:
    """p50 per-clip latency (ms) at the bucket-8 serving batch.

    Per-invocation wall times are unobservable through the tunnel (the only
    sync is a host transfer with ~100 s fixed latency), so each estimate is
    an N-vs-1 chained-loop difference — the honest per-batch execution time
    — and the reported p50 is the median across ``estimates`` independent
    estimates (same-program repeats in one process are uncontaminated on
    this rig; it is cross-PROGRAM sequences that are not — CLAUDE.md)."""
    run, variables, windows = _looped_runner(ens, out_size, on_tpu,
                                             LATENCY_BATCH)
    n1 = jnp.asarray(1, jnp.int32)
    nN = jnp.asarray(iters, jnp.int32)
    float(run(variables, windows, nN))  # compile + first-transfer

    def timed(n) -> float:
        t0 = time.perf_counter()
        float(run(variables, windows, n))
        return time.perf_counter() - t0

    ests = []
    for _ in range(estimates):
        t1, tn = timed(n1), timed(nN)
        ests.append(max((tn - t1) / (iters - 1), 1e-9))
    return sorted(ests)[len(ests) // 2] * 1e3


# fidelity modes: out_size (0 = native mel resolution) and loop iterations.
# 51 iterations everywhere: the differencing signal must stand clear of the
# tunnel's scalar-fetch jitter (fetches cost 25-100 s; 50 extra loop
# iterations cost ~1 s at 512² and less elsewhere — pure SNR win)
MODES = {"headline": (512, 51), "fast": (256, 51), "native": (0, 51)}

# which modes also measure p50 per-clip latency, and the key it lands under
LATENCY_KEYS = {"native": "p50_latency_ms_native",
                "headline": "p50_latency_ms_512"}
# a latency measurement costs one extra remote compile (~85-240 s cold) plus
# ~7 scalar fetches; the child only attempts it when this much of its budget
# remains AFTER the throughput phase — on a slow tunnel patch the mode
# reverts to the round-4 throughput-only shape instead of risking its
# watchdog (the throughput figure must never be the casualty)
LATENCY_EST_SECS = 330.0


def _measure_mode(mode: str, budget: float = 0.0) -> dict:
    from __graft_entry__ import _flagship_ensemble

    t0 = time.monotonic()
    ens = _flagship_ensemble(n_heads=6, shared_backbone=True,
                             dtype=jnp.bfloat16)
    on_tpu = jax.default_backend() in ("tpu", "axon")
    out_size, iters = MODES[mode]
    out = {"segments_per_sec":
           _measure_config(ens, out_size, on_tpu, iters=iters)}
    lat_key = LATENCY_KEYS.get(mode)
    if lat_key and budget > 0:
        elapsed = time.monotonic() - t0
        if elapsed + LATENCY_EST_SECS <= budget:
            try:
                out[lat_key] = round(
                    _measure_latency_p50_ms(ens, out_size, on_tpu,
                                            iters=iters), 3)
            except Exception:  # noqa: BLE001 - latency is the optional half
                pass
    return out


# Budgets (round-4 rework — BENCH_r03 was rc:124 with NO output: the old
# 45-min per-mode watchdog + headline retry-after-timeout could spend 90+
# minutes before printing anything, which exceeded the DRIVER's own kill
# budget. The budget that matters is the driver's, so the orchestrator now
# runs against a hard TOTAL deadline and prints its one JSON line with
# whatever was measured when it expires. Budgets assume COLD compiles:
# the persistent cache's keys are unstable across processes on this rig
# (same program recompiled under a new key within one session — NOTES.md),
# so every mode budget covers a 2-10-min remote compile per shape.
MODE_TIMEOUT_SECS = 1250.0       # headline watchdog. Round-5 lesson: on a
                                 # slow tunnel patch the cold 512² compile
                                 # alone exceeded 900 s (a 27-min headline
                                 # child completed fine at 1200s budget the
                                 # same evening) — the old 900 s watchdog
                                 # turned a slow compile into a zero line.
SECONDARY_TIMEOUT_SECS = 900.0   # per secondary mode (observed cold+slow-
                                 # tunnel modes up to ~15 min; the TOTAL
                                 # deadline is the binding bound either way)
TOTAL_DEADLINE_SECS = 1920.0     # hard cap before the JSON line is emitted
                                 # (32 min: a 900 s native still leaves the
                                 # headline ~1000 s; the round-3 driver
                                 # demonstrably allowed 33+ and the round-4
                                 # capture ran 27 min)
MIN_ATTEMPT_SECS = 120.0         # don't start an attempt with less than this


def _measure_mode_fresh_process(mode: str, timeout: float) -> float:
    """Measure a mode in a FRESH interpreter under a hang watchdog.

    Fresh process for two reasons: (a) same-process multi-MODE timing
    sequences are contaminated on this rig (readings after the first program
    can run ~2× fast — CLAUDE.md's twice-confirmed rule), so every quotable
    figure gets first-position semantics; (b) the subprocess is the hang
    boundary — when the tunnel enters its hang mode the child freezes, the
    timeout kills it, and the parent (which never touches a JAX backend in
    orchestration mode) survives to report what it has.

    The child runs in its own session/process group and the WHOLE group is
    SIGKILLed on timeout — subprocess.run's own kill reaps only the direct
    child, and any helper process inheriting the stdout pipe would keep
    communicate() blocked forever (the exact hang this watchdog exists to
    bound)."""
    import os
    import signal
    import subprocess
    import sys

    proc = subprocess.Popen(
        [sys.executable, __file__, "--mode", mode,
         "--budget", str(max(timeout - 30.0, 0.0))],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        start_new_session=True,
    )
    try:
        stdout, stderr = proc.communicate(timeout=timeout)
    except subprocess.TimeoutExpired:
        try:
            os.killpg(proc.pid, signal.SIGKILL)
        except (ProcessLookupError, PermissionError):
            pass
        proc.wait()
        raise
    if proc.returncode != 0:
        raise subprocess.CalledProcessError(
            proc.returncode, proc.args, output=stdout, stderr=stderr)
    last = stdout.strip().splitlines()[-1]
    try:
        parsed = json.loads(last)
    except json.JSONDecodeError:
        parsed = float(last)
    if not isinstance(parsed, dict):
        # historical child protocol: a bare throughput float
        parsed = {"segments_per_sec": float(parsed)}
    return parsed


HOST_FEED_TIMEOUT_SECS = 300.0


def _measure_host_feed(timeout: float) -> dict:
    """The host half of 'end-to-end': benchmarks/host_feed.py in a fresh
    process (no JAX, no device, no tunnel — it cannot hang on the tunnel,
    so it runs even after a headline timeout; more evidence on the line)."""
    import os as _os
    import subprocess
    import sys

    out = subprocess.run(
        [sys.executable,
         _os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                       "benchmarks", "host_feed.py"),
         "--json", "--files", "256", "--min-seconds", "15"],
        capture_output=True, text=True, timeout=timeout, check=True,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def _zero_line() -> dict:
    """The honest failure line: the driver records a number every round;
    0.0 (not a stale or partial figure) is the unambiguous 'measurement
    failed' marker, matching the historical `bench failed` fallback."""
    return {
        "metric": "4s_segments_per_sec_per_chip",
        "value": 0.0,
        "unit": "segments/s",
        "vs_baseline": 0.0,
    }


def _orchestrate(run_sub=_measure_mode_fresh_process, clock=None,
                 run_host=_measure_host_feed) -> dict:
    """Assemble the one-line JSON dict. Pure orchestration — measurement and
    clock are injected so tests can pin the failure policy without a TPU:

    - Hard TOTAL deadline: every attempt's watchdog is clamped to the
      remaining budget, and no attempt starts with less than
      MIN_ATTEMPT_SECS left — the JSON line always appears within
      TOTAL_DEADLINE_SECS (+ one watchdog granularity), which is the budget
      the DRIVER has.
    - NATIVE runs FIRST (its own fresh process, so first-position timing
      semantics hold per mode regardless of order): it is the north-star
      evidence and must not be the mode a slow tunnel squeezes out. Its
      result is attached to the final line even when the headline fails.
      A native failure of any kind does NOT abandon the headline — the
      headline is the round record and always gets its shot.
    - headline (512² reference fidelity, `value`, meaning unchanged round
      over round): fresh subprocess under the watchdog. On a TIMEOUT there
      is NO retry (the observed hang mode freezes the whole tunnel — a
      second attempt would burn the rest of the budget hanging too) and
      `fast` is skipped for the same reason. On a non-timeout child crash,
      ONE retry in another fresh subprocess. Never measured in the
      orchestrator's own process: a tunnel hang there is unkillable.
    - host_feed (benchmarks/host_feed.py, the measured decode half of
      "end-to-end") runs after the headline: it touches no device and no
      tunnel, so it runs EVEN AFTER a headline timeout — a tunnel hang
      cannot reach it, and the zero line still carries the host evidence.
    - fast runs last, only while nothing has timed out. No in-process
      fallback anywhere (unkillable under a hang AND second-position
      contaminated).
    """
    import subprocess
    import time as _time

    clock = clock or _time.monotonic
    t0 = clock()

    def remaining() -> float:
        return TOTAL_DEADLINE_SECS - (clock() - t0)

    def as_dict(res) -> dict:
        # stubbed/legacy measurements may be bare throughput floats
        return res if isinstance(res, dict) else {"segments_per_sec": res}

    native = None
    if remaining() >= MIN_ATTEMPT_SECS:
        try:
            native = as_dict(run_sub("native", min(SECONDARY_TIMEOUT_SECS,
                                                   remaining())))
        except Exception:  # noqa: BLE001 - incl. timeout: headline still runs
            pass

    headline = None
    headline_timed_out = False
    for _attempt in range(2):
        if remaining() < MIN_ATTEMPT_SECS:
            break
        try:
            headline = as_dict(run_sub(
                "headline", min(MODE_TIMEOUT_SECS, remaining())))
            break
        except subprocess.TimeoutExpired:
            headline_timed_out = True
            break  # tunnel hang: a retry would hang too — fail fast
        except Exception:  # noqa: BLE001 - child crash: one more fresh try
            continue

    out = _zero_line() if headline is None else {
        "metric": "4s_segments_per_sec_per_chip",
        "value": round(headline["segments_per_sec"], 1),
        "unit": "segments/s",
        "vs_baseline": round(
            headline["segments_per_sec"] / TARGET_SEGS_PER_SEC, 4),
    }
    if headline is not None and "p50_latency_ms_512" in headline:
        out["p50_latency_ms_512"] = headline["p50_latency_ms_512"]
    if native is not None:
        out["native_segments_per_sec"] = round(native["segments_per_sec"], 1)
        out["native_vs_baseline"] = round(
            native["segments_per_sec"] / TARGET_SEGS_PER_SEC, 4)
        if "p50_latency_ms_native" in native:
            out["p50_latency_ms_native"] = native["p50_latency_ms_native"]
    if remaining() >= MIN_ATTEMPT_SECS:
        try:
            host = run_host(min(HOST_FEED_TIMEOUT_SECS, remaining()))
            out["host_feed_segments_per_sec"] = host[
                "host_feed_segments_per_sec"]
            out["host_feed_segments_per_sec_per_core"] = host[
                "host_feed_segments_per_sec_per_core"]
        except Exception:  # noqa: BLE001 - optional evidence: skip on failure
            pass
    if (headline is not None and not headline_timed_out
            and remaining() >= MIN_ATTEMPT_SECS):
        try:
            fast = as_dict(run_sub(
                "fast", min(SECONDARY_TIMEOUT_SECS, remaining())))
            out["fast_256_segments_per_sec"] = round(
                fast["segments_per_sec"], 1)
        except Exception:  # noqa: BLE001 - optional mode: skip on any failure
            pass
    return out


def main(mode: str = "", budget: float = 0.0) -> None:
    if mode:  # subprocess entry: print one mode's JSON line (last line wins)
        _enable_compile_cache()
        print(json.dumps(_measure_mode(mode, budget=budget)))
        return
    # orchestrator: no _enable_compile_cache() here — it initializes the
    # JAX backend, and backend init itself hangs when the tunnel is in its
    # hang mode; only the watchdogged children may touch the device.
    print(json.dumps(_orchestrate()))


if __name__ == "__main__":
    import argparse

    _p = argparse.ArgumentParser()
    _p.add_argument("--mode", default="", choices=["", *MODES])
    _p.add_argument("--budget", type=float, default=0.0,
                    help="child self-limit (secs): the optional latency "
                         "phase only runs inside this budget")
    _args = _p.parse_args()
    try:
        main(_args.mode, _args.budget)
    except Exception as e:  # noqa: BLE001 - the driver needs its one JSON line
        import sys

        if _args.mode:  # subprocess entry: signal failure, no JSON
            print(f"bench --mode {_args.mode} failed: {e!r}", file=sys.stderr)
            sys.exit(1)
        print(f"bench failed: {e!r}", file=sys.stderr)
        print(
            json.dumps(
                {
                    "metric": "4s_segments_per_sec_per_chip",
                    "value": 0.0,
                    "unit": "segments/s",
                    "vs_baseline": 0.0,
                }
            )
        )
