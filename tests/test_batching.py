"""MicroBatcher unit tests: coalescing, ordering, caps, error isolation —
against a controllable fake forward (no device)."""

import threading
import time

import numpy as np
import pytest

from synthetic_audio_detection_tpu.infer.batching import MicroBatcher


def fake_forward(windows: np.ndarray) -> np.ndarray:
    """Deterministic per-row function so slice routing is checkable:
    logits[i] = [row_sum, row_sum * 2]."""
    s = windows.sum(axis=1, keepdims=True)
    return np.concatenate([s, 2 * s], axis=1)


def _submit_concurrently(batcher, arrays, start_together=True):
    """Run batcher.logits for every array on its own thread; return results
    in submission order."""
    results = [None] * len(arrays)
    errors = [None] * len(arrays)
    barrier = threading.Barrier(len(arrays)) if start_together else None

    def run(i):
        if barrier is not None:
            barrier.wait()
        try:
            results[i] = batcher.logits(arrays[i])
        except BaseException as e:  # noqa: BLE001
            errors[i] = e

    threads = [threading.Thread(target=run, args=(i,))
               for i in range(len(arrays))]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=30)
    return results, errors


def test_results_routed_correctly_under_concurrency():
    rng = np.random.default_rng(0)
    arrays = [rng.standard_normal((int(rng.integers(1, 7)), 16))
              .astype(np.float32) for _ in range(12)]
    b = MicroBatcher(fake_forward, max_windows=16)
    try:
        results, errors = _submit_concurrently(b, arrays)
        assert all(e is None for e in errors)
        for arr, res in zip(arrays, results):
            np.testing.assert_allclose(res, fake_forward(arr), rtol=0, atol=0)
    finally:
        b.stop()


def test_coalesces_queued_requests_into_one_dispatch():
    """Block the first forward; everything queued behind it must ride ONE
    shared dispatch once released."""
    gate = threading.Event()
    first_entered = threading.Event()
    calls = []

    def gated_forward(windows):
        calls.append(windows.shape[0])
        if len(calls) == 1:
            first_entered.set()
            gate.wait(timeout=30)
        return fake_forward(windows)

    b = MicroBatcher(gated_forward, max_windows=64)
    try:
        arrays = [np.full((2, 4), i, np.float32) for i in range(6)]
        results = [None] * 6

        def run(i):
            results[i] = b.logits(arrays[i])

        t0 = threading.Thread(target=run, args=(0,))
        t0.start()
        assert first_entered.wait(timeout=10)
        rest = [threading.Thread(target=run, args=(i,)) for i in range(1, 6)]
        for t in rest:
            t.start()
        # let the 5 stragglers reach the queue, then open the gate
        time.sleep(0.2)
        gate.set()
        t0.join(timeout=10)
        for t in rest:
            t.join(timeout=10)
        assert calls[0] == 2              # the lone first request
        assert calls[1:] == [10]          # 5 x 2 rows coalesced into ONE
        assert b.dispatch_count == 2
        for arr, res in zip(arrays, results):
            np.testing.assert_array_equal(res, fake_forward(arr))
    finally:
        b.stop()


def test_max_windows_caps_but_never_splits_items():
    gate = threading.Event()
    first_entered = threading.Event()
    calls = []

    def gated_forward(windows):
        calls.append(windows.shape[0])
        if len(calls) == 1:
            first_entered.set()
            gate.wait(timeout=30)
        return fake_forward(windows)

    b = MicroBatcher(gated_forward, max_windows=5)
    try:
        # 1 blocker + queued items of 3, 3, 9 rows: 3+3 exceeds the cap of 5
        # only after the second item, and the 9-row item must go out whole
        arrays = [np.full((n, 4), i, np.float32)
                  for i, n in enumerate([1, 3, 3, 9])]
        results = [None] * 4
        threads = []

        def run(i):
            results[i] = b.logits(arrays[i])

        t0 = threading.Thread(target=run, args=(0,))
        t0.start()
        assert first_entered.wait(timeout=10)
        for i in range(1, 4):
            t = threading.Thread(target=run, args=(i,))
            t.start()
            threads.append(t)
            time.sleep(0.05)  # preserve queue order
        gate.set()
        t0.join(timeout=10)
        for t in threads:
            t.join(timeout=10)
        assert calls[0] == 1
        # cap 5: [3, 3] coalesce (first item under cap, second crosses it);
        # the 9-row item dispatches alone and un-split
        assert sorted(calls[1:]) == [6, 9]
        for arr, res in zip(arrays, results):
            np.testing.assert_array_equal(res, fake_forward(arr))
    finally:
        b.stop()


def test_batch_failure_isolated_by_individual_retry():
    """A poisoned item in a coalesced batch must error ONLY its own caller;
    neighbors get retried alone and succeed."""
    gate = threading.Event()
    first_entered = threading.Event()
    n_calls = [0]

    def forward(windows):
        n_calls[0] += 1
        if n_calls[0] == 1:
            first_entered.set()
            gate.wait(timeout=30)
        if np.isnan(windows).any():
            raise ValueError("poisoned batch")
        return fake_forward(windows)

    b = MicroBatcher(forward, max_windows=64)
    try:
        good1 = np.ones((2, 4), np.float32)
        bad = np.full((2, 4), np.nan, np.float32)
        good2 = np.full((2, 4), 3.0, np.float32)
        blocker = np.zeros((1, 4), np.float32)
        results = {}
        errors = {}

        def run(name, arr):
            try:
                results[name] = b.logits(arr)
            except BaseException as e:  # noqa: BLE001
                errors[name] = e

        t0 = threading.Thread(target=run, args=("blocker", blocker))
        t0.start()
        assert first_entered.wait(timeout=10)
        threads = []
        for name, arr in [("good1", good1), ("bad", bad), ("good2", good2)]:
            t = threading.Thread(target=run, args=(name, arr))
            t.start()
            threads.append(t)
            time.sleep(0.05)
        gate.set()
        t0.join(timeout=10)
        for t in threads:
            t.join(timeout=10)
        assert isinstance(errors["bad"], ValueError)
        np.testing.assert_array_equal(results["good1"], fake_forward(good1))
        np.testing.assert_array_equal(results["good2"], fake_forward(good2))
        # the batcher survives for later work
        np.testing.assert_array_equal(b.logits(good1), fake_forward(good1))
    finally:
        b.stop()


def test_empty_windows_bypass_queue():
    b = MicroBatcher(fake_forward, max_windows=8)
    try:
        out = b.logits(np.zeros((0, 4), np.float32))
        assert out.shape == (0, 2)
        assert b.dispatch_count == 0
    finally:
        b.stop()


def test_stop_rejects_new_work():
    b = MicroBatcher(fake_forward, max_windows=8)
    b.stop()
    b.stop()  # idempotent
    with pytest.raises(RuntimeError, match="stopped"):
        b.logits(np.ones((1, 4), np.float32))


def test_linger_accumulates_burst():
    """With a generous linger, a trickle of requests arriving within the
    window shares one dispatch even though the device is idle."""
    b = MicroBatcher(fake_forward, max_windows=64, linger_ms=500.0)
    try:
        arrays = [np.full((1, 4), i, np.float32) for i in range(4)]
        results = [None] * 4

        def run(i):
            results[i] = b.logits(arrays[i])

        threads = []
        for i in range(4):
            t = threading.Thread(target=run, args=(i,))
            t.start()
            threads.append(t)
            time.sleep(0.03)  # all inside the 500 ms linger
        for t in threads:
            t.join(timeout=30)
        assert b.dispatch_count == 1
        for arr, res in zip(arrays, results):
            np.testing.assert_array_equal(res, fake_forward(arr))
    finally:
        b.stop()
