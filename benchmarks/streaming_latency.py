"""Live-streaming verdict latency: chunk arrives → verdict returned.

Measures the end-to-end wall time of StreamingAnalyzer.feed() in the
steady state: each 4 s chunk completes exactly one analysis window
(overlap 0), so a feed's cost = host windowing + one bucket-8 device
forward + the verdict fetch. Unlike the dispatch-loop benchmarks this IS
honestly wall-clockable — every feed round-trips to the host through the
returned verdict, so there is no async dispatch to mis-time. On the
tunneled rig the figure is dominated by the tunnel's upload (a 4 s
float32 window = 512 KB at ~28 MB/s ≈ 18 ms) + RTT; on a PCIe host the
device forward (~0.5 ms bucket-8, throughput.py latency-native) bounds it.

Also reports the non-completing-feed cost (0.5 s chunks that finish no
window — pure host buffering) and the source-rate path (44.1 kHz input
through the incremental resampler).

    python benchmarks/streaming_latency.py [--feeds 40] [--input-size native]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

SR = 32_000


def measure(pipe, feeds: int, seconds_per_chunk: float, source_rate=None):
    from synthetic_audio_detection_tpu.infer.streaming import StreamingAnalyzer

    rng = np.random.default_rng(0)
    rate = source_rate or SR
    n = int(seconds_per_chunk * rate)
    sa = StreamingAnalyzer(pipe, source_rate=source_rate)
    # warmup: compile the bucket + first host transfer
    for _ in range(3):
        sa.feed((rng.standard_normal(n) * 0.3).astype(np.float32))
    times, verdicts = [], 0
    for _ in range(feeds):
        chunk = (rng.standard_normal(n) * 0.3).astype(np.float32)
        t0 = time.perf_counter()
        out = sa.feed(chunk)
        times.append(time.perf_counter() - t0)
        verdicts += len(out)
    sa.finalize()
    times.sort()
    return {
        "median_ms": round(times[len(times) // 2] * 1e3, 2),
        "p90_ms": round(times[int(len(times) * 0.9)] * 1e3, 2),
        "verdicts": verdicts,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--feeds", type=int, default=40)
    ap.add_argument("--input-size", default="native")
    ap.add_argument("--no-bf16", action="store_true")
    args = ap.parse_args()

    from synthetic_audio_detection_tpu.utils.compile_cache import (
        enable_persistent_cache,
    )

    enable_persistent_cache()
    from serving_concurrency import make_pipeline
    from synthetic_audio_detection_tpu.utils.config import parse_input_size

    pipe = make_pipeline(parse_input_size(args.input_size), not args.no_bf16)

    out = {"benchmark": "streaming_latency", "input_size": args.input_size}
    # steady state: one window per 4 s chunk
    out["per_window"] = measure(pipe, args.feeds, 4.0)
    # host-only feeds (no window completes): buffering + (no) dispatch
    out["non_completing"] = measure(pipe, args.feeds, 0.5)
    # through the incremental resampler (44.1 kHz capture source)
    out["per_window_44k1"] = measure(pipe, args.feeds, 4.0, source_rate=44_100)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
