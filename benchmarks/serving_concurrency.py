"""Concurrent short-clip serving: micro-batching ON vs OFF.

Simulates the daemon's bursty-traffic regime: N client threads, each
holding a stream of 1-window clips, call the verdict forward through
either the MicroBatcher (infer/batching.py — windows coalesce into shared
device batches while the previous batch executes) or a plain lock (one
bucket-8 dispatch per clip, the pre-batching daemon behavior). Reports
end-to-end clips/sec per variant.

On the tunneled rig each dispatch pays a round trip, so coalescing shows
up directly in dispatch counts; on a PCIe host the win is MXU occupancy
(a full 128-window program vs many 8-window ones — throughput.py's
fastpath vs latency gap).

    python benchmarks/serving_concurrency.py --clients 16 --clips 32
"""

from __future__ import annotations

import argparse
import json
import sys
import threading
import time

import numpy as np

sys.path.insert(0, ".")

SR = 32_000
SEG = 4 * SR


def make_pipeline(input_size, bf16: bool):
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_ensemble
    from synthetic_audio_detection_tpu.infer.pipeline import InferencePipeline
    from synthetic_audio_detection_tpu.utils.config import (
        AudioConfig,
        InferenceConfig,
        SpectrogramConfig,
    )

    ens = _flagship_ensemble(
        n_heads=6, shared_backbone=True,
        dtype=jnp.bfloat16 if bf16 else jnp.float32)
    import jax
    on_tpu = jax.default_backend() in ("tpu", "axon")
    return InferencePipeline(
        ens,
        audio=AudioConfig(),
        spec=SpectrogramConfig.inference(out_size=input_size),
        infer=InferenceConfig(batch_size=128),
        compute_dtype=jnp.bfloat16 if bf16 else jnp.float32,
        use_gemm_dft=True,
        use_pallas=on_tpu,
        use_fast_backbone=on_tpu,
    )


def run_variant(pipeline, clips_per_client: int, clients: int,
                micro: bool, linger_ms: float) -> dict:
    from synthetic_audio_detection_tpu.infer.batching import MicroBatcher

    rng = np.random.default_rng(0)
    # one-window clips: the per-request regime where coalescing matters most
    windows = [rng.standard_normal((1, SEG)).astype(np.float32) * 0.2
               for _ in range(clients)]
    lock = threading.Lock()

    def locked_forward(w):
        with lock:
            return pipeline.logits_for_windows(w)

    batcher = MicroBatcher(locked_forward, max_windows=128,
                           linger_ms=linger_ms) if micro else None
    fwd = batcher.logits if batcher else locked_forward

    # warm both bucket programs before timing
    locked_forward(np.zeros((1, SEG), np.float32))
    locked_forward(np.zeros((128, SEG), np.float32))

    done = threading.Barrier(clients + 1)
    results = [0] * clients

    def client(i):
        done.wait()
        for _ in range(clips_per_client):
            out = fwd(windows[i])
            results[i] += out.shape[0]
        done.wait()

    threads = [threading.Thread(target=client, args=(i,))
               for i in range(clients)]
    for t in threads:
        t.start()
    done.wait()
    t0 = time.perf_counter()
    done.wait()
    elapsed = time.perf_counter() - t0
    for t in threads:
        t.join()
    total = sum(results)
    out = {
        "variant": "micro" if micro else "per-request",
        "clips": total,
        "seconds": round(elapsed, 3),
        "clips_per_sec": round(total / elapsed, 1),
    }
    if batcher:
        out["device_dispatches"] = batcher.dispatch_count
        batcher.stop()
    else:
        out["device_dispatches"] = total  # one per clip by construction
    return out


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--clients", type=int, default=16)
    p.add_argument("--clips", type=int, default=32,
                   help="clips per client")
    p.add_argument("--linger-ms", type=float, default=0.0)
    p.add_argument("--variants", nargs="+", default=["micro", "per-request"],
                   choices=["micro", "per-request"])
    p.add_argument("--f32", action="store_true")
    from synthetic_audio_detection_tpu.utils.config import parse_input_size

    p.add_argument("--input-size", type=parse_input_size, default=0)
    args = p.parse_args()

    from synthetic_audio_detection_tpu.utils.compile_cache import (
        enable_persistent_cache,
    )

    enable_persistent_cache()
    pipeline = make_pipeline(args.input_size, bf16=not args.f32)
    for variant in args.variants:
        res = run_variant(pipeline, args.clips, args.clients,
                          micro=variant == "micro",
                          linger_ms=args.linger_ms)
        print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
