"""Sustained corpus serving: BASELINE.json config 5 shape, scaled to minutes.

Generates a corpus of pre-segmented 4 s / 32 kHz / mono / 16-bit WAV files
(the dataset_manager output contract), then runs the batch serving path for
at least --seconds wall-clock: a producer thread pool decodes files (native
C++ decoder when libsadio.so is built, RIFF-parser fallback otherwise) and
fills fixed-shape int16 batches; the consumer drives the compiled
windows→verdict program and fetches every batch's verdicts back to the host
(the only honest sync on tunneled runtimes). Reports sustained END-TO-END
segments/sec — decode + transport + device — plus where the time went
(producer-starved vs device-bound).

    python benchmarks/sustained_serving.py --files 3000 --seconds 330
"""

from __future__ import annotations

import argparse
import json
import os
import queue
import sys
import tempfile
import threading
import time

import numpy as np

sys.path.insert(0, ".")

SR = 32_000
SEG = 4 * SR


def make_corpus(root: str, n_files: int) -> list:
    from synthetic_audio_detection_tpu.audio import wavio

    rng = np.random.default_rng(0)
    paths = []
    # content variety: tone+noise mixtures at varied frequencies/levels
    t = np.arange(SEG) / SR
    for i in range(n_files):
        f0 = 80.0 + (i % 97) * 23.0
        x = 0.25 * np.sin(2 * np.pi * f0 * t) + 0.04 * rng.standard_normal(SEG)
        p = os.path.join(root, f"{i:016x}_Segment_000.wav")
        wavio.write_wav(p, x.astype(np.float32), SR, subtype="PCM_16")
        paths.append(p)
    return paths


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--files", type=int, default=3000)
    p.add_argument("--seconds", type=float, default=330.0)
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--decode-workers", type=int, default=8)
    from synthetic_audio_detection_tpu.utils.config import parse_input_size
    p.add_argument("--input-size", type=parse_input_size, default=512)
    p.add_argument("--no-s2d", action="store_true")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from __graft_entry__ import _flagship_ensemble  # enables the compile cache
    from synthetic_audio_detection_tpu.audio import native
    from synthetic_audio_detection_tpu.ensemble.multihead import decide
    from synthetic_audio_detection_tpu.infer.pipeline import InferencePipeline
    from synthetic_audio_detection_tpu.utils.config import (
        InferenceConfig,
        SpectrogramConfig,
    )

    tmp = tempfile.mkdtemp(prefix="sustained_corpus_")
    t0 = time.time()
    paths = make_corpus(tmp, args.files)
    print(f"corpus: {len(paths)} segment files in {time.time() - t0:.1f}s "
          f"({os.path.getsize(paths[0]) * len(paths) / 1e6:.0f} MB)",
          file=sys.stderr, flush=True)

    ens = _flagship_ensemble(n_heads=6, shared_backbone=True, dtype=jnp.bfloat16)
    pipe = InferencePipeline(
        ens,
        spec=SpectrogramConfig(mel_norm="slaney", out_size=args.input_size),
        infer=InferenceConfig(batch_size=args.batch),
        compute_dtype=jnp.bfloat16,
        transport_dtype="int16",
        use_s2d_layer1=False if args.no_s2d else None,
    )

    # -- producer: decode → fixed [batch, SEG] int16 blocks ------------------
    q: "queue.Queue" = queue.Queue(maxsize=4)
    stop = threading.Event()

    use_native = native.available()
    print(f"decoder: {'native libsadio (threaded C++)' if use_native else 'RIFF fallback'}",
          file=sys.stderr, flush=True)

    def producer():
        idx = 0
        while not stop.is_set():
            chunk = [paths[(idx + j) % len(paths)] for j in range(args.batch)]
            idx += args.batch
            block, lengths, rates = native.decode_batch(
                chunk, SEG, threads=args.decode_workers
            )
            assert (lengths > 0).all(), "decode error in corpus"
            q.put(np.clip(block * 32767.0, -32768, 32767).astype(np.int16))
        q.put(None)

    t = threading.Thread(target=producer, daemon=True)
    t.start()

    # warm up: compile + absorb the first-transfer latency (int16 blocks go
    # straight to the device — the pipeline accepts pre-quantized transport)
    warm = q.get()
    r = pipe.analyze_windows(warm, [(0.0, 4.0)] * args.batch)
    assert len(r["segments"]) == args.batch
    print("warmup done (compile + first transfer)", file=sys.stderr, flush=True)

    # -- sustained loop -------------------------------------------------------
    done_segments = 0
    wait_producer = 0.0
    t_start = time.time()
    while time.time() - t_start < args.seconds:
        tw = time.time()
        block = q.get()
        wait_producer += time.time() - tw
        res = pipe.analyze_windows(block, [(0.0, 4.0)] * args.batch)
        assert len(res["segments"]) == args.batch
        done_segments += args.batch
    elapsed = time.time() - t_start
    stop.set()
    try:
        while q.get_nowait() is not None:
            pass
    except queue.Empty:
        pass

    print(json.dumps({
        "metric": "sustained_e2e_segments_per_sec",
        "files": len(paths),
        "seconds": round(elapsed, 1),
        "segments": done_segments,
        "segments_per_sec": round(done_segments / elapsed, 1),
        "producer_wait_fraction": round(wait_producer / elapsed, 4),
        "input_size": args.input_size,
        "batch": args.batch,
        "transport": "int16",
    }))


if __name__ == "__main__":
    main()
