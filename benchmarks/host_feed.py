"""Host decode-feed throughput: can the host PRODUCE segments fast enough?

The north-star metric is end-to-end "decode→mel→ensemble" (BASELINE.json:1)
— the reference pays its decode stage via ffmpeg/torchaudio
(audio_convert.py:26-34, inference_runner.py:144-155). This repo's device
figure (native 40.5k seg/s, BENCH_r04.json) measures pre-staged windows →
logits; the missing half is a MEASURED host feed rate: batch decode through
native/sadio.cpp (threaded C++ RIFF decoder) → window slice → int16
quantize, exactly the producer stage of benchmarks/sustained_serving.py and
infer/server.py. No JAX, no device, no tunnel — this benchmark isolates the
host half so "decode→mel→ensemble ≥ 25k" can rest on two measured numbers
instead of transport-bandwidth arithmetic.

Two corpus shapes:
  --file-secs 4  (default): pre-segmented 4 s files — the dataset_manager
      output contract and BASELINE.json config-5 shape (one window per
      file; slice is a bounds check).
  --file-secs 60: long recordings decoded whole then sliced into 4 s
      windows host-side (the inference_runner.py:176-190 path) — the
      per-file Python slicing cost shows up here.

The corpus is written once and read repeatedly (page-cache resident): the
number isolates DECODE+SLICE+QUANTIZE compute, not cold-disk I/O — the same
regime the reference's benchmarks run in after the first epoch. Output: one
JSON line with segments/sec and segments/sec/core (this rig's nproc is
printed so figures transfer: the C++ decoder scales with decode threads).

    python benchmarks/host_feed.py --json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SR = 32_000
WIN = 4 * SR


def make_corpus(root: str, n_files: int, file_secs: float) -> list:
    """Pre-segmented PCM_16 mono 32 kHz WAVs (the ETL output contract)."""
    from synthetic_audio_detection_tpu.audio import wavio

    rng = np.random.default_rng(0)
    frames = int(file_secs * SR)
    t = np.arange(frames) / SR
    paths = []
    for i in range(n_files):
        f0 = 80.0 + (i % 97) * 23.0
        x = 0.25 * np.sin(2 * np.pi * f0 * t) + 0.04 * rng.standard_normal(frames)
        p = os.path.join(root, f"{i:016x}_Segment_000.wav")
        wavio.write_wav(p, x.astype(np.float32), SR, subtype="PCM_16")
        paths.append(p)
    return paths


def feed_batches(paths, batch, max_frames, threads, audio_cfg):
    """One full pass: decode → slice → int16-quantize every file once.

    Returns (n_segments, n_bytes_decoded). Mirrors the serving producer:
    native.decode_batch (threaded C++) fills [B, max_frames] float32, then
    windows are sliced and quantized to the int16 transport dtype
    (sustained_serving.py producer; infer/server.py micro-batcher)."""
    from synthetic_audio_detection_tpu.audio import native
    from synthetic_audio_detection_tpu.infer.pipeline import slice_waveform

    segs = 0
    nbytes = 0
    one_window = max_frames == WIN
    for i in range(0, len(paths), batch):
        chunk = paths[i : i + batch]
        block, lengths, rates = native.decode_batch(
            chunk, max_frames, threads=threads
        )
        if (lengths <= 0).any():
            raise RuntimeError("decode error in corpus")
        nbytes += int(lengths.sum()) * 2  # PCM16 source bytes
        if one_window:
            # pre-segmented corpus: each file IS one window — bounds check
            # only, same as the serving bucket fill
            q = np.clip(block * 32767.0, -32768, 32767).astype(np.int16)
            segs += q.shape[0]
        else:
            # long-recording path: per-file host-side slicing (the
            # inference_runner.py:176-190 window walk, incl. silence gate)
            for row, ln in zip(block, lengths):
                windows, _ = slice_waveform(row[:ln], audio_cfg)
                if windows.shape[0]:
                    q = np.clip(windows * 32767.0, -32768, 32767).astype(
                        np.int16
                    )
                    segs += q.shape[0]
    return segs, nbytes


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--files", type=int, default=256)
    p.add_argument("--file-secs", type=float, default=4.0)
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--threads", type=int, default=0,
                   help="decode threads (0 = library default: hw threads)")
    p.add_argument("--min-seconds", type=float, default=15.0,
                   help="keep passing over the corpus until this much "
                        "measured wall time has accumulated")
    p.add_argument("--max-passes", type=int, default=64)
    p.add_argument("--json", action="store_true",
                   help="print exactly one JSON line (machine consumers)")
    args = p.parse_args()

    from synthetic_audio_detection_tpu.audio import native
    from synthetic_audio_detection_tpu.utils.config import AudioConfig

    audio_cfg = AudioConfig()
    max_frames = int(args.file_secs * SR)

    tmp = tempfile.mkdtemp(prefix="host_feed_")
    t0 = time.time()
    paths = make_corpus(tmp, args.files, args.file_secs)
    corpus_mb = sum(os.path.getsize(q) for q in paths) / 1e6
    if not args.json:
        print(f"corpus: {len(paths)} files x {args.file_secs:.0f}s "
              f"({corpus_mb:.0f} MB) in {time.time() - t0:.1f}s",
              file=sys.stderr, flush=True)

    # warm pass: page cache + thread pool spin-up (excluded from timing)
    feed_batches(paths, args.batch, max_frames, args.threads, audio_cfg)

    wall = 0.0
    segs = 0
    nbytes = 0
    passes = 0
    while wall < args.min_seconds and passes < args.max_passes:
        t0 = time.perf_counter()
        s, b = feed_batches(paths, args.batch, max_frames, args.threads,
                            audio_cfg)
        wall += time.perf_counter() - t0
        segs += s
        nbytes += b
        passes += 1

    ncores = os.cpu_count() or 1
    seg_per_sec = segs / wall
    out = {
        "host_feed_segments_per_sec": round(seg_per_sec, 1),
        "host_feed_segments_per_sec_per_core": round(seg_per_sec / ncores, 1),
        "decode_MBps": round(nbytes / wall / 1e6, 1),
        "cores": ncores,
        "decoder": "native" if native.available() else "python-fallback",
        "file_secs": args.file_secs,
        "passes": passes,
        "segments": segs,
        "wall_secs": round(wall, 2),
    }
    print(json.dumps(out), flush=True)

    for q in paths:
        os.unlink(q)
    os.rmdir(tmp)


if __name__ == "__main__":
    main()
