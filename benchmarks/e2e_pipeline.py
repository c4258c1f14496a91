"""End-to-end pipeline benchmark over an hour-long recording
(BASELINE.json config 4: converter → segmenter → ensemble, multi-format
recordings). Measures the full serving path including host decode:

    synthesize N-minute 44.1 kHz stereo WAV → native decode + downmix →
    polyphase resample to 32 kHz → 4 s windowing + silence gate →
    fused mel + 6-head ensemble (bf16, device) → verdicts + JSON

Reports wall-clock split by stage and overall 4 s-segments/sec.

    python benchmarks/e2e_pipeline.py --minutes 60 --mesh
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, ".")


def synthesize(path: str, minutes: float, sr: int = 44_100) -> None:
    from synthetic_audio_detection_tpu.audio import wavio

    rng = np.random.default_rng(0)
    n = int(minutes * 60 * sr)
    # speech-band-ish chirpy content + noise, chunked to bound memory
    with_chunks = []
    t0 = 0
    chunk = sr * 60
    out = np.empty(n, np.float32)
    for s in range(0, n, chunk):
        e = min(s + chunk, n)
        t = np.arange(s, e) / sr
        x = 0.3 * np.sin(2 * np.pi * (200 + 50 * np.sin(t / 7)) * t)
        x += 0.05 * rng.standard_normal(e - s)
        out[s:e] = x
    wavio.write_wav(path, np.stack([out, out]), sr)


def main() -> None:
    import jax
    import jax.numpy as jnp

    p = argparse.ArgumentParser()
    p.add_argument("--minutes", type=float, default=60.0)
    from synthetic_audio_detection_tpu.utils.config import parse_input_size
    p.add_argument("--input-size", type=parse_input_size, default=512)
    p.add_argument("--heads", type=int, default=6)
    p.add_argument("--mono", action="store_true")
    p.add_argument("--mesh", action="store_true",
                   help="shard windows over all local devices")
    p.add_argument("--device-resample", action="store_true",
                   help="resample 44.1k->32k on device via the jitted "
                   "bucketed polyphase (ops.resample.resample_bucketed) "
                   "instead of the host BLAS twin — A/B for VERDICT r2 #7")
    args = p.parse_args()

    from __graft_entry__ import _flagship_ensemble
    from synthetic_audio_detection_tpu.audio import native
    from synthetic_audio_detection_tpu.audio.dsp import resample_poly_np
    from synthetic_audio_detection_tpu.ensemble.multihead import fold_to_mono
    from synthetic_audio_detection_tpu.infer.pipeline import (
        InferencePipeline,
        slice_waveform,
    )
    from synthetic_audio_detection_tpu.parallel import sharding as sh
    from synthetic_audio_detection_tpu.utils.config import (
        AudioConfig,
        InferenceConfig,
        SpectrogramConfig,
    )
    from synthetic_audio_detection_tpu.utils.profiling import StageTimer

    timer = StageTimer()
    with tempfile.TemporaryDirectory() as tmp:
        wav = os.path.join(tmp, "hour.wav")
        with timer.stage("synthesize"):
            synthesize(wav, args.minutes)

        with timer.stage("decode+downmix (native)"):
            mono, sr = native.read_mono(wav)

        if args.device_resample:
            from synthetic_audio_detection_tpu.ops.resample import (
                resample_bucketed,
            )

            # warmup compile outside the timed stage (shape-bucketed: one
            # compile per bucket count)
            with timer.stage("device-resample compile"):
                resample_bucketed(mono[: 44_100 * 60], sr, 32_000)
            with timer.stage("resample 44.1k->32k (device)"):
                mono = resample_bucketed(mono, sr, 32_000)
        else:
            with timer.stage("resample 44.1k->32k"):
                mono = resample_poly_np(mono, sr, 32_000)

        audio_cfg = AudioConfig()
        with timer.stage("window+gate"):
            windows, stamps = slice_waveform(mono, audio_cfg)

        ens = _flagship_ensemble(n_heads=args.heads, shared_backbone=True)
        if args.mono:
            ens = fold_to_mono(ens)
        mesh = sh.create_mesh() if args.mesh and jax.device_count() > 1 else None
        pipe = InferencePipeline(
            ens,
            audio=audio_cfg,
            spec=SpectrogramConfig(mel_norm="slaney", out_size=args.input_size),
            infer=InferenceConfig(batch_size=128),
            compute_dtype=jnp.bfloat16,
            mesh=mesh,
        )
        # warmup compile on one bucket (excluded from the timed run)
        with timer.stage("compile+warmup"):
            pipe.logits_for_windows(windows[:128] if len(windows) >= 128 else windows)

        t0 = time.perf_counter()
        with timer.stage("ensemble inference"):
            result = pipe.analyze_windows(windows, stamps)
        infer_s = time.perf_counter() - t0

    n_windows = len(stamps)
    print(timer.report())
    print(json.dumps({
        "minutes": args.minutes,
        "windows": n_windows,
        "devices": jax.device_count(),
        "inference_segments_per_sec": round(n_windows / infer_s, 1),
        "realtime_factor": round(args.minutes * 60 / infer_s, 1),
        "verdict_counts": {
            k: sum(1 for s in result["segments"] if s["label"] == k)
            for k in set(s["label"] for s in result["segments"])
        },
    }))


if __name__ == "__main__":
    main()
