"""Detector robustness study: perturbation sweep over a held-out tree.

A deployed synthetic-audio detector sees re-encoded, noisy, re-leveled
audio, not the pristine segments it was trained on. This study measures how
the merged ensemble's operating metrics (binary accuracy, AUC, EER —
infer/study.py) degrade under controlled host-side perturbations of the
held-out clips. No reference counterpart — the reference trains WITH random
augmentations (audio_augmneter.py) but never measures robustness of the
resulting detector.

Perturbations (deterministic per file: RNG seeded from the relative path):

* ``clean``        — baseline, no change
* ``noise_snr20``  — additive white noise at 20 dB SNR (audible hiss)
* ``noise_snr10``  — 10 dB SNR (heavy noise)
* ``gain_-12db``   — 0.25x level (front end standardizes per-spectrogram,
                     so a robust detector should shrug)
* ``lowpass_8k``   — resample round trip 32k -> 16k -> 32k: removes all
                     content above 8 kHz (kills high-band artifacts)
* ``clip_2x``      — 2x gain hard-clipped to [-1, 1] (harmonic distortion)
* ``shift_0.5s``   — circular time shift (translation sensitivity)

Usage:
    python tools/robustness_study.py --merged-model merged.pth \
        --data-dir dataset/test --input-size native --bf16 \
        [--perturbations clean noise_snr20 lowpass_8k]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _with_snr(wf: np.ndarray, rng: np.random.Generator, snr_db: float):
    rms = float(np.sqrt(np.mean(wf**2))) or 1e-6
    noise_rms = rms / (10.0 ** (snr_db / 20.0))
    return wf + noise_rms * rng.standard_normal(wf.shape).astype(np.float32)


def _lowpass_8k(wf: np.ndarray, sr: int = 32_000) -> np.ndarray:
    from synthetic_audio_detection_tpu.audio.dsp import resample_poly_np

    down = resample_poly_np(wf, sr, sr // 2)
    return resample_poly_np(down, sr // 2, sr)[: wf.shape[0]]


PERTURBATIONS = {
    "clean": lambda wf, rng: wf,
    "noise_snr20": lambda wf, rng: _with_snr(wf, rng, 20.0),
    "noise_snr10": lambda wf, rng: _with_snr(wf, rng, 10.0),
    "gain_-12db": lambda wf, rng: 0.25 * wf,
    "lowpass_8k": lambda wf, rng: _lowpass_8k(wf),
    "clip_2x": lambda wf, rng: np.clip(2.0 * wf, -1.0, 1.0),
    "shift_0.5s": lambda wf, rng: np.roll(wf, 16_000),
}


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--merged-model", required=True)
    p.add_argument("--data-dir", required=True)
    from synthetic_audio_detection_tpu.utils.config import parse_input_size

    p.add_argument("--input-size", type=parse_input_size, default=512)
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--batch-size", type=int, default=128)
    p.add_argument("--backbone", default="resnet18")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--perturbations", nargs="+",
                   default=list(PERTURBATIONS),
                   choices=list(PERTURBATIONS))
    args = p.parse_args(argv)

    from synthetic_audio_detection_tpu.utils.compile_cache import (
        enable_persistent_cache,
    )

    enable_persistent_cache()

    import jax.numpy as jnp

    from synthetic_audio_detection_tpu.checkpoints import serialization
    from synthetic_audio_detection_tpu.infer.pipeline import InferencePipeline
    from synthetic_audio_detection_tpu.infer.study import evaluate_tree
    from synthetic_audio_detection_tpu.utils.config import (
        AudioConfig,
        InferenceConfig,
        SpectrogramConfig,
    )

    ensemble = serialization.load_merged(args.merged_model,
                                         backbone=args.backbone)
    if args.bf16:
        from synthetic_audio_detection_tpu.ensemble.multihead import with_dtype

        ensemble = with_dtype(ensemble, jnp.bfloat16)
    pipe = InferencePipeline(
        ensemble,
        audio=AudioConfig(),
        spec=SpectrogramConfig.inference(out_size=args.input_size),
        infer=InferenceConfig(batch_size=args.batch_size),
        compute_dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
    )
    out = {
        "input_size": args.input_size or "native",
        "dtype": "bf16" if args.bf16 else "f32",
        "perturbations": {},
    }
    for name in args.perturbations:
        res = evaluate_tree(pipe, args.data_dir,
                            perturb=PERTURBATIONS[name], seed=args.seed)
        out["perturbations"][name] = {
            k: res[k] for k in ("n_segments", "binary_accuracy",
                                "attribution_accuracy", "binary_auc",
                                "binary_eer") if k in res
        }
        print(json.dumps({name: out["perturbations"][name]}),
              file=sys.stderr, flush=True)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
