"""Compat CLI: multi-head inference on one audio file.

Flag surface mirrors the reference inference_runner.py:219-229 exactly
(--merged-model, --audio, --threshold, --device, --confidence-threshold,
--smooth, --output-json); --device is accepted and ignored (device selection
is JAX's job). Output JSON schema matches inference_runner.py:336-353.

Usage:
    python -m synthetic_audio_detection_tpu.cli.inference_runner \
        --merged-model merged.pth --audio clip.wav --output-json out.json
"""

from __future__ import annotations

import argparse
import logging
import os
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="Multi-head inference with overlapping windows using "
        "metadata from the merged model."
    )
    p.add_argument("--merged-model", type=str, required=True,
                   help="Path to merged .pth (or native .msgpack) checkpoint")
    p.add_argument("--audio", type=str, help="Path to WAV file")
    p.add_argument("--audio-dir", type=str,
                   help="Folder mode (the legacy analyzer's --IsBatch "
                   "precedent, inference_script.py:428-451): analyze every "
                   "audio file in the directory through ONE warm compiled "
                   "pipeline; writes <stem>.json per file into --output-json "
                   "(treated as a directory). Mutually exclusive with "
                   "--audio.")
    p.add_argument("--threshold", type=float, default=0.5,
                   help="Threshold for deciding Real vs Synthetic")
    p.add_argument("--device", type=str, default="tpu",
                   help="Accepted for reference compatibility; ignored "
                   "(JAX owns device placement)")
    p.add_argument("--confidence-threshold", type=float, default=0.45,
                   help="Confidence threshold for segments.")
    p.add_argument("--smooth", action="store_true",
                   help="Apply smoothing across windows.")
    p.add_argument("--output-json", type=str, default="results.json")
    # extensions beyond the reference surface
    p.add_argument("--backbone", type=str, default="resnet18")
    p.add_argument("--overlap", type=float, default=0.0,
                   help="Window overlap fraction (reference main uses 0.0)")
    p.add_argument("--batch-size", type=int, default=128)
    p.add_argument("--bf16", action="store_true",
                   help="bfloat16 compute (TPU fast path)")
    p.add_argument("--input-size", type=int, default=512,
                   help="Spectrogram image size. 512 = reference fidelity; "
                   "256 = the documented fast mode (~3x the throughput on "
                   "TPU at reduced fidelity — docs/PERFORMANCE.md)")
    p.add_argument("--per-head-diagnostics", action="store_true",
                   help="Log each window's per-head [real, synthetic] "
                   "sigmoids (the pre-aggregation outputs the [B, N+1] "
                   "collapse hides) — debugging aid for one-vs-rest "
                   "attribution confusions. Output JSON is unchanged.")
    return p


def main(argv=None) -> int:
    parser = build_parser()
    args = parser.parse_args(argv)
    if bool(args.audio) == bool(args.audio_dir):
        parser.error("exactly one of --audio / --audio-dir is required")
    logging.basicConfig(level=logging.INFO, format="%(levelname)s %(message)s")

    import jax.numpy as jnp

    from synthetic_audio_detection_tpu.checkpoints import serialization
    from synthetic_audio_detection_tpu.infer.pipeline import (
        InferencePipeline,
        result_json,
    )
    from synthetic_audio_detection_tpu.utils.config import (
        AudioConfig,
        InferenceConfig,
        SpectrogramConfig,
    )

    ensemble = serialization.load_merged(args.merged_model, backbone=args.backbone)
    if args.bf16:
        from synthetic_audio_detection_tpu.ensemble.multihead import with_dtype

        ensemble = with_dtype(ensemble, jnp.bfloat16)
    print("Using metadata names:")
    print("Synthetic names:", ensemble.synthetic_names)
    print("Real name:", ensemble.real_name)

    pipeline = InferencePipeline(
        ensemble,
        audio=AudioConfig(overlap=args.overlap, silence_threshold=1e-3),
        spec=SpectrogramConfig.inference(out_size=args.input_size),
        infer=InferenceConfig(
            threshold=args.threshold,
            confidence_threshold=args.confidence_threshold,
            smooth=args.smooth,
            batch_size=args.batch_size,
        ),
        compute_dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
    )
    def run_one(audio_path: str) -> str:
        result = pipeline.analyze_file(audio_path, smooth=args.smooth)
        if args.per_head_diagnostics:
            from synthetic_audio_detection_tpu.infer.pipeline import (
                preprocess_waveform,
                slice_waveform,
            )

            wf = preprocess_waveform(audio_path, pipeline.audio)
            windows, stamps = slice_waveform(wf, pipeline.audio)
            probs = pipeline.per_head_sigmoids(windows)  # [num, N, 2]
            names = ensemble.synthetic_names
            for (s, e), row in zip(stamps, probs):
                cells = ", ".join(
                    f"{n}: real={row[i][0]:.3f} syn={row[i][1]:.3f}"
                    for i, n in enumerate(names)
                )
                logging.info("per-head %6.2f-%6.2fs  %s", s, e, cells)
        return result_json(os.path.basename(audio_path), result)

    if args.audio_dir:
        # folder mode: one warm pipeline across all files (the per-file CLI
        # alternative pays model load + compile per process)
        exts = (".wav", ".mp3", ".flac", ".ogg", ".aac", ".wma", ".opus")
        files = sorted(
            f for f in os.listdir(args.audio_dir)
            if f.lower().endswith(exts)
        )
        if not files:
            logging.warning("no audio files in %s", args.audio_dir)
        os.makedirs(args.output_json, exist_ok=True)
        failed = 0
        for name in files:
            try:
                payload = run_one(os.path.join(args.audio_dir, name))
            except Exception as e:  # noqa: BLE001 - per-file isolation,
                # reported not swallowed (unlike the reference's silent skips)
                logging.error("FAILED %s: %r", name, e)
                failed += 1
                continue
            out = os.path.join(
                args.output_json, os.path.splitext(name)[0] + ".json")
            with open(out, "w") as f:
                f.write(payload)
            logging.info("wrote %s", out)
        print(f"Analyzed {len(files) - failed}/{len(files)} files -> "
              f"{args.output_json}")
        return 1 if failed else 0

    payload = run_one(args.audio)
    with open(args.output_json, "w") as f:
        f.write(payload)
    print(payload)
    return 0


if __name__ == "__main__":
    sys.exit(main())
