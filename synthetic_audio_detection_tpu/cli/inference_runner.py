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
    from synthetic_audio_detection_tpu.utils.config import parse_input_size

    p.add_argument("--input-size", type=parse_input_size, default=512,
                   help="Spectrogram image size. 512 = reference fidelity; "
                   "256 = the documented fast mode; 'native' = the mel's "
                   "true 128-by-frames resolution, no resize (serve models "
                   "TRAINED at the matching size — docs/PERFORMANCE.md)")
    p.add_argument("--per-head-diagnostics", action="store_true",
                   help="Log each window's per-head [real, synthetic] "
                   "sigmoids (the pre-aggregation outputs the [B, N+1] "
                   "collapse hides) — debugging aid for one-vs-rest "
                   "attribution confusions. Output JSON is unchanged.")
    p.add_argument("--round-floats", action="store_true",
                   help="Round JSON floats (3 dp timestamps, 2 dp "
                   "percentages). Default off: the reference emits "
                   "unrounded floats (inference_runner.py:293-349) and the "
                   "default output is byte-faithful to it.")
    p.add_argument("--no-calibration", action="store_true",
                   help="Ignore checkpoint-carried temperature calibration "
                   "(tools/calibrate_ensemble.py) and report raw sigmoids. "
                   "Uncalibrated checkpoints are unaffected either way.")
    p.add_argument("--syn-override-k", type=int, default=1,
                   help="Synthetic columns that must clear their threshold "
                   "to override a Real verdict. Default 1 = the reference's "
                   "unanimity rule (any single strong head ⇒ not Real, "
                   "inference_runner.py:205-213); higher K restores Real "
                   "TNR at many heads (docs/PERFORMANCE.md LOGO study).")
    p.add_argument("--per-column-thresholds", action="store_true",
                   help="Use the checkpoint calibration's per-column EER "
                   "operating points instead of the single --threshold "
                   "(needs tools/calibrate_ensemble.py "
                   "--store-column-thresholds).")
    p.add_argument("--generic-verdict", action="store_true",
                   help="Decide Real/Synthetic from the generic "
                   "Real-vs-any-synthetic head (checkpoints trained with "
                   "ensemble_trainer --generic-head); attribution stays "
                   "per-specialist and the JSON schema is unchanged.")
    return p


def main(argv=None) -> int:
    parser = build_parser()
    args = parser.parse_args(argv)
    if bool(args.audio) == bool(args.audio_dir):
        parser.error("exactly one of --audio / --audio-dir is required")
    logging.basicConfig(level=logging.INFO, format="%(levelname)s %(message)s")
    from synthetic_audio_detection_tpu.utils.compile_cache import (
        enable_persistent_cache,
    )

    enable_persistent_cache()

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
            round_floats=args.round_floats,
            apply_calibration=not args.no_calibration,
            syn_override_k=args.syn_override_k,
            per_column_thresholds=args.per_column_thresholds,
            generic_verdict=args.generic_verdict,
        ),
        compute_dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
    )

    from synthetic_audio_detection_tpu.infer.pipeline import (
        preprocess_waveform,
        slice_waveform,
    )

    def run_one(audio_path: str, display_name: str = ""):
        """→ (payload_json_text, had_windows). Preprocess/slice ONCE and feed
        both the verdict pass and the optional per-head diagnostics from the
        same windows. ``display_name`` overrides the JSON "filename" field
        (folder mode writes the basename — stable regardless of how
        --audio-dir was spelled; single-file mode writes the path verbatim)."""
        wf = preprocess_waveform(audio_path, pipeline.audio)
        windows, stamps = slice_waveform(wf, pipeline.audio)
        if args.per_head_diagnostics and windows.shape[0]:
            # one device program: serving logits + pre-aggregation view on
            # the SAME numerics (pipeline.logits_and_per_head)
            import numpy as np

            logits, nh = pipeline.logits_and_per_head(windows)
            result = pipeline.analyze_windows(
                windows, stamps, smooth=args.smooth, logits=logits)
            probs = 1.0 / (1.0 + np.exp(-nh))  # [num, N, 2]
            names = ensemble.synthetic_names
            for (s, e), row in zip(stamps, probs):
                cells = ", ".join(
                    f"{n}: real={row[i][0]:.3f} syn={row[i][1]:.3f}"
                    for i, n in enumerate(names)
                )
                logging.info("per-head %6.2f-%6.2fs  %s", s, e, cells)
        else:
            result = pipeline.analyze_windows(
                windows, stamps, smooth=args.smooth)
        # filename is the path AS PASSED (reference writes args.audio
        # verbatim, inference_runner.py:346)
        return (result_json(display_name or audio_path, result),
                bool(windows.shape[0]))

    if args.audio_dir:
        # folder mode: one warm pipeline across all files (the per-file CLI
        # alternative pays model load + compile per process)
        if os.path.exists(args.output_json) and not os.path.isdir(args.output_json):
            parser.error(
                f"--output-json {args.output_json!r} exists and is a file; "
                "folder mode writes per-file JSONs into it as a directory")
        exts = (".wav", ".mp3", ".flac", ".ogg", ".aac", ".wma", ".opus")
        files = sorted(
            f for f in os.listdir(args.audio_dir)
            if f.lower().endswith(exts)
        )
        if not files:
            logging.warning("no audio files in %s", args.audio_dir)
        os.makedirs(args.output_json, exist_ok=True)
        # same-stem inputs (a.wav + a.mp3) must not overwrite each other's
        # JSON: colliding stems keep their original extension in the name
        stems: dict = {}
        for name in files:
            stems.setdefault(os.path.splitext(name)[0], []).append(name)

        def out_name(name: str) -> str:
            stem, ext = os.path.splitext(name)
            if len(stems[stem]) > 1:
                return f"{stem}{ext}.json"
            return stem + ".json"

        failed = 0
        for name in files:
            try:
                payload, _ = run_one(os.path.join(args.audio_dir, name),
                                     display_name=name)
            except Exception as e:  # noqa: BLE001 - per-file isolation,
                # reported not swallowed (unlike the reference's silent skips)
                logging.error("FAILED %s: %r", name, e)
                failed += 1
                continue
            out = os.path.join(args.output_json, out_name(name))
            with open(out, "w", encoding="utf-8") as f:
                f.write(payload)
            logging.info("wrote %s", out)
        print(f"Analyzed {len(files) - failed}/{len(files)} files -> "
              f"{args.output_json}")
        return 1 if failed else 0

    payload, had_windows = run_one(args.audio)
    if not had_windows:
        # reference empty-clip behavior (inference_runner.py:264-273):
        # console line + empty JSON, NO "Wrote results to"/payload echo
        print("No valid audio chunks found (all below silence threshold). "
              "Exiting.")
        with open(args.output_json, "w", encoding="utf-8") as f:
            f.write(payload)
        return 0
    with open(args.output_json, "w", encoding="utf-8") as f:
        f.write(payload)
    # reference stdout contract (inference_runner.py:352-353)
    print("Wrote results to", args.output_json)
    print(payload)
    return 0


if __name__ == "__main__":
    sys.exit(main())
