"""Compat CLI: legacy 5-class analyzer
(reference legacy/source/inference_script.py:403-472 flag surface:
--audio_path, --checkpoint_path, --output_dir, --confidence_threshold,
--device, --IsBatch, --parallel).

Per-file results are written to <output_dir>/<stem>.json with the legacy
schema {percentages, segments[{start, end, class, confidence}]}."""

from __future__ import annotations

import argparse
import json
import logging
import os
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Legacy 5-class audio analyzer")
    p.add_argument("--audio_path", type=str, help="Path to single audio file")
    p.add_argument("--checkpoint_path", type=str, required=True,
                   help="Model checkpoint path (must be for 5 classes)")
    p.add_argument("--output_dir", type=str, default="results_json")
    p.add_argument("--confidence_threshold", type=float, default=0.45)
    p.add_argument("--device", type=str, default="tpu",
                   help="Accepted for reference compatibility; ignored")
    p.add_argument("--IsBatch", type=str, default=None, help="Folder for batch mode")
    p.add_argument("--parallel", action="store_true",
                   help="Accepted for compatibility; preprocessing is "
                   "always pipelined")
    p.add_argument("--model-name", type=str, default="resnet152",
                   help="Backbone (legacy default resnet152, "
                   "inference_script.py:96)")
    p.add_argument("--bf16", action="store_true")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    logging.basicConfig(level=logging.INFO, format="%(levelname)s %(message)s")
    from synthetic_audio_detection_tpu.utils.compile_cache import (
        enable_persistent_cache,
    )

    enable_persistent_cache()

    import jax.numpy as jnp

    from synthetic_audio_detection_tpu.checkpoints import serialization
    from synthetic_audio_detection_tpu.infer.legacy_analyzer import (
        DEFAULT_CLASSES,
        LegacyAudioAnalyzer,
    )
    from synthetic_audio_detection_tpu.models.classifier import BinaryClassifier

    variables, extras = serialization.load_submodel_torch(args.checkpoint_path)
    model = BinaryClassifier(backbone=args.model_name, num_outputs=5)
    analyzer = LegacyAudioAnalyzer(
        model,
        variables,
        classes=DEFAULT_CLASSES,
        confidence_threshold=args.confidence_threshold,
        compute_dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
    )

    os.makedirs(args.output_dir, exist_ok=True)

    def write(name: str, result):
        stem = os.path.splitext(os.path.basename(name))[0]
        out_path = os.path.join(args.output_dir, f"{stem}.json")
        with open(out_path, "w") as f:
            json.dump({"filename": os.path.basename(name), **result}, f, indent=2)
        print(f"{name}: {result['percentages']}")

    if args.IsBatch:
        for name, result in analyzer.analyze_batch(args.IsBatch).items():
            write(name, result)
    elif args.audio_path:
        write(args.audio_path, analyzer.analyze_audio(args.audio_path))
    else:
        print("provide --audio_path or --IsBatch", file=sys.stderr)
        return 2
    return 0


if __name__ == "__main__":
    sys.exit(main())
