"""Held-out accuracy study: merged ensemble vs a segment tree.

Drives the REAL serving pipeline (one warm InferencePipeline) over
``<data-dir>/<ClassName>/*.wav`` held-out segments and reports binary
detection accuracy (Real vs any-synthetic), attribution accuracy (exact
class), and detector AUC/EER (infer/study.py evaluate_tree). This is the measurement behind docs/PERFORMANCE.md's
train-resolution/serve-resolution table (512 vs 256 vs native).

Usage (on TPU or CPU):
    python tools/accuracy_study.py --merged-model merged.pth \
        --data-dir dataset/test --input-size native --bf16
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--merged-model", required=True)
    p.add_argument("--data-dir", required=True,
                   help="Folder of <ClassName>/*.wav held-out segments")
    from synthetic_audio_detection_tpu.utils.config import parse_input_size

    p.add_argument("--input-size", type=parse_input_size, default=512)
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--batch-size", type=int, default=128)
    p.add_argument("--backbone", default="resnet18")
    p.add_argument("--threshold", type=float, default=0.5)
    p.add_argument("--syn-override-k", type=int, default=1,
                   help="Decision-layer K (reference unanimity = 1): "
                   "synthetic columns needed to override a Real verdict")
    p.add_argument("--per-column-thresholds", action="store_true",
                   help="Use the checkpoint calibration's per-column EER "
                   "operating points as the decision thresholds")
    p.add_argument("--generic-verdict", action="store_true",
                   help="Decide Real/Synthetic from the generic head "
                   "(ensembles trained with ensemble_trainer --generic-head)"
                   "; the detector AUC/EER score becomes the generic head's "
                   "probability")
    p.add_argument("--no-calibration", action="store_true")
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

    ensemble = serialization.load_merged(args.merged_model, backbone=args.backbone)
    if args.bf16:
        from synthetic_audio_detection_tpu.ensemble.multihead import with_dtype

        ensemble = with_dtype(ensemble, jnp.bfloat16)
    pipe = InferencePipeline(
        ensemble,
        audio=AudioConfig(),
        spec=SpectrogramConfig.inference(out_size=args.input_size),
        infer=InferenceConfig(
            batch_size=args.batch_size,
            threshold=args.threshold,
            apply_calibration=not args.no_calibration,
            syn_override_k=args.syn_override_k,
            per_column_thresholds=args.per_column_thresholds,
            generic_verdict=args.generic_verdict,
        ),
        compute_dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
    )
    out = {
        "input_size": args.input_size or "native",
        "dtype": "bf16" if args.bf16 else "f32",
        "decision": {"syn_override_k": args.syn_override_k,
                     "per_column_thresholds": args.per_column_thresholds,
                     "generic_verdict": args.generic_verdict,
                     "threshold": args.threshold,
                     "calibration": not args.no_calibration},
        **evaluate_tree(pipe, args.data_dir),
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
