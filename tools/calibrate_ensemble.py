"""Fit temperature calibration for a merged ensemble and write it back.

The reference ships no calibration story — its percentages are raw sigmoid
means (inference_runner.py:327-334). This tool closes that product gap:
it drives the REAL serving pipeline over a labeled segment tree
(``<data-dir>/<ClassName>/*.wav``), fits one temperature per aggregated
output column (utils/calibration.py), and writes the calibration into the
merged checkpoint's metadata — native or torch format, matching the input.
Serving then applies it automatically (infer/pipeline.py;
``--no-calibration`` opts out).

Fit on a VALIDATION split (e.g. the train-side tree or a held-in slice),
not the final test set — report ECE there with ``--eval-dir``.

Usage:
    python tools/calibrate_ensemble.py --merged-model merged.pth \
        --fit-dir dataset/train --eval-dir dataset/test \
        --input-size native --bf16 --output merged_cal.pth
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
    p.add_argument("--fit-dir", required=True,
                   help="Labeled tree <dir>/<ClassName>/*.wav to fit on "
                   "(use a validation split, not the final test set)")
    p.add_argument("--eval-dir",
                   help="Optional second tree: report held-out ECE "
                   "before/after with the fitted temperatures")
    p.add_argument("--output",
                   help="Output checkpoint path (default: overwrite "
                   "--merged-model in place)")
    from synthetic_audio_detection_tpu.utils.config import parse_input_size

    p.add_argument("--input-size", type=parse_input_size, default=512)
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--batch-size", type=int, default=128)
    p.add_argument("--backbone", default="resnet18")
    p.add_argument("--store-eer-threshold", action="store_true",
                   help="Also store the calibrated real column's EER "
                   "operating point as the serving threshold (otherwise "
                   "the 0.5 default stays)")
    p.add_argument("--store-column-thresholds", action="store_true",
                   help="Also store per-column operating points (the "
                   "per-head threshold lever for the unanimity rule's "
                   "compounding false positives; serve with "
                   "--per-column-thresholds)")
    p.add_argument("--column-threshold-method", default="eer",
                   choices=["eer", "sidak"],
                   help="'eer': each column's own calibrated EER point "
                   "(balanced default). 'sidak': per-head real-FPR "
                   "q=1-(1-alpha)^(1/N) so the ensemble's compounded "
                   "real-FPR is bounded by --sidak-alpha (the TNR-control "
                   "knob; costs seen TPR with head overlap — measured "
                   "trade in docs/PERFORMANCE.md)")
    p.add_argument("--sidak-alpha", type=float, default=0.05,
                   help="target ensemble real-FPR for "
                   "--column-threshold-method sidak")
    args = p.parse_args(argv)

    from synthetic_audio_detection_tpu.utils.compile_cache import (
        enable_persistent_cache,
    )

    enable_persistent_cache()

    import dataclasses

    import jax.numpy as jnp
    import numpy as np

    from synthetic_audio_detection_tpu.checkpoints import serialization
    from synthetic_audio_detection_tpu.infer.pipeline import InferencePipeline
    from synthetic_audio_detection_tpu.infer.study import collect_logits_tree
    from synthetic_audio_detection_tpu.utils import calibration as cal_mod
    from synthetic_audio_detection_tpu.utils.config import (
        AudioConfig,
        InferenceConfig,
        SpectrogramConfig,
    )

    ensemble = serialization.load_merged(args.merged_model, backbone=args.backbone)
    serving = ensemble
    if args.bf16:
        from synthetic_audio_detection_tpu.ensemble.multihead import with_dtype

        serving = with_dtype(ensemble, jnp.bfloat16)
    pipe = InferencePipeline(
        serving,
        audio=AudioConfig(),
        spec=SpectrogramConfig.inference(out_size=args.input_size),
        # raw logits wanted regardless of any calibration already present
        infer=InferenceConfig(batch_size=args.batch_size,
                              apply_calibration=False),
        compute_dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
    )

    fit = collect_logits_tree(pipe, args.fit_dir)
    cal = cal_mod.fit_ensemble_calibration(
        fit["logits"], fit["class_idx"], serving.class_names,
        store_eer_threshold=args.store_eer_threshold,
        store_column_thresholds=args.store_column_thresholds,
        column_threshold_method=args.column_threshold_method,
        sidak_alpha=args.sidak_alpha,
        fit_on=f"{args.fit_dir} ({fit['logits'].shape[0]} windows)",
    )
    report = {"calibration": cal}

    if args.eval_dir:
        ev = collect_logits_tree(pipe, args.eval_dir)
        temps = np.asarray(cal["temperatures"], np.float64)
        ece_b, ece_a = [], []
        for j in range(len(serving.class_names)):
            target = (ev["class_idx"] == j).astype(np.float64)
            col = np.asarray(ev["logits"][:, j], np.float64)
            p_raw = 1.0 / (1.0 + np.exp(-col))
            p_cal = 1.0 / (1.0 + np.exp(-col / temps[j]))
            ece_b.append(round(cal_mod.expected_calibration_error(p_raw, target), 6))
            ece_a.append(round(cal_mod.expected_calibration_error(p_cal, target), 6))
        report["eval"] = {
            "dir": args.eval_dir,
            "n_windows": int(ev["logits"].shape[0]),
            "ece_before": ece_b,
            "ece_after": ece_a,
        }

    # write back in the input's format (the f32 tree, not the bf16 serving view)
    out_path = args.output or args.merged_model
    calibrated = dataclasses.replace(ensemble, calibration=cal)
    torch_format = out_path.endswith((".pth", ".pt"))
    from synthetic_audio_detection_tpu.ensemble.merger import save_merged

    save_merged(calibrated, out_path, torch_format=torch_format)
    report["output"] = out_path
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    sys.exit(main())
