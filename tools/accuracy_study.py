"""Held-out accuracy study: merged ensemble vs a segment tree.

Drives the REAL serving pipeline (one warm InferencePipeline) over
``<data-dir>/<ClassName>/*.wav`` held-out segments and reports binary
detection accuracy (Real vs any-synthetic) and attribution accuracy (exact
class). This is the measurement behind docs/PERFORMANCE.md's
train-resolution/serve-resolution table (512 vs 256 vs native).

Usage (on TPU or CPU):
    python tools/accuracy_study.py --merged-model merged.pth \
        --data-dir dataset/test --input-size native --bf16
"""

from __future__ import annotations

import argparse
import collections
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
    args = p.parse_args(argv)

    from synthetic_audio_detection_tpu.utils.compile_cache import (
        enable_persistent_cache,
    )

    enable_persistent_cache()

    import jax.numpy as jnp
    import numpy as np

    from synthetic_audio_detection_tpu.checkpoints import serialization
    from synthetic_audio_detection_tpu.infer.pipeline import (
        InferencePipeline,
        preprocess_waveform,
        slice_waveform,
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
    pipe = InferencePipeline(
        ensemble,
        audio=AudioConfig(),
        spec=SpectrogramConfig.inference(out_size=args.input_size),
        infer=InferenceConfig(batch_size=args.batch_size),
        compute_dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
    )
    real_name = ensemble.real_name

    classes = sorted(
        d for d in os.listdir(args.data_dir)
        if os.path.isdir(os.path.join(args.data_dir, d))
    )
    n = bin_ok = attr_ok = 0
    per_class = collections.defaultdict(lambda: [0, 0, 0])  # n, bin, attr
    confusion = collections.Counter()
    det_scores, det_truth = [], []  # per-file synthetic-ness score / label
    for cls in classes:
        folder = os.path.join(args.data_dir, cls)
        for name in sorted(os.listdir(folder)):
            if not name.lower().endswith(".wav"):
                continue
            wf = preprocess_waveform(os.path.join(folder, name), pipe.audio)
            windows, stamps = slice_waveform(wf, pipe.audio)
            if windows.shape[0] == 0:
                continue
            res = pipe.analyze_windows(windows, stamps)
            # majority label over the file's windows (segments are 4 s, so
            # usually exactly one window)
            labels = [s["label"] for s in res["segments"]]
            label = collections.Counter(labels).most_common(1)[0][0]
            is_real_true = cls == real_name
            is_real_pred = label == real_name
            n += 1
            per_class[cls][0] += 1
            if is_real_true == is_real_pred:
                bin_ok += 1
                per_class[cls][1] += 1
            if label == cls:
                attr_ok += 1
                per_class[cls][2] += 1
            confusion[(cls, label)] += 1
            if res["percentages"]:
                # synthetic-ness score = 1 - mean real sigmoid (the unanimity
                # rule's primary axis) — feeds threshold-free AUC/EER
                det_scores.append(1.0 - res["percentages"][real_name] / 100.0)
                det_truth.append(not is_real_true)

    out = {
        "input_size": args.input_size or "native",
        "dtype": "bf16" if args.bf16 else "f32",
        "n_segments": n,
        "binary_accuracy": round(bin_ok / max(n, 1), 4),
        "attribution_accuracy": round(attr_ok / max(n, 1), 4),
        "per_class": {
            c: {"n": v[0], "binary": round(v[1] / max(v[0], 1), 4),
                "attribution": round(v[2] / max(v[0], 1), 4)}
            for c, v in per_class.items()
        },
        "confusion": {f"{t}->{p}": c for (t, p), c in sorted(confusion.items())},
    }
    truth = np.asarray(det_truth, bool)
    if truth.size and 0 < truth.sum() < truth.size:
        from synthetic_audio_detection_tpu.utils import metrics as metrics_mod

        s = np.asarray(det_scores, np.float64)
        eer, thr = metrics_mod.equal_error_rate(s, truth)
        out["binary_auc"] = round(metrics_mod.roc_auc(s, truth), 6)
        out["binary_eer"] = round(eer, 6)
        out["binary_eer_threshold"] = round(thr, 6)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
