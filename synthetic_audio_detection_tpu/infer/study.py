"""Held-out evaluation over a segment tree: the measurement core behind
tools/accuracy_study.py and tools/robustness_study.py.

Drives the REAL serving pipeline (warm compiled buckets) over
``<data_dir>/<ClassName>/*.wav`` and aggregates binary detection accuracy
(Real vs any-synthetic), attribution accuracy (exact class), the
class-confusion table, and threshold-free detector AUC/EER
(utils/metrics.py). The reference has no evaluation tooling beyond the
trainer's per-epoch report (submodel_trainer.py:376-383); a detector
product needs its operating metrics measured on the serving path itself.

An optional ``perturb(waveform, rng)`` hook distorts each decoded clip
before windowing — the robustness study sweeps noise/gain/band-limit/clip
perturbations through it with a per-file deterministic RNG.
"""

from __future__ import annotations

import collections
import os
import zlib
from typing import Any, Callable, Dict, Optional

import numpy as np

from synthetic_audio_detection_tpu.infer.pipeline import (
    InferencePipeline,
    preprocess_waveform,
    slice_waveform,
)
from synthetic_audio_detection_tpu.utils import metrics as metrics_mod

Perturb = Callable[[np.ndarray, np.random.Generator], np.ndarray]


def collect_logits_tree(
    pipe: InferencePipeline, data_dir: str
) -> Dict[str, np.ndarray]:
    """Per-WINDOW serving logits over a labeled segment tree.

    → {"logits": [num, N+1] float32 (RAW, pre-calibration), "class_idx":
    [num] int64 index into pipe.ensemble.class_names (the real class is the
    last index; a folder not matching any ensemble class name is skipped
    with a warning — it has no column to calibrate against)}.

    This is the measurement feed for tools/calibrate_ensemble.py: windows
    are the decision rule's unit, so calibration is fit at window
    granularity on the same serving numerics the verdicts use.
    """
    import logging

    names = list(pipe.ensemble.class_names)
    logits_out, idx_out = [], []
    classes = sorted(
        d for d in os.listdir(data_dir)
        if os.path.isdir(os.path.join(data_dir, d))
    )
    for cls in classes:
        if cls not in names:
            logging.getLogger(__name__).warning(
                "collect_logits_tree: folder %r matches no ensemble class "
                "%s; skipped", cls, names)
            continue
        ci = names.index(cls)
        folder = os.path.join(data_dir, cls)
        for name in sorted(os.listdir(folder)):
            if not name.lower().endswith(".wav"):
                continue
            wf = preprocess_waveform(os.path.join(folder, name), pipe.audio)
            windows, _ = slice_waveform(wf, pipe.audio)
            if windows.shape[0] == 0:
                continue
            lg = pipe.logits_for_windows(windows)
            logits_out.append(np.asarray(lg, np.float32))
            idx_out.extend([ci] * lg.shape[0])
    if not logits_out:
        raise ValueError(f"{data_dir}: no usable labeled segments")
    return {
        "logits": np.concatenate(logits_out, axis=0),
        "class_idx": np.asarray(idx_out, np.int64),
    }


def evaluate_tree(
    pipe: InferencePipeline,
    data_dir: str,
    perturb: Optional[Perturb] = None,
    seed: int = 0,
) -> Dict[str, Any]:
    """→ {n_segments, binary_accuracy, attribution_accuracy, per_class,
    confusion, binary_auc, binary_eer, binary_eer_threshold}.

    Per-file verdict = majority window label (segments are 4 s, so usually
    exactly one window). The per-file RNG passed to ``perturb`` is seeded
    from (seed, crc32(relative path)) — deterministic across runs and
    independent of listing order.
    """
    real_name = pipe.ensemble.real_name
    classes = sorted(
        d for d in os.listdir(data_dir)
        if os.path.isdir(os.path.join(data_dir, d))
    )
    n = bin_ok = attr_ok = 0
    per_class = collections.defaultdict(lambda: [0, 0, 0])  # n, bin, attr
    confusion = collections.Counter()
    det_scores, det_truth = [], []  # per-file synthetic-ness score / label
    for cls in classes:
        folder = os.path.join(data_dir, cls)
        for name in sorted(os.listdir(folder)):
            if not name.lower().endswith(".wav"):
                continue
            wf = preprocess_waveform(os.path.join(folder, name), pipe.audio)
            if perturb is not None:
                rng = np.random.default_rng(
                    (seed << 32) ^ zlib.crc32(f"{cls}/{name}".encode()))
                wf = np.asarray(perturb(wf, rng), np.float32)
            windows, stamps = slice_waveform(wf, pipe.audio)
            if windows.shape[0] == 0:
                continue
            logits = pipe.logits_for_windows(windows)
            res = pipe.analyze_windows(windows, stamps, logits=logits)
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
                if pipe.ensemble.generic_head and pipe.infer.generic_verdict:
                    # generic-head arm: the threshold-free detector score is
                    # the generic head's mean calibrated synthetic
                    # probability — the ranking quantity the generic head
                    # exists to improve (train/joint.py generic_head)
                    cal_logits = logits
                    if pipe._cal is not None:
                        from synthetic_audio_detection_tpu.utils.calibration \
                            import apply_calibration

                        cal_logits = np.asarray(
                            apply_calibration(logits, pipe._cal), np.float32)
                    probs = (1.0 / (1.0 + np.exp(
                        -cal_logits.astype(np.float32))))
                    _, gen = pipe._split_generic(probs)
                    det_scores.append(float(gen.mean()))
                else:
                    # synthetic-ness score = 1 - mean real sigmoid (the
                    # unanimity rule's primary axis) — threshold-free AUC/EER
                    det_scores.append(
                        1.0 - res["percentages"][real_name] / 100.0)
                det_truth.append(not is_real_true)

    out: Dict[str, Any] = {
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
        s = np.asarray(det_scores, np.float64)
        eer, thr = metrics_mod.equal_error_rate(s, truth)
        out["binary_auc"] = round(metrics_mod.roc_auc(s, truth), 6)
        out["binary_eer"] = round(eer, 6)
        out["binary_eer_threshold"] = round(thr, 6)
    return out
