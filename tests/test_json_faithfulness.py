"""Byte-level output faithfulness vs the reference inference runner.

The oracle re-implements the reference's output-assembly logic verbatim
(inference_runner.py:290-353: per-row sigmoid interpretation, float32
probability means × 100, unrounded floats, start+window_size end stamps,
``json.dumps(..., indent=4)``, filename as passed) from OUR pipeline's
logits — agreement between two independent renderings of the same contract,
per the repo's oracle-test convention. Numeric float values come from the
same logits on both sides, so the comparison pins the full JSON TEXT.
"""

import json

import jax
import numpy as np
import pytest

from synthetic_audio_detection_tpu.ensemble.multihead import build_ensemble
from synthetic_audio_detection_tpu.infer.pipeline import (
    InferencePipeline,
    result_json,
)
from synthetic_audio_detection_tpu.models.classifier import (
    BinaryClassifier,
    init_classifier,
)
from synthetic_audio_detection_tpu.utils.config import (
    AudioConfig,
    InferenceConfig,
    SpectrogramConfig,
)


@pytest.fixture(scope="module")
def pipe():
    model = BinaryClassifier(backbone="resnet18")
    vds = [init_classifier(model, jax.random.PRNGKey(i), input_size=64)
           for i in range(2)]
    ens = build_ensemble(model, vds, ["SynA", "SynB", "Real"],
                         detect_shared_backbone=False)
    return InferencePipeline(
        ens,
        audio=AudioConfig(overlap=0.3, silence_threshold=1e-3),
        spec=SpectrogramConfig(mel_norm="slaney", out_size=64),
        infer=InferenceConfig(batch_size=8),
        use_pallas=False,
    )


def reference_render(filename, logits, timestamps, window_size,
                     synthetic_names, real_name, threshold=0.5):
    """The reference's steps 4-6 + json text (inference_runner.py:293-351),
    re-implemented independently: torch.sigmoid → numpy float32 sigmoid,
    list-of-float32-rows mean, float(x * 100) unrounded."""
    raw_labels, raw_probs = [], []
    for row in np.asarray(logits, np.float32):
        s = (1.0 / (1.0 + np.exp(-row))).astype(np.float32)
        n = s.shape[0] - 1
        syn_probs, real_prob = s[:n], s[-1]
        if real_prob >= threshold and (syn_probs < threshold).all():
            label = real_name
        else:
            idx = int(np.argmax(syn_probs))
            label = (synthetic_names[idx] if idx < len(synthetic_names)
                     else f"Synthetic_{idx + 1}")
        raw_labels.append(label)
        raw_probs.append(s)
    final = np.mean(raw_probs, axis=0)
    prob_dict = {}
    for i in range(len(final) - 1):
        prob_dict[synthetic_names[i]] = float(final[i] * 100)
    prob_dict[real_name] = float(final[-1] * 100)
    segments = [
        {"start_sec": t, "end_sec": t + window_size, "label": lbl}
        for t, lbl in zip(timestamps, raw_labels)
    ]
    return json.dumps(
        {"filename": filename, "segments": segments, "percentages": prob_dict},
        indent=4,
    )


def test_json_text_matches_reference_assembly(pipe, rng):
    windows = (rng.standard_normal((5, 128_000)) * 0.3).astype(np.float32)
    # overlap 0.3 → hop 2.8 s: inexact float starts exercise the unrounded repr
    starts = [i * 2.8 for i in range(5)]
    stamps = [(s, s + pipe.audio.window_seconds) for s in starts]

    result = pipe.analyze_windows(windows, stamps, smooth=False)
    ours = result_json("/data/clips/input clip.wav", result)

    logits = pipe.logits_for_windows(windows)
    oracle = reference_render(
        "/data/clips/input clip.wav", logits, starts,
        pipe.audio.window_seconds, ["SynA", "SynB"], "Real",
    )
    assert ours == oracle


def test_slice_waveform_stamps_use_reference_arithmetic(pipe):
    """end_sec = start + window_size (inference_runner.py:341-343), computed
    the same way — not (start_idx + window_samples) / sr, which differs in
    the last ulp for inexact hop starts."""
    from synthetic_audio_detection_tpu.infer.pipeline import slice_waveform

    audio = pipe.audio  # overlap 0.3 → hop 89600 samples
    wf = (np.ones(int(32_000 * 15)) * 0.1).astype(np.float32)
    _, stamps = slice_waveform(wf, audio)
    assert len(stamps) >= 3
    for s, e in stamps:
        assert e == s + audio.window_seconds  # exact float identity
    # starts are start_idx / sr exactly
    assert stamps[1][0] == 89600 / 32_000


def test_empty_result_contract(pipe):
    """Empty-chunk JSON: segments [] and an EMPTY percentages dict
    (inference_runner.py:264-273)."""
    res = pipe.analyze_windows(np.zeros((0, 128_000), np.float32), [])
    assert res == {"segments": [], "percentages": {}}
    txt = result_json("x.wav", res)
    assert json.loads(txt) == {"filename": "x.wav", "segments": [],
                               "percentages": {}}
    assert '\n    "' in txt  # indent=4


def test_round_floats_opt_in(pipe, rng):
    """The cosmetic rounding survives behind InferenceConfig.round_floats."""
    import dataclasses as dc

    windows = (rng.standard_normal((3, 128_000)) * 0.3).astype(np.float32)
    stamps = [(i * 2.8, i * 2.8 + 4.0) for i in range(3)]
    rounded_pipe = InferencePipeline(
        pipe.ensemble, audio=pipe.audio, spec=pipe.spec,
        infer=dc.replace(pipe.infer, round_floats=True), use_pallas=False,
    )
    res = rounded_pipe.analyze_windows(windows, stamps)
    for seg in res["segments"]:
        assert seg["start_sec"] == round(seg["start_sec"], 3)
    for v in res["percentages"].values():
        assert v == round(v, 2)
