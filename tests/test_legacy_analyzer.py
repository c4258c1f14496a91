"""Legacy analyzer unit tests: normalization, windowing at 85% overlap,
sensitivity rescaling, smoothing fallback, run-length segment merging
(legacy/source/inference_script.py semantics)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from synthetic_audio_detection_tpu.infer.legacy_analyzer import (
    LegacyAudioAnalyzer,
    LegacyAudioConfig,
    normalize_audio,
)
from synthetic_audio_detection_tpu.models.classifier import (
    BinaryClassifier,
    init_classifier,
)


def test_normalize_audio_semantics(rng):
    y = rng.standard_normal(32000).astype(np.float32) * 3.0 + 0.5
    out = normalize_audio(y)
    # mean-subtract → peak-normalize → RMS 0.2
    assert abs(np.sqrt(np.mean(out**2)) - 0.2) < 1e-5


@pytest.fixture(scope="module")
def analyzer():
    model = BinaryClassifier(backbone="resnet18", num_outputs=5)
    variables = init_classifier(model, jax.random.PRNGKey(0), input_size=64)
    a = LegacyAudioAnalyzer(model, variables)
    # shrink spectrogram for CPU test speed
    import dataclasses as dc

    a.spec_cfg = dc.replace(a.spec_cfg, out_size=64)

    from synthetic_audio_detection_tpu.ops import melspec

    def fwd(variables, windows):
        feats = melspec.log_mel_features(
            windows, a.spec_cfg, a.audio.target_sample_rate, use_gemm_dft=True
        )
        x = melspec.replicate_channels(feats, 3)
        logits = a.model.apply(variables, x, train=False)
        return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)

    a._jit_fwd = jax.jit(fwd)
    return a


def test_window_overlap_85(analyzer):
    # 6 s of audio, 4 s windows, hop = 0.6 s → starts 0, 0.6, 1.2, 1.8
    wf = (np.ones(6 * 32000) * 0.1).astype(np.float32)
    windows, stamps = analyzer.windows(wf)
    assert stamps[:4] == [0.0, 0.6, 1.2, 1.8]
    assert windows.shape[1] == 128000


def test_sensitivity_factors_rescale(analyzer, rng):
    wf = (rng.standard_normal(5 * 32000) * 0.2).astype(np.float32)
    windows, _ = analyzer.windows(wf)
    base = analyzer.probabilities(windows)
    analyzer.sensitivity_factors = {c.lower(): 1.0 for c in analyzer.classes}
    analyzer.sensitivity_factors["class3"] = 2.0
    boosted = analyzer.probabilities(windows)
    analyzer.sensitivity_factors["class3"] = 1.0
    # class3 gains mass, rows stay normalized
    assert (boosted[:, 2] > base[:, 2]).all()
    np.testing.assert_allclose(boosted.sum(1), 1.0, atol=1e-6)


def test_smoothing_majority_fallback(analyzer):
    # synthetic probability track: confident class 0 except two noisy rows
    probs = np.full((9, 5), 0.05)
    probs[:, 0] = 0.8
    probs[4] = [0.22, 0.21, 0.19, 0.19, 0.19]  # low-confidence row
    probs = probs / probs.sum(1, keepdims=True)
    preds, sm = analyzer.smooth_predictions(probs)
    assert (np.asarray(preds) == 0).all()  # fallback snaps to majority


def test_run_length_segments(analyzer):
    timestamps = [0.0, 0.6, 1.2, 1.8, 2.4]
    preds = np.array([0, 0, 1, 1, 1])
    probs = np.full((5, 5), 0.1)
    probs[:2, 0] = 0.9
    probs[2:, 1] = 0.6
    segs = analyzer.confident_segments(timestamps, preds, probs)
    assert len(segs) == 2
    assert segs[0]["class"] == "Class1" and segs[0]["start"] == 0.0
    assert segs[0]["end"] == pytest.approx(0.6 + 4.0)
    assert segs[1]["class"] == "Class2" and segs[1]["start"] == 1.2
    assert segs[0]["confidence"] == pytest.approx(0.9)
    # below-threshold runs are dropped
    lowp = np.full((5, 5), 0.1)
    assert analyzer.confident_segments(timestamps, preds, lowp) == []
