"""infer/study.py evaluate_tree: aggregation correctness against a
hand-computed oracle over a tiny tree, perturbation determinism, and the
robustness-study perturbation functions' signal properties."""

import os

import numpy as np
import jax
import pytest

from synthetic_audio_detection_tpu.audio import wavio
from synthetic_audio_detection_tpu.ensemble.multihead import build_ensemble
from synthetic_audio_detection_tpu.infer.pipeline import InferencePipeline
from synthetic_audio_detection_tpu.infer.study import evaluate_tree
from synthetic_audio_detection_tpu.models.classifier import (
    BinaryClassifier,
    init_classifier,
)
from synthetic_audio_detection_tpu.utils.config import (
    AudioConfig,
    InferenceConfig,
    SpectrogramConfig,
)

SR = 32_000


@pytest.fixture(scope="module")
def tiny_pipe():
    model = BinaryClassifier(backbone="resnet18")
    vds = [init_classifier(model, jax.random.PRNGKey(i), input_size=64)
           for i in range(2)]
    ens = build_ensemble(model, vds, ["SynA", "SynB", "Real"],
                         detect_shared_backbone=False)
    return InferencePipeline(
        ens,
        audio=AudioConfig(),
        spec=SpectrogramConfig.inference(out_size=64),
        infer=InferenceConfig(batch_size=8),
        use_pallas=False,
    )


@pytest.fixture(scope="module")
def tiny_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("tree")
    rng = np.random.default_rng(0)
    t = np.arange(4 * SR) / SR
    for cls, freqs in [("Real", [220.0, 330.0]),
                       ("SynA", [1000.0, 1500.0]),
                       ("SynB", [3000.0])]:
        d = root / cls
        d.mkdir()
        for i, f in enumerate(freqs):
            x = (0.3 * np.sin(2 * np.pi * f * t)
                 + 0.02 * rng.standard_normal(t.size)).astype(np.float32)
            wavio.write_wav(str(d / f"{i:016x}_Segment_000.wav"), x, SR)
    return str(root)


def test_evaluate_tree_matches_manual_aggregation(tiny_pipe, tiny_tree):
    """The aggregate counters must equal a by-hand pass using the same
    pipeline verdicts."""
    from synthetic_audio_detection_tpu.infer.pipeline import (
        preprocess_waveform,
        slice_waveform,
    )

    res = evaluate_tree(tiny_pipe, tiny_tree)
    assert res["n_segments"] == 5

    bin_ok = attr_ok = 0
    for cls in ("Real", "SynA", "SynB"):
        folder = os.path.join(tiny_tree, cls)
        for name in sorted(os.listdir(folder)):
            wf = preprocess_waveform(os.path.join(folder, name),
                                     tiny_pipe.audio)
            windows, stamps = slice_waveform(wf, tiny_pipe.audio)
            out = tiny_pipe.analyze_windows(windows, stamps)
            label = out["segments"][0]["label"]
            bin_ok += (label == "Real") == (cls == "Real")
            attr_ok += label == cls
    assert res["binary_accuracy"] == round(bin_ok / 5, 4)
    assert res["attribution_accuracy"] == round(attr_ok / 5, 4)
    # confusion counts sum to n
    assert sum(res["confusion"].values()) == 5
    # detector metrics present (both sides exist) and bounded
    assert 0.0 <= res["binary_auc"] <= 1.0
    assert 0.0 <= res["binary_eer"] <= 1.0


def test_perturbation_rng_deterministic(tiny_pipe, tiny_tree):
    """Same seed → identical results; the per-file RNG must not depend on
    visit order."""
    calls = []

    def noisy(wf, rng):
        calls.append(rng.standard_normal(4))
        return wf + 0.01 * rng.standard_normal(wf.shape).astype(np.float32)

    r1 = evaluate_tree(tiny_pipe, tiny_tree, perturb=noisy, seed=7)
    first = [c.copy() for c in calls]
    calls.clear()
    r2 = evaluate_tree(tiny_pipe, tiny_tree, perturb=noisy, seed=7)
    assert r1 == r2
    for a, b in zip(first, calls):
        np.testing.assert_array_equal(a, b)
    # a different seed draws different noise
    calls.clear()
    evaluate_tree(tiny_pipe, tiny_tree, perturb=noisy, seed=8)
    assert not np.allclose(first[0], calls[0])


def test_robustness_perturbations_signal_properties():
    """Each perturbation does what its name claims (on a synthetic tone)."""
    from tools.robustness_study import PERTURBATIONS, _lowpass_8k, _with_snr

    t = np.arange(4 * SR) / SR
    tone = (0.5 * np.sin(2 * np.pi * 440.0 * t)).astype(np.float32)
    rng = np.random.default_rng(0)

    # SNR: noise power within 1 dB of the target
    noisy = _with_snr(tone, rng, 20.0)
    noise = noisy - tone
    snr = 10 * np.log10(np.mean(tone**2) / np.mean(noise**2))
    assert snr == pytest.approx(20.0, abs=1.0)

    # gain: exact scale
    assert np.allclose(PERTURBATIONS["gain_-12db"](tone, rng), 0.25 * tone)

    # lowpass: a 10 kHz tone dies, a 440 Hz tone survives
    hi = (0.5 * np.sin(2 * np.pi * 10_000.0 * t)).astype(np.float32)
    assert np.sqrt(np.mean(_lowpass_8k(hi) ** 2)) < 0.02
    lo_out = _lowpass_8k(tone)
    assert np.sqrt(np.mean(lo_out**2)) == pytest.approx(
        np.sqrt(np.mean(tone**2)), rel=0.05)
    assert lo_out.shape == tone.shape

    # clip: bounded and distorted
    clipped = PERTURBATIONS["clip_2x"](tone, rng)
    assert clipped.max() <= 1.0 and clipped.min() >= -1.0
    assert np.abs(clipped).max() == pytest.approx(1.0)

    # shift: circular roll by 0.5 s
    shifted = PERTURBATIONS["shift_0.5s"](tone, rng)
    np.testing.assert_array_equal(shifted[16_000:], tone[:-16_000])

    # clean: identity
    np.testing.assert_array_equal(PERTURBATIONS["clean"](tone, rng), tone)


def test_decision_ab_variant_evaluator():
    """tools/decision_ab.py host-side evaluator: reference unanimity at the
    defaults; K-of-N and per-column thresholds flip exactly the intended
    verdicts (the offline twin of pipeline._decide_rows used for the
    decision-layer A/B — agreement with the serving rule is pinned in
    tests/test_calibration.py)."""
    import sys
    from pathlib import Path

    import numpy as np

    tools = str(Path(__file__).resolve().parents[1] / "tools")
    if tools not in sys.path:
        sys.path.insert(0, tools)
    from decision_ab import evaluate_variant

    names = ["SynA", "SynB", "Real"]
    z = lambda p: np.log(np.array(p) / (1 - np.array(p))).astype(np.float32)
    files = [
        ("Real", z([[0.6, 0.1, 0.9]])),   # one head false-fires on real
        ("Real", z([[0.1, 0.2, 0.9]])),   # clean real
        ("SynA", z([[0.9, 0.1, 0.2]])),
        ("Unseen", z([[0.7, 0.1, 0.3]])),  # held-out generator
    ]
    uniform = np.full(3, 0.5, np.float32)
    ref = evaluate_variant(files, names, "Real", "Unseen", None, uniform, 1)
    assert ref["real_tnr"] == 0.5          # the FP head overrides one file
    assert ref["unseen_tpr"] == 1.0 and ref["seen_tpr_mean"] == 1.0

    k2 = evaluate_variant(files, names, "Real", "Unseen", None, uniform, 2)
    assert k2["real_tnr"] == 1.0           # a single FP no longer overrides
    assert k2["unseen_tpr"] == 1.0         # real col weak → still synthetic

    colthr = np.array([0.65, 0.5, 0.5], np.float32)
    col = evaluate_variant(files, names, "Real", "Unseen", None, colthr, 1)
    assert col["real_tnr"] == 1.0          # SynA's own point above its FP
    assert col["unseen_tpr"] == 1.0


def test_decision_ab_sidak_thresholds_bound_compound_fpr():
    """The Šidák per-head operating points: capping each head's real-window
    FPR at q = 1-(1-alpha)^(1/N) bounds the unanimity rule's compounded
    real-FPR at alpha (independence-or-better). Pin the quantile math the
    tool uses and the compound bound on held-out-like data."""
    import numpy as np

    rng = np.random.default_rng(3)
    n_heads, alpha = 5, 0.10
    # per-head sigmoids on real windows: mildly correlated noise
    base = rng.uniform(0.0, 0.6, size=(4000, 1))
    p_real = np.clip(base * 0.3 + rng.uniform(0, 0.6, (4000, n_heads)), 0, 1)

    q = 1.0 - (1.0 - alpha) ** (1.0 / n_heads)
    thr = np.quantile(p_real, 1.0 - q, axis=0)
    # each head individually: FPR <= q (+ sampling slack)
    per_head_fpr = (p_real >= thr).mean(axis=0)
    assert (per_head_fpr <= q + 2e-3).all()
    # the compound (any head fires) on the SAME data is bounded by
    # 1-(1-q)^N = alpha under independence; positive correlation only
    # reduces it
    compound = (p_real >= thr).any(axis=1).mean()
    assert compound <= alpha + 0.01
