"""Utility tests: config tree serialization round-trip, stage timers."""

import time

import pytest

from synthetic_audio_detection_tpu.utils import config as C
from synthetic_audio_detection_tpu.utils.profiling import StageTimer


def test_config_roundtrip():
    cfg = C.PipelineConfig(
        audio=C.AudioConfig(overlap=0.85, silence_threshold=1e-4),
        spec=C.SpectrogramConfig(mel_norm="slaney", out_size=256),
        train=C.TrainConfig(batch_size=16, class1="SynthA",
                            data_backend="grain"),
    )
    blob = C.to_json(cfg)
    back = C.from_dict(C.PipelineConfig, __import__("json").loads(blob))
    assert back.audio.overlap == 0.85
    assert back.spec.mel_norm == "slaney" and back.spec.out_size == 256
    assert back.train.batch_size == 16 and back.train.class1 == "SynthA"
    assert back.train.data_backend == "grain"
    # derived properties survive
    assert back.audio.hop_samples == int(0.15 * 128000)
    assert back.spec.n_freqs == 1025


def test_config_reference_defaults():
    """The defaults ARE the reference's constructed values (SURVEY.md §2.3)."""
    a = C.AudioConfig()
    assert (a.sample_rate, a.window_seconds, a.overlap) == (32000, 4.0, 0.0)
    assert a.silence_threshold == 1e-3
    s = C.SpectrogramConfig()
    assert (s.n_fft, s.hop_length, s.n_mels) == (2048, 512, 128)
    assert (s.f_min, s.f_max, s.top_db) == (20.0, 12000.0, 80.0)
    assert C.SpectrogramConfig.train().mel_norm is None
    assert C.SpectrogramConfig.inference().mel_norm == "slaney"
    legacy = C.AudioConfig.legacy()
    assert legacy.overlap == 0.85 and legacy.silence_threshold == 1e-4
    t = C.TrainConfig()
    assert (t.lr, t.weight_decay, t.grad_clip_norm) == (1e-3, 0.01, 0.5)
    assert (t.plateau_factor, t.plateau_patience) == (0.5, 2)


def test_stage_timer():
    t = StageTimer()
    with t.stage("a"):
        time.sleep(0.01)
    with t.stage("a"):
        time.sleep(0.01)
    with t.stage("b"):
        pass
    assert t.counts["a"] == 2 and t.counts["b"] == 1
    assert t.totals["a"] >= 0.02
    report = t.report()
    assert "a: total" in report and "b: total" in report


# ---------------------------------------------------------------------------
# ROC / AUC / EER vs sklearn + scipy oracles


def test_roc_auc_matches_sklearn():
    import numpy as np
    from sklearn.metrics import roc_auc_score

    from synthetic_audio_detection_tpu.utils import metrics as M

    rng = np.random.default_rng(0)
    for trial in range(20):
        n = int(rng.integers(8, 300))
        y = rng.integers(0, 2, n)
        if y.sum() in (0, n):
            y[0], y[-1] = 0, 1
        # half the trials use heavily tied (quantized) scores
        s = rng.normal(size=n) + 0.8 * y
        if trial % 2:
            s = np.round(s * 4) / 4
        assert M.roc_auc(s, y) == pytest.approx(roc_auc_score(y, s), abs=1e-12)


def test_roc_points_match_sklearn():
    import numpy as np
    from sklearn.metrics import roc_curve

    from synthetic_audio_detection_tpu.utils import metrics as M

    rng = np.random.default_rng(3)
    y = rng.integers(0, 2, 64)
    y[0], y[1] = 0, 1
    s = np.round(rng.normal(size=64), 1)  # force ties
    fpr, tpr, thr = M.binary_roc(s, y)
    ref_fpr, ref_tpr, ref_thr = roc_curve(y, s, drop_intermediate=False)
    assert np.allclose(fpr, ref_fpr) and np.allclose(tpr, ref_tpr)
    # sklearn's leading threshold is inf too (>= 1.0 semantics match)
    assert np.allclose(thr[1:], ref_thr[1:]) and np.isinf(thr[0])


def test_eer_matches_brentq_interpolation():
    """The classic EER recipe: root of 1 - x - interp1d(fpr, tpr)(x)."""
    import numpy as np
    from scipy.interpolate import interp1d
    from scipy.optimize import brentq
    from sklearn.metrics import roc_curve

    from synthetic_audio_detection_tpu.utils import metrics as M

    rng = np.random.default_rng(7)
    for _ in range(10):
        n = int(rng.integers(30, 400))
        y = rng.integers(0, 2, n)
        if y.sum() in (0, n):
            y[0], y[-1] = 0, 1
        s = rng.normal(size=n) + 1.2 * y  # continuous: no ties
        fpr, tpr, _ = roc_curve(y, s, drop_intermediate=False)
        oracle = brentq(lambda x: 1.0 - x - interp1d(fpr, tpr)(x), 0.0, 1.0)
        eer, thr = M.equal_error_rate(s, y)
        assert eer == pytest.approx(oracle, abs=1e-9)
        # the returned threshold is an achievable operating point near the EER
        pred = s >= thr
        got_fpr = (pred & (y == 0)).sum() / (y == 0).sum()
        got_fnr = (~pred & (y == 1)).sum() / (y == 1).sum()
        assert max(got_fpr, got_fnr) <= eer + max(
            1.0 / (y == 0).sum(), 1.0 / (y == 1).sum()
        ) + 1e-9


def test_eer_perfect_and_random_detectors():
    import numpy as np

    from synthetic_audio_detection_tpu.utils import metrics as M

    y = np.array([0, 0, 0, 1, 1, 1])
    s = np.array([0.1, 0.2, 0.3, 0.7, 0.8, 0.9])
    eer, thr = M.equal_error_rate(s, y)
    assert eer == 0.0 and 0.3 < thr <= 0.7
    assert M.roc_auc(s, y) == 1.0
    # anti-detector: reversed scores -> EER 1, AUC 0
    assert M.roc_auc(-s, y) == 0.0
    # degenerate labels rejected
    with pytest.raises(ValueError):
        M.roc_auc(s, np.ones_like(y))
