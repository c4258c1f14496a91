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
