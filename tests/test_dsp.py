"""Host DSP tests: STFT/ISTFT reconstruction, phase-vocoder stretch, pitch
shift, augmentation contracts (reference audio_augmneter.py semantics)."""

import os

import numpy as np
import pytest

from synthetic_audio_detection_tpu.audio import dsp, wavio
from synthetic_audio_detection_tpu.data import augment


def _tone(freq, sr, seconds=1.0, amp=0.5):
    t = np.arange(int(sr * seconds)) / sr
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def dominant_freq(y, sr):
    w = np.hanning(len(y))
    spec = np.abs(np.fft.rfft(y * w))
    return np.argmax(spec) * sr / len(y)


def test_stft_istft_roundtrip():
    rng = np.random.default_rng(0)
    y = rng.standard_normal(22050).astype(np.float32) * 0.3
    D = dsp.stft(y)
    back = dsp.istft(D, length=len(y))
    # interior reconstruction must be near-exact (COLA with Hann @ 75% overlap)
    np.testing.assert_allclose(back[2048:-2048], y[2048:-2048], atol=1e-6)


def test_time_stretch_changes_length_not_pitch():
    sr = 22050
    y = _tone(440.0, sr, 2.0)
    for rate in (0.7, 1.4):
        out = dsp.time_stretch(y, rate)
        assert abs(len(out) - round(len(y) / rate)) <= 2
        f = dominant_freq(out[sr // 4 : -sr // 4], sr)
        assert abs(f - 440.0) < 5.0, (rate, f)


def test_pitch_shift_changes_pitch_not_length():
    sr = 22050
    y = _tone(440.0, sr, 2.0)
    for steps in (-2.0, 2.0):
        out = dsp.pitch_shift(y, sr, steps)
        assert len(out) == len(y)
        f = dominant_freq(out[sr // 4 : -sr // 4], sr)
        expect = 440.0 * 2 ** (steps / 12)
        assert abs(f - expect) < 8.0, (steps, f, expect)


def test_all_augmentations_produce_output(tmp_path):
    sr = 44100
    y = _tone(330.0, sr, 1.0)
    wavio.write_wav(tmp_path / "ffffffff00000000.wav", y, sr)
    for name in augment.AUGMENTATIONS:
        rec = augment.process_augmentation(
            str(tmp_path / "ffffffff00000000.wav"), str(tmp_path / "out"),
            name, seed=5,
        )
        assert rec is not None, name
        out_path = tmp_path / "out" / rec["output_file"]
        assert out_path.exists(), name
        wf, out_sr = wavio.read_wav(out_path)
        assert out_sr == 44100
        assert wf.shape[0] == 2  # stereo duplication contract
        assert np.abs(wf).max() <= 1.0
        # filename contract: {base}_{augmentation}[_{param}].wav
        assert rec["output_file"].startswith(f"ffffffff00000000_{name}")


def test_augment_directory_csv(tmp_path):
    sr = 44100
    wavio.write_wav(tmp_path / "a0a0a0a0a0a0a0a0.wav", _tone(500, sr, 0.5), sr)
    csv_path = tmp_path / "prov.csv"
    recs = augment.augment_directory(
        str(tmp_path), str(tmp_path / "out"), csv_path=str(csv_path),
        pool_size=2, seed=7,
    )
    assert len(recs) == len(augment.AUGMENTATIONS)
    text = csv_path.read_text()
    assert text.startswith("input_file,output_file,augmentation,param")
    assert text.count("\n") == len(recs) + 1


def test_drc_and_noise_and_tremolo_semantics():
    rng = np.random.default_rng(1)
    y = _tone(200.0, 44100, 0.5)
    out, amount = augment.augment_dynamic_range_compression(y, rng)
    assert 0.01 <= amount <= 0.5
    # compression boosts quiet samples: |out| >= |y| wherever |y|<1
    assert (np.abs(out) + 1e-9 >= np.abs(y)).mean() > 0.99

    out, amp = augment.augment_add_white_noise(y, rng)
    assert out.shape == y.shape and amp > 0

    out, params = augment.augment_tremolo(y, 44100, rng)
    assert 3.0 <= params["lfo_rate"] <= 6.0
    assert 0.2 <= params["depth"] <= 0.5
    # amplitude envelope actually modulates
    assert out.std() != pytest.approx(y.std(), rel=1e-3)
