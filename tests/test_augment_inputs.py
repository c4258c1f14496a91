"""Augmenter input-format acceptance (reference audio_augmneter.py:233,242
accepts .wav AND .mp3; non-WAV decodes through the ffmpeg shim)."""

import os

import numpy as np
import pytest

from synthetic_audio_detection_tpu.audio import wavio
from synthetic_audio_detection_tpu.data import augment


def _wav(path, seconds=1.0, sr=44_100):
    t = np.arange(int(seconds * sr)) / sr
    y = (0.4 * np.sin(2 * np.pi * 330 * t)).astype(np.float32)
    wavio.write_wav(str(path), np.stack([y, y]), sr)


def test_directory_listing_accepts_mp3(tmp_path, monkeypatch):
    """.mp3 files enter the task fan-out (decode mocked — no ffmpeg here)."""
    _wav(tmp_path / "a.wav")
    (tmp_path / "b.mp3").write_bytes(b"\xff\xfb\x90\x00fakemp3")
    (tmp_path / "c.flac").write_bytes(b"fLaC")  # NOT in the reference's list

    def fake_load(path):
        sr = 44_100
        y = 0.3 * np.sin(np.arange(sr) * 0.05).astype(np.float32)
        return np.stack([y, y]), sr

    monkeypatch.setattr(
        "synthetic_audio_detection_tpu.audio.decode.load_audio", fake_load
    )
    out = tmp_path / "out"
    recs = augment.augment_directory(
        str(tmp_path), str(out), pool_size=1,
        augmentations=["add_white_noise"], seed=1,
    )
    ins = sorted(os.path.basename(r["input_file"]) for r in recs)
    assert ins == ["a.wav", "b.mp3"]  # flac excluded, mp3 included
    names = sorted(os.listdir(out))
    assert len(names) == 2
    assert names[0].startswith("a_add_white_noise")
    assert names[1].startswith("b_add_white_noise")


def test_non_wav_routes_through_decode_shim(tmp_path, monkeypatch):
    calls = []

    def fake_load(path):
        calls.append(path)
        sr = 44_100
        y = 0.2 * np.ones(sr, np.float32)
        return y[None, :], sr

    monkeypatch.setattr(
        "synthetic_audio_detection_tpu.audio.decode.load_audio", fake_load
    )
    src = tmp_path / "x.mp3"
    src.write_bytes(b"\xff\xfb\x90\x00fake")
    rec = augment.process_augmentation(
        str(src), str(tmp_path / "out"), "time_shift", seed=3
    )
    assert rec is not None and calls == [str(src)]
    wf, sr = wavio.read_wav(str(tmp_path / "out" / rec["output_file"]))
    assert sr == augment.AUGMENT_SR and wf.shape[0] == 2


def test_non_wav_without_ffmpeg_reports_clear_error(tmp_path, capsys):
    """Without ffmpeg the per-task isolation reports (not swallows) a clear
    error naming the missing dependency."""
    from synthetic_audio_detection_tpu.audio import decode

    if decode.have_ffmpeg():
        pytest.skip("ffmpeg installed; error path not reachable")
    src = tmp_path / "x.mp3"
    src.write_bytes(b"\xff\xfb\x90\x00fake")
    rec = augment.process_augmentation(
        str(src), str(tmp_path / "out"), "tremolo", seed=0
    )
    assert rec is None
    assert "ffmpeg" in capsys.readouterr().out


@pytest.mark.skipif(
    not __import__(
        "synthetic_audio_detection_tpu.audio.decode", fromlist=["have_ffmpeg"]
    ).have_ffmpeg(),
    reason="ffmpeg not installed",
)
def test_real_mp3_roundtrip(tmp_path):
    """Integration (ffmpeg-gated): encode an mp3, augment it."""
    import subprocess

    wav = tmp_path / "in.wav"
    _wav(wav)
    mp3 = tmp_path / "in.mp3"
    subprocess.run(["ffmpeg", "-y", "-i", str(wav), str(mp3)],
                   capture_output=True, check=True)
    rec = augment.process_augmentation(
        str(mp3), str(tmp_path / "out"), "speed_up", seed=5
    )
    assert rec is not None
