"""WAV reader/writer round-trip + stdlib cross-check."""

import struct
import wave

import numpy as np
import pytest

from synthetic_audio_detection_tpu.audio import wavio


def test_pcm16_roundtrip(tmp_path, rng):
    # keep strictly inside [-1, 1]: PCM clamps values beyond full scale,
    # which no roundtrip can undo
    x = np.clip(rng.standard_normal((2, 4000)) * 0.3, -0.999, 0.999).astype(np.float32)
    p = tmp_path / "a.wav"
    wavio.write_wav(p, x, 32000, subtype="PCM_16")
    y, sr = wavio.read_wav(p)
    assert sr == 32000
    assert y.shape == (2, 4000)
    np.testing.assert_allclose(y, x, atol=1.0 / 32000)


def test_float_roundtrip(tmp_path, rng):
    x = rng.standard_normal((1, 1000)).astype(np.float32)
    p = tmp_path / "f.wav"
    wavio.write_wav(p, x, 44100, subtype="FLOAT")
    y, sr = wavio.read_wav(p)
    assert sr == 44100
    np.testing.assert_allclose(y, x, atol=0)


def test_matches_stdlib_wave_module(tmp_path, rng):
    """Our writer must produce files the stdlib can parse, and our reader must
    agree with the stdlib on stdlib-written files."""
    x = (rng.standard_normal(2048) * 0.5).astype(np.float32)
    # libsndfile float→PCM16 semantics (scale 32768, round, clamp)
    pcm = np.clip(
        np.round(np.clip(x, -1, 1).astype(np.float64) * 32768.0), -32768, 32767
    ).astype("<i2")

    p = tmp_path / "std.wav"
    with wave.open(str(p), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(32000)
        w.writeframes(pcm.tobytes())
    y, sr = wavio.read_wav(p)
    np.testing.assert_allclose(y[0], pcm.astype(np.float32) / 32768.0, atol=0)

    q = tmp_path / "ours.wav"
    wavio.write_wav(q, x, 32000)
    with wave.open(str(q), "rb") as w:
        assert w.getnchannels() == 1
        assert w.getframerate() == 32000
        raw = w.readframes(w.getnframes())
    np.testing.assert_array_equal(np.frombuffer(raw, "<i2"), pcm)


def test_pcm24_decode(tmp_path):
    # hand-build a 24-bit PCM wav with values at the extremes
    vals = [0, 1 << 22, -(1 << 22), (1 << 23) - 1, -(1 << 23)]
    raw = b"".join(struct.pack("<i", v)[:3] for v in vals)
    body = (
        b"WAVEfmt " + struct.pack("<IHHIIHH", 16, 1, 1, 48000, 48000 * 3, 3, 24)
        + b"data" + struct.pack("<I", len(raw)) + raw
    )
    data = b"RIFF" + struct.pack("<I", len(body)) + body
    y, sr = wavio.read_wav_bytes(data)
    assert sr == 48000
    np.testing.assert_allclose(
        y[0], np.array(vals, dtype=np.float64) / (1 << 23), atol=1e-7
    )


def test_mono_downmix_mean(tmp_path, rng):
    x = rng.standard_normal((2, 100)).astype(np.float32) * 0.2
    p = tmp_path / "st.wav"
    wavio.write_wav(p, x, 32000, subtype="FLOAT")
    m, _ = wavio.read_wav_mono(p)
    np.testing.assert_allclose(m, x.mean(axis=0), atol=1e-7)


def test_rejects_garbage():
    with pytest.raises(wavio.WavFormatError):
        wavio.read_wav_bytes(b"not a wav file at all")
