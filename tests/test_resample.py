"""Resampler correctness: spectral fidelity + bandlimiting properties."""

import numpy as np
import jax.numpy as jnp

from synthetic_audio_detection_tpu.ops.resample import resample


def _tone(freq, sr, seconds=1.0):
    t = np.arange(int(sr * seconds)) / sr
    return np.sin(2 * np.pi * freq * t).astype(np.float32)


def test_output_length():
    x = jnp.zeros(44100)
    y = resample(x, 44100, 32000)
    assert y.shape == (32000,)
    y2 = resample(jnp.zeros((3, 22050)), 22050, 32000)
    assert y2.shape == (3, 32000)


def test_identity_when_equal_rates():
    x = jnp.asarray(np.random.default_rng(1).standard_normal(1000), jnp.float32)
    assert resample(x, 32000, 32000) is x


def test_tone_preserved_44k_to_32k():
    sr_in, sr_out, f = 44100, 32000, 1000.0
    x = _tone(f, sr_in)
    y = np.asarray(resample(jnp.asarray(x), sr_in, sr_out))
    # measure the dominant frequency & amplitude in the interior (skip edges)
    yi = y[2000:-2000]
    spec = np.abs(np.fft.rfft(yi * np.hanning(len(yi))))
    peak = np.argmax(spec) * sr_out / len(yi)
    assert abs(peak - f) < 5.0
    assert abs(np.max(np.abs(yi)) - 1.0) < 0.02


def test_upsample_then_downsample_roundtrip():
    rng = np.random.default_rng(2)
    # bandlimited noise: lowpass white noise by FFT truncation below 8 kHz
    x = rng.standard_normal(32000).astype(np.float32)
    X = np.fft.rfft(x)
    X[8000:] = 0
    x = np.fft.irfft(X).astype(np.float32)
    # default filter width 6 (torchaudio's default quality) — modest error
    up = resample(jnp.asarray(x), 32000, 48000)
    down = np.asarray(resample(up, 48000, 32000))
    err = np.abs(down[1000:-1000] - x[1000:-1000])
    assert err.max() < 1e-2
    # wide filter — near-perfect reconstruction proves kernel correctness
    up = resample(jnp.asarray(x), 32000, 48000, lowpass_filter_width=64)
    down = np.asarray(resample(up, 48000, 32000, lowpass_filter_width=64))
    err = np.abs(down[2000:-2000] - x[2000:-2000])
    assert err.max() < 1e-4


def test_aliasing_rejected():
    # 20 kHz tone at 44.1k is above the 16 kHz Nyquist of 32k: must be attenuated
    x = _tone(20000.0, 44100)
    y = np.asarray(resample(jnp.asarray(x), 44100, 32000))
    assert np.abs(y[2000:-2000]).max() < 0.05


def test_dc_preserved():
    x = jnp.ones(10000, jnp.float32) * 0.5
    y = np.asarray(resample(x, 48000, 32000))
    np.testing.assert_allclose(y[100:-100], 0.5, atol=1e-3)


def test_bucketed_matches_unbucketed_exactly():
    """resample_bucketed (serving-path static-shape variant) reproduces
    resample on the unpadded signal at odd lengths (zero-padding is
    mathematically exact; XLA may reassociate the conv reduction across
    different compiled shapes, so agreement is float-tolerance, not
    bitwise), and the output length matches the ceil(T*new/orig)
    contract."""
    from synthetic_audio_detection_tpu.ops.resample import resample_bucketed

    rng = np.random.default_rng(5)
    for T in (44_100 * 3 + 17, 44_100 // 2, 44_100 * 7):
        x = (rng.standard_normal(T) * 0.3).astype(np.float32)
        direct = np.asarray(resample(jnp.asarray(x), 44_100, 32_000))
        bucketed = resample_bucketed(x, 44_100, 32_000, bucket_seconds=2.0)
        assert bucketed.shape == direct.shape
        np.testing.assert_allclose(bucketed, direct, atol=2e-6, rtol=1e-5)
    # same-rate passthrough
    x = (rng.standard_normal(1000) * 0.3).astype(np.float32)
    np.testing.assert_array_equal(resample_bucketed(x, 32_000, 32_000), x)
