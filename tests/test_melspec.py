"""Front-end parity tests vs independent NumPy oracles (SURVEY.md §4 plan b)."""

import numpy as np
import jax.numpy as jnp
import pytest

from synthetic_audio_detection_tpu.ops import melspec as M
from synthetic_audio_detection_tpu.utils.config import SpectrogramConfig

import oracles


def test_hann_window_matches_oracle():
    np.testing.assert_allclose(
        M.hann_window(2048), oracles.hann_periodic(2048), atol=1e-7
    )


def test_mel_filterbank_htk_matches_oracle():
    fb = M.mel_filterbank(1025, 20.0, 12000.0, 128, 32000, None, "htk")
    fb_o = oracles.mel_fb_oracle(1025, 20.0, 12000.0, 128, 32000, None)
    np.testing.assert_allclose(fb, fb_o, atol=1e-6)


def test_mel_filterbank_slaney_norm_matches_oracle():
    fb = M.mel_filterbank(1025, 20.0, 12000.0, 128, 32000, "slaney", "htk")
    fb_o = oracles.mel_fb_oracle(1025, 20.0, 12000.0, 128, 32000, "slaney")
    np.testing.assert_allclose(fb, fb_o, atol=1e-6)


def test_frame_signal_reshape_path_equals_gather(rng):
    x = rng.standard_normal((2, 128000)).astype(np.float32)
    frames = M.frame_signal(jnp.asarray(x), 2048, 512, True, "reflect")
    assert frames.shape == (2, 251, 2048)
    # cross-check first/last frames against manual padding
    pad = np.pad(x[0], (1024, 1024), mode="reflect")
    np.testing.assert_allclose(frames[0, 0], pad[:2048], atol=0)
    np.testing.assert_allclose(frames[0, 250], pad[250 * 512 : 250 * 512 + 2048], atol=0)


@pytest.mark.parametrize("norm", [None, "slaney"])
def test_mel_spectrogram_matches_oracle(rng, norm):
    x = rng.standard_normal((1, 32000)).astype(np.float32) * 0.3
    cfg = SpectrogramConfig(mel_norm=norm)
    mel = np.asarray(M.mel_spectrogram(jnp.asarray(x), cfg))
    mel_o = oracles.melspec_oracle(x[0].astype(np.float64), norm=norm)
    assert mel.shape == (1, 128, 63)
    np.testing.assert_allclose(mel[0], mel_o, rtol=1e-3, atol=1e-5)


def test_gemm_dft_matches_fft_path(rng):
    x = rng.standard_normal((2, 32000)).astype(np.float32) * 0.1
    cfg = SpectrogramConfig()
    a = np.asarray(M.mel_spectrogram(jnp.asarray(x), cfg, use_gemm_dft=False))
    b = np.asarray(M.mel_spectrogram(jnp.asarray(x), cfg, use_gemm_dft=True))
    np.testing.assert_allclose(a, b, rtol=2e-2, atol=1e-4)


def test_factored_dft_matches_fft_path(rng):
    """Shared-hop-block DFT + frequency-domain Hann ≡ rFFT + time-domain
    Hann (exact identity up to float association)."""
    x = rng.standard_normal((2, 32000)).astype(np.float32) * 0.1
    cfg = SpectrogramConfig()
    a = np.asarray(M.mel_spectrogram(jnp.asarray(x), cfg, dft_mode="fft"))
    b = np.asarray(M.mel_spectrogram(jnp.asarray(x), cfg, dft_mode="factored"))
    np.testing.assert_allclose(a, b, rtol=2e-2, atol=1e-4)


def test_amplitude_to_db_top_db_per_item(rng):
    x = np.abs(rng.standard_normal((2, 8, 16))).astype(np.float32)
    x[1] *= 1e9  # very different dynamic ranges per item
    db = np.asarray(M.amplitude_to_db(jnp.asarray(x), 80.0))
    for i in range(2):
        np.testing.assert_allclose(
            db[i], oracles.amplitude_to_db_oracle(x[i].astype(np.float64)),
            rtol=1e-5, atol=1e-4,
        )


def test_standardize_unbiased_std(rng):
    x = rng.standard_normal((3, 128, 251)).astype(np.float32)
    z = np.asarray(M.standardize(jnp.asarray(x)))
    for i in range(3):
        np.testing.assert_allclose(
            z[i], oracles.standardize_oracle(x[i].astype(np.float64)),
            rtol=1e-4, atol=1e-5,
        )


def test_log_mel_features_shape_and_finiteness(rng):
    x = rng.standard_normal((4, 128000)).astype(np.float32) * 0.2
    z = np.asarray(M.log_mel_features(jnp.asarray(x), SpectrogramConfig.inference()))
    assert z.shape == (4, 512, 512)
    assert np.isfinite(z).all()
    # standardized before resize: near zero mean
    assert abs(float(z.mean())) < 0.1


def test_resize_matches_torch_bilinear(rng):
    """jax.image.resize('linear') upscaling must equal torch F.interpolate
    bilinear align_corners=False (what torchvision Resize uses on tensors,
    reference: submodel_trainer.py:200)."""
    import torch
    import jax

    x = rng.standard_normal((1, 1, 128, 251)).astype(np.float32)
    t = torch.nn.functional.interpolate(
        torch.from_numpy(x), size=(512, 512), mode="bilinear",
        align_corners=False, antialias=False,
    ).numpy()
    j = np.asarray(
        jax.image.resize(jnp.asarray(x), (1, 1, 512, 512), method="linear")
    )
    np.testing.assert_allclose(j, t, rtol=1e-4, atol=1e-5)
