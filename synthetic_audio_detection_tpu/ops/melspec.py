"""Batched, jittable mel-spectrogram front end.

The reference computes mel spectrograms one clip at a time on CPU inside
DataLoader workers / the inference loop (reference: submodel_trainer.py:97-105,
189-203; inference_runner.py:157-174) via torchaudio's MelSpectrogram +
AmplitudeToDB. Here the whole front end is a single batched jitted function —
frame → Hann window → rFFT → power → mel matmul → dB → per-spectrogram
standardize → bilinear resize — designed so XLA fuses the elementwise stages
and maps the mel projection (and optionally the DFT itself) onto the MXU.

Numerical semantics reproduce torchaudio bit-for-bit in intent:
- Hann *periodic* window, center=True, reflect padding, power-2 spectrogram.
- Mel filterbank: HTK-scale triangles over linspace(0, sr/2) bins, optional
  'slaney' area normalization (the reference trains with norm=None and infers
  with norm='slaney' — SURVEY.md §2.3; both are supported here).
- AmplitudeToDB(top_db=80): 10*log10(clamp(x, 1e-10)) clamped from below at
  (per-spectrogram max − top_db).
- Standardization uses torch's *unbiased* std (ddof=1) with eps=1e-6
  (reference: submodel_trainer.py:199 `spec.std()` → unbiased).
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from synthetic_audio_detection_tpu.utils.config import SpectrogramConfig

_AMIN = 1e-10


# ---------------------------------------------------------------------------
# Mel filterbank (host-side constant, computed once per config)
# ---------------------------------------------------------------------------

def hz_to_mel(f: np.ndarray, mel_scale: str = "htk") -> np.ndarray:
    f = np.asarray(f, dtype=np.float64)
    if mel_scale == "htk":
        return 2595.0 * np.log10(1.0 + f / 700.0)
    # slaney scale: linear below 1 kHz, log above
    f_min, f_sp = 0.0, 200.0 / 3
    mels = (f - f_min) / f_sp
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = math.log(6.4) / 27.0
    return np.where(f >= min_log_hz, min_log_mel + np.log(f / min_log_hz) / logstep, mels)


def mel_to_hz(m: np.ndarray, mel_scale: str = "htk") -> np.ndarray:
    m = np.asarray(m, dtype=np.float64)
    if mel_scale == "htk":
        return 700.0 * (10.0 ** (m / 2595.0) - 1.0)
    f_min, f_sp = 0.0, 200.0 / 3
    freqs = f_min + f_sp * m
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = math.log(6.4) / 27.0
    return np.where(m >= min_log_mel, min_log_hz * np.exp(logstep * (m - min_log_mel)), freqs)


@functools.lru_cache(maxsize=16)
def mel_filterbank(
    n_freqs: int,
    f_min: float,
    f_max: float,
    n_mels: int,
    sample_rate: int,
    norm: Optional[str] = None,
    mel_scale: str = "htk",
) -> np.ndarray:
    """Triangular mel filterbank, shape [n_freqs, n_mels], float32.

    Matches torchaudio.functional.melscale_fbanks (used by the reference's
    MelSpectrogram at submodel_trainer.py:97-103).
    """
    all_freqs = np.linspace(0.0, sample_rate / 2.0, n_freqs)
    m_min = hz_to_mel(f_min, mel_scale)
    m_max = hz_to_mel(f_max, mel_scale)
    m_pts = np.linspace(m_min, m_max, n_mels + 2)
    f_pts = mel_to_hz(m_pts, mel_scale)

    f_diff = f_pts[1:] - f_pts[:-1]                       # [n_mels+1]
    slopes = f_pts[None, :] - all_freqs[:, None]          # [n_freqs, n_mels+2]
    down = -slopes[:, :-2] / f_diff[:-1]                  # rising edge
    up = slopes[:, 2:] / f_diff[1:]                       # falling edge
    fb = np.maximum(0.0, np.minimum(down, up))

    if norm == "slaney":
        enorm = 2.0 / (f_pts[2 : n_mels + 2] - f_pts[:n_mels])
        fb = fb * enorm[None, :]
    elif norm is not None:
        raise ValueError(f"unsupported mel norm: {norm!r}")
    return fb.astype(np.float32)


@functools.lru_cache(maxsize=8)
def hann_window(win_length: int) -> np.ndarray:
    """Periodic Hann window (torch.hann_window(periodic=True))."""
    n = np.arange(win_length, dtype=np.float64)
    return (0.5 * (1.0 - np.cos(2.0 * np.pi * n / win_length))).astype(np.float32)


# ---------------------------------------------------------------------------
# Framing + spectrogram (device-side)
# ---------------------------------------------------------------------------

def frame_signal(x: jnp.ndarray, n_fft: int, hop: int, center: bool, pad_mode: str) -> jnp.ndarray:
    """[B, T] → [B, n_frames, n_fft] frames.

    When hop divides n_fft and the padded length is a hop multiple (true for
    the 4 s / 32 kHz / 2048 / 512 defaults), framing lowers to pure reshapes +
    static slices — no gather, fully layout-friendly for XLA:TPU.
    """
    if center:
        pad = n_fft // 2
        x = jnp.pad(x, ((0, 0), (pad, pad)), mode=pad_mode)
    B, T = x.shape
    n_frames = 1 + (T - n_fft) // hop
    if n_fft % hop == 0 and T % hop == 0:
        r = x.reshape(B, T // hop, hop)
        k = n_fft // hop
        parts = [r[:, i : i + n_frames, :] for i in range(k)]
        return jnp.concatenate(parts, axis=2)
    idx = (jnp.arange(n_frames)[:, None] * hop + jnp.arange(n_fft)[None, :])
    return x[:, idx]


def power_spectrogram(
    frames: jnp.ndarray, window: jnp.ndarray, power: float = 2.0
) -> jnp.ndarray:
    """[B, n_frames, n_fft] → [B, n_frames, n_fft//2+1] power spectrogram via rFFT."""
    xw = frames * window[None, None, :]
    spec = jnp.fft.rfft(xw.astype(jnp.float32), axis=-1)
    p = jnp.real(spec) ** 2 + jnp.imag(spec) ** 2
    if power != 2.0:
        p = p ** (power / 2.0)
    return p


def significant_bins(fb: np.ndarray, rel_tol: float = 1e-7) -> int:
    """Number of leading frequency bins carrying non-negligible mel weight.

    The triangle filters end exactly at f_max, so the bin sitting on f_max
    should weigh 0 — but the mel↔Hz round trip leaves ~1e-15 of float dust
    there (row 768 weighs 6.5e-15 at the 32 kHz / f_max=12 kHz defaults),
    which a strict nonzero test counts, pushing the GEMM-DFT from 768 to 769
    columns and — after lane alignment — to 896 (+14% DFT FLOPs for a bin
    whose contribution is below f32 resolution). Thresholding at
    ``rel_tol × max(row_sum)`` drops only such dust rows."""
    row_sums = fb.sum(axis=1)
    keep = np.nonzero(row_sums > rel_tol * row_sums.max())[0]
    return int(keep[-1]) + 1


@functools.lru_cache(maxsize=8)
def _dft_matrices(n_fft: int, n_cols: int) -> tuple:
    """Real/imag DFT matrices [n_fft, n_cols] for the GEMM-native (MXU) path."""
    k = np.arange(n_cols)[None, :]
    n = np.arange(n_fft)[:, None]
    ang = -2.0 * np.pi * n * k / n_fft
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


def power_spectrogram_gemm(
    frames: jnp.ndarray,
    window: jnp.ndarray,
    n_cols: int,
    power: float = 2.0,
    dtype: jnp.dtype = jnp.float32,
) -> jnp.ndarray:
    """GEMM-native DFT: computes only the first `n_cols` rFFT bins as two real
    matmuls so the whole front end rides the MXU (no XLA FFT op). With
    f_max=12 kHz only bins < 770 of 1025 carry mel energy, so this does less
    work than a full rFFT while matching it numerically (float tolerance).
    """
    n_fft = frames.shape[-1]
    cos_m, sin_m = _dft_matrices(n_fft, n_cols)
    xw = (frames * window[None, None, :]).astype(dtype)
    re = jnp.einsum("btn,nk->btk", xw, jnp.asarray(cos_m, dtype),
                    preferred_element_type=jnp.float32)
    im = jnp.einsum("btn,nk->btk", xw, jnp.asarray(sin_m, dtype),
                    preferred_element_type=jnp.float32)
    p = re * re + im * im
    if power != 2.0:
        p = p ** (power / 2.0)
    return p


def amplitude_to_db(x: jnp.ndarray, top_db: Optional[float] = 80.0) -> jnp.ndarray:
    """Power → dB with torchaudio AmplitudeToDB(stype='power') semantics:
    10*log10(clamp(x, 1e-10)), then clamp at (max over each spectrogram's
    freq×time plane − top_db)."""
    x_db = 10.0 * jnp.log10(jnp.maximum(x, _AMIN))
    if top_db is not None:
        ref = jnp.max(x_db, axis=(-2, -1), keepdims=True) - top_db
        x_db = jnp.maximum(x_db, ref)
    return x_db


def standardize(x: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """Per-spectrogram (x - mean) / (std + eps) with unbiased std, matching
    torch `spec.std()` in the reference (submodel_trainer.py:199)."""
    axes = tuple(range(1, x.ndim))
    n = math.prod(x.shape[1:])
    mean = jnp.mean(x, axis=axes, keepdims=True)
    var = jnp.sum((x - mean) ** 2, axis=axes, keepdims=True) / max(n - 1, 1)
    return (x - mean) / (jnp.sqrt(var) + eps)


# ---------------------------------------------------------------------------
# Full front end
# ---------------------------------------------------------------------------

def mel_spectrogram(
    waveforms: jnp.ndarray,
    cfg: SpectrogramConfig,
    sample_rate: int = 32_000,
    use_gemm_dft: bool = False,
) -> jnp.ndarray:
    """[B, T] waveforms → [B, n_mels, n_frames] power-mel spectrograms."""
    frames = frame_signal(waveforms, cfg.n_fft, cfg.hop_length, cfg.center, cfg.pad_mode)
    window = jnp.asarray(hann_window(cfg.win))
    fb_np = mel_filterbank(
        cfg.n_freqs, cfg.f_min, cfg.f_max, cfg.n_mels, sample_rate,
        cfg.mel_norm, cfg.mel_scale,
    )
    if use_gemm_dft:
        # Only bins with significant mel weight contribute (host-side, static).
        n_cols = significant_bins(fb_np)
        p = power_spectrogram_gemm(frames, window, n_cols, cfg.power)
        fb = jnp.asarray(fb_np[:n_cols])
    else:
        p = power_spectrogram(frames, window, cfg.power)
        fb = jnp.asarray(fb_np)
    mel = jnp.einsum("btf,fm->btm", p, fb, preferred_element_type=jnp.float32)
    return jnp.transpose(mel, (0, 2, 1))


def finalize_features(z: jnp.ndarray, cfg: SpectrogramConfig) -> jnp.ndarray:
    """Standardized [B, n_mels, n_frames] log-mel → the model-input image.

    Square modes bilinearly resize to [out_size, out_size] (the reference's
    torchvision Resize, inference_runner.py:172). NATIVE mode (out_size=0)
    keeps the mel at its true resolution and only zero-pads the frame axis up
    to the next multiple of 128 (251 → 256 at the 4 s defaults) — zero IS the
    per-spectrogram mean after standardization, so the pad is neutral and the
    interpolation the reference does for its ImageNet backbones is skipped
    entirely."""
    if cfg.is_native:
        w = -(-z.shape[2] // 128) * 128
        return jnp.pad(z, ((0, 0), (0, 0), (0, w - z.shape[2])))
    return jax.image.resize(
        z, (z.shape[0], cfg.out_size, cfg.out_size), method="linear"
    )


def log_mel_features(
    waveforms: jnp.ndarray,
    cfg: SpectrogramConfig,
    sample_rate: int = 32_000,
    use_gemm_dft: bool = False,
    resize: bool = True,
    out_dtype: jnp.dtype = jnp.float32,
) -> jnp.ndarray:
    """Full reference front end: [B, T] → [B, H, W] standardized log-mel
    images (single channel; the reference's `repeat(3,1,1)` is folded into the
    model's first conv — see models.resnet.fold_rgb_conv — since all three
    channels are identical copies). H = W = cfg.out_size, or the native
    [n_mels, padded-frames] shape when cfg.is_native."""
    mel = mel_spectrogram(waveforms, cfg, sample_rate, use_gemm_dft)
    db = amplitude_to_db(mel, cfg.top_db)
    z = standardize(db, cfg.eps)
    if resize:
        z = finalize_features(z, cfg)
    return z.astype(out_dtype)


def replicate_channels(x: jnp.ndarray, channels: int = 3) -> jnp.ndarray:
    """[B, H, W] → [B, H, W, C] by replication (NHWC; reference uses
    `repeat(3,1,1)` NCHW at submodel_trainer.py:203)."""
    return jnp.broadcast_to(x[..., None], (*x.shape, channels))
