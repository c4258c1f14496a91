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


def hop_block_phases(n_fft: int, hop: int, n_cols: int) -> tuple:
    """Per-strip combine phases for the factored (shared-block) DFT.

    Frame t's full-window DFT decomposes over its k = n_fft/hop hop-blocks:
        X_t[f] = sum_i exp(-2pij * i*hop*f / n_fft) * Y[t+i, f]
    where Y[h, f] is hop-block h's 512-sample DFT evaluated at the FULL
    n_fft-point frequencies (rows [:hop] of the standard DFT matrix) — so
    each block transform is shared by all k overlapping frames that contain
    it. Returns (a, b) with a[i, f] + j*b[i, f] = exp(-2pij*i*hop*f/n_fft);
    the phase depends only on f mod k, so entries are in {0, ±1} for k=4.
    """
    k4 = n_fft // hop
    f = np.arange(n_cols) % k4
    i = np.arange(k4)[:, None]
    ang = 2.0 * np.pi * i * f[None, :] / k4
    return np.cos(ang).astype(np.float32), (-np.sin(ang)).astype(np.float32)


def power_spectrogram_factored(
    waveforms: jnp.ndarray,
    cfg,
    n_cols: int,
    power: float = 2.0,
    dtype: jnp.dtype = jnp.float32,
) -> jnp.ndarray:
    """[B, T] → [B, n_frames, n_cols] power spectrogram via the factored
    (Cooley-Tukey style) GEMM DFT with the Hann window applied in frequency.

    With hop | n_fft, consecutive frames share all but one of their hop
    blocks, so the per-frame [n_fft, 2*n_cols] matmul of
    power_spectrogram_gemm redoes n_fft/hop ≈ 4x work the previous frame
    already did. Here each hop block rides ONE [hop, 2*(n_cols+1)] matmul
    (4x fewer MACs at the 2048/512 reference geometry), frames are then
    assembled by the {0, ±1} phase masks of hop_block_phases (elementwise),
    and the periodic-Hann window — a 3-tap kernel in frequency — is applied
    exactly as  Xw[f] = 0.5*X[f] − 0.25*X[f−1] − 0.25*X[f+1]  (circular;
    X[−1] = conj(X[1]) for real input). Matches power_spectrogram (rFFT,
    time-domain window) to float tolerance; pinned in tests/test_melspec.py.
    """
    n_fft, hop = cfg.n_fft, cfg.hop_length
    if n_fft % hop or cfg.win != n_fft or not cfg.center:
        raise ValueError("factored DFT requires hop | n_fft == win, center")
    k4 = n_fft // hop
    pad = n_fft // 2
    x = jnp.pad(waveforms, ((0, 0), (pad, pad)), mode=cfg.pad_mode)
    T = x.shape[1]
    n_frames = 1 + (T - n_fft) // hop
    if T % hop:
        x = jnp.pad(x, ((0, 0), (0, hop - T % hop)))
    blocks = x.reshape(x.shape[0], -1, hop)
    nraw = n_cols + 1  # one guard bin feeds the window conv's f+1 tap
    cos_m, sin_m = _dft_matrices(n_fft, nraw)
    bl = blocks.astype(dtype)
    y_re = jnp.einsum("bhr,rf->bhf", bl, jnp.asarray(cos_m[:hop], dtype),
                      preferred_element_type=jnp.float32)
    y_im = jnp.einsum("bhr,rf->bhf", bl, jnp.asarray(sin_m[:hop], dtype),
                      preferred_element_type=jnp.float32)
    a_np, b_np = hop_block_phases(n_fft, hop, nraw)
    x_re = jnp.zeros_like(y_re[:, :n_frames])
    x_im = jnp.zeros_like(x_re)
    for i in range(k4):
        a = jnp.asarray(a_np[i]); b = jnp.asarray(b_np[i])
        yr = jax.lax.slice_in_dim(y_re, i, i + n_frames, axis=1)
        yi = jax.lax.slice_in_dim(y_im, i, i + n_frames, axis=1)
        x_re = x_re + a * yr - b * yi
        x_im = x_im + a * yi + b * yr
    # periodic Hann = 0.5 − 0.25e^{+jw} − 0.25e^{−jw}  ⇒  3-tap conv in f
    r_re = jnp.concatenate([x_re[..., 1:2], x_re[..., : n_cols - 1]], -1)
    r_im = jnp.concatenate([-x_im[..., 1:2], x_im[..., : n_cols - 1]], -1)
    l_re = x_re[..., 1 : n_cols + 1]
    l_im = x_im[..., 1 : n_cols + 1]
    w_re = 0.5 * x_re[..., :n_cols] - 0.25 * (r_re + l_re)
    w_im = 0.5 * x_im[..., :n_cols] - 0.25 * (r_im + l_im)
    p = w_re * w_re + w_im * w_im
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
    dft_mode: Optional[str] = None,
) -> jnp.ndarray:
    """[B, T] waveforms → [B, n_mels, n_frames] power-mel spectrograms.

    dft_mode: 'fft' (XLA rFFT op), 'gemm' (direct GEMM DFT over the ≤f_max
    bins), or 'factored' (shared hop-block GEMM DFT, ~4x fewer MACs). When
    None, use_gemm_dft selects between 'gemm' and 'fft' (back-compat)."""
    mode = dft_mode or ("gemm" if use_gemm_dft else "fft")
    fb_np = mel_filterbank(
        cfg.n_freqs, cfg.f_min, cfg.f_max, cfg.n_mels, sample_rate,
        cfg.mel_norm, cfg.mel_scale,
    )
    if mode == "factored":
        n_cols = significant_bins(fb_np)
        p = power_spectrogram_factored(waveforms, cfg, n_cols, cfg.power)
        fb = jnp.asarray(fb_np[:n_cols])
        mel = jnp.einsum("btf,fm->btm", p, fb, preferred_element_type=jnp.float32)
        return jnp.transpose(mel, (0, 2, 1))
    frames = frame_signal(waveforms, cfg.n_fft, cfg.hop_length, cfg.center, cfg.pad_mode)
    window = jnp.asarray(hann_window(cfg.win))
    if mode == "gemm":
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
