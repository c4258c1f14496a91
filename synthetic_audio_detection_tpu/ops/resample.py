"""Polyphase windowed-sinc resampler (torchaudio.transforms.Resample semantics).

The reference resamples on the fly with torchaudio's bandlimited sinc
interpolation (reference: submodel_trainer.py:151-153,
inference_runner.py:147-149; defaults lowpass_filter_width=6, rolloff=0.99,
Hann window). This implements the same algorithm as a strided 1-D convolution:
one kernel bank of `new_g` polyphase filters applied with stride `orig_g`,
which XLA lowers to an MXU-friendly conv. Kernels are computed host-side once
per (orig, new) pair and cached.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=32)
def _sinc_kernels(
    orig_freq: int,
    new_freq: int,
    lowpass_filter_width: int = 6,
    rolloff: float = 0.99,
) -> tuple:
    """Returns (kernels [new_g, 1, L], width, orig_g, new_g)."""
    g = math.gcd(int(orig_freq), int(new_freq))
    orig_g, new_g = int(orig_freq) // g, int(new_freq) // g
    base_freq = min(orig_g, new_g) * rolloff
    width = math.ceil(lowpass_filter_width * orig_g / base_freq)

    idx = np.arange(-width, width + orig_g, dtype=np.float64)[None, :] / orig_g
    t = (-np.arange(new_g, dtype=np.float64)[:, None] / new_g + idx) * base_freq
    t = np.clip(t, -lowpass_filter_width, lowpass_filter_width)

    # Hann-windowed sinc
    window = np.cos(t * np.pi / lowpass_filter_width / 2.0) ** 2
    t_pi = t * np.pi
    kernel = np.where(t == 0.0, 1.0, np.sin(t_pi) / np.where(t_pi == 0.0, 1.0, t_pi))
    kernels = (kernel * window * base_freq / orig_g).astype(np.float32)
    return kernels[:, None, :], width, orig_g, new_g


def resample(
    waveform: jnp.ndarray,
    orig_freq: int,
    new_freq: int,
    lowpass_filter_width: int = 6,
    rolloff: float = 0.99,
) -> jnp.ndarray:
    """Resample [..., T] → [..., ceil(T * new/orig)].

    Matches torchaudio's `sinc_interp_hann` resampling numerically (same
    polyphase kernel construction) without any torch dependency.
    """
    if orig_freq == new_freq:
        return waveform
    kernels_np, width, orig_g, new_g = _sinc_kernels(
        orig_freq, new_freq, lowpass_filter_width, rolloff
    )
    kernels = jnp.asarray(kernels_np)  # [new_g, 1, L]

    shape = waveform.shape
    T = shape[-1]
    x = waveform.reshape(-1, 1, T)
    # pad: `width` zeros left, `width + orig_g` right (covers the final frame)
    x = jnp.pad(x, ((0, 0), (0, 0), (width, width + orig_g)))
    # conv with stride orig_g: output [B, new_g, K]
    y = jax.lax.conv_general_dilated(
        x,
        kernels,
        window_strides=(orig_g,),
        padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
    )
    # interleave phases: out[k * new_g + i] = y[i, k]
    B, P, K = y.shape
    out = jnp.transpose(y, (0, 2, 1)).reshape(B, K * P)
    target_len = int(math.ceil(new_g * T / orig_g))
    out = out[:, :target_len]
    return out.reshape(*shape[:-1], target_len)


def resample_np(waveform: np.ndarray, orig_freq: int, new_freq: int, **kw) -> np.ndarray:
    """NumPy host-side variant (for offline ETL where no device is involved)."""
    return np.asarray(resample(jnp.asarray(waveform, jnp.float32), orig_freq, new_freq, **kw))


_jit_resample = jax.jit(resample, static_argnums=(1, 2))


def resample_bucketed(
    waveform: np.ndarray,
    orig_freq: int,
    new_freq: int,
    bucket_seconds: float = 60.0,
) -> np.ndarray:
    """Device-jitted resample for arbitrary-length HOST waveforms on the
    serving path (reference: inference_runner.py:147-149 resamples on the
    fly). The input is zero-padded up to a multiple of ``bucket_seconds`` so
    each (orig, new, bucket-count) shape compiles exactly once — the repo's
    static-shape serving convention; arbitrary lengths through a bare jit
    would recompile per clip. Zero padding is mathematically
    exact (the polyphase conv already zero-pads its tail), so trimming to
    ceil(T·new/orig) reproduces ``resample`` on the unpadded signal to float
    tolerance (XLA may reassociate the conv reduction across shapes).

    Measured on the v5e (benchmarks/e2e_pipeline.py --device-resample): the
    host polyphase twin is upload-bound-cheaper on this tunneled rig; this
    path exists for PCIe-attached hosts where device FLOPs are closer than
    host BLAS."""
    waveform = np.asarray(waveform, np.float32)
    if orig_freq == new_freq:
        return waveform
    T = waveform.shape[-1]
    bucket = max(int(bucket_seconds * orig_freq), 1)
    padded = -(-T // bucket) * bucket
    x = np.pad(waveform, [(0, 0)] * (waveform.ndim - 1) + [(0, padded - T)])
    y = np.asarray(_jit_resample(jnp.asarray(x), int(orig_freq), int(new_freq)))
    g = math.gcd(int(orig_freq), int(new_freq))
    target = int(math.ceil(int(new_freq) // g * T / (int(orig_freq) // g)))
    return y[..., :target]
