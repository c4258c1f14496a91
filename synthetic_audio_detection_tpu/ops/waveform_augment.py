"""On-device stochastic waveform augmentation for training.

The reference augments OFFLINE: audio_augmneter.py writes 11 fixed variants
of every file into the dataset, so a model sees the same perturbations every
epoch. This module complements that with fresh per-step draws INSIDE the
jitted train program — additive white noise at a random SNR and a random
low-pass FIR (acquisition-channel simulation) — motivated by the
leave-one-generator-out study (docs/PERFORMANCE.md): detectors key on
narrowband generator artifacts and transfer near-chance to unseen
generators, the classic overfit that train-time signal perturbation targets
in the anti-spoofing literature.

Everything is shape-static and float32; per-example parameters are drawn
inside the program, so no host round-trip and no recompiles. Disabled
(all probabilities 0) is a guaranteed no-op — the caller skips the call
entirely (train/steps.py), keeping existing trajectories bit-identical.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from synthetic_audio_detection_tpu.utils.config import SpecAugmentConfig


def lowpass_kernels(
    cutoffs_hz: jnp.ndarray, taps: int, sample_rate: int
) -> jnp.ndarray:
    """Per-example windowed-sinc low-pass FIRs.

    cutoffs_hz: [B] cutoff frequencies. Returns [B, taps] kernels:
    ``h[n] = 2 fc · sinc(2 fc (n - c)) · hann(n)``, sum-normalized so the
    DC gain is exactly 1 (a constant signal passes unchanged).
    """
    fc = (cutoffs_hz / sample_rate)[:, None]  # normalized cutoff, [B, 1]
    n = jnp.arange(taps, dtype=jnp.float32) - (taps - 1) / 2.0
    win = 0.5 - 0.5 * jnp.cos(2.0 * jnp.pi * jnp.arange(taps) / (taps - 1))
    h = 2.0 * fc * jnp.sinc(2.0 * fc * n) * win.astype(jnp.float32)
    return h / jnp.sum(h, axis=1, keepdims=True)


def _batched_same_conv(wav: jnp.ndarray, kernels: jnp.ndarray) -> jnp.ndarray:
    """Convolve each row of ``wav`` [B, T] with its own kernel [B, taps]
    ('same' padding) in ONE grouped conv: batch rides the feature-group axis
    so XLA lowers it as a single op instead of B host-unrolled convs."""
    b, t = wav.shape
    taps = kernels.shape[1]
    out = lax.conv_general_dilated(
        wav[None, :, :],                # [1, B, T]   (N, C, W)
        kernels[:, None, :],            # [B, 1, taps] (O, I, W)
        window_strides=(1,),
        padding=[((taps - 1) // 2, taps // 2)],
        feature_group_count=b,
        dimension_numbers=("NCH", "OIH", "NCH"),
    )
    return out[0]


def augment_waveforms(
    rng: jax.Array,
    wav: jnp.ndarray,
    cfg: SpecAugmentConfig,
    sample_rate: int,
) -> jnp.ndarray:
    """[B, T] float32 → [B, T]: random low-pass channel, then additive noise.

    Per example, independently:
      - with probability ``wave_lowpass_prob``: filter through a windowed-sinc
        low-pass at cutoff ~ U[wave_lowpass_hz] (channel/codec band-limit
        simulation);
      - with probability ``wave_noise_prob``: add white Gaussian noise at
        SNR ~ U[wave_snr_db] dB relative to the (post-channel) signal power.

    The physical order — channel first, additive noise at the receiver —
    and noise power referenced to the filtered signal, so a heavily
    band-limited example still gets its target SNR.
    """
    k_cut, k_lpm, k_snr, k_nm, k_noise = jax.random.split(rng, 5)
    b = wav.shape[0]
    out = wav.astype(jnp.float32)

    if cfg.wave_lowpass_prob > 0.0:
        lo, hi = cfg.wave_lowpass_hz
        cut = jax.random.uniform(k_cut, (b,), minval=lo, maxval=hi)
        filt = _batched_same_conv(out, lowpass_kernels(
            cut, cfg.wave_taps, sample_rate))
        m = jax.random.bernoulli(k_lpm, cfg.wave_lowpass_prob, (b,))
        out = jnp.where(m[:, None], filt, out)

    if cfg.wave_noise_prob > 0.0:
        lo, hi = cfg.wave_snr_db
        snr = jax.random.uniform(k_snr, (b,), minval=lo, maxval=hi)
        p_sig = jnp.mean(jnp.square(out), axis=1)
        sigma = jnp.sqrt(p_sig * jnp.power(10.0, -snr / 10.0) + 1e-20)
        noise = jax.random.normal(k_noise, out.shape) * sigma[:, None]
        m = jax.random.bernoulli(k_nm, cfg.wave_noise_prob, (b,))
        out = out + jnp.where(m[:, None], noise, 0.0)

    return out
