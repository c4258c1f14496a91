"""Independent NumPy oracles for DSP parity tests.

These re-state the *documented* torchaudio semantics (the reference's front
end, SURVEY.md §2.3) in plain NumPy, deliberately written differently from the
JAX implementations (per-frame Python loops, np.fft) so that agreement is
meaningful. torchaudio itself is not installed in this environment.
"""

from __future__ import annotations

import numpy as np


def hann_periodic(n: int) -> np.ndarray:
    return 0.5 * (1.0 - np.cos(2.0 * np.pi * np.arange(n) / n))


def stft_power_oracle(x: np.ndarray, n_fft: int, hop: int) -> np.ndarray:
    """Single waveform [T] → power spectrogram [n_freqs, n_frames]; center
    reflect padding, periodic Hann, power 2."""
    pad = n_fft // 2
    xp = np.pad(x, (pad, pad), mode="reflect")
    n_frames = 1 + (len(xp) - n_fft) // hop
    w = hann_periodic(n_fft)
    out = np.empty((n_fft // 2 + 1, n_frames), dtype=np.float64)
    for t in range(n_frames):
        seg = xp[t * hop : t * hop + n_fft] * w
        spec = np.fft.rfft(seg)
        out[:, t] = np.abs(spec) ** 2
    return out


def mel_fb_oracle(
    n_freqs: int, f_min: float, f_max: float, n_mels: int, sr: int, norm=None
) -> np.ndarray:
    """HTK-scale triangular filterbank [n_freqs, n_mels], torchaudio layout."""
    def hz2mel(f):
        return 2595.0 * np.log10(1.0 + np.asarray(f, float) / 700.0)

    def mel2hz(m):
        return 700.0 * (10.0 ** (np.asarray(m, float) / 2595.0) - 1.0)

    freqs = np.linspace(0, sr / 2, n_freqs)
    pts = mel2hz(np.linspace(hz2mel(f_min), hz2mel(f_max), n_mels + 2))
    fb = np.zeros((n_freqs, n_mels))
    for m in range(n_mels):
        lo, c, hi = pts[m], pts[m + 1], pts[m + 2]
        for i, f in enumerate(freqs):
            if lo <= f <= c and c > lo:
                fb[i, m] = (f - lo) / (c - lo)
            elif c < f <= hi and hi > c:
                fb[i, m] = (hi - f) / (hi - c)
        if norm == "slaney":
            fb[:, m] *= 2.0 / (hi - lo)
    return fb


def amplitude_to_db_oracle(x: np.ndarray, top_db: float = 80.0) -> np.ndarray:
    db = 10.0 * np.log10(np.maximum(x, 1e-10))
    return np.maximum(db, db.max() - top_db)


def melspec_oracle(x: np.ndarray, sr=32000, n_fft=2048, hop=512, n_mels=128,
                   f_min=20.0, f_max=12000.0, norm=None) -> np.ndarray:
    """Full mel pipeline for one waveform → [n_mels, n_frames] power mel."""
    p = stft_power_oracle(x, n_fft, hop)
    fb = mel_fb_oracle(n_fft // 2 + 1, f_min, f_max, n_mels, sr, norm)
    return fb.T @ p


def standardize_oracle(x: np.ndarray, eps=1e-6) -> np.ndarray:
    """(x - mean) / (unbiased std + eps) over all elements."""
    std = x.std(ddof=1)
    return (x - x.mean()) / (std + eps)
