"""Legacy 5-class audio analyzer (the richer inference path the modular
runner dropped — reference legacy/source/inference_script.py).

Feature set reproduced:
- audio normalization: mean-subtract → peak-normalize → RMS 0.2 rescale
  (:138-147); <4 s files zero-pad to 5 s (:165-172)
- 85% window overlap, silence gate 1e-4 (:46-47, :248)
- per-window softmax → per-class sensitivity rescale → renormalize
  (:85-92, :191-195)
- smoothing: Gaussian σ=2 per class → row renorm → argmax → median filter
  k=5 → low-confidence windows fall back to the majority class (:197-217)
- run-length merge of equal-label windows, kept when mean confidence ≥ 0.45,
  segments carry a confidence field (:219-242)
- batch-folder mode (--IsBatch, :428-451)

TPU-native design: window batches run through ONE jitted mel+model program
(batched, bf16-capable), mirroring the legacy AMP batching (:276-283); the
smoothing/median/merge post-processing operates on [num_windows, C] host
arrays (tiny) with jitted filters available in ops.filters.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from synthetic_audio_detection_tpu.audio import wavio
from synthetic_audio_detection_tpu.models.classifier import BinaryClassifier
from synthetic_audio_detection_tpu.ops import melspec
from synthetic_audio_detection_tpu.ops.filters import gaussian_filter1d, median_filter1d
from synthetic_audio_detection_tpu.utils.config import SpectrogramConfig


DEFAULT_CLASSES = ["Class1", "Class2", "Class3", "Class4", "Class5"]


@dataclasses.dataclass
class LegacyAudioConfig:
    """legacy/source/inference_script.py:41-49 defaults."""

    target_sample_rate: int = 32_000
    window_size: float = 4.0
    overlap: float = 0.85
    silence_threshold: float = 1e-4
    normalize_audio: bool = True
    batch_size: int = 256

    @property
    def window_samples(self) -> int:
        return int(self.window_size * self.target_sample_rate)

    @property
    def hop_samples(self) -> int:
        return max(int((1.0 - self.overlap) * self.window_samples), 1)


def normalize_audio(waveform: np.ndarray, target_rms: float = 0.2) -> np.ndarray:
    """mean-subtract → peak normalize → RMS rescale (:138-147)."""
    wf = waveform - waveform.mean()
    peak = np.abs(wf).max()
    if peak > 0:
        wf = wf / peak
    rms = float(np.sqrt(np.mean(wf**2)))
    if rms > 0:
        wf = wf * (target_rms / rms)
    return wf


class LegacyAudioAnalyzer:
    """5-class analyzer over a single multi-class model."""

    def __init__(
        self,
        model: BinaryClassifier,
        variables: Any,
        classes: Optional[Sequence[str]] = None,
        audio: Optional[LegacyAudioConfig] = None,
        sensitivity_factors: Optional[Dict[str, float]] = None,
        confidence_threshold: float = 0.45,
        compute_dtype: Any = jnp.float32,
    ):
        self.model = model
        self.variables = variables
        self.classes = list(classes or DEFAULT_CLASSES)
        self.audio = audio or LegacyAudioConfig()
        # reference keys its factors by lowercased class name (:85-92)
        self.sensitivity_factors = sensitivity_factors or {
            c.lower(): 1.0 for c in self.classes
        }
        self.confidence_threshold = confidence_threshold
        # legacy spectrogram: norm='slaney' (:56), power 2, top_db 80
        self.spec_cfg = SpectrogramConfig(mel_norm="slaney")
        self.compute_dtype = compute_dtype

        def fwd(variables, windows):
            feats = melspec.log_mel_features(
                windows, self.spec_cfg, self.audio.target_sample_rate,
                use_gemm_dft=True, out_dtype=compute_dtype,
            )
            x = melspec.replicate_channels(feats, 3)
            logits = self.model.apply(variables, x, train=False)
            return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)

        self._jit_fwd = jax.jit(fwd)

    # -- preprocessing -------------------------------------------------------

    def preprocess(self, path: str) -> np.ndarray:
        # torchaudio.load-equivalent container support (inference_script.py
        # decodes any container torchaudio handles): non-WAV → ffmpeg.
        from synthetic_audio_detection_tpu.audio.decode import load_audio

        wf, sr = load_audio(path)
        mono = wf.mean(axis=0)
        if sr != self.audio.target_sample_rate:
            # host polyphase resample: variable lengths would recompile the
            # jitted path once per file length
            from synthetic_audio_detection_tpu.audio.dsp import resample_poly_np

            mono = resample_poly_np(mono, sr, self.audio.target_sample_rate)
        seconds = mono.shape[0] / self.audio.target_sample_rate
        if seconds < self.audio.window_size:
            # reference pads short clips to 5 s (:165-172)
            out = np.zeros(int(5.0 * self.audio.target_sample_rate), np.float32)
            out[: mono.shape[0]] = mono
            mono = out
        if self.audio.normalize_audio:
            mono = normalize_audio(mono)
        return mono.astype(np.float32)

    def windows(self, waveform: np.ndarray) -> Tuple[np.ndarray, List[float]]:
        win, hop = self.audio.window_samples, self.audio.hop_samples
        chunks, stamps = [], []
        for s in range(0, max(len(waveform) - win + 1, 1), hop):
            seg = waveform[s : s + win]
            if seg.shape[0] < win:
                break
            if np.abs(seg).max() < self.audio.silence_threshold:
                continue
            chunks.append(seg)
            stamps.append(s / self.audio.target_sample_rate)
        if not chunks:
            return np.zeros((0, win), np.float32), []
        return np.stack(chunks), stamps

    # -- inference -----------------------------------------------------------

    def probabilities(self, windows: np.ndarray) -> np.ndarray:
        """Batched softmax probs [N, C] with sensitivity rescaling."""
        out = []
        bs = self.audio.batch_size
        for i in range(0, windows.shape[0], bs):
            batch = windows[i : i + bs]
            pad = 0
            if batch.shape[0] < min(bs, 8):
                pad = min(bs, 8) - batch.shape[0]
            elif batch.shape[0] % 8:
                pad = 8 - batch.shape[0] % 8
            if pad:
                batch = np.concatenate(
                    [batch, np.zeros((pad, batch.shape[1]), batch.dtype)]
                )
            probs = np.asarray(self._jit_fwd(self.variables, jnp.asarray(batch)))
            out.append(probs[: probs.shape[0] - pad if pad else None])
        probs = np.concatenate(out, axis=0)
        factors = np.array(
            [self.sensitivity_factors.get(c.lower(), 1.0) for c in self.classes],
            np.float64,
        )
        adjusted = probs * factors[None, :]
        return adjusted / adjusted.sum(axis=1, keepdims=True)

    def smooth_predictions(
        self, probs: np.ndarray
    ) -> Tuple[np.ndarray, np.ndarray]:
        """gaussian σ=2 → renorm → argmax → medfilt(5) → majority fallback
        (:197-217). Returns (final_preds, smoothed_probs)."""
        if probs.shape[0] == 0:
            return np.zeros(0, np.int64), probs
        sm = np.asarray(gaussian_filter1d(jnp.asarray(probs), 2.0, axis=0))
        sm = sm / sm.sum(axis=1, keepdims=True)
        preds = np.argmax(sm, axis=1)
        final = np.asarray(
            median_filter1d(jnp.asarray(preds.astype(np.float32)), 5)
        ).astype(np.int64)
        max_probs = sm.max(axis=1)
        confident = max_probs >= self.confidence_threshold
        if len(final) > 0:
            majority = np.argmax(np.bincount(final, minlength=len(self.classes)))
            final[~confident] = majority
        return final, sm

    def confident_segments(
        self,
        timestamps: Sequence[float],
        predictions: np.ndarray,
        probabilities: np.ndarray,
    ) -> List[Dict[str, Any]]:
        """Run-length merge equal-label windows; keep mean conf ≥ threshold
        (:219-242). Segments carry a confidence field."""
        segments: List[Dict[str, Any]] = []
        preds = list(predictions)
        idx = 0
        while idx < len(preds):
            current = preds[idx]
            start = idx
            while idx + 1 < len(preds) and preds[idx + 1] == current:
                idx += 1
            end = idx
            seg_probs = [probabilities[i][current] for i in range(start, end + 1)]
            conf = float(np.mean(seg_probs))
            if conf >= self.confidence_threshold:
                segments.append(
                    {
                        "start": float(timestamps[start]),
                        "end": float(timestamps[end] + self.audio.window_size),
                        "class": self.classes[current],
                        "confidence": conf,
                    }
                )
            idx += 1
        return segments

    def analyze_audio(self, path: str) -> Dict[str, Any]:
        wf = self.preprocess(path)
        windows, stamps = self.windows(wf)
        if windows.shape[0] == 0:
            return {
                "percentages": {c: 0.0 for c in self.classes},
                "segments": [],
            }
        probs = self.probabilities(windows)
        preds, smoothed = self.smooth_predictions(probs)
        segments = self.confident_segments(stamps, preds, smoothed)
        percentages = {
            c: round(float(smoothed[:, i].mean()) * 100.0, 2)
            for i, c in enumerate(self.classes)
        }
        return {"percentages": percentages, "segments": segments}

    def analyze_batch(self, folder: str) -> Dict[str, Dict[str, Any]]:
        """--IsBatch folder mode (:428-451)."""
        results = {}
        for f in sorted(os.listdir(folder)):
            if f.lower().endswith(".wav"):
                results[f] = self.analyze_audio(os.path.join(folder, f))
        return results
