"""End-to-end inference pipeline: waveform → windows → fused mel+ensemble →
verdicts → JSON.

Reference behavior being reproduced (inference_runner.py:218-353):
- preprocess: load → mono mean → resample to 32 kHz → zero-pad to ≥4 s
  (:144-155)
- windowing: 4 s windows, hop = (1-overlap)·window, silence gate
  max|x| < threshold (:176-190)
- per window: mel spectrogram (slaney norm) → dB → standardize → 512×512 →
  3-channel (:157-174)
- batched no-grad forward, batch 128 (:282-289)
- decision: element-wise sigmoid; Real iff real≥thr and all syn<thr (:194-214)
- optional temporal smoothing: gaussian σ=2 per output dim, row renorm,
  re-decide (:300-325)
- percentages = mean(probs)·100 per class (:327-334) — note the unsmoothed
  path averages independent sigmoids (does not sum to 100), faithfully.

TPU-native differences (design, not semantics): the whole window→logits path
is ONE jitted program (mel front end fused with the vmapped ensemble instead
of a CPU loop feeding the GPU); window batches are padded to static bucket
sizes so each bucket compiles once; everything runs in float32 by default with
a bfloat16 fast path.
"""

from __future__ import annotations

import dataclasses
import functools
import json
import math
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from synthetic_audio_detection_tpu.audio import wavio
from synthetic_audio_detection_tpu.ensemble.multihead import (
    MultiHeadEnsemble,
    decide,
    ensemble_forward,
    labels_from_indices,
)
from synthetic_audio_detection_tpu.ops import melspec
from synthetic_audio_detection_tpu.ops.filters import gaussian_filter1d
from synthetic_audio_detection_tpu.utils.config import (
    AudioConfig,
    InferenceConfig,
    SpectrogramConfig,
)


# ---------------------------------------------------------------------------
# Host-side: load + window slicing (cheap numpy; decode stays off-device)
# ---------------------------------------------------------------------------

def preprocess_waveform(
    path: str, audio: AudioConfig
) -> np.ndarray:
    """Load → mono mean → resample to target rate → pad to ≥1 window.

    Mirrors inference_runner.py:144-155, including torchaudio.load's
    container support: non-WAV inputs decode through ffmpeg
    (audio/decode.py). Returns float32 [T]."""
    from synthetic_audio_detection_tpu.audio.decode import load_audio

    wf, sr = load_audio(path)
    mono = wf.mean(axis=0)
    if sr != audio.sample_rate:
        # host polyphase twin of ops.resample: arbitrary file lengths would
        # force one XLA compile per length through the jitted path
        from synthetic_audio_detection_tpu.audio.dsp import resample_poly_np

        mono = resample_poly_np(mono, sr, audio.sample_rate)
    if mono.shape[0] < audio.window_samples:
        mono = np.pad(mono, (0, audio.window_samples - mono.shape[0]))
    return mono.astype(np.float32)


def slice_waveform(
    waveform: np.ndarray, audio: AudioConfig
) -> Tuple[np.ndarray, List[Tuple[float, float]]]:
    """[T] → (windows [num, window_samples], [(start_sec, end_sec), ...]).

    Overlapped strided windows with the silence gate, mirroring
    inference_runner.py:176-190 (gate: skip when max|x| < threshold)."""
    win = audio.window_samples
    hop = audio.hop_samples
    T = waveform.shape[0]
    n = max(1, 1 + (T - win) // hop) if T >= win else 0
    chunks, stamps = [], []
    for i in range(n):
        s = i * hop
        seg = waveform[s : s + win]
        if seg.shape[0] < win:
            break
        if np.abs(seg).max() < audio.silence_threshold:
            continue
        chunks.append(seg)
        stamps.append((s / audio.sample_rate, (s + win) / audio.sample_rate))
    if not chunks:
        return np.zeros((0, win), np.float32), []
    return np.stack(chunks).astype(np.float32), stamps


# ---------------------------------------------------------------------------
# Device-side: one fused jitted program per (bucket_size, config)
# ---------------------------------------------------------------------------

def _forward_windows(
    variables: Any,
    windows: jnp.ndarray,
    *,
    ensemble: MultiHeadEnsemble,
    spec_cfg: SpectrogramConfig,
    sample_rate: int,
    use_gemm_dft: bool,
    compute_dtype: Any,
    use_pallas: bool = False,
    use_s2d_layer1: bool = False,
    use_fast_backbone: bool = False,
) -> jnp.ndarray:
    """[B, T] waveform windows → [B, N+1] ensemble logits. Fully jitted:
    mel front end + channel fold + vmapped multi-head forward in one program.
    use_pallas=True routes the mel front end through the fused Pallas kernel
    (ops.pallas_melspec) — TPU only. Integer-typed windows are int16 PCM
    transport (4× less host→device traffic; exact for PCM sources) and are
    dequantized here."""
    if jnp.issubdtype(windows.dtype, jnp.integer):
        windows = windows.astype(jnp.float32) / 32768.0
    if use_pallas:
        from synthetic_audio_detection_tpu.ops.pallas_melspec import fused_log_mel

        z = fused_log_mel(windows, spec_cfg, sample_rate)  # [B, mels, frames]
        feats = jax.image.resize(
            z, (z.shape[0], spec_cfg.out_size, spec_cfg.out_size),
            method="linear",
        ).astype(compute_dtype)
    else:
        feats = melspec.log_mel_features(
            windows, spec_cfg, sample_rate, use_gemm_dft=use_gemm_dft,
            out_dtype=compute_dtype,
        )  # [B, 512, 512]
    if ensemble.model.in_channels == 1:
        # mono-folded stem (ensemble.fold_to_mono): identical logits,
        # 3x less stem input
        x = feats[..., None]
    else:
        x = melspec.replicate_channels(feats, spec_cfg.out_channels)
    ens = dataclasses.replace(ensemble, variables=variables)
    if jnp.dtype(ens.model.dtype) != jnp.dtype(compute_dtype):
        # compute_dtype governs the whole program: a float32-constructed model
        # (e.g. a freshly loaded checkpoint) must not silently run f32 convs
        # inside a bf16 pipeline (or vice versa); params stay f32 either way.
        ens = dataclasses.replace(ens, model=ens.model.clone(dtype=compute_dtype))
    if use_s2d_layer1:
        # layer1 at 512² runs 8x under MXU peak through plain lax.conv; the
        # exactly-folded H-only space-to-depth stage (models/resnet.py:
        # S2DBasicBlock — identical param tree, measured 53 vs 30 TF/s at the
        # conv level) engages via the model flag. Same Flax forward path as
        # the baseline, so the comparison (and fusion behavior) stays apples
        # to apples; the flag is a no-op for bottleneck backbones or small
        # inputs (gate in models/resnet.py).
        ens = dataclasses.replace(ens, model=ens.model.clone(s2d_stage1=True))
    elif use_fast_backbone and ens.shared_backbone:
        # eval-mode functional backbone with folded BN affines: measured
        # 6,020 vs 5,825 seg/s at 512²/batch 128 on v5e (throughput.py
        # 'fastpath'); numerics match the Flax path at bf16 tolerance
        from synthetic_audio_detection_tpu.models.fast_resnet import (
            fast_ensemble_forward,
        )

        return fast_ensemble_forward(ens, x)
    return ensemble_forward(ens, x)


class InferencePipeline:
    """Compiled windows→logits executor with static bucket sizes.

    Bucketing: window batches are zero-padded up to the next bucket so each
    bucket shape compiles exactly once (XLA static-shape requirement). Real
    batches of any size then reuse the cached executables.
    """

    def __init__(
        self,
        ensemble: MultiHeadEnsemble,
        audio: Optional[AudioConfig] = None,
        spec: Optional[SpectrogramConfig] = None,
        infer: Optional[InferenceConfig] = None,
        use_gemm_dft: bool = True,
        compute_dtype: Any = jnp.float32,
        donate_windows: bool = False,
        use_pallas: Optional[bool] = None,
        mesh: Optional[Any] = None,
        transport_dtype: str = "float32",
        use_s2d_layer1: Optional[bool] = None,
        use_fast_backbone: Optional[bool] = None,
        fold_mono: Optional[bool] = None,
    ):
        # Exact mono stem fold (sum conv1's kernel over its input axis; the
        # front end feeds one replicated mel channel, so this is
        # bit-equivalent). OPT-IN: although the isolated stem measures 2.4x
        # faster at C=1 (4.19 → 1.72 ms/batch-128 @512²), the composite
        # program shows XLA already folds the broadcast into the conv —
        # mono measured NEUTRAL at 512² (6,005 vs 6,020 seg/s) and HARMFUL
        # at 256² (12,868 vs 19,524: C=1 stems hit a bad emitter path).
        if fold_mono is None:
            fold_mono = False
        if fold_mono and ensemble.model.in_channels == 3:
            from synthetic_audio_detection_tpu.ensemble.multihead import (
                fold_to_mono,
            )

            ensemble = fold_to_mono(ensemble)
        self.ensemble = ensemble
        self.audio = audio or AudioConfig()
        self.spec = spec or SpectrogramConfig.inference()
        self.infer = infer or InferenceConfig()
        self.use_gemm_dft = use_gemm_dft
        self.compute_dtype = compute_dtype
        if use_pallas is None:
            # Auto-enable the fused Pallas mel front end only on TPU backends
            # AND when the pipeline already computes in a reduced dtype: the
            # kernel's DFT matmuls run in bf16, so a float32 pipeline must
            # stay on the f32 jnp path end to end (near-threshold verdicts
            # would otherwise differ between TPU and CPU runs).
            use_pallas = (
                jax.default_backend() in ("tpu", "axon")
                and jnp.dtype(compute_dtype) != jnp.float32
            )
        self.use_pallas = use_pallas
        # 'int16' transports windows as PCM (¼ the host→device bytes — exact
        # for PCM-sourced audio, ≤1.5e-5 quantization otherwise); matters on
        # hosts with constrained upload bandwidth
        if transport_dtype not in ("float32", "int16"):
            raise ValueError(f"unsupported transport_dtype {transport_dtype!r}")
        self.transport_dtype = transport_dtype
        # data-parallel serving: windows shard over the mesh 'data' axis,
        # params replicate — hour-long recordings scale across chips with the
        # window axis as the batch axis (SURVEY.md §5 long-context)
        self.mesh = mesh
        if mesh is not None:
            from synthetic_audio_detection_tpu.parallel import sharding as sh

            self.ensemble = dataclasses.replace(
                ensemble, variables=sh.replicate(mesh, ensemble.variables)
            )
            ensemble = self.ensemble

        if use_s2d_layer1 is None:
            # auto: the H-only s2d layer1 folding wins only in the SMALL-batch
            # 512² regime (measured: 53.1 vs 29.7 TF/s at B=32, but 49.7 vs
            # 52.4 at B=128 — XLA's conv emitter tiles layer1 well once the
            # batch is large). Enable for latency-style pipelines (bucket
            # <= 32) on TPU with reduced dtype and a basic-block backbone;
            # the model-level gate additionally requires stage-1 spatial
            # >= 128 (so 256² fast mode is a no-op either way).
            from synthetic_audio_detection_tpu.models.resnet import RESNET_SPECS

            use_s2d_layer1 = (
                jax.default_backend() in ("tpu", "axon")
                and jnp.dtype(self.compute_dtype) != jnp.float32
                and RESNET_SPECS[self.ensemble.model.backbone][0] == "basic"
                and self.infer.batch_size <= 32
            )
        self.use_s2d_layer1 = use_s2d_layer1
        if use_fast_backbone is None:
            # auto: throughput serving (shared backbone, reduced dtype, TPU)
            # through the folded-affine functional backbone — measured +3.3%
            use_fast_backbone = (
                jax.default_backend() in ("tpu", "axon")
                and jnp.dtype(self.compute_dtype) != jnp.float32
                and self.ensemble.shared_backbone
                and not self.use_s2d_layer1
            )
        self.use_fast_backbone = use_fast_backbone

        fwd = functools.partial(
            _forward_windows,
            ensemble=self.ensemble,
            spec_cfg=self.spec,
            sample_rate=self.audio.sample_rate,
            use_gemm_dft=self.use_gemm_dft,
            compute_dtype=self.compute_dtype,
            use_pallas=self.use_pallas,
            use_s2d_layer1=self.use_s2d_layer1,
            use_fast_backbone=self.use_fast_backbone,
        )
        self._jit_fwd = jax.jit(fwd, donate_argnums=(1,) if donate_windows else ())
        self._jit_per_head = None  # lazily built by per_head_sigmoids()

    # -- bucketing ----------------------------------------------------------

    def _bucket(self, n: int) -> int:
        # two-level bucketing: a small bucket for short clips and the full
        # batch bucket for throughput — at most TWO compiled shapes per
        # pipeline (a power-of-two ladder was observed recompiling mid-run on
        # long recordings whose remainder batch hit a fresh bucket size)
        b = self.infer.batch_size
        bucket = 8 if n <= 8 else b
        if self.mesh is not None:
            from synthetic_audio_detection_tpu.parallel import sharding as sh

            bucket = sh.pad_batch_to_multiple(bucket, self.mesh)
        return bucket

    def logits_for_windows(self, windows: np.ndarray) -> np.ndarray:
        """[num, T] → [num, N+1] logits, batching through compiled buckets.

        The bucket is chosen once per call (small bucket for short clips,
        the full batch bucket otherwise) so a long recording's tail chunk
        pads into the already-compiled bucket instead of compiling a new
        shape mid-run."""
        num = windows.shape[0]
        if num == 0:
            return np.zeros((0, self.ensemble.num_heads + 1), np.float32)
        bucket = self._bucket(num)
        if self.transport_dtype == "int16" and windows.dtype != np.int16:
            windows = np.clip(
                np.round(windows.astype(np.float64) * 32768.0), -32768, 32767
            ).astype(np.int16)
        out = []
        i = 0
        while i < num:
            take = min(bucket, num - i)
            batch = windows[i : i + take]
            if take < bucket:
                batch = np.concatenate(
                    [batch, np.zeros((bucket - take, windows.shape[1]), windows.dtype)]
                )
            if self.mesh is not None:
                from synthetic_audio_detection_tpu.parallel import sharding as sh

                batch = jax.device_put(batch, sh.batch_sharded(self.mesh, 2))
            logits = self._jit_fwd(self.ensemble.variables, jnp.asarray(batch))
            out.append(np.asarray(logits[:take], np.float32))
            i += take
        return np.concatenate(out, axis=0)

    # -- diagnostics --------------------------------------------------------

    def per_head_sigmoids(self, windows: np.ndarray) -> np.ndarray:
        """[num, T] → [num, N, 2] per-head sigmoids (columns: [real, syn] per
        ensemble.multihead REAL_INDEX/SYNTHETIC_INDEX order). A separate
        (lazily-compiled) program from the serving path — only pay its
        compile when diagnostics are requested. Exposes the pre-aggregation
        head outputs the reference's [B, N+1] collapse hides (see
        ensemble_per_head_logits). Always uses the jnp mel front end and the
        plain ensemble forward, so values can differ from a Pallas/bf16
        serving pipeline's at reduced-precision tolerance."""
        from synthetic_audio_detection_tpu.ensemble.multihead import (
            ensemble_per_head_logits,
        )

        if windows.shape[0] == 0:
            return np.zeros((0, self.ensemble.num_heads, 2), np.float32)
        if self._jit_per_head is None:
            spec, sr = self.spec, self.audio.sample_rate

            def fwd(variables, w):
                if jnp.issubdtype(w.dtype, jnp.integer):
                    w = w.astype(jnp.float32) / 32768.0
                feats = melspec.log_mel_features(
                    w, spec, sr, use_gemm_dft=self.use_gemm_dft,
                    out_dtype=self.compute_dtype,
                )
                x = melspec.replicate_channels(feats, spec.out_channels)
                ens = dataclasses.replace(self.ensemble, variables=variables)
                return ensemble_per_head_logits(ens, x)  # [N, B, 2]

            self._jit_per_head = jax.jit(fwd)
        logits_nb2 = np.asarray(
            self._jit_per_head(self.ensemble.variables,
                               jnp.asarray(windows.astype(np.float32))),
            np.float32,
        )
        probs = 1.0 / (1.0 + np.exp(-logits_nb2))
        return probs.transpose(1, 0, 2)  # [B, N, 2]

    # -- full clip ----------------------------------------------------------

    def analyze_file(self, path: str, smooth: Optional[bool] = None) -> Dict[str, Any]:
        wf = preprocess_waveform(path, self.audio)
        windows, stamps = slice_waveform(wf, self.audio)
        return self.analyze_windows(windows, stamps, smooth=smooth)

    def analyze_windows(
        self,
        windows: np.ndarray,
        stamps: Sequence[Tuple[float, float]],
        smooth: Optional[bool] = None,
    ) -> Dict[str, Any]:
        """Windows → reference JSON result dict {segments, percentages}."""
        smooth = self.infer.smooth if smooth is None else smooth
        class_names = self.ensemble.class_names
        if windows.shape[0] == 0:
            # mirrors inference_runner.py:264-273 (empty JSON on no windows)
            return {"segments": [], "percentages": {c: 0.0 for c in class_names}}

        logits = self.logits_for_windows(windows)
        verdict = decide(jnp.asarray(logits), self.infer.threshold)
        probs = np.asarray(verdict["probs"])
        label_idx = np.asarray(verdict["label_idx"])

        if smooth:
            probs, label_idx = self.smooth_probs(probs)

        labels = labels_from_indices(
            label_idx, self.ensemble.synthetic_names, self.ensemble.real_name
        )
        segments = [
            {"start_sec": round(float(s), 3), "end_sec": round(float(e), 3),
             "label": lab}
            for (s, e), lab in zip(stamps, labels)
        ]
        percentages = {
            c: round(float(probs[:, j].astype(np.float64).mean()) * 100.0, 2)
            for j, c in enumerate(class_names)
        }
        return {"segments": segments, "percentages": percentages}

    def smooth_probs(self, probs: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """Gaussian-smooth per output dim across the window axis, renormalize
        rows, re-decide labels (inference_runner.py:300-325)."""
        sm = np.asarray(
            gaussian_filter1d(jnp.asarray(probs), self.infer.smooth_sigma, axis=0)
        )
        row_sums = sm.sum(axis=1, keepdims=True)
        sm = sm / np.maximum(row_sums, 1e-8)
        n = probs.shape[1] - 1
        syn = sm[:, :n]
        real = sm[:, n]
        # after renormalization the reference re-applies the same rule with
        # the configured threshold scaled to the renormalized scale: it
        # compares the renormalized values against threshold directly
        is_real = (real >= self.infer.threshold) & np.all(
            syn < self.infer.threshold, axis=1
        )
        label_idx = np.where(is_real, n, syn.argmax(axis=1))
        return sm, label_idx


def result_json(filename: str, result: Dict[str, Any]) -> str:
    """Assemble the exact reference output schema
    (inference_runner.py:336-353): {filename, segments[], percentages{}}."""
    return json.dumps(
        {"filename": filename,
         "segments": result["segments"],
         "percentages": result["percentages"]},
        indent=2,
    )
