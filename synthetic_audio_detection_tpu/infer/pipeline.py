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
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from synthetic_audio_detection_tpu.audio import wavio
from synthetic_audio_detection_tpu.ensemble.multihead import (
    MultiHeadEnsemble,
    _aggregate,
    ensemble_per_head_logits,
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
        # reference arithmetic exactly: start = start_idx / sr, end = start +
        # window_size (inference_runner.py:190,341-343) — NOT (s + win) / sr,
        # whose float value can differ in the last ulp and change the JSON text
        start = s / audio.sample_rate
        stamps.append((start, start + audio.window_seconds))
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
    return_per_head: bool = False,
) -> jnp.ndarray:
    """[B, T] waveform windows → [B, N+1] ensemble logits. Fully jitted:
    mel front end + channel fold + vmapped multi-head forward in one program.
    use_pallas=True routes the mel front end through the fused Pallas kernel
    (ops.pallas_melspec) — TPU only. Integer-typed windows are int16 PCM
    transport (half the float32 host→device traffic; exact for PCM sources) and are
    dequantized here.

    return_per_head=True additionally returns the PRE-aggregation per-head
    logits [N, B, 2] from the SAME graph — the diagnostics surface shares
    every numeric choice (front end, dtype, fast path) with the verdict it
    explains, so aggregate(per_head) == serving logits by construction."""
    if jnp.issubdtype(windows.dtype, jnp.integer):
        windows = windows.astype(jnp.float32) / 32768.0
    if use_pallas:
        from synthetic_audio_detection_tpu.ops.pallas_melspec import serving_log_mel

        z = serving_log_mel(windows, spec_cfg, sample_rate)  # [B, mels, frames]
        feats = melspec.finalize_features(z, spec_cfg).astype(compute_dtype)
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
        logits_nh = ensemble_per_head_logits(ens, x)
    elif use_fast_backbone and ens.shared_backbone:
        # eval-mode functional backbone with folded BN affines: measured
        # 6,020 vs 5,825 seg/s at 512²/batch 128 on v5e (throughput.py
        # 'fastpath'); numerics match the Flax path at bf16 tolerance
        from synthetic_audio_detection_tpu.models.fast_resnet import (
            fast_ensemble_per_head_logits,
        )

        logits_nh = fast_ensemble_per_head_logits(ens, x)
    else:
        logits_nh = ensemble_per_head_logits(ens, x)
    agg = _aggregate(logits_nh)
    if return_per_head:
        return agg, logits_nh
    return agg


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
        # bit-equivalent). Composite measurements decide the default
        # (micro numbers do not transfer — NOTES.md): NEUTRAL at 512²
        # (6,005 vs 6,020 seg/s), HARMFUL at 256² (12,868 vs 19,524 — C=1
        # stems hit a bad emitter path there), +7% WIN at the native mel
        # resolution (40,076 vs 37,520; 41,235 with the fast path, factored
        # mel, throughput.py mono-native/fastpath-mono-native). Auto = on
        # only for native-resolution TPU serving in a reduced dtype.
        spec_resolved = spec or SpectrogramConfig.inference()
        if fold_mono is None:
            fold_mono = (
                spec_resolved.is_native
                and jax.default_backend() in ("tpu", "axon")
                and jnp.dtype(compute_dtype) != jnp.float32
            )
        if fold_mono and ensemble.model.in_channels == 3:
            from synthetic_audio_detection_tpu.ensemble.multihead import (
                fold_to_mono,
            )

            ensemble = fold_to_mono(ensemble)
        self.ensemble = ensemble
        self.audio = audio or AudioConfig()
        self.spec = spec_resolved
        self.infer = infer or InferenceConfig()
        self._resolve_calibration()
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
        # 'int16' transports windows as PCM (half the float32 host→device
        # bytes — exact
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
            # at 512² and, with the factored-DFT serving mel, +2.9% at native
            # too (41,235 fastpath-mono vs 40,076 mono, same-process sweep —
            # throughput.py; under the older strip mel the flax path had won
            # native, 34,981 vs 32,628: the gate follows the composite record)
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
        self._fwd = fwd
        self._jit_fwd = self._wrap_jit(
            fwd, donate_argnums=(1,) if donate_windows else ())
        self._jit_fwd_diag = None  # lazily built by logits_and_per_head()
        self._jit_per_head = None  # lazily built by per_head_sigmoids()

    def _wrap_jit(self, fwd, out_specs=None, donate_argnums=()):
        """jit the forward; under a pure data-parallel mesh, via shard_map.

        Data-parallel serving is embarrassingly parallel — each device runs
        the IDENTICAL single-device program on its batch shard. shard_map
        makes that true by construction; relying on GSPMD propagation
        instead was measured inserting full-batch all-gathers before every
        head-stacked grouped conv of the dense ensemble (layers 2-4 ran
        replicated, so each device redid the whole batch's work —
        tests/test_sharded_infer.py::test_weak_scaling_program_invariance
        pins the collective-free per-device program)."""
        mesh = self.mesh
        if mesh is not None:
            from synthetic_audio_detection_tpu.parallel import sharding as sh

            if mesh.shape.get(sh.MODEL_AXIS, 1) == 1:
                from jax.sharding import PartitionSpec as P

                fwd = jax.shard_map(
                    fwd, mesh=mesh,
                    in_specs=(P(), P(sh.DATA_AXIS)),
                    out_specs=out_specs or P(sh.DATA_AXIS),
                    check_vma=False,
                )
        return jax.jit(fwd, donate_argnums=donate_argnums)

    @classmethod
    def from_artifact(
        cls,
        path_or_bytes,
        audio: Optional[AudioConfig] = None,
        infer: Optional[InferenceConfig] = None,
    ) -> "InferencePipeline":
        """Serve from a StableHLO artifact (infer/export.py) — no model
        code, checkpoint parsing, or weight trees; the exported programs ARE
        the forward. Host-side behavior (windowing, silence gate, decision
        rule, smoothing, JSON) is identical to a checkpoint-backed pipeline;
        the device programs are the artifact's entries, so only the exported
        batch shapes exist (``_bucket`` snaps to them). Per-head diagnostics
        need the parameter tree and are not available from an artifact."""
        from synthetic_audio_detection_tpu.ensemble.multihead import (
            MultiHeadEnsemble,
        )
        from synthetic_audio_detection_tpu.infer import export as sadx

        calls, meta = sadx.load_artifact(path_or_bytes)
        sizes = sorted(calls)

        self = cls.__new__(cls)
        self.ensemble = MultiHeadEnsemble(
            model=None, variables=None,
            class_names=list(meta["class_names"]),
            calibration=meta.get("calibration") or None,
            generic_head=bool(meta.get("generic_head", False)),
        )
        # host-side knobs (overlap, silence gate) come from the caller; the
        # sample rate is the artifact's — it defines what the exported
        # program expects, and preprocess_waveform resamples to it
        self.audio = dataclasses.replace(
            audio or AudioConfig(), sample_rate=meta["sample_rate"])
        self.spec = SpectrogramConfig(**meta["spec"])
        self.infer = infer or InferenceConfig(batch_size=sizes[-1])
        self._resolve_calibration()
        self.use_gemm_dft = True
        self.compute_dtype = jnp.dtype(meta["compute_dtype"])
        self.use_pallas = False
        self.transport_dtype = meta["transport_dtype"]
        self.mesh = None
        self.use_s2d_layer1 = False
        self.use_fast_backbone = False
        self._bucket_sizes = sizes
        self._fwd = None
        self._jit_fwd = lambda _variables, batch: calls[batch.shape[0]](batch)
        self._jit_fwd_diag = None
        self._jit_per_head = None
        return self

    # -- calibration --------------------------------------------------------

    def _resolve_calibration(self) -> None:
        """Engage the checkpoint's temperature calibration (if any).

        utils/calibration.py: ``ensemble.calibration`` carries per-column
        temperatures (+ optionally an EER operating threshold) fit offline
        by tools/calibrate_ensemble.py. Scaled logits feed the UNCHANGED
        decision rule, so an uncalibrated checkpoint is bit-identical to the
        reference path. A calibration-stored threshold applies only while
        ``infer.threshold`` is the 0.5 default (the compat CLI's
        ``--threshold`` wins; ``--no-calibration`` disables both).
        """
        cal = self.ensemble.calibration
        self._cal = cal if (cal and self.infer.apply_calibration) else None
        self._threshold = self.infer.threshold
        if (self._cal and "threshold" in self._cal
                and self.infer.threshold == 0.5):
            self._threshold = float(self._cal["threshold"])
        # Per-column operating points (decision-layer extension): a [N+1]
        # threshold vector — syn columns then real — defaulting to the
        # scalar everywhere, replaced by the calibration dict's per-column
        # EER points when InferenceConfig.per_column_thresholds is set.
        n_cols = self.ensemble.num_heads + 1
        self._col_thr = np.full(n_cols, self._threshold, np.float32)
        if self.infer.per_column_thresholds:
            if not (self._cal and "column_thresholds" in self._cal):
                raise ValueError(
                    "per_column_thresholds requires a checkpoint calibrated "
                    "with column thresholds (tools/calibrate_ensemble.py "
                    "--store-column-thresholds)")
            ct = np.asarray(self._cal["column_thresholds"], np.float32)
            if ct.shape != (n_cols,):
                raise ValueError(
                    f"column_thresholds {ct.shape} vs {n_cols} columns")
            self._col_thr = ct
        # split views for the decision layer: for a generic-head ensemble
        # _col_thr covers [spec_1..spec_N, generic, real]; the standard rule
        # sees the visible columns, the generic verdict its own slot
        if self.ensemble.generic_head:
            n_spec = len(self.ensemble.synthetic_names)
            self._col_thr_vis = np.delete(self._col_thr, n_spec)
            self._thr_generic = float(self._col_thr[n_spec])
        else:
            self._col_thr_vis = self._col_thr
            self._thr_generic = float(self._col_thr[-1])
        if self.infer.generic_verdict and not self.ensemble.generic_head:
            raise ValueError(
                "generic_verdict requires a checkpoint trained with a "
                "generic head (ensemble_trainer --generic-head)")

    # -- bucketing ----------------------------------------------------------

    def _bucket(self, n: int) -> int:
        # two-level bucketing: a small bucket for short clips and the full
        # batch bucket for throughput — at most TWO compiled shapes per
        # pipeline (a power-of-two ladder was observed recompiling mid-run on
        # long recordings whose remainder batch hit a fresh bucket size)
        sizes = getattr(self, "_bucket_sizes", None)
        if sizes is not None:
            # artifact-backed pipeline: only the exported shapes exist
            for s in sizes:
                if n <= s:
                    return s
            return sizes[-1]
        b = self.infer.batch_size
        bucket = 8 if n <= 8 else b
        if self.mesh is not None:
            from synthetic_audio_detection_tpu.parallel import sharding as sh

            bucket = sh.pad_batch_to_multiple(bucket, self.mesh)
        return bucket

    def _bucketed_batches(self, windows: np.ndarray, quantize: bool = True):
        """Yield (device-ready batch, rows-to-keep) pairs: windows padded up
        to the two-level bucket sizes (so each pipeline compiles at most two
        program shapes), int16 transport applied (unless ``quantize=False`` —
        the reference-numerics diagnostics path must see the raw floats),
        mesh sharding applied."""
        num = windows.shape[0]
        bucket = self._bucket(num)
        if (quantize and self.transport_dtype == "int16"
                and windows.dtype != np.int16):
            windows = wavio.pcm16_quantize(windows)
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
            yield jnp.asarray(batch), take
            i += take

    def logits_for_windows(self, windows: np.ndarray) -> np.ndarray:
        """[num, T] → [num, N+1] logits, batching through compiled buckets.

        The bucket is chosen once per call (small bucket for short clips,
        the full batch bucket otherwise) so a long recording's tail chunk
        pads into the already-compiled bucket instead of compiling a new
        shape mid-run."""
        if windows.shape[0] == 0:
            return np.zeros((0, self.ensemble.num_heads + 1), np.float32)
        out = []
        for batch, take in self._bucketed_batches(windows):
            logits = self._jit_fwd(self.ensemble.variables, batch)
            out.append(np.asarray(logits[:take], np.float32))
        return np.concatenate(out, axis=0)

    # -- diagnostics --------------------------------------------------------

    def logits_and_per_head(
        self, windows: np.ndarray
    ) -> Tuple[np.ndarray, np.ndarray]:
        """[num, T] → (serving logits [num, N+1], per-head logits [num, N, 2])
        from ONE program that shares every numeric choice with the serving
        path (same front end — Pallas or jnp — same compute dtype, same
        fast-backbone/s2d routing, same buckets). The aggregated output IS
        the serving logits: a near-threshold verdict and the per-head
        diagnostics explaining it can never disagree."""
        if windows.shape[0] == 0:
            n = self.ensemble.num_heads
            return (np.zeros((0, n + 1), np.float32),
                    np.zeros((0, n, 2), np.float32))
        if self._fwd is None:
            raise NotImplementedError(
                "per-head diagnostics need the parameter tree; this pipeline "
                "serves from a StableHLO artifact (from_artifact)")
        if self._jit_fwd_diag is None:
            from jax.sharding import PartitionSpec as P

            from synthetic_audio_detection_tpu.parallel import sharding as sh

            fwd = functools.partial(self._fwd, return_per_head=True)
            # per-head output is [N, B, 2]: batch on axis 1
            self._jit_fwd_diag = self._wrap_jit(
                fwd, out_specs=(P(sh.DATA_AXIS), P(None, sh.DATA_AXIS)))
        agg_out, nh_out = [], []
        for batch, take in self._bucketed_batches(windows):
            agg, nh = self._jit_fwd_diag(self.ensemble.variables, batch)
            agg_out.append(np.asarray(agg[:take], np.float32))
            nh_out.append(np.asarray(nh, np.float32).transpose(1, 0, 2)[:take])
        return np.concatenate(agg_out, axis=0), np.concatenate(nh_out, axis=0)

    def per_head_sigmoids(
        self, windows: np.ndarray, serving_numerics: bool = True
    ) -> np.ndarray:
        """[num, T] → [num, N, 2] per-head sigmoids (columns: [real, syn] per
        ensemble.multihead REAL_INDEX/SYNTHETIC_INDEX order). Exposes the
        pre-aggregation head outputs the reference's [B, N+1] collapse hides
        (see ensemble_per_head_logits). Lazily compiled — only pay for it
        when diagnostics are requested — and bucketed exactly like serving,
        so at most two diagnostic program shapes ever compile.

        serving_numerics=True (default) computes the per-head logits in the
        SAME program/numerics as the serving verdict (logits_and_per_head).
        False selects the reference-style f32 jnp front end + plain ensemble
        forward regardless of the pipeline's serving configuration — values
        can then differ from a Pallas/bf16 pipeline's at reduced-precision
        tolerance."""
        if windows.shape[0] == 0:
            return np.zeros((0, self.ensemble.num_heads, 2), np.float32)
        if serving_numerics:
            _, logits_bn2 = self.logits_and_per_head(windows)
            return (1.0 / (1.0 + np.exp(-logits_bn2))).astype(np.float32)
        if self.ensemble.model is None:
            raise NotImplementedError(
                "per-head diagnostics need the parameter tree; this pipeline "
                "serves from a StableHLO artifact (from_artifact)")
        if self._jit_per_head is None:
            spec, sr = self.spec, self.audio.sample_rate

            def fwd(variables, w):
                if jnp.issubdtype(w.dtype, jnp.integer):
                    w = w.astype(jnp.float32) / 32768.0
                feats = melspec.log_mel_features(
                    w, spec, sr, use_gemm_dft=self.use_gemm_dft,
                    out_dtype=jnp.float32,
                )
                x = melspec.replicate_channels(feats, spec.out_channels)
                ens = dataclasses.replace(self.ensemble, variables=variables)
                if jnp.dtype(ens.model.dtype) != jnp.dtype(jnp.float32):
                    ens = dataclasses.replace(
                        ens, model=ens.model.clone(dtype=jnp.float32))
                return ensemble_per_head_logits(ens, x)  # [N, B, 2]

            self._jit_per_head = jax.jit(fwd)
        out = []
        for batch, take in self._bucketed_batches(windows, quantize=False):
            logits_nb2 = np.asarray(
                self._jit_per_head(self.ensemble.variables, batch), np.float32
            )
            out.append(logits_nb2.transpose(1, 0, 2)[:take])
        probs = 1.0 / (1.0 + np.exp(-np.concatenate(out, axis=0)))
        return probs.astype(np.float32)

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
        logits: Optional[np.ndarray] = None,
    ) -> Dict[str, Any]:
        """Windows → reference JSON result dict {segments, percentages}.

        ``logits`` short-circuits the forward pass with precomputed serving
        logits (e.g. from logits_and_per_head, so a diagnostics caller runs
        ONE device program for verdict + per-head view)."""
        smooth = self.infer.smooth if smooth is None else smooth
        class_names = self.ensemble.class_names
        if windows.shape[0] == 0:
            # mirrors inference_runner.py:264-273 exactly: the empty-result
            # JSON carries an EMPTY percentages dict, not per-class zeros
            return {"segments": [], "percentages": {}}

        if logits is None:
            logits = self.logits_for_windows(windows)
        if self._cal is not None:
            from synthetic_audio_detection_tpu.utils.calibration import (
                apply_calibration,
            )

            logits = apply_calibration(logits, self._cal)
        # Host-side verdict in float32 numpy, matching the reference's
        # torch.sigmoid → numpy text byte-for-byte (jax.nn.sigmoid's stable
        # formulation differs in the last ulp, which would leak into the
        # unrounded percentage floats). decide() stays the jitted in-graph
        # variant for device-resident consumers.
        probs = (1.0 / (1.0 + np.exp(-np.asarray(logits, np.float32)))
                 ).astype(np.float32)
        # a generic-head ensemble carries one extra column (the generic
        # Real-vs-any-synthetic probability) between the specialists and the
        # real mean; it feeds only the verdict — the visible columns keep
        # the reference schema exactly
        probs, generic = self._split_generic(probs)
        syn, real = probs[:, :-1], probs[:, -1]
        is_real = self._decide_rows(syn, real, generic)
        label_idx = np.where(is_real, probs.shape[1] - 1, syn.argmax(axis=1))

        if smooth:
            probs, label_idx = self.smooth_probs(probs, generic)

        labels = labels_from_indices(
            label_idx, self.ensemble.synthetic_names, self.ensemble.real_name
        )
        round_floats = self.infer.round_floats
        segments = [
            {"start_sec": round(float(s), 3) if round_floats else float(s),
             "end_sec": round(float(e), 3) if round_floats else float(e),
             "label": lab}
            for (s, e), lab in zip(stamps, labels)
        ]
        # reference percentages: float(np.mean(float32 sigmoids, axis=0) * 100)
        # — the float32 mean's exact double value, unrounded
        # (inference_runner.py:327-334); rounding is the opt-in extension
        final = np.mean(probs, axis=0)
        percentages = {
            c: (round(float(final[j]) * 100.0, 2) if round_floats
                else float(final[j] * 100))
            for j, c in enumerate(class_names)
        }
        return {"segments": segments, "percentages": percentages}

    def _split_generic(
        self, probs: np.ndarray
    ) -> Tuple[np.ndarray, Optional[np.ndarray]]:
        """[B, C] probabilities → (visible [B, N+1], generic [B] or None).

        For a generic-head ensemble C = N+2 with the generic column at
        index N (ensemble/multihead.py:_aggregate); the visible columns are
        the reference-schema specialists + real mean."""
        if not self.ensemble.generic_head:
            return probs, None
        n_spec = len(self.ensemble.synthetic_names)
        return np.delete(probs, n_spec, axis=1), probs[:, n_spec]

    def smooth_probs(
        self, probs: np.ndarray, generic: Optional[np.ndarray] = None
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Gaussian-smooth per output dim across the window axis, renormalize
        rows, re-decide labels (inference_runner.py:300-325).

        At the defaults the re-decision runs on the RENORMALIZED rows with
        the scalar threshold — the reference's quirk, preserved bit for bit.
        With the opt-in operating points engaged (``per_column_thresholds``
        or ``syn_override_k != 1``) the fitted thresholds live on the
        calibrated SIGMOID scale, so applying them to rows renormalized to
        sum to 1 across N+1 columns would be a scale mismatch that silently
        voids the calibration contract; there the labels are re-decided from
        the smoothed pre-renormalization values instead (the renormalized
        rows still feed the percentages, matching the reference schema)."""
        sm_raw = np.asarray(
            gaussian_filter1d(jnp.asarray(probs), self.infer.smooth_sigma, axis=0)
        )
        row_sums = sm_raw.sum(axis=1, keepdims=True)
        sm = sm_raw / np.maximum(row_sums, 1e-8)
        n = probs.shape[1] - 1
        custom_points = (self.infer.per_column_thresholds
                         or int(self.infer.syn_override_k) != 1
                         or self.infer.generic_verdict)
        decide_on = sm_raw if custom_points else sm
        if generic is not None:
            # the generic column rides the same smoothing (it is never part
            # of the renormalized rows — sigmoid scale throughout)
            generic = np.asarray(gaussian_filter1d(
                jnp.asarray(generic[:, None]), self.infer.smooth_sigma,
                axis=0))[:, 0]
        # after renormalization the reference re-applies the same rule with
        # the configured threshold compared against the renormalized values
        # directly (the quirk documented above)
        is_real = self._decide_rows(decide_on[:, :n], decide_on[:, n], generic)
        label_idx = np.where(is_real, n, decide_on[:, :n].argmax(axis=1))
        return sm, label_idx

    def _decide_rows(
        self, syn: np.ndarray, real: np.ndarray,
        generic: Optional[np.ndarray] = None,
    ) -> np.ndarray:
        """Row verdicts via the module-level :func:`decide_rows` (one shared
        implementation of the rule — tools/decision_ab.py evaluates the same
        function offline, so the A/B tool cannot drift from serving).

        ``syn``/``real`` are the VISIBLE columns (generic column already
        split out); with ``infer.generic_verdict`` the verdict comes from
        the generic head instead: Real iff its synthetic probability is
        below its threshold (``_col_thr``'s generic slot)."""
        if self.infer.generic_verdict:
            if generic is None:
                raise ValueError(
                    "generic_verdict requires an ensemble trained with a "
                    "generic head (train/joint.py --generic-head)")
            return generic < self._thr_generic
        return decide_rows(syn, real, self._col_thr_vis,
                           int(self.infer.syn_override_k))


def decide_rows(
    syn: np.ndarray,
    real: np.ndarray,
    col_thr: np.ndarray,
    syn_override_k: int = 1,
) -> np.ndarray:
    """Row verdicts: Real iff the real column clears its threshold AND fewer
    than ``syn_override_k`` synthetic columns clear theirs.

    At the defaults (K=1, scalar threshold everywhere) this is the
    reference's unanimity rule BIT FOR BIT — ``sum(syn >= thr) < 1`` is the
    exact complement of ``all(syn < thr)`` (inference_runner.py:205-213,
    any-strong-synthetic ⇒ not Real). The K and per-column-threshold knobs
    are the measured mitigation for that rule's compounding per-head false
    positives at many heads (docs/PERFORMANCE.md LOGO study).

    This module-level function is THE decision rule: the serving pipeline
    (``InferencePipeline._decide_rows``) and the offline A/B evaluator
    (``tools/decision_ab.py``) both call it, so the two cannot drift."""
    strong = syn >= col_thr[:-1]
    k = max(int(syn_override_k), 1)
    return (real >= col_thr[-1]) & (strong.sum(axis=1) < k)


def result_json(filename: str, result: Dict[str, Any], indent: int = 4) -> str:
    """Assemble the exact reference output schema and text
    (inference_runner.py:345-351): {filename, segments[], percentages{}},
    ``json.dumps(..., indent=4)``. ``filename`` must be the audio path AS
    PASSED on the command line (the reference writes ``args.audio`` verbatim,
    :346) — the compat CLI does; callers wanting a basename pass one."""
    return json.dumps(
        {"filename": filename,
         "segments": result["segments"],
         "percentages": result["percentages"]},
        indent=indent,
    )
