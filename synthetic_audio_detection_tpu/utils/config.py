"""Typed configuration tree for the whole framework.

The reference scatters its hyperparameters across per-script argparse flags and
hard-coded constants (reference: modular/source/submodel_trainer.py:97-105,
inference_runner.py:127-142). Here everything lives in one serializable
dataclass tree; the compat CLIs map the reference flag surfaces onto it.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any, Optional, Sequence, Tuple


@dataclass(frozen=True)
class AudioConfig:
    """Waveform-level parameters.

    Defaults mirror the reference inference runner's *constructed* values
    (reference: inference_runner.py:258 — overlap 0.0, silence 1e-3), not the
    dataclass defaults it never uses. The legacy analyzer's values (overlap
    0.85, silence 1e-4; legacy/source/inference_script.py:46-47) are available
    via `legacy()`.
    """

    sample_rate: int = 32_000
    window_seconds: float = 4.0
    overlap: float = 0.0
    silence_threshold: float = 1e-3

    @property
    def window_samples(self) -> int:
        return int(self.window_seconds * self.sample_rate)

    @property
    def hop_samples(self) -> int:
        hop = int((1.0 - self.overlap) * self.window_samples)
        return max(hop, 1)

    @staticmethod
    def legacy() -> "AudioConfig":
        return AudioConfig(overlap=0.85, silence_threshold=1e-4)


@dataclass(frozen=True)
class SpectrogramConfig:
    """Mel-spectrogram front-end parameters.

    Matches the reference bit-for-bit intent (SURVEY.md §2.3): n_fft 2048, hop
    512, 128 mels in [20, 12000] Hz, power-2 spectrogram, dB conversion with
    top_db=80, per-spectrogram standardization, bilinear resize to 512x512,
    channel-triplication. `mel_norm` is None at training time and 'slaney' at
    inference in the reference (a train/infer mismatch we reproduce,
    flag-selected): submodel_trainer.py:97-103 vs inference_runner.py:142.

    ``out_size=0`` selects the NATIVE-resolution mode: the standardized
    log-mel is fed to the model at its true [n_mels, n_frames] resolution
    (frames zero-padded to a lane-friendly multiple of 128 — 251 → 256 for
    the 4 s / 32 kHz / hop-512 defaults) with NO resize. The reference's
    512×512 resize (inference_runner.py:157-174) exists only because its
    ImageNet-pretrained backbones expect square RGB inputs; it interpolates a
    128×251 mel up ~8× without adding information. Models trained from
    scratch at the native shape skip that interpolation entirely (matched
    train/serve resolution — the accuracy contract measured in
    docs/PERFORMANCE.md).
    """

    n_fft: int = 2048
    hop_length: int = 512
    win_length: Optional[int] = None  # defaults to n_fft
    n_mels: int = 128
    f_min: float = 20.0
    f_max: float = 12_000.0
    power: float = 2.0
    top_db: float = 80.0
    mel_norm: Optional[str] = None  # None (training) or 'slaney' (inference)
    mel_scale: str = "htk"
    center: bool = True
    pad_mode: str = "reflect"
    eps: float = 1e-6  # std epsilon in per-spectrogram normalization
    out_size: int = 512  # square resize target; 0 = native mel resolution
    out_channels: int = 3

    @property
    def win(self) -> int:
        return self.win_length or self.n_fft

    @property
    def n_freqs(self) -> int:
        return self.n_fft // 2 + 1

    @property
    def is_native(self) -> bool:
        return self.out_size == 0

    def num_frames(self, num_samples: int) -> int:
        if self.center:
            return 1 + num_samples // self.hop_length
        return 1 + (num_samples - self.win) // self.hop_length

    def model_input_hw(self, num_samples: int = 128_000) -> tuple:
        """(H, W) of the image the model consumes. Square resize target, or
        in native mode [n_mels, frames-padded-up-to-multiple-of-128]."""
        if self.is_native:
            frames = self.num_frames(num_samples)
            return self.n_mels, -(-frames // 128) * 128
        return self.out_size, self.out_size

    @staticmethod
    def train() -> "SpectrogramConfig":
        return SpectrogramConfig(mel_norm=None)

    @staticmethod
    def inference(out_size: int = 512) -> "SpectrogramConfig":
        # out_size 512 = reference fidelity (inference_runner.py:172);
        # 256 = the documented fast mode; 0 = native mel resolution
        # (docs/PERFORMANCE.md)
        return SpectrogramConfig(mel_norm="slaney", out_size=out_size)


def parse_input_size(value) -> int:
    """CLI ``--input-size`` values: a positive int (square resize target) or
    ``native``/``0`` for the native mel-resolution mode
    (``SpectrogramConfig.out_size == 0``). Raises ValueError otherwise, which
    argparse renders as the usual invalid-argument error."""
    v = str(value).strip().lower()
    if v == "native":
        return 0
    n = int(v)
    if n < 0:
        raise ValueError(f"invalid input size {value!r}")
    return n


@dataclass(frozen=True)
class SpecAugmentConfig:
    """Train-time augmentation policy.

    Spectrogram masking follows the reference (submodel_trainer.py:109-114).
    The ``wave_*`` fields add ON-DEVICE stochastic waveform augmentation the
    reference has no counterpart for (its audio_augmneter.py bakes 11 fixed
    variants into the dataset offline; these draw FRESH noise/channel
    perturbations every step inside the jitted train program —
    ops/waveform_augment.py). All probabilities default to 0.0, so existing
    training trajectories are bit-identical unless explicitly enabled
    (``--wave-augment`` on the trainer CLIs)."""

    freq_mask_param: int = 15
    time_mask_param: int = 35
    enabled: bool = True
    # waveform-domain augmentation (applied pre-mel, train mode only)
    wave_noise_prob: float = 0.0       # P(add white noise) per example
    wave_snr_db: Tuple[float, float] = (5.0, 30.0)
    wave_lowpass_prob: float = 0.0     # P(random low-pass channel) per example
    wave_lowpass_hz: Tuple[float, float] = (4000.0, 15000.0)
    wave_taps: int = 63                # FIR length (odd)

    @property
    def wave_enabled(self) -> bool:
        return self.wave_noise_prob > 0.0 or self.wave_lowpass_prob > 0.0


def add_wave_augment_args(p) -> None:
    """Shared trainer-CLI flags for on-device waveform augmentation
    (submodel_trainer and ensemble_trainer; consumed by
    spec_augment_from_args)."""
    g = p.add_argument_group("waveform augmentation (train-time, on device)")
    g.add_argument("--wave-augment", action="store_true",
                   help="Enable fresh per-step waveform augmentation inside "
                   "the jitted train step: additive white noise at a random "
                   "SNR and a random low-pass channel (generalization lever; "
                   "ops/waveform_augment.py)")
    g.add_argument("--wave-noise-prob", type=float, default=0.5,
                   help="P(add noise) per example (with --wave-augment)")
    g.add_argument("--wave-snr-db", nargs=2, type=float, default=[5.0, 30.0],
                   metavar=("MIN", "MAX"), help="Noise SNR range in dB")
    g.add_argument("--wave-lowpass-prob", type=float, default=0.25,
                   help="P(low-pass channel) per example (with --wave-augment)")
    g.add_argument("--wave-lowpass-hz", nargs=2, type=float,
                   default=[4000.0, 15000.0], metavar=("MIN", "MAX"),
                   help="Low-pass cutoff range in Hz")


def spec_augment_from_args(args) -> SpecAugmentConfig:
    """SpecAugmentConfig from trainer-CLI args: reference masking defaults,
    plus the waveform fields when --wave-augment is set."""
    if not getattr(args, "wave_augment", False):
        return SpecAugmentConfig()
    return SpecAugmentConfig(
        wave_noise_prob=args.wave_noise_prob,
        wave_snr_db=tuple(args.wave_snr_db),
        wave_lowpass_prob=args.wave_lowpass_prob,
        wave_lowpass_hz=tuple(args.wave_lowpass_hz),
    )


@dataclass(frozen=True)
class ModelConfig:
    """Backbone + head topology (reference: model_merger.py:18-40)."""

    backbone: str = "resnet18"  # resnet18|resnet34|resnet50|resnet101|resnet152
    head_hidden: Sequence[int] = (512, 256)
    head_dropout: Sequence[float] = (0.5, 0.3)
    num_outputs: int = 2  # [Real, Synthetic]
    dtype: str = "float32"  # compute dtype: float32|bfloat16
    input_size: int = 512


@dataclass(frozen=True)
class TrainConfig:
    """Training hyperparameters (reference: submodel_trainer.py:33-53,646-660)."""

    data_dir: str = "./dataset"
    batch_size: int = 32
    epochs: int = 100
    lr: float = 1e-3
    weight_decay: float = 0.01
    grad_clip_norm: float = 0.5
    seed: int = 42
    workers: int = 20
    checkpoint_dir: str = "./checkpoints"
    resume: str = ""
    class0: str = "Real"
    class1: str = "Class1"
    # Other generators' class folders folded into class0 as hard negatives.
    # A head trained only Real-vs-SynthX answers "synthetic?" — ANY
    # generator fires it and ensemble attribution argmax ties at saturated
    # sigmoids (the reference's per-head binary datasets share the failure).
    # Hard negatives make the head answer "this generator?"; binary
    # detection still works through the ensemble's any-head rule. Measured:
    # attribution 0.667 → 1.000 on the 3-class study (docs/PERFORMANCE.md).
    hard_negative_classes: tuple = ()
    # ReduceLROnPlateau(mode='min', factor=0.5, patience=2)
    plateau_factor: float = 0.5
    plateau_patience: int = 2
    # layer3 unfreezes at epochs // 3 (submodel_trainer.py:687-691)
    unfreeze_layer3_at_fraction: float = 1.0 / 3.0
    # Reference-compat "loss over pooled features" quirk is NOT the default;
    # the sane path puts the head in the loss (SURVEY.md §7.3).
    log_every_steps: int = 100
    # Second reference quirk (verified round 3): its AdamW is constructed
    # ONCE over filter(requires_grad) BEFORE the epoch loop
    # (submodel_trainer.py:647-651), so the epochs//3 layer3 "unfreeze"
    # (:687-691) only sets requires_grad — torch optimizers never update
    # params outside their param_groups, so reference layer3 weights NEVER
    # change; the unfreeze adds backward compute and nothing else. Default
    # False = train layer3 after the unfreeze (the documented intent);
    # True = reproduce the reference exactly (layer3 stays frozen forever,
    # and the stop-grad boundary never moves down — faster, like the ref's
    # wasted backward is skipped too).
    reference_quirk_frozen_layer3: bool = False
    # input pipeline backend: 'threads' (dependency-light, data/dataset.py)
    # or 'grain' (worker processes, deterministic global shuffle,
    # data/grain_pipeline.py)
    data_backend: str = "threads"
    # checkpoint backend: 'native' (msgpack + torch twin) or 'orbax'
    # (async step-indexed with retention, checkpoints/orbax_io.py)
    checkpoint_backend: str = "native"
    # Exact H-only space-to-depth stage 1 (models/resnet.py:S2DBasicBlock):
    # identical params/grads/stats, faster layer1 at 512² on TPU. Off by
    # default; flip per measured hardware.
    s2d_stage1: bool = False
    # Stop gradients at the freeze boundary (before layer4 in phase 1, before
    # layer3 after the epochs//3 unfreeze): the frozen stages' backward pass
    # is never emitted instead of computed-then-masked-to-zero. Identical
    # updates; large measured step speedup (train/steps.py docstring). The
    # step recompiles once at the unfreeze transition.
    stop_grad_boundary: bool = True
    # Model COMPUTE dtype for the train step ('float32'|'bfloat16'). Params,
    # optimizer state, loss, and BN statistics stay float32 either way
    # (flax promotes); bfloat16 engages the MXU's full rate on TPU. The
    # reference trains in f32 (its AMP precedent is legacy inference,
    # inference_script.py:278), so f32 stays the default.
    compute_dtype: str = "float32"
    # Device-mel DFT path for the train step: '' = the step's measured
    # default (train/steps.py:_features_from_waveforms docstring), or one of
    # 'fft' | 'gemm' | 'factored' | 'pallas' ('pallas' = the serving path's
    # fused factored-DFT kernel in dB-only mode; bf16 DFT numerics).
    mel_dft: str = ""
    # Host→device transport for waveform batches: '' = auto (int16 for bf16
    # training on TPU backends — the same opt-in gate as the Pallas mel;
    # float32 otherwise), or 'float32' | 'int16' to force. int16 halves
    # the PCIe/DMA (or tunnel) bytes per step and is EXACT for PCM_16 mono
    # 32 kHz sources — the post-ETL segment contract (round(i/32768·32768)
    # == i); non-PCM sources see ≤0.5 LSB input quantization, far below
    # bf16 activation noise. Mirrors the serving path's int16 transport
    # (infer/pipeline.py). Dequantized on device in the jitted step.
    transport_dtype: str = ""


@dataclass(frozen=True)
class InferenceConfig:
    threshold: float = 0.5
    confidence_threshold: float = 0.45
    smooth: bool = False
    smooth_sigma: float = 2.0
    batch_size: int = 128
    max_windows: int = 4096  # static upper bound per compiled bucket
    # The reference emits UNROUNDED float timestamps and percentages
    # (inference_runner.py:293-349); rounding (3 dp times, 2 dp percentages)
    # is an opt-in cosmetic extension, off by default for byte-faithful JSON.
    round_floats: bool = False
    # Apply checkpoint-carried temperature calibration (utils/calibration.py)
    # when present. No-op for uncalibrated checkpoints, so the default keeps
    # reference behavior bit-identical; False forces raw sigmoids even for a
    # calibrated checkpoint (CLI --no-calibration).
    apply_calibration: bool = True
    # Decision-layer extensions. At the defaults the verdict is the
    # reference's unanimity rule bit for bit (inference_runner.py:194-214:
    # Real iff real >= thr AND every syn < thr). The LOGO study measured the
    # rule's per-head false positives compounding at 5-6 heads
    # (docs/PERFORMANCE.md); these are the framework's measured levers:
    # syn_override_k — how many synthetic columns must clear their threshold
    # to override a Real verdict (reference: 1 = any single head).
    syn_override_k: int = 1
    # per_column_thresholds — use the calibration dict's per-column EER
    # operating points ("column_thresholds", utils/calibration.py) in place
    # of the single scalar threshold. Requires a calibrated checkpoint.
    per_column_thresholds: bool = False
    # generic_verdict — decide Real/Synthetic from the generic
    # Real-vs-any-synthetic head's probability (requires an ensemble trained
    # with train/joint.py generic_head): Real iff sigmoid(generic) < its
    # threshold. Attribution stays per-specialist-head; the generic column
    # never appears in the JSON schema. Off = reference unanimity rule over
    # the specialists (the generic column is then ignored entirely).
    generic_verdict: bool = False


@dataclass(frozen=True)
class MeshConfig:
    """Device-mesh layout for pjit sharding (no reference counterpart;
    the reference's only parallelism is single-process DataParallel,
    submodel_trainer.py:637-639)."""

    data_axis: str = "data"
    model_axis: str = "model"
    data_parallel: int = -1  # -1: all devices
    model_parallel: int = 1


@dataclass(frozen=True)
class PipelineConfig:
    """Full end-to-end pipeline configuration."""

    audio: AudioConfig = field(default_factory=AudioConfig)
    spec: SpectrogramConfig = field(default_factory=SpectrogramConfig.inference)
    model: ModelConfig = field(default_factory=ModelConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    infer: InferenceConfig = field(default_factory=InferenceConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)


def to_dict(cfg: Any) -> Any:
    if dataclasses.is_dataclass(cfg):
        return {f.name: to_dict(getattr(cfg, f.name)) for f in dataclasses.fields(cfg)}
    if isinstance(cfg, (list, tuple)):
        return [to_dict(v) for v in cfg]
    return cfg


def to_json(cfg: Any) -> str:
    return json.dumps(to_dict(cfg), indent=2, sort_keys=True)


def from_dict(cls, data: dict):
    """Rebuild a (possibly nested) config dataclass from `to_dict` output."""
    import typing

    hints = typing.get_type_hints(cls)
    kwargs = {}
    for f in dataclasses.fields(cls):
        if f.name not in data:
            continue
        v = data[f.name]
        ftype = hints.get(f.name)
        if dataclasses.is_dataclass(ftype) and isinstance(v, dict):
            v = from_dict(ftype, v)
        elif isinstance(v, list):
            v = tuple(v)
        kwargs[f.name] = v
    return cls(**kwargs)
