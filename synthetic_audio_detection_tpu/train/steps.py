"""Jitted training/eval steps for one binary head.

Reference training semantics reproduced (submodel_trainer.py:241-313,646-660):
- CrossEntropyLoss over 2 logits, targets {0=Real, 1=Synthetic}. (The sane
  head-in-the-loss path — the reference's trainer accidentally computes CE on
  pooled backbone features because timm ResNets classify via ``.fc`` not
  ``.head`` (SURVEY.md §2.2); the checkpoint importer preserves that quirk's
  *consequences*, the trainer does not reproduce the bug.)
- AdamW(lr, weight_decay=0.01) (:648), global-norm gradient clip 0.5 (:276)
- NaN/Inf loss → skip the whole update, matching `continue` at :266-271 —
  implemented inside jit with lax.cond so the step stays one XLA program.
- Freeze schedule: backbone frozen except layer4 at start; layer3 unfreezes at
  epoch == epochs//3 (:609-633, :687-691) — implemented as a traced 0/1
  parameter mask multiplied into the updates, so one compiled step serves all
  phases.
- ReduceLROnPlateau(factor=0.5, patience=2) on the TRAIN epoch loss (:307-309,
  :654-660) — host-side
  state (train/plateau.py); the lr scale enters the step as a scalar operand.
- BatchNorm running stats update in train mode (torch momentum 0.1).

TPU-native design: the mel front end runs *inside* the train step (device-side
feature extraction — SURVEY.md §3.1 notes the reference computes mels on CPU
in DataLoader workers, its biggest inefficiency); batch is sharded over the
mesh 'data' axis; XLA inserts the gradient all-reduce over ICI.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import FrozenDict

from synthetic_audio_detection_tpu.models.classifier import BinaryClassifier
from synthetic_audio_detection_tpu.ops import image as image_ops
from synthetic_audio_detection_tpu.ops import masking, melspec
from synthetic_audio_detection_tpu.utils.config import (
    SpecAugmentConfig,
    SpectrogramConfig,
    TrainConfig,
)


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    # 0/1 per-leaf freeze mask over params (1 = trainable)
    param_mask: Any
    # multiplicative lr scale from the plateau scheduler (host-updated)
    lr_scale: jnp.ndarray

    def variables(self) -> Dict[str, Any]:
        return {"params": self.params, "batch_stats": self.batch_stats}


# ---------------------------------------------------------------------------
# Freeze masks
# ---------------------------------------------------------------------------

def freeze_mask(params: Any, trainable_prefixes: Tuple[str, ...]) -> Any:
    """0/1 mask tree: a leaf is trainable iff its path contains one of the
    prefixes. Reference phase 1: ('head', 'layer4'); phase 2 adds 'layer3'
    (submodel_trainer.py:609-633, 687-691)."""

    def walk(tree, path):
        if isinstance(tree, (dict, FrozenDict)):
            return {k: walk(v, path + (k,)) for k, v in tree.items()}
        on = any(any(p.startswith(pref) for p in path) for pref in trainable_prefixes)
        return jnp.asarray(1.0 if on else 0.0, jnp.float32)

    return walk(params, ())


PHASE1_PREFIXES = ("head", "layer4")
PHASE2_PREFIXES = ("head", "layer4", "layer3")


# ---------------------------------------------------------------------------
# Optimizer
# ---------------------------------------------------------------------------

def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    """clip(0.5) → AdamW(lr, wd=0.01); lr is scaled at apply time by the
    plateau factor through inject_hyperparams."""

    def tx(lr):
        return optax.chain(
            optax.clip_by_global_norm(cfg.grad_clip_norm),
            optax.adamw(lr, b1=0.9, b2=0.999, eps=1e-8,
                        weight_decay=cfg.weight_decay),
        )

    return optax.inject_hyperparams(tx)(lr=cfg.lr)


def create_train_state(
    model: BinaryClassifier,
    rng: jax.Array,
    cfg: TrainConfig,
    input_size: Any = 512,  # int (square) or (H, W)
    initial_variables: Optional[Dict[str, Any]] = None,
) -> Tuple[TrainState, optax.GradientTransformation]:
    if initial_variables is None:
        hw = (input_size, input_size) if isinstance(input_size, int) else tuple(input_size)
        dummy = jnp.zeros((2, *hw, model.in_channels), jnp.float32)
        initial_variables = model.init({"params": rng}, dummy, train=False)
    params = initial_variables["params"]
    tx = make_optimizer(cfg)
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=initial_variables.get("batch_stats", {}),
        opt_state=tx.init(params),
        param_mask=freeze_mask(params, PHASE1_PREFIXES),
        lr_scale=jnp.ones((), jnp.float32),
    )
    return state, tx


def unfreeze_layer3(state: TrainState) -> TrainState:
    """Epoch == epochs//3 transition (submodel_trainer.py:687-691)."""
    return state.replace(param_mask=freeze_mask(state.params, PHASE2_PREFIXES))


def extract_adam_state(opt_state: Any) -> Optional[Tuple[int, Any, Any]]:
    """Find the ScaleByAdamState inside a (possibly inject_hyperparams-
    wrapped, chained) optax state → (count, mu, nu), or None."""
    found: list = []

    def walk(node):
        if isinstance(node, optax.ScaleByAdamState):
            found.append(node)
        elif isinstance(node, (tuple, list)):
            for x in node:
                walk(x)

    walk(opt_state)
    if not found:
        return None
    st = found[0]
    return int(st.count), st.mu, st.nu


def replace_adam_state(opt_state: Any, count: int, mu: Any, nu: Any) -> Any:
    """Return ``opt_state`` with its ScaleByAdamState's moments/count swapped
    for the given trees — the torch-``.pth``-resume path
    (submodel_trainer.py:669-682 restores the torch AdamW dict; this is the
    optax side of that round trip)."""

    def walk(node):
        if isinstance(node, optax.ScaleByAdamState):
            as_f32 = lambda t: jax.tree_util.tree_map(  # noqa: E731
                lambda a: jnp.asarray(a, jnp.float32), t)
            return optax.ScaleByAdamState(
                count=jnp.asarray(count, jnp.int32),
                mu=as_f32(mu),
                nu=as_f32(nu),
            )
        if isinstance(node, tuple) and hasattr(node, "_fields"):
            return type(node)(*[walk(x) for x in node])
        if isinstance(node, tuple):
            return tuple(walk(x) for x in node)
        if isinstance(node, list):
            return [walk(x) for x in node]
        return node

    return walk(opt_state)


# ---------------------------------------------------------------------------
# Loss / forward
# ---------------------------------------------------------------------------

def cross_entropy(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    weights: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Mean CE over valid rows. `weights` (0/1 per row) masks out the zero
    rows that pad a shrunken batch up to the static jit shape (the reference
    instead shrinks the batch dynamically via custom_collate_fn,
    submodel_trainer.py:221-238 — dynamic shapes are not an option under XLA)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    if weights is None:
        return nll.mean()
    w = weights.astype(jnp.float32)
    return (nll * w).sum() / jnp.maximum(w.sum(), 1.0)


def _features_from_waveforms(
    waveforms: jnp.ndarray,
    spec_cfg: SpectrogramConfig,
    augment: Optional[SpecAugmentConfig],
    rng: Optional[jax.Array],
    sample_rate: int,
    dft_mode: Optional[str] = None,
) -> jnp.ndarray:
    """[B, T] → [B, H, W, 3] standardized spectrogram images, with SpecAugment
    masking applied pre-normalization in train mode (submodel_trainer.py:194-197
    applies masks to the dB spectrogram before standardize) and
    RandomResizedCrop applied post-resize (train transform,
    submodel_trainer.py:465-467 via :207-208). In native mode (out_size=0) the
    crop runs on the TRUE [n_mels, n_frames] content before the frame-axis pad
    so the augmentation never samples pad columns.

    dft_mode=None → 'gemm': the train-step A/B at native b128
    (train_throughput.py --dft-mode '' gemm factored, after the LICM
    chaining fix) measured ~5.9 ms/step GEMM (5.72/5.97/6.04 over three
    same-process reps) vs 15.48 fft vs 7.82 jnp-factored — the XLA rFFT
    costs more than the whole rest of the step, and the factored assembly
    (shifted gathers) only pays off inside the handwritten Pallas serving
    kernel, not through XLA. Cross-checked at 512² b128: gemm 33.35 ms vs
    fft 42.78 — the same ~9.5 ms fft-vs-gemm delta.

    Integer-typed waveforms are int16 PCM transport (mirroring the serving
    path, infer/pipeline.py: half the float32 host→device traffic; EXACT for PCM_16
    mono 32 kHz sources — the post-ETL segment contract) and are dequantized
    here on device.

    dft_mode='pallas' routes the front end through the serving path's fused
    factored-DFT Pallas kernel in dB-only mode (standardize=False) — legal in
    training because no gradient flows through the mel (it is a function of
    the input audio only); SpecAugment/standardize/crop stay in jnp so the
    reference's mask-before-normalize order is preserved. Compiled on TPU
    backends, interpreter mode elsewhere (tests). Measured at native b128
    (fresh-process reps): 4.59/5.43/4.95 ms/step vs gemm 5.72-6.07 — ~+18%;
    the Trainer auto-selects it for bf16 training on TPU backends."""
    if jnp.issubdtype(waveforms.dtype, jnp.integer):
        waveforms = waveforms.astype(jnp.float32) / 32768.0
    if (augment is not None and augment.enabled and augment.wave_enabled
            and rng is not None):
        # On-device waveform augmentation (fresh draws per step; the rng is
        # only consumed when enabled, so disabled trajectories stay
        # bit-identical to pre-feature builds).
        from synthetic_audio_detection_tpu.ops import waveform_augment

        rng_wave, rng = jax.random.split(rng)
        waveforms = waveform_augment.augment_waveforms(
            rng_wave, waveforms, augment, sample_rate)
    if dft_mode == "pallas":
        from synthetic_audio_detection_tpu.ops import pallas_melspec

        db = pallas_melspec.fused_log_mel_factored(
            waveforms, spec_cfg, sample_rate,
            interpret=jax.default_backend() not in ("tpu", "axon"),
            standardize=False,
        )
    else:
        mel = melspec.mel_spectrogram(waveforms, spec_cfg, sample_rate,
                                      dft_mode=dft_mode or "gemm")
        db = melspec.amplitude_to_db(mel, spec_cfg.top_db)
    train_mode = augment is not None and augment.enabled and rng is not None
    if train_mode:
        rng_mask, rng_crop = jax.random.split(rng)
        db = masking.spec_augment(
            rng_mask, db, augment.freq_mask_param, augment.time_mask_param
        )
    z = melspec.standardize(db, spec_cfg.eps)
    if spec_cfg.is_native:
        if train_mode:
            z = image_ops.random_resized_crop(rng_crop, z, scale=(0.8, 1.0))
        z = melspec.finalize_features(z, spec_cfg)
    else:
        z = melspec.finalize_features(z, spec_cfg)
        if train_mode:
            z = image_ops.random_resized_crop(rng_crop, z, scale=(0.8, 1.0))
    return melspec.replicate_channels(z, spec_cfg.out_channels)


# ---------------------------------------------------------------------------
# Steps
# ---------------------------------------------------------------------------

def make_train_step(
    model: BinaryClassifier,
    tx: optax.GradientTransformation,
    cfg: TrainConfig,
    spec_cfg: SpectrogramConfig,
    augment: Optional[SpecAugmentConfig] = None,
    sample_rate: int = 32_000,
    from_waveforms: bool = True,
    reference_quirk_loss: bool = False,
    stop_grad_stage: int = 0,
    dft_mode: Optional[str] = None,
) -> Callable:
    """Returns train_step(state, batch, rng) -> (state, metrics).

    batch: {'audio': [B, T] or 'image': [B, S, S, 3], 'label': [B] int32}.
    One XLA program: feature extraction + fwd + bwd + masked update + NaN skip.

    reference_quirk_loss=True reproduces the reference trainer's bug exactly
    (SURVEY.md §2.2): timm ResNets classify via ``.fc`` not ``.head``, so its
    `model(inputs)` returns the POOLED BACKBONE FEATURES and the CE loss at
    submodel_trainer.py:263 treats the num_features-dim feature vector as
    class scores for targets {0, 1} — the custom head is never in the loss.
    Default False (the sane head-in-the-loss path, per SURVEY.md §7.3).

    stop_grad_stage > 0 stops gradients on the activation entering that
    backbone stage (models/resnet.py:ResNet.stop_grad_stage), skipping the
    backward pass through stages the freeze mask zeroes anyway. The caller is
    responsible for keeping it consistent with the freeze phase (4 for the
    phase-1 mask, 3 after layer3 unfreezes) — the Trainer rebuilds the step at
    the transition. Updates are identical to the masked-only path; the frozen
    stages' backward work is simply never emitted."""

    if stop_grad_stage:
        model = model.clone(stop_grad_stage=stop_grad_stage)

    def train_step(state: TrainState, batch: Dict[str, jnp.ndarray], rng: jax.Array):
        rng_mask, rng_drop = jax.random.split(rng)
        if from_waveforms:
            x = _features_from_waveforms(
                batch["audio"], spec_cfg, augment, rng_mask, sample_rate,
                dft_mode=dft_mode,
            )
        else:
            x = batch["image"]
        labels = batch["label"]
        weights = batch.get("weight")

        def loss_fn(params):
            if reference_quirk_loss:
                from synthetic_audio_detection_tpu.models.resnet import create_resnet

                base = create_resnet(model.backbone, model.in_channels,
                                     model.dtype, module_name="base",
                                     stop_grad_stage=stop_grad_stage)
                feats, mutated = base.apply(
                    {"params": params["base"],
                     "batch_stats": state.batch_stats["base"]},
                    x, train=True, mutable=["batch_stats"],
                )
                # pooled features AS the "logits" (the reference's bug)
                out = feats.mean(axis=(1, 2))
                loss = cross_entropy(out, labels, weights)
                new_stats = {"batch_stats": {
                    "base": mutated["batch_stats"],
                    "head": state.batch_stats["head"],
                }}
                return loss, (out, new_stats["batch_stats"])
            out, mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                x,
                train=True,
                mutable=["batch_stats"],
                rngs={"dropout": rng_drop},
            )
            loss = cross_entropy(out, labels, weights)
            return loss, (out, mutated["batch_stats"])

        (loss, (logits, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)

        # freeze mask: zero out gradients of frozen params BEFORE the optimizer
        # so Adam moments don't accumulate on them
        mask = state.param_mask
        if reference_quirk_loss:
            # torch skips grad-None params entirely (no AdamW weight decay):
            # with the quirk loss only the backbone is in the graph, so the
            # head must receive no updates at all
            quirk_mask = freeze_mask(state.params, ("base",))
            mask = jax.tree_util.tree_map(lambda a, b: a * b, mask, quirk_mask)
        grads = jax.tree_util.tree_map(lambda g, m: g * m, grads, mask)

        # plateau lr scale enters through the injected hyperparam
        opt_state = state.opt_state
        opt_state.hyperparams["lr"] = cfg.lr * state.lr_scale
        updates, new_opt_state = tx.update(grads, opt_state, state.params)
        updates = jax.tree_util.tree_map(lambda u, m: u * m, updates, mask)
        new_params = optax.apply_updates(state.params, updates)

        # NaN/Inf guard: keep the old state entirely (reference skips the
        # batch, submodel_trainer.py:266-271)
        ok = jnp.isfinite(loss)

        def commit(_):
            return dataclasses.replace(
                state,
                step=state.step + 1,
                params=new_params,
                batch_stats=new_stats,
                opt_state=new_opt_state,
            )

        def skip(_):
            return dataclasses.replace(state, step=state.step + 1)

        new_state = jax.lax.cond(ok, commit, skip, None)
        correct = (jnp.argmax(logits, -1) == labels).astype(jnp.float32)
        if weights is not None:
            w = weights.astype(jnp.float32)
            acc = (correct * w).sum() / jnp.maximum(w.sum(), 1.0)
        else:
            acc = correct.mean()
        metrics = {"loss": loss, "accuracy": acc, "skipped": (~ok).astype(jnp.float32)}
        return new_state, metrics

    return train_step


def make_eval_step(
    model: BinaryClassifier,
    spec_cfg: SpectrogramConfig,
    sample_rate: int = 32_000,
    from_waveforms: bool = True,
    dft_mode: Optional[str] = None,
) -> Callable:
    """eval_step(variables, batch) -> per-batch sufficient statistics
    (loss-sum, correct-count, per-class confusion counts) so the host can
    aggregate the reference's classification report (submodel_trainer.py:376-383),
    plus the per-row softmax probabilities so it can also compute
    threshold-free detector metrics (ROC-AUC/EER, utils/metrics.py) that
    need the full score ordering rather than counts."""

    def eval_step(variables, batch):
        if from_waveforms:
            x = _features_from_waveforms(
                batch["audio"], spec_cfg, None, None, sample_rate,
                dft_mode=dft_mode,
            )
        else:
            x = batch["image"]
        labels = batch["label"]
        weights = batch.get("weight")
        w = (weights if weights is not None
             else jnp.ones_like(labels)).astype(jnp.float32)
        logits = model.apply(variables, x, train=False)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
        loss_sum = (-jnp.take_along_axis(logp, labels[:, None], -1)[:, 0] * w).sum()
        pred = jnp.argmax(logits, -1)
        n_cls = logits.shape[-1]
        # confusion: rows = true, cols = pred (pad rows weighted out)
        conf = jnp.zeros((n_cls, n_cls), jnp.float32).at[labels, pred].add(w)
        return {"loss_sum": loss_sum, "confusion": conf, "count": w.sum(),
                "probs": jnp.exp(logp)}

    return eval_step
