"""Incremental head addition: grow one new class head onto a merged artifact.

The reference's CSV re-merge workflow (model_merger.py:93-160) can only
recombine INDEPENDENTLY trained sub-models — for the shared-trunk artifacts
its own strict=False loader actually produces (SURVEY.md §2.2), adding a
class means retraining everything. Here the shared trunk of an existing
merged/joint checkpoint is FROZEN (applied in inference mode, so its
parameters and batch statistics are byte-identical before and after) and
ONE new binary head trains against it; the trained head is then spliced
into the ensemble and its metadata. Every pre-existing head's logits are
bit-identical post-splice — pinned by tests/test_add_head.py.

The trunk forward runs train=False inside the same jitted program as the
head's forward/backward: gradients exist only for head parameters, so XLA
never materializes a trunk backward (the same economics as the stop-grad
freeze boundary, train/steps.py) — an add-head step is ~the trunk forward
plus an MLP update.

Reference parity anchors: submodel_trainer.py:463-511 (the per-head data
regime the new head trains under), model_merger.py:153-159 (the metadata
being extended)."""

from __future__ import annotations

import dataclasses
import logging
import os
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from synthetic_audio_detection_tpu.data import dataset as ds
from synthetic_audio_detection_tpu.ensemble import multihead
from synthetic_audio_detection_tpu.models.head import BinaryHead
from synthetic_audio_detection_tpu.models.resnet import create_resnet
from synthetic_audio_detection_tpu.train import steps
from synthetic_audio_detection_tpu.utils.config import (
    SpecAugmentConfig,
    SpectrogramConfig,
    TrainConfig,
)

log = logging.getLogger(__name__)


class AddHeadState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any          # head params only
    batch_stats: Any     # head batch stats only
    opt_state: Any


def trunk_variables(ensemble: multihead.MultiHeadEnsemble) -> Dict[str, Any]:
    """The shared trunk of a merged artifact as an unstacked variable tree.

    Only fully shared-backbone artifacts are supported: trunk-shared
    (per_head_stages=K) artifacts would need a fresh per-head tail trained
    alongside the MLP — a different (larger) program; rejected explicitly so
    the caller knows why."""
    if not ensemble.shared_backbone:
        raise ValueError(
            "incremental head addition needs a shared-backbone artifact "
            "(joint-trainer merges, or reference strict=False merges); "
            f"this artifact has shared_backbone={ensemble.shared_backbone}, "
            f"shared_trunk_stages={ensemble.shared_trunk_stages}")
    take0 = lambda a: np.asarray(a[0])  # noqa: E731 - every head holds the same base
    v = ensemble.variables
    return {
        "params": jax.tree_util.tree_map(take0, v["params"]["base"]),
        "batch_stats": jax.tree_util.tree_map(take0, v["batch_stats"]["base"]),
    }


def make_add_head_step(
    model_name: str,
    tx: optax.GradientTransformation,
    spec_cfg: SpectrogramConfig,
    augment: Optional[SpecAugmentConfig],
    sample_rate: int = 32_000,
    dft_mode: Optional[str] = None,
    dtype: Any = jnp.float32,
):
    """step(state, trunk, batch, rng) -> (state, metrics). One XLA program:
    device mel (+SpecAugment) → FROZEN trunk forward (train=False: stored
    batch statistics, no mutation) → head forward/backward → AdamW → NaN
    skip. ``trunk`` is an argument, not a closure constant, so the compiled
    program is reusable across artifacts of the same topology."""
    head = BinaryHead(dtype=dtype)

    def step(state: AddHeadState, trunk, batch, rng):
        rng_mask, rng_drop = jax.random.split(rng)
        x = steps._features_from_waveforms(
            batch["audio"], spec_cfg, augment, rng_mask, sample_rate,
            dft_mode=dft_mode,
        )
        base = create_resnet(model_name, 3, dtype, module_name="base")
        feats = base.apply(
            {"params": trunk["params"], "batch_stats": trunk["batch_stats"]},
            x, train=False,
        )
        feats = jax.lax.stop_gradient(feats)
        labels = batch["label"]
        weights = batch.get("weight")

        def loss_fn(params):
            out, mutated = head.apply(
                {"params": params, "batch_stats": state.batch_stats},
                feats, train=True, mutable=["batch_stats"],
                rngs={"dropout": rng_drop},
            )
            loss = steps.cross_entropy(out, labels, weights)
            return loss, (out, mutated["batch_stats"])

        (loss, (out, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        ok = jnp.isfinite(loss)
        new_state = jax.lax.cond(
            ok,
            lambda _: dataclasses.replace(
                state, step=state.step + 1, params=new_params,
                batch_stats=new_stats, opt_state=new_opt),
            lambda _: dataclasses.replace(state, step=state.step + 1),
            None,
        )
        correct = (jnp.argmax(out, -1) == labels).astype(jnp.float32)
        if weights is not None:
            w = weights.astype(jnp.float32)
            acc = (correct * w).sum() / jnp.maximum(w.sum(), 1.0)
        else:
            acc = correct.mean()
        return new_state, {"loss": loss, "accuracy": acc,
                           "skipped": (~ok).astype(jnp.float32)}

    return step


def make_add_head_eval(
    model_name: str,
    spec_cfg: SpectrogramConfig,
    sample_rate: int = 32_000,
    dft_mode: Optional[str] = None,
    dtype: Any = jnp.float32,
):
    head = BinaryHead(dtype=dtype)

    def eval_step(state_vars, trunk, batch):
        audio = batch["audio"]
        if jnp.issubdtype(audio.dtype, jnp.integer):
            audio = audio.astype(jnp.float32) / 32768.0
        x = steps._features_from_waveforms(
            audio, spec_cfg, None, None, sample_rate, dft_mode=dft_mode)
        base = create_resnet(model_name, 3, dtype, module_name="base")
        feats = base.apply(
            {"params": trunk["params"], "batch_stats": trunk["batch_stats"]},
            x, train=False)
        out = head.apply(
            {"params": state_vars["params"],
             "batch_stats": state_vars["batch_stats"]},
            feats, train=False)
        w = batch.get("weight")
        w = (w if w is not None
             else jnp.ones_like(batch["label"])).astype(jnp.float32)
        correct = (jnp.argmax(out, -1) == batch["label"]).astype(jnp.float32)
        return {"correct": (correct * w).sum(), "count": w.sum()}

    return eval_step


def splice_head(
    ensemble: multihead.MultiHeadEnsemble,
    new_class: str,
    head_params: Any,
    head_stats: Any,
) -> multihead.MultiHeadEnsemble:
    """Insert a trained head into a shared-backbone artifact.

    The new specialist lands at the end of the named synthetic classes; a
    generic head (always the LAST stacked head) stays last. The trunk arrays
    are the existing ones — pre-existing heads are bit-identical. Any stored
    calibration is dropped (its per-column vectors no longer match the
    column count) with a warning; recalibrate with
    tools/calibrate_ensemble.py."""
    if new_class in ensemble.class_names:
        raise ValueError(f"class {new_class!r} already in the ensemble")
    v = jax.tree_util.tree_map(np.asarray, ensemble.variables)
    per_head = multihead.unstack_variables(v, ensemble.num_heads)
    trunk0 = per_head[0]
    new_head = {
        "params": {"base": trunk0["params"]["base"],
                   "head": jax.tree_util.tree_map(np.asarray, head_params)},
        "batch_stats": {"base": trunk0["batch_stats"]["base"],
                        "head": jax.tree_util.tree_map(np.asarray, head_stats)},
    }
    insert_at = len(ensemble.synthetic_names)  # before the generic head
    per_head.insert(insert_at, new_head)
    class_names = (ensemble.synthetic_names + [new_class,
                                               ensemble.real_name])
    if ensemble.calibration:
        log.warning(
            "dropping stored calibration: its per-column vectors no longer "
            "match the grown ensemble (re-run tools/calibrate_ensemble.py)")
    return multihead.build_ensemble(
        ensemble.model, per_head, class_names,
        generic_head=ensemble.generic_head,
    )


class HeadAdder:
    """Train ONE new head against a frozen merged-artifact trunk.

    data regime: new_class is the positive; Real plus every OTHER class
    folder present in the tree are negatives (the hard-negative contract the
    flagship heads train under; ``hard_negatives=False`` restores the
    reference's binary Real-vs-class regime, submodel_trainer.py:463-511)."""

    def __init__(
        self,
        ensemble: multihead.MultiHeadEnsemble,
        new_class: str,
        cfg: TrainConfig,
        spec_cfg: Optional[SpectrogramConfig] = None,
        augment: Optional[SpecAugmentConfig] = None,
        real_class: str = "Real",
        hard_negatives: bool = True,
        model_name: Optional[str] = None,
    ):
        self.ensemble = ensemble
        self.new_class = new_class
        self.cfg = cfg
        self.real_class = real_class
        self.hard_negatives = hard_negatives
        self.model_name = model_name or ensemble.model.backbone
        self.spec_cfg = spec_cfg or SpectrogramConfig.train()
        self.augment = augment or SpecAugmentConfig()
        self.dtype = (jnp.bfloat16 if cfg.compute_dtype == "bfloat16"
                      else jnp.float32)
        self.trunk = trunk_variables(ensemble)

        rng = jax.random.PRNGKey(cfg.seed)
        self.rng, init_rng = jax.random.split(rng)
        # head initialized against the trunk's actual feature shape
        base = create_resnet(self.model_name, 3, jnp.float32,
                             module_name="base")
        dummy = jnp.zeros((2, *self.spec_cfg.model_input_hw(), 3), jnp.float32)
        feats = base.apply(
            {"params": self.trunk["params"],
             "batch_stats": self.trunk["batch_stats"]}, dummy, train=False)
        head = BinaryHead(dtype=self.dtype)
        hv = head.init({"params": init_rng}, feats, train=False)
        self.tx = optax.chain(
            optax.clip_by_global_norm(cfg.grad_clip_norm),
            optax.adamw(cfg.lr, b1=0.9, b2=0.999, eps=1e-8,
                        weight_decay=cfg.weight_decay),
        )
        self.state = AddHeadState(
            step=jnp.zeros((), jnp.int32),
            params=hv["params"],
            batch_stats=hv.get("batch_stats", {}),
            opt_state=self.tx.init(hv["params"]),
        )
        dft = cfg.mel_dft or None
        if (dft is None and cfg.compute_dtype == "bfloat16"
                and jax.default_backend() in ("tpu", "axon")):
            dft = "pallas"
        self._step = jax.jit(make_add_head_step(
            self.model_name, self.tx, self.spec_cfg, self.augment,
            dft_mode=dft, dtype=self.dtype), donate_argnums=(0,))
        self._eval = jax.jit(make_add_head_eval(
            self.model_name, self.spec_cfg, dft_mode=dft, dtype=self.dtype))

    def _samples(self, data_dir: str, mode: str) -> List[Tuple[str, int]]:
        extra: Sequence[str] = ()
        if self.hard_negatives:
            extra = sorted(
                d for d in os.listdir(os.path.join(data_dir, mode))
                if os.path.isdir(os.path.join(data_dir, mode, d))
                and d not in (self.real_class, self.new_class)
            )
        return ds.list_samples(data_dir, mode,
                               [self.real_class, self.new_class],
                               extra_negative_classes=extra)

    def fit(self, data_dir: str) -> float:
        cfg = self.cfg
        train_b = ds.WaveformBatcher(
            self._samples(data_dir, "train"), cfg.batch_size, shuffle=True,
            workers=cfg.workers, seed=cfg.seed)
        val_b = ds.WaveformBatcher(
            self._samples(data_dir, "test"), cfg.batch_size, shuffle=False,
            workers=cfg.workers)
        trunk_dev = jax.device_put(self.trunk)
        best = 0.0
        self._best_head = None  # best-epoch snapshot — splice serves THIS
        for epoch in range(cfg.epochs):
            n_batches = 0
            for batch in train_b.epoch(epoch):
                padded, rows = ds.pad_batch(batch, 2 * cfg.batch_size)
                padded["weight"] = (
                    np.arange(2 * cfg.batch_size) < rows).astype(np.float32)
                self.rng, key = jax.random.split(self.rng)
                self.state, metrics = self._step(
                    self.state, trunk_dev, padded, key)
                n_batches += 1
            correct = count = 0.0
            sv = {"params": self.state.params,
                  "batch_stats": self.state.batch_stats}
            for batch in val_b.epoch(0):
                padded, rows = ds.pad_batch(batch, 2 * cfg.batch_size)
                padded["weight"] = (
                    np.arange(2 * cfg.batch_size) < rows).astype(np.float32)
                st = self._eval(sv, trunk_dev, padded)
                correct += float(st["correct"])
                count += float(st["count"])
            acc = correct / max(count, 1.0)
            if acc >= best or self._best_head is None:
                # the added head can overfit within a few epochs on frozen
                # features (measured: epoch-0 val 0.911 vs epoch-1 0.852,
                # round-5 study) — serve the best validated epoch, matching
                # the joint trainer's best-checkpoint policy
                self._best_head = (
                    jax.tree_util.tree_map(np.asarray, self.state.params),
                    jax.tree_util.tree_map(np.asarray, self.state.batch_stats),
                )
            best = max(best, acc)
            log.info("add-head %s epoch %d: val acc %.4f (%d train batches)",
                     self.new_class, epoch, acc, n_batches)
        return best

    def spliced(self) -> multihead.MultiHeadEnsemble:
        """Grown ensemble serving the BEST validated epoch's head (falls
        back to the current state when fit() has not run)."""
        if getattr(self, "_best_head", None) is not None:
            hp, hs = self._best_head
        else:
            hp = jax.tree_util.tree_map(np.asarray, self.state.params)
            hs = jax.tree_util.tree_map(np.asarray, self.state.batch_stats)
        return splice_head(self.ensemble, self.new_class, hp, hs)
