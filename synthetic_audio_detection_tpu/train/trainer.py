"""Host-side training orchestration for one binary head.

Reproduces the reference main-loop behavior (submodel_trainer.py:531-727):
seeded init, frozen-backbone start, layer3 unfreeze at epochs//3, per-epoch
train + validate, ReduceLROnPlateau stepped on the TRAIN epoch loss inside
the train pass (submodel_trainer.py:307-309), classification report each
epoch, best-val-accuracy checkpointing with full resume (params, optimizer,
scheduler, step counter, and ``start_epoch = saved_epoch + 1`` per
submodel_trainer.py:677), TensorBoard scalars every ``log_every_steps`` and
per epoch, and a final --evaluate pass with confusion matrix.

TPU-native layout: the host loop only moves file bytes and scalars; mel
features, fwd/bwd, the masked-AdamW update, and the NaN guard all live in ONE
jitted step (train/steps.py). Batches are padded to a static shape with 0/1
row weights instead of the reference's dynamically-shrinking collate.
"""

from __future__ import annotations

import logging
import os
import time
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from synthetic_audio_detection_tpu.audio import wavio
from synthetic_audio_detection_tpu.checkpoints import serialization
from synthetic_audio_detection_tpu.data import dataset as ds
from synthetic_audio_detection_tpu.models.classifier import BinaryClassifier
from synthetic_audio_detection_tpu.parallel import sharding as sh
from synthetic_audio_detection_tpu.train import steps
from synthetic_audio_detection_tpu.train.plateau import PlateauState
from synthetic_audio_detection_tpu.utils import metrics as metrics_mod
from synthetic_audio_detection_tpu.utils.config import (
    SpecAugmentConfig,
    SpectrogramConfig,
    TrainConfig,
)
from synthetic_audio_detection_tpu.utils.tb_writer import SummaryWriter

log = logging.getLogger(__name__)


class _GrainBatcher:
    """WaveformBatcher-shaped adapter over data.grain_pipeline (worker
    processes, deterministic global shuffle; TrainConfig.data_backend='grain')."""

    def __init__(self, samples, batch_size, shuffle=True, workers=8, seed=0):
        self.samples = list(samples)
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.workers = workers
        self.seed = seed

    def __len__(self):
        return len(self.samples) // self.batch_size

    def epoch(self, epoch_idx: int = 0):
        from synthetic_audio_detection_tpu.data.grain_pipeline import (
            make_grain_loader,
        )

        epoch_seed = ds.derive_epoch_seed(self.seed, epoch_idx)
        yield from make_grain_loader(
            self.samples, self.batch_size, shuffle=self.shuffle,
            seed=epoch_seed, workers=self.workers,
        )


@dataclass
class EpochResult:
    train_loss: float = 0.0
    train_acc: float = 0.0
    val_loss: float = 0.0
    val_acc: float = 0.0
    report: Dict[str, Dict[str, float]] = field(default_factory=dict)
    confusion: Optional[np.ndarray] = None
    # threshold-free detector metrics (Real = class 0 vs any-synthetic);
    # None when the eval split lacks one of the sides
    val_auc: Optional[float] = None
    val_eer: Optional[float] = None


class Trainer:
    def __init__(
        self,
        cfg: TrainConfig,
        model_name: str = "resnet18",
        spec_cfg: Optional[SpectrogramConfig] = None,
        augment: Optional[SpecAugmentConfig] = None,
        log_dir: Optional[str] = None,
        use_mesh: bool = True,
        class_names: Optional[List[str]] = None,
        reference_quirk_loss: bool = False,
    ):
        self.cfg = cfg
        self.spec_cfg = spec_cfg or SpectrogramConfig.train()
        self.augment = augment or SpecAugmentConfig()
        self.class_names = list(class_names) if class_names else [cfg.class0, cfg.class1]
        self.model = BinaryClassifier(
            backbone=model_name, num_outputs=len(self.class_names),
            s2d_stage1=cfg.s2d_stage1,
            dtype=(jnp.bfloat16 if cfg.compute_dtype == "bfloat16"
                   else jnp.float32),
        )
        self.model_name = model_name

        rng = jax.random.PRNGKey(cfg.seed)
        self.rng, init_rng = jax.random.split(rng)
        self.state, self.tx = steps.create_train_state(
            self.model, init_rng, cfg,
            input_size=self.spec_cfg.model_input_hw(),
        )
        self.plateau = PlateauState(cfg.plateau_factor, cfg.plateau_patience)
        self.best_acc = 0.0
        self.start_epoch = 0
        self.layer3_unfrozen = False

        self._orbax = None
        self._transport = cfg.transport_dtype or (
            "int16"
            if cfg.compute_dtype == "bfloat16"
            and jax.default_backend() in ("tpu", "axon")
            else "float32"
        )
        self.mesh = sh.create_mesh() if use_mesh and jax.device_count() > 1 else None
        self._reference_quirk_loss = reference_quirk_loss
        self._train_step = self._build_train_step()
        self._eval_step = jax.jit(
            steps.make_eval_step(self.model, self.spec_cfg)
        )
        self.writer = SummaryWriter(
            log_dir or os.path.join("runs", f"experiment_{int(time.time())}")
        )

        if cfg.resume:
            self.resume(cfg.resume)

    def _build_train_step(self):
        """(Re)build the jitted step for the current freeze phase. With
        stop_grad_boundary, the backward pass stops at the trainable frontier
        (stage 4, then stage 3 after the epochs//3 unfreeze) — the frozen
        stages' backward work is DCE'd instead of masked to zero, so the
        step recompiles once at the transition (and once on a phase-2
        resume)."""
        stage = 0
        if self.cfg.stop_grad_boundary:
            stage = 3 if self.layer3_unfrozen else 4
        dft = self.cfg.mel_dft or None
        if (
            dft is None
            and self.cfg.compute_dtype == "bfloat16"
            and jax.default_backend() in ("tpu", "axon")
        ):
            # bf16 training already opted into bf16 numerics; route the mel
            # through the serving path's fused factored-DFT kernel (dB-only
            # mode). Measured at native b128 (train_throughput.py --dft-mode
            # pallas, fresh-process reps): 4.59/5.43/4.95 ms/step vs gemm
            # 5.72-6.07 — ~+18%. f32 training keeps the f32 GEMM mel
            # (reference numerics); --mel-dft overrides either way.
            dft = "pallas"
        return jax.jit(
            steps.make_train_step(
                self.model, self.tx, self.cfg, self.spec_cfg, self.augment,
                reference_quirk_loss=self._reference_quirk_loss,
                stop_grad_stage=stage,
                dft_mode=dft,
            ),
            donate_argnums=(0,),
        )

    # -- checkpointing -------------------------------------------------------

    def checkpoint_payload(self, epoch: int) -> Dict[str, Any]:
        return {
            "epoch": epoch,
            "variables": jax.tree_util.tree_map(
                np.asarray, self.state.variables()
            ),
            "opt_state": jax.tree_util.tree_map(
                np.asarray, self.state.opt_state
            ),
            "best_acc": float(self.best_acc),
            "total_steps": int(self.state.step),
            "scheduler": self.plateau.state_dict(),
            "layer3_unfrozen": self.layer3_unfrozen,
        }

    def _torch_optimizer_export(self) -> Optional[Dict[str, Any]]:
        """Adam moments → torch AdamW state-dict format for the ``.pth``
        twin, so resumes from the twin (ours or the reference's,
        submodel_trainer.py:669-682) continue the optimizer trajectory."""
        from synthetic_audio_detection_tpu.checkpoints import torch_compat

        adam = steps.extract_adam_state(self.state.opt_state)
        if adam is None:
            return None
        count, mu, nu = adam
        to_np = lambda t: jax.tree_util.tree_map(np.asarray, t)  # noqa: E731
        return torch_compat.torch_optimizer_state_dict(
            count, to_np(mu), to_np(nu),
            lr=self.cfg.lr * float(self.state.lr_scale),
            weight_decay=self.cfg.weight_decay,
        )

    def save_checkpoint(self, epoch: int, path: str) -> None:
        payload = self.checkpoint_payload(epoch)
        scheduler = payload.pop("scheduler")
        extra = {
            "epoch": payload.pop("epoch"),
            "best_acc": payload.pop("best_acc"),
            "total_steps": payload.pop("total_steps"),
            "layer3_unfrozen": payload.pop("layer3_unfrozen"),
            "scheduler": scheduler,
            "model_name": self.model_name,
            "class_names": self.class_names,
        }
        torch_opt = self._torch_optimizer_export()
        if self.cfg.checkpoint_backend == "orbax":
            if self._orbax is None:
                from synthetic_audio_detection_tpu.checkpoints.orbax_io import (
                    OrbaxCheckpointer,
                )

                self._orbax = OrbaxCheckpointer(path + ".orbax")
            self._orbax.save(extra["total_steps"], payload, metadata=extra)
            # keep the torch twin for reference-tooling interop
            serialization.save_submodel_torch(
                path + ".pth", payload["variables"], epoch=extra["epoch"],
                best_acc=extra["best_acc"], total_steps=extra["total_steps"],
                scheduler=extra["scheduler"],
                layer3_unfrozen=extra["layer3_unfrozen"],
                optimizer=torch_opt,
            )
            return
        serialization.save_native(path, payload, metadata=extra)
        # torch-contract twin so reference tooling can read our checkpoints
        serialization.save_submodel_torch(
            path + ".pth",
            payload["variables"],
            epoch=extra["epoch"],
            best_acc=extra["best_acc"],
            total_steps=extra["total_steps"],
            scheduler=extra["scheduler"],
            layer3_unfrozen=extra["layer3_unfrozen"],
            optimizer=torch_opt,
        )

    def resume(self, path: str) -> None:
        """Restore params/opt/scheduler/step and set ``start_epoch`` to the
        saved epoch + 1, matching submodel_trainer.py:672-677 (the saved epoch
        already completed). Accepts native or torch checkpoints. Torch resumes
        restore the scheduler when the checkpoint carries a usable
        ReduceLROnPlateau state dict, and map the torch AdamW moment tensors
        (exp_avg/exp_avg_sq/step) onto the optax ScaleByAdamState — the same
        optimizer round trip the reference performs at
        submodel_trainer.py:669-682/707-714."""
        if path.endswith((".pth", ".pt")):
            variables, extras = serialization.load_submodel_torch(path)
            self.state = self.state.replace(
                params=variables["params"],
                batch_stats=variables["batch_stats"],
            )
            self.start_epoch = int(extras.get("epoch", -1)) + 1
            self.best_acc = float(extras.get("best_acc", 0.0))
            if "total_steps" in extras:
                self.state = self.state.replace(
                    step=jnp.asarray(int(extras["total_steps"]), jnp.int32)
                )
            sched = extras.get("scheduler")
            if isinstance(sched, dict) and sched:
                if "scale" in sched:  # our twin stores PlateauState directly
                    self.plateau = PlateauState.from_state_dict(sched)
                else:  # genuine torch ReduceLROnPlateau state dict
                    self.plateau = PlateauState.from_torch_state_dict(
                        sched, base_lr=self.cfg.lr
                    )
                self.state = self.state.replace(
                    lr_scale=jnp.asarray(self.plateau.scale, jnp.float32)
                )
            if extras.get("layer3_unfrozen"):
                self.state = steps.unfreeze_layer3(self.state)
                self.layer3_unfrozen = True
                self._train_step = self._build_train_step()
            from synthetic_audio_detection_tpu.checkpoints import torch_compat

            adam = torch_compat.adam_moments_from_torch(
                extras.get("optimizer"), extras.get("raw_state_dict", {})
            )
            if adam is not None:
                count, mu_p, nu_p = adam
                zeros = jax.tree_util.tree_map(jnp.zeros_like, self.state.params)
                self.state = self.state.replace(
                    opt_state=steps.replace_adam_state(
                        self.state.opt_state, count,
                        torch_compat.overlay_tree(zeros, mu_p),
                        torch_compat.overlay_tree(zeros, nu_p),
                    )
                )
                log.info("restored AdamW moments from torch checkpoint "
                         "(step %d)", count)
            elif extras.get("optimizer"):
                log.warning("torch-ckpt resume: optimizer dict present but "
                            "unmappable; moments restart fresh")
            log.info("resumed (torch ckpt) at epoch %d", self.start_epoch)
            return
        from flax import serialization as flax_ser

        tree, meta = serialization.load_native(path)
        self.state = self.state.replace(
            params=tree["variables"]["params"],
            batch_stats=tree["variables"]["batch_stats"],
            opt_state=flax_ser.from_state_dict(
                self.state.opt_state, tree["opt_state"]
            ),
            step=jnp.asarray(meta.get("total_steps", 0), jnp.int32),
        )
        self.plateau = PlateauState.from_state_dict(meta["scheduler"])
        self.state = self.state.replace(
            lr_scale=jnp.asarray(self.plateau.scale, jnp.float32)
        )
        self.best_acc = float(meta.get("best_acc", 0.0))
        self.start_epoch = int(meta.get("epoch", -1)) + 1
        if meta.get("layer3_unfrozen"):
            self.state = steps.unfreeze_layer3(self.state)
            self.layer3_unfrozen = True
            self._train_step = self._build_train_step()
        log.info("resumed at epoch %d (best_acc %.4f)", self.start_epoch, self.best_acc)

    # -- epochs ---------------------------------------------------------------

    def _batches(self, batcher: ds.WaveformBatcher, epoch: int, target_rows: int):
        for batch in batcher.epoch(epoch):
            if "weight" in batch:
                # grain backend: fixed-shape batches with weights built in
                padded = batch
            else:
                padded, n = ds.pad_batch(batch, target_rows)
                padded["weight"] = (
                    np.arange(target_rows) < n
                ).astype(np.float32)
            if (self._transport == "int16"
                    and padded["audio"].dtype != np.int16):
                # PCM transport (utils/config.py:TrainConfig.transport_dtype):
                # exact for the post-ETL PCM_16 segment contract; the jitted
                # step dequantizes on device. Shared with serving so both
                # transports round identically (wavio.pcm16_quantize).
                padded = dict(padded, audio=wavio.pcm16_quantize(padded["audio"]))
            if self.mesh is not None:
                padded = sh.shard_batch(self.mesh, padded)
            yield padded

    def train_epoch(self, batcher: ds.WaveformBatcher, epoch: int) -> Dict[str, float]:
        target_rows = 2 * batcher.batch_size
        # Full-epoch running mean accumulated ON DEVICE (tiny scalar adds, no
        # per-step host sync): this is what the reference's scheduler consumes
        # (submodel_trainer.py:300-309) — sampling only every log_every_steps
        # batches would make the plateau decision depend on logging cadence.
        loss_sum = jnp.float32(0.0)
        acc_sum = jnp.float32(0.0)
        n_good = jnp.float32(0.0)
        t0 = time.time()
        for i, batch in enumerate(self._batches(batcher, epoch, target_rows)):
            self.rng, step_rng = jax.random.split(self.rng)
            self.state, m = self._train_step(self.state, batch, step_rng)
            # NaN-skipped batches stay out of the epoch mean (the reference's
            # `continue` drops them from its running loss too)
            good = jnp.isfinite(m["loss"]).astype(jnp.float32)
            loss_sum = loss_sum + jnp.where(good > 0, m["loss"], 0.0)
            acc_sum = acc_sum + good * m["accuracy"]
            n_good = n_good + good
            if (i + 1) % self.cfg.log_every_steps == 0:
                loss = float(m["loss"])
                acc = float(m["accuracy"])
                step = int(self.state.step)
                lr = self.cfg.lr * float(self.state.lr_scale)
                self.writer.add_scalar("train/loss", loss, step)
                self.writer.add_scalar("train/accuracy", acc, step)
                self.writer.add_scalar("train/lr", lr, step)
                log.info(
                    "epoch %d step %d loss %.4f acc %.4f (%.1f rows/s)",
                    epoch, step, loss, acc,
                    (i + 1) * target_rows / (time.time() - t0),
                )
        denom = max(float(n_good), 1.0)
        return {
            "loss": float(loss_sum) / denom,
            "accuracy": float(acc_sum) / denom,
        }

    def validate(self, batcher: ds.WaveformBatcher, epoch: int) -> EpochResult:
        target_rows = 2 * batcher.batch_size
        loss_sum = 0.0
        n_cls = len(self.class_names)
        confusion = np.zeros((n_cls, n_cls), np.float64)
        count = 0.0
        variables = self.state.variables()
        scores: list = []
        is_syn: list = []
        for batch in self._batches(batcher, epoch, target_rows):
            stats = self._eval_step(variables, batch)
            loss_sum += float(stats["loss_sum"])
            confusion += np.asarray(stats["confusion"], np.float64)
            count += float(stats["count"])
            # any-synthetic score = 1 - P(Real); labels/weights are host-side
            valid = np.asarray(batch["weight"]) > 0
            probs = np.asarray(stats["probs"], np.float32)[valid]
            scores.append(1.0 - probs[:, 0])
            is_syn.append(np.asarray(batch["label"])[valid] != 0)
        result = EpochResult()
        result.val_loss = loss_sum / max(count, 1.0)
        result.val_acc = float(np.trace(confusion) / max(count, 1.0))
        result.report = metrics_mod.report_from_confusion(confusion, self.class_names)
        result.confusion = confusion
        if scores:
            s, y = np.concatenate(scores), np.concatenate(is_syn)
            if 0 < y.sum() < y.size:  # ROC needs both sides present
                result.val_auc = metrics_mod.roc_auc(s, y)
                result.val_eer = metrics_mod.equal_error_rate(s, y)[0]
        return result

    def fit(self, data_dir: Optional[str] = None) -> float:
        cfg = self.cfg
        data_dir = data_dir or cfg.data_dir
        extra_neg = tuple(cfg.hard_negative_classes)
        train_samples = ds.list_samples(data_dir, "train", self.class_names,
                                        extra_negative_classes=extra_neg)
        val_samples = ds.list_samples(data_dir, "test", self.class_names,
                                      extra_negative_classes=extra_neg)
        make = (_GrainBatcher if cfg.data_backend == "grain"
                else ds.WaveformBatcher)
        train_batcher = make(
            train_samples, cfg.batch_size, shuffle=True,
            workers=cfg.workers, seed=cfg.seed,
        )
        val_batcher = make(
            val_samples, cfg.batch_size, shuffle=False, workers=cfg.workers
        )
        os.makedirs(cfg.checkpoint_dir, exist_ok=True)
        unfreeze_epoch = int(cfg.epochs * cfg.unfreeze_layer3_at_fraction)

        for epoch in range(self.start_epoch, cfg.epochs):
            # >= (not ==): a resume that starts past the boundary (e.g. a
            # torch checkpoint without the layer3_unfrozen flag, saved at or
            # after the unfreeze epoch) must still unfreeze on its first epoch.
            # reference_quirk_frozen_layer3 reproduces the reference exactly:
            # its optimizer never holds layer3 (built pre-loop over the
            # phase-1 filter, submodel_trainer.py:647-651), so its "unfreeze"
            # changes no weights — we skip the transition entirely.
            if (epoch >= unfreeze_epoch and not self.layer3_unfrozen
                    and not cfg.reference_quirk_frozen_layer3):
                self.state = steps.unfreeze_layer3(self.state)
                self.layer3_unfrozen = True
                # move the gradient-stop boundary down to layer3 (one-time
                # recompile; same params/opt state, so donation is safe)
                self._train_step = self._build_train_step()
                log.info("epoch %d: unfroze layer3 (epochs//3 schedule)", epoch)

            tr = self.train_epoch(train_batcher, epoch)
            # Reference steps ReduceLROnPlateau on the TRAIN epoch loss inside
            # train(), before validation (submodel_trainer.py:307-309).
            scale = self.plateau.update(tr["loss"])
            self.state = self.state.replace(
                lr_scale=jnp.asarray(scale, jnp.float32)
            )
            result = self.validate(val_batcher, epoch)

            self.writer.add_scalar("epoch/train_loss", tr["loss"], epoch)
            self.writer.add_scalar("epoch/val_loss", result.val_loss, epoch)
            self.writer.add_scalar("epoch/val_accuracy", result.val_acc, epoch)
            if result.val_auc is not None:
                self.writer.add_scalar("epoch/val_auc", result.val_auc, epoch)
                self.writer.add_scalar("epoch/val_eer", result.val_eer, epoch)
                log.info("epoch %d: val AUC %.4f EER %.4f",
                         epoch, result.val_auc, result.val_eer)
            log.info(
                "epoch %d: train loss %.4f | val loss %.4f acc %.4f | lr scale %.4f",
                epoch, tr["loss"], result.val_loss, result.val_acc, scale,
            )
            log.info("\n%s", metrics_mod.format_report(result.report))

            if result.val_acc > self.best_acc:
                self.best_acc = result.val_acc
                path = os.path.join(cfg.checkpoint_dir, "best_model.ckpt")
                self.save_checkpoint(epoch, path)
                log.info("saved best checkpoint (acc %.4f) -> %s", self.best_acc, path)
        return self.best_acc

    def evaluate(self, data_dir: Optional[str] = None) -> EpochResult:
        """--evaluate mode: confusion matrix + per-class accuracy on test
        (submodel_trainer.py:388-460)."""
        data_dir = data_dir or self.cfg.data_dir
        samples = ds.list_samples(data_dir, "test", self.class_names)
        batcher = ds.WaveformBatcher(
            samples, self.cfg.batch_size, shuffle=False, workers=self.cfg.workers
        )
        result = self.validate(batcher, 0)
        log.info("\n%s", metrics_mod.format_confusion(result.confusion, self.class_names))
        log.info("\n%s", metrics_mod.format_report(result.report))
        if result.val_auc is not None:
            log.info("detector AUC %.4f  EER %.4f (Real vs any-synthetic)",
                     result.val_auc, result.val_eer)
        return result
