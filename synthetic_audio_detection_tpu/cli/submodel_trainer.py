"""Compat CLI: train one binary sub-model (Real vs one synthetic class).

Flag surface mirrors the reference submodel_trainer.py:33-53 (--data-dir,
--batch-size, --epochs, --lr, --workers, --seed, --checkpoint-dir, --resume,
--evaluate, --Class0, --Class1, --model-name); --gpu/--num_gpus are accepted
and ignored (JAX SPMD owns device parallelism — all local devices are used
through the mesh automatically).

Usage:
    python -m synthetic_audio_detection_tpu.cli.submodel_trainer \
        --data-dir ./dataset --Class0 Real --Class1 SynthA --epochs 30
"""

from __future__ import annotations

import argparse
import logging
import os
import sys
import time

# Every vanilla-topology timm resnet* name (models/resnet.py:RESNET_SPECS).
# Unknown names are rejected with this choices list, reproducing the
# reference's argparse behavior (submodel_trainer.py:51-52).
from synthetic_audio_detection_tpu.models.resnet import RESNET_SPECS

BACKBONES = tuple(sorted(RESNET_SPECS))


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Audio Classification Training")
    p.add_argument("--data-dir", default="./dataset", type=str, help="Path to dataset")
    p.add_argument("--batch-size", default=32, type=int, help="Batch size (files; each file yields 2 segments)")
    p.add_argument("--epochs", default=100, type=int, help="Number of total epochs to run")
    p.add_argument("--lr", default=0.001, type=float, help="Initial learning rate")
    p.add_argument("--workers", default=20, type=int, help="Number of data loading workers")
    p.add_argument("--seed", default=42, type=int, help="Seed for initializing training.")
    p.add_argument("--gpu", default=0, type=int, help="Ignored (reference compatibility)")
    p.add_argument("--num_gpus", default=1, type=int, help="Ignored (JAX uses all local devices)")
    p.add_argument("--checkpoint-dir", default="./checkpoints", type=str)
    p.add_argument("--resume", default="", type=str, help="Path to resume checkpoint")
    p.add_argument("--evaluate", action="store_true", help="Evaluate model on validation set")
    p.add_argument("--Class0", default="Real", type=str, help="Name of Class 0 eg. Real")
    p.add_argument("--Class1", default="Class1", type=str, help="Name of Class 1 eg. Training platform")
    p.add_argument("--hard-negative-classes", nargs="*", default=[],
                   metavar="CLASS",
                   help="Additional class folders trained as Class0 (hard "
                   "negatives): makes this head answer 'this generator?' "
                   "instead of 'synthetic?', fixing ensemble-attribution "
                   "argmax ties between saturated heads (attribution 0.667 "
                   "-> 1.000 on the 3-class study, docs/PERFORMANCE.md; "
                   "binary detection is unaffected via the any-head rule)")
    p.add_argument("--model-name", default="resnet18", type=str, choices=BACKBONES)
    p.add_argument("--log-dir", default="", type=str,
                   help="TensorBoard log dir (default runs/experiment_<ts>)")
    from synthetic_audio_detection_tpu.utils.config import parse_input_size

    p.add_argument("--input-size", default=512, type=parse_input_size,
                   help="Spectrogram image size (512 = reference fidelity; "
                   "smaller sizes trade accuracy for speed; 'native' trains "
                   "at the mel's true 128-by-frames resolution with no "
                   "resize — docs/PERFORMANCE.md)")
    p.add_argument("--s2d-layer1", action=argparse.BooleanOptionalAction,
                   default=None,
                   help="Run stage 1 in exact H-only space-to-depth form "
                   "(identical params/grads/stats; measured +13%% train step "
                   "at batch 32-64 on v5e — models/resnet.py:S2DBasicBlock). "
                   "Default: auto (on for TPU + input>=512 + basic-block).")
    p.add_argument("--data-backend", default="threads",
                   choices=("threads", "grain"),
                   help="Input pipeline: thread pool (default) or grain "
                   "worker processes")
    p.add_argument("--bf16", action="store_true",
                   help="bfloat16 compute in the train step (params/optimizer/"
                   "loss stay float32). ~MXU-rate convs on TPU; the reference "
                   "trains in f32, so this is opt-in.")
    p.add_argument("--mel-dft", default="",
                   choices=("", "fft", "gemm", "factored", "pallas"),
                   help="Device-mel DFT path in the train step. Default '' = "
                   "the measured default (GEMM-DFT); 'pallas' = the serving "
                   "path's fused factored-DFT kernel in dB-only mode (bf16 "
                   "DFT numerics, TPU backends).")
    p.add_argument("--transport-dtype", default="",
                   choices=("", "float32", "int16"),
                   help="Host-to-device waveform transport. Default '' = auto "
                   "(int16 under --bf16 on TPU backends, float32 otherwise). "
                   "int16 halves host-to-device bytes per step and is exact "
                   "for PCM_16 mono 32 kHz segments (the post-ETL contract).")
    p.add_argument("--stop-grad-boundary", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="Stop gradients at the freeze boundary so the frozen "
                   "stages' backward pass is never computed (identical "
                   "updates; the step recompiles once when layer3 unfreezes). "
                   "Default: on.")
    p.add_argument("--reference-quirk-loss", action="store_true",
                   help="Reproduce the reference trainer's head-not-in-loss "
                   "bug exactly (CE over pooled backbone features; "
                   "SURVEY.md §2.2). Default: the sane head-in-loss path.")
    p.add_argument("--reference-quirk-frozen-layer3", action="store_true",
                   help="Reproduce the reference's layer3-unfreeze no-op "
                   "exactly: its AdamW is built before the epoch loop over "
                   "the phase-1 trainable set, so the epochs//3 unfreeze "
                   "never updates layer3 (submodel_trainer.py:647-651 vs "
                   ":687-691). Default: actually train layer3 after the "
                   "unfreeze (the documented intent).")
    from synthetic_audio_detection_tpu.utils.config import add_wave_augment_args

    add_wave_augment_args(p)
    return p


def setup_logging(checkpoint_dir: str) -> None:
    """File + console logging (reference setup_logging, submodel_trainer.py:56-66)."""
    os.makedirs("logs", exist_ok=True)
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(levelname)s %(message)s",
        handlers=[
            logging.FileHandler(os.path.join("logs", f"train_{int(time.time())}.log")),
            logging.StreamHandler(),
        ],
    )


def _resolve_s2d(args) -> bool:
    """Auto-enable the s2d stage 1 in its measured-positive regime.

    The +13% s2d train-step win was measured on the FULL-backward step
    (round-2, pre-stop-grad). With the stop-grad freeze boundary on (now the
    default — 3.8x the step rate), layer1's backward is skipped entirely and
    s2d measured slightly NEGATIVE (2001 vs 1974 rows/s at batch 32, 512²,
    benchmarks/train_ab.py sg vs sg-s2d), so auto only engages when the
    boundary is disabled."""
    if args.s2d_layer1 is not None:
        return args.s2d_layer1
    if args.stop_grad_boundary:
        return False
    import jax

    return (
        jax.default_backend() in ("tpu", "axon")
        and args.input_size >= 512
        and RESNET_SPECS[args.model_name][0] == "basic"
    )


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    setup_logging(args.checkpoint_dir)
    from synthetic_audio_detection_tpu.utils.compile_cache import (
        enable_persistent_cache,
    )

    enable_persistent_cache()

    from synthetic_audio_detection_tpu.train.trainer import Trainer
    from synthetic_audio_detection_tpu.utils.config import TrainConfig

    cfg = TrainConfig(
        data_dir=args.data_dir,
        batch_size=args.batch_size,
        epochs=args.epochs,
        lr=args.lr,
        workers=args.workers,
        seed=args.seed,
        checkpoint_dir=args.checkpoint_dir,
        resume=args.resume,
        class0=args.Class0,
        class1=args.Class1,
        hard_negative_classes=tuple(args.hard_negative_classes),
        data_backend=args.data_backend,
        s2d_stage1=_resolve_s2d(args),
        stop_grad_boundary=args.stop_grad_boundary,
        compute_dtype="bfloat16" if args.bf16 else "float32",
        mel_dft=args.mel_dft,
        transport_dtype=args.transport_dtype,
        reference_quirk_frozen_layer3=args.reference_quirk_frozen_layer3,
    )
    from synthetic_audio_detection_tpu.utils.config import (
        SpectrogramConfig,
        spec_augment_from_args,
    )

    spec_cfg = SpectrogramConfig(mel_norm=None, out_size=args.input_size)
    trainer = Trainer(cfg, model_name=args.model_name, spec_cfg=spec_cfg,
                      augment=spec_augment_from_args(args),
                      log_dir=args.log_dir or None,
                      reference_quirk_loss=args.reference_quirk_loss)
    if args.evaluate:
        trainer.evaluate()
        return 0
    best = trainer.fit()
    print(f"Best validation accuracy: {best:.4f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
