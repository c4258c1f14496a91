"""Incremental head addition CLI: grow one class onto a merged artifact.

No reference counterpart — the reference's CSV re-merge (model_merger.py:
93-160) recombines independently trained sub-models, so adding one class to
a shared-trunk artifact means retraining every head. Here the artifact's
shared trunk is frozen (bit-identical before/after — existing verdicts
cannot move) and ONE new binary head trains against it, then splices into
the ensemble + metadata (train/add_head.py). Output artifacts are drop-in
inputs for inference_runner / the serving daemon, exactly like the joint
trainer's merges.

Usage:
    python -m synthetic_audio_detection_tpu.cli.add_head \
        --merged-model merged.ckpt --data-dir ./dataset \
        --new-class SynthD --epochs 4 --bf16 --input-size native \
        --output merged_plus_SynthD.ckpt
"""

from __future__ import annotations

import argparse
import sys

from synthetic_audio_detection_tpu.cli.submodel_trainer import setup_logging


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="Train one new head against a frozen merged-artifact "
                    "trunk and splice it into the ensemble")
    p.add_argument("--merged-model", required=True,
                   help="existing merged artifact (.ckpt native or .pth)")
    p.add_argument("--data-dir", default="./dataset", type=str,
                   help="dataset tree with train/ and test/ class folders "
                   "(must contain the new class and the real class)")
    p.add_argument("--new-class", required=True)
    p.add_argument("--real-class", default="Real", type=str)
    p.add_argument("--output", required=True,
                   help="path for the grown artifact (.ckpt; a .pth twin is "
                   "written alongside)")
    p.add_argument("--epochs", default=4, type=int)
    p.add_argument("--batch-size", default=32, type=int,
                   help="files per batch (2 segments per file)")
    p.add_argument("--lr", default=0.001, type=float)
    p.add_argument("--workers", default=20, type=int)
    p.add_argument("--seed", default=42, type=int)
    p.add_argument("--backbone", default="resnet18")
    from synthetic_audio_detection_tpu.utils.config import parse_input_size

    p.add_argument("--input-size", default=512, type=parse_input_size,
                   help="512/256/native — must match how the artifact is "
                   "served (the trunk is frozen; features must look like "
                   "what it was trained on)")
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--mel-dft", default="",
                   choices=["", "fft", "gemm", "factored", "pallas"])
    p.add_argument("--hard-negatives", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="Default: other class folders are extra negatives "
                   "for the new head (attribution-grade training); "
                   "--no-hard-negatives restores the reference's binary "
                   "Real-vs-class regime (submodel_trainer.py:463-511)")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    setup_logging(".")
    from synthetic_audio_detection_tpu.utils.compile_cache import (
        enable_persistent_cache,
    )

    enable_persistent_cache()

    import jax.numpy as jnp

    from synthetic_audio_detection_tpu.checkpoints import serialization
    from synthetic_audio_detection_tpu.ensemble.multihead import with_dtype
    from synthetic_audio_detection_tpu.train.add_head import HeadAdder
    from synthetic_audio_detection_tpu.utils.config import (
        SpectrogramConfig,
        TrainConfig,
    )

    ensemble = serialization.load_merged(args.merged_model,
                                         backbone=args.backbone)
    if args.bf16:
        ensemble = with_dtype(ensemble, jnp.bfloat16)
    cfg = TrainConfig(
        data_dir=args.data_dir,
        batch_size=args.batch_size,
        epochs=args.epochs,
        lr=args.lr,
        workers=args.workers,
        seed=args.seed,
        compute_dtype="bfloat16" if args.bf16 else "float32",
        mel_dft=args.mel_dft,
    )
    adder = HeadAdder(
        ensemble, args.new_class, cfg,
        spec_cfg=SpectrogramConfig(mel_norm=None, out_size=args.input_size),
        real_class=args.real_class,
        hard_negatives=args.hard_negatives,
        model_name=args.backbone,
    )
    best = adder.fit(args.data_dir)
    grown = adder.spliced()
    serialization.save_merged_native(args.output, grown)
    serialization.save_merged_torch(
        args.output.removesuffix(".ckpt") + ".pth", grown)
    print(f"Best new-head validation accuracy: {best:.4f}")
    print(f"Grown ensemble: {grown.class_names} -> {args.output}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
