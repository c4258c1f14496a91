"""Compat CLI: legacy single-model 5-class trainer
(reference legacy/source/train.py flag surface; differences from the modular
trainer: 5 fixed classes ['Real','class1'..'class4'] (:82), default lr 1e-4
(:40), per-epoch checkpoints named epoch_{e}_acc_{a:.2f} (:656-667) instead of
best-only).

Note: the reference's default --model-name is 'resnet151', which is not a
valid model name and fails its own argparse choices — we default to the
intended resnet152."""

from __future__ import annotations

import argparse
import logging
import os
import sys
import time

from synthetic_audio_detection_tpu.models.resnet import RESNET_SPECS

BACKBONES = tuple(sorted(RESNET_SPECS))
LEGACY_CLASSES = ["Real", "class1", "class2", "class3", "class4"]


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Legacy 5-class Audio Classification Training")
    p.add_argument("--data-dir", default="./dataset", type=str)
    p.add_argument("--batch-size", default=32, type=int)
    p.add_argument("--epochs", default=30, type=int)
    p.add_argument("--lr", default=0.0001, type=float)
    p.add_argument("--workers", default=1, type=int)
    p.add_argument("--seed", default=42, type=int)
    p.add_argument("--gpu", default=0, type=int, help="Ignored")
    p.add_argument("--num_gpus", default=1, type=int, help="Ignored")
    p.add_argument("--checkpoint-dir", default="./checkpoints", type=str)
    p.add_argument("--resume", default="", type=str)
    p.add_argument("--evaluate", action="store_true")
    p.add_argument("--model-name", default="resnet152", type=str, choices=BACKBONES)
    from synthetic_audio_detection_tpu.utils.config import parse_input_size

    p.add_argument("--input-size", default=512, type=parse_input_size)
    p.add_argument("--classes", nargs="*", default=LEGACY_CLASSES,
                   help="Class folder names (default the legacy 5)")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    from synthetic_audio_detection_tpu.utils.compile_cache import (
        enable_persistent_cache,
    )

    enable_persistent_cache()
    os.makedirs("logs", exist_ok=True)
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(levelname)s %(message)s",
        handlers=[
            logging.FileHandler(os.path.join("logs", f"legacy_train_{int(time.time())}.log")),
            logging.StreamHandler(),
        ],
    )

    from synthetic_audio_detection_tpu.train.trainer import Trainer
    from synthetic_audio_detection_tpu.utils.config import (
        SpectrogramConfig,
        TrainConfig,
    )

    cfg = TrainConfig(
        data_dir=args.data_dir,
        batch_size=args.batch_size,
        epochs=args.epochs,
        lr=args.lr,
        workers=args.workers,
        seed=args.seed,
        checkpoint_dir=args.checkpoint_dir,
        resume=args.resume,
    )
    trainer = Trainer(
        cfg,
        model_name=args.model_name,
        spec_cfg=SpectrogramConfig(mel_norm=None, out_size=args.input_size),
        class_names=list(args.classes),
    )
    # legacy behavior: save EVERY epoch as epoch_{e}_acc_{a:.2f}
    # (legacy/source/train.py:656-667) — wrap fit with a per-epoch save hook
    orig_validate = trainer.validate

    def validate_and_save(batcher, epoch):
        result = orig_validate(batcher, epoch)
        path = os.path.join(
            cfg.checkpoint_dir, f"epoch_{epoch}_acc_{result.val_acc:.2f}.ckpt"
        )
        os.makedirs(cfg.checkpoint_dir, exist_ok=True)
        trainer.save_checkpoint(epoch, path)
        return result

    if args.evaluate:
        trainer.evaluate()
        return 0
    trainer.validate = validate_and_save
    best = trainer.fit()
    print(f"Best validation accuracy: {best:.4f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
