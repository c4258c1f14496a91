"""Joint ensemble trainer CLI: all N heads in one pass over the corpus.

No reference counterpart — the reference trains each head with a separate
``submodel_trainer.py`` invocation (its own full backbone each time) and then
merges (SURVEY.md §2.1); its merger's strict=False load means the deployed
ensemble is effectively one shared backbone + N trained heads anyway
(model_merger.py:55, SURVEY.md §2.2). This CLI trains that artifact directly:
one shared backbone forward/backward per batch, N heads vmapped, hard-negative
labels built in (train/joint.py). Output: ``joint_model.ckpt`` (resume state)
plus ``joint_model.ckpt.merged.ckpt`` / ``.merged.pth`` — drop-in inputs for
the inference_runner CLI and the serving daemon.

Usage:
    python -m synthetic_audio_detection_tpu.cli.ensemble_trainer \
        --data-dir ./dataset --real-class Real \
        --synthetic-classes SynthA SynthB SynthC --epochs 12 --bf16 \
        --input-size native
"""

from __future__ import annotations

import argparse
import sys

from synthetic_audio_detection_tpu.cli.submodel_trainer import (
    BACKBONES,
    setup_logging,
)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="Joint multi-head ensemble training (one pass, N heads)"
    )
    p.add_argument("--data-dir", default="./dataset", type=str)
    p.add_argument("--real-class", default="Real", type=str,
                   help="Folder name of the Real class (corpus label 0)")
    p.add_argument("--synthetic-classes", nargs="+", required=True,
                   metavar="CLASS",
                   help="One head per class, in this order; each head's "
                   "positives are its class, its negatives are Real AND "
                   "every other class (hard negatives)")
    p.add_argument("--batch-size", default=32, type=int,
                   help="Files per batch (each yields 2 segments)")
    p.add_argument("--epochs", default=100, type=int)
    p.add_argument("--lr", default=0.001, type=float)
    p.add_argument("--workers", default=20, type=int)
    p.add_argument("--seed", default=42, type=int)
    p.add_argument("--checkpoint-dir", default="./checkpoints", type=str)
    p.add_argument("--resume", default="", type=str,
                   help="Path to a joint_model.ckpt to resume from")
    p.add_argument("--model-name", default="resnet18", type=str,
                   choices=BACKBONES)
    p.add_argument("--log-dir", default="", type=str)
    from synthetic_audio_detection_tpu.utils.config import parse_input_size

    p.add_argument("--input-size", default=512, type=parse_input_size,
                   help="512 = reference fidelity; 'native' = the mel's true "
                   "resolution, no resize (docs/PERFORMANCE.md)")
    p.add_argument("--bf16", action="store_true",
                   help="bfloat16 compute (params/optimizer/loss stay f32)")
    p.add_argument("--mel-dft", default="",
                   choices=("", "fft", "gemm", "factored", "pallas"))
    p.add_argument("--transport-dtype", default="",
                   choices=("", "float32", "int16"))
    p.add_argument("--stop-grad-boundary", action=argparse.BooleanOptionalAction,
                   default=True)
    p.add_argument("--per-head-stages", default=0, type=int,
                   help="Trailing ResNet stages trained PER HEAD on top of "
                   "the shared trunk (0 = fully shared backbone; 1 = each "
                   "head owns its layer4 — the same specialization capacity "
                   "as a sequential per-head run under the freeze schedule)")
    p.add_argument("--hard-negatives", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="Default: each head's negatives are Real AND every "
                   "other class. --no-hard-negatives restores the "
                   "reference's plain-OvR regime (loss masked to Real + own "
                   "class; submodel_trainer.py:463-511) — better attribution "
                   "needs hard negatives, novel-generator recall may prefer "
                   "plain OvR (docs/PERFORMANCE.md generalization study)")
    p.add_argument("--generic-head", action="store_true",
                   help="Train ONE extra Real-vs-any-synthetic head beyond "
                   "the named classes (its positive is every synthetic "
                   "class). Serving can decide Real/Synthetic from it via "
                   "--generic-verdict; attribution stays per-specialist. "
                   "The separability lever for unseen generators "
                   "(docs/PERFORMANCE.md LOGO study)")
    from synthetic_audio_detection_tpu.utils.config import add_wave_augment_args

    add_wave_augment_args(p)
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    setup_logging(args.checkpoint_dir)
    from synthetic_audio_detection_tpu.utils.compile_cache import (
        enable_persistent_cache,
    )

    enable_persistent_cache()

    from synthetic_audio_detection_tpu.train.joint import JointTrainer
    from synthetic_audio_detection_tpu.utils.config import (
        SpectrogramConfig,
        TrainConfig,
        spec_augment_from_args,
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
        stop_grad_boundary=args.stop_grad_boundary,
        compute_dtype="bfloat16" if args.bf16 else "float32",
        mel_dft=args.mel_dft,
        transport_dtype=args.transport_dtype,
    )
    spec_cfg = SpectrogramConfig(mel_norm=None, out_size=args.input_size)
    trainer = JointTrainer(
        cfg,
        synthetic_classes=args.synthetic_classes,
        real_class=args.real_class,
        model_name=args.model_name,
        spec_cfg=spec_cfg,
        augment=spec_augment_from_args(args),
        log_dir=args.log_dir or None,
        per_head_stages=args.per_head_stages,
        hard_negatives=args.hard_negatives,
        generic_head=args.generic_head,
    )
    best = trainer.fit()
    print(f"Best ensemble validation accuracy: {best:.4f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
