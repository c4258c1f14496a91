"""Training throughput: segment-rows/sec/chip for the reference's Table II
comparison (whitepaper: resnet152, 90M train samples → 18.5 h/epoch on a
RTX 3090, 5.0 h on 4×A100).

Measures the full jitted train step (device-side mel + SpecAugment + RRC +
fwd/bwd + masked AdamW + NaN guard) with the same N-vs-1 chained fori_loop
differencing as bench.py. Prints hours-per-90M-sample-epoch for a direct
read against Table II.

    python benchmarks/train_throughput.py --backbone resnet152 --batch 16
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

ITERS = 9


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--backbone", default="resnet18")
    p.add_argument("--batch", type=int, default=16,
                   help="segment rows per step")
    from synthetic_audio_detection_tpu.utils.config import parse_input_size
    p.add_argument("--input-size", type=parse_input_size, default=512,
                   help="512/256/... or 'native' (mel-resolution, no resize)")
    p.add_argument("--stop-grad", type=int, default=4, choices=(0, 3, 4),
                   help="Freeze-boundary gradient stop stage: 4 = phase-1 "
                   "production default (backward only through layer4+head), "
                   "3 = post-unfreeze phase, 0 = full backward (round-1 "
                   "measurement mode)")
    p.add_argument("--dft-mode", nargs="*", default=[""],
                   choices=["", "fft", "gemm", "factored", "pallas"],
                   help="device-mel DFT path(s); several = same-process A/B "
                   "('' = the step's default)")
    p.add_argument("--joint", type=int, default=0, metavar="N",
                   help="measure the joint N-head ensemble step "
                   "(train/joint.py: one shared-backbone fwd/bwd + N vmapped "
                   "heads) instead of the single-head step; ensemble-training "
                   "speedup vs sequential = N x (joint rows/s) / "
                   "(single rows/s)")
    p.add_argument("--per-head-stages", type=int, default=0,
                   help="with --joint: trailing ResNet stages trained PER "
                   "HEAD on the shared trunk (train/joint.py; 1 = per-head "
                   "layer4)")
    p.add_argument("--wave-augment", action="store_true",
                   help="measure with on-device waveform augmentation in the "
                   "step (ops/waveform_augment.py, CLI defaults)")
    args = p.parse_args()

    from synthetic_audio_detection_tpu.models.classifier import BinaryClassifier
    from synthetic_audio_detection_tpu.train import steps
    from synthetic_audio_detection_tpu.utils.config import (
        SpecAugmentConfig,
        SpectrogramConfig,
        TrainConfig,
    )

    from bench import _enable_compile_cache
    _enable_compile_cache()

    cfg = TrainConfig(batch_size=args.batch)
    spec = SpectrogramConfig(out_size=args.input_size)
    if args.joint:
        from synthetic_audio_detection_tpu.train import joint

        state, tx = joint.init_joint_state(
            args.backbone, args.joint, jax.random.PRNGKey(0), cfg,
            spec.model_input_hw(), dtype=jnp.bfloat16,
            per_head_stages=args.per_head_stages,
        )
        if args.stop_grad == 3:
            state = state.replace(
                param_mask=joint.joint_freeze_mask(state.params, phase2=True)
            )
        if args.per_head_stages:
            probe = lambda params: params["heads"]["mlp"]["out"]["bias"][0]  # noqa: E731
        else:
            probe = lambda params: params["heads"]["out"]["bias"][0]  # noqa: E731
    else:
        model = BinaryClassifier(backbone=args.backbone, dtype=jnp.bfloat16)
        state, tx = steps.create_train_state(
            model, jax.random.PRNGKey(0), cfg,
            input_size=spec.model_input_hw(),
        )
        if args.stop_grad == 3:
            state = steps.unfreeze_layer3(state)
        probe = lambda params: params["head"]["out"]["bias"]  # noqa: E731

    rng = np.random.default_rng(0)
    batch = {
        "audio": jnp.asarray(
            rng.standard_normal((args.batch, 128_000)).astype(np.float32) * 0.2
        ),
        "label": jnp.asarray(
            np.tile([0, 1], args.batch // 2 + 1)[: args.batch].astype(np.int32)
        ),
        "weight": jnp.ones(args.batch, jnp.float32),
    }

    aug = SpecAugmentConfig(
        wave_noise_prob=0.5, wave_lowpass_prob=0.25,
    ) if args.wave_augment else SpecAugmentConfig()

    for dft_mode in args.dft_mode:
        if args.joint:
            from synthetic_audio_detection_tpu.train import joint

            train_step = joint.make_joint_train_step(
                args.backbone, tx, cfg, spec, aug,
                num_heads=args.joint, stop_grad_stage=args.stop_grad,
                dft_mode=dft_mode or None, dtype=jnp.bfloat16,
                per_head_stages=args.per_head_stages,
            )
        else:
            train_step = steps.make_train_step(
                model, tx, cfg, spec, aug,
                stop_grad_stage=args.stop_grad,
                dft_mode=dft_mode or None,
            )

        def looped(n):
            def body(i, st):
                # chain the batch through the state so the rng-independent
                # mel prefix is loop-carried — without this, XLA's while-loop
                # LICM hoists mel+dB out of the loop and the measurement
                # silently excludes the front end (caught in round 3;
                # bench.py has always chained its input for the same reason)
                eps = (probe(st.params).reshape(-1)[0] * 1e-30).astype(
                    jnp.float32)
                b = dict(batch)
                b["audio"] = batch["audio"] + eps
                st2, m = train_step(st, b, jax.random.fold_in(
                    jax.random.PRNGKey(7), i))
                return st2

            def run(s):
                final = jax.lax.fori_loop(0, n, body, s)
                return probe(final.params).sum()

            return jax.jit(run)

        r1, rn = looped(1), looped(ITERS)
        float(r1(state)); float(rn(state))

        def timed(fn) -> float:
            t0 = time.perf_counter()
            float(fn(state))
            return time.perf_counter() - t0

        t1 = sorted(timed(r1) for _ in range(3))[1]
        tn = sorted(timed(rn) for _ in range(3))[1]
        per_step = max((tn - t1) / (ITERS - 1), 1e-9)

        rows_per_sec = args.batch / per_step
        hours_per_90m = 90e6 / rows_per_sec / 3600
        print(json.dumps({
            "backbone": args.backbone,
            "joint_heads": args.joint,
            "per_head_stages": args.per_head_stages,
            "stop_grad": args.stop_grad,
            "dft_mode": dft_mode or "default",
            "wave_augment": args.wave_augment,
            "batch_rows": args.batch,
            "input_size": args.input_size,
            "ms_per_step": round(per_step * 1e3, 2),
            "rows_per_sec_per_chip": round(rows_per_sec, 1),
            "hours_per_90M_sample_epoch": round(hours_per_90m, 2),
        }), flush=True)


if __name__ == "__main__":
    main()
