"""Train-step A/B: standard vs s2d-stage1 backbone (rows/sec/chip).

One fully-jitted training step (device mel + SpecAugment + RRC + fwd/bwd +
masked AdamW + NaN guard — train/steps.py) iterated inside a fori_loop; the
state carry makes iterations serially dependent, and timing is the N-vs-1
difference (honest on tunneled runtimes, see bench.py).

    python benchmarks/train_ab.py --batch 16 --input-size 512
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

ITERS = 6


def measure(step, state, batch, rng) -> float:
    def run(n):
        def body(i, carry):
            st, r = carry
            r, sub = jax.random.split(r)
            # loop-carry the batch via a state-dependent epsilon: without it
            # XLA LICM hoists the rng-independent mel+dB prefix out of the
            # loop and the step time excludes the front end (bench.py note)
            eps = (st.params["head"]["out"]["bias"][0] * 1e-30).astype(jnp.float32)
            b = dict(batch)
            b["audio"] = batch["audio"] + eps
            st, m = step(st, b, sub)
            return st, r

        return jax.jit(
            lambda st: jax.lax.fori_loop(0, n, body, (st, rng))[0].step
        )

    r1, rn = run(1), run(ITERS)
    int(r1(state)); int(rn(state))  # compile + absorb first transfer
    t0 = time.perf_counter(); int(r1(state)); t1 = time.perf_counter() - t0
    t0 = time.perf_counter(); int(rn(state)); tn = time.perf_counter() - t0
    return max((tn - t1) / (ITERS - 1), 1e-9)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=16, help="rows per step")
    from synthetic_audio_detection_tpu.utils.config import parse_input_size
    p.add_argument("--input-size", type=parse_input_size, default=512)
    p.add_argument("--backbone", default="resnet18")
    p.add_argument("--variants", nargs="*", default=["plain", "s2d"],
                   choices=["plain", "s2d", "sg", "sg-s2d", "sg3"])
    args = p.parse_args()

    import __graft_entry__  # noqa: F401  (enables the compile cache)
    from synthetic_audio_detection_tpu.models.classifier import BinaryClassifier
    from synthetic_audio_detection_tpu.train import steps
    from synthetic_audio_detection_tpu.utils.config import (
        SpecAugmentConfig,
        SpectrogramConfig,
        TrainConfig,
    )

    rng = np.random.default_rng(0)
    batch = {
        "audio": jnp.asarray(
            rng.standard_normal((args.batch, 128_000)).astype(np.float32) * 0.2),
        "label": jnp.asarray(
            np.tile([0, 1], args.batch // 2).astype(np.int32)),
        "weight": jnp.ones(args.batch, np.float32),
    }
    cfg = TrainConfig(batch_size=args.batch // 2)
    spec = SpectrogramConfig(out_size=args.input_size)

    for variant in args.variants:
        model = BinaryClassifier(backbone=args.backbone,
                                 s2d_stage1=("s2d" in variant))
        state, tx = steps.create_train_state(
            model, jax.random.PRNGKey(0), cfg, input_size=spec.model_input_hw())
        # sg = stop-grad at the phase-1 freeze boundary (before layer4);
        # sg3 = phase-2 boundary (before layer3, post-unfreeze schedule)
        sg_stage = 4 if variant.startswith("sg") and variant != "sg3" else (
            3 if variant == "sg3" else 0)
        if variant == "sg3":
            state = steps.unfreeze_layer3(state)
        step = steps.make_train_step(model, tx, cfg, spec, SpecAugmentConfig(),
                                     stop_grad_stage=sg_stage)
        per_iter = measure(step, state, batch, jax.random.PRNGKey(1))
        print(json.dumps({
            "variant": variant,
            "batch_rows": args.batch,
            "input_size": args.input_size,
            "backbone": args.backbone,
            "ms_per_step": round(per_iter * 1e3, 2),
            "rows_per_sec": round(args.batch / per_iter, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
