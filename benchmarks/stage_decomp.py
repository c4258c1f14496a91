"""Composite-program stage decomposition at the 512² serving shape.

Times PREFIX programs of the fast-backbone serving path (front end; +stem;
+layer1; optionally +layer2/3/4/heads) with the N-vs-1 chained-loop method,
so adjacent differences give per-stage time IN THE COMPOSITE (micro-benchmarks
on this toolchain do not transfer — NOTES.md). This locates the next lever:
conv_ab says layer1@B=128 runs at 52.4 TF/s → ~11.8 ms of the ~21 ms batch;
this verifies that arithmetic in situ.

Run: python benchmarks/stage_decomp.py [--prefixes fe stem l1 l2 l3 l4 full]
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

from bench import _enable_compile_cache, _looped

ITERS = 51  # the per-stage deltas need the signal well above
            # the tunnel's scalar-fetch jitter (NOTES entry 38)
BATCH = 128


def make_prefix(ens, spec, upto: str):
    """fn(variables, windows) running the fast serving path up to `upto`."""
    from synthetic_audio_detection_tpu.models.fast_resnet import (
        _bn_affine,
        _conv_bn,
        fast_ensemble_forward,
    )
    from synthetic_audio_detection_tpu.models.resnet import RESNET_SPECS
    from synthetic_audio_detection_tpu.ops.pallas_melspec import serving_log_mel

    block, stages = RESNET_SPECS[ens.model.backbone]
    n_stages = {"fe": 0, "stem": 0, "l1": 1, "l2": 2, "l3": 3, "l4": 4}

    def fwd(variables, windows):
        import dataclasses as dc

        from synthetic_audio_detection_tpu.ops import melspec as M

        z = serving_log_mel(windows, spec, 32_000)
        feats = M.finalize_features(z, spec).astype(jnp.bfloat16)
        ch = ens.model.in_channels
        x = feats[..., None]
        if ch > 1:
            x = jnp.broadcast_to(x, (*feats.shape, ch))
        if upto == "fe":
            return x
        e = dc.replace(ens, variables=variables)
        if upto == "full":
            return fast_ensemble_forward(e, x, s2d_layer1=False)
        base_params = jax.tree_util.tree_map(
            lambda a: a[0], variables["params"]["base"])
        base_stats = jax.tree_util.tree_map(
            lambda a: a[0], variables["batch_stats"]["base"])
        y = _conv_bn(x, base_params["conv1"], base_params["bn1"],
                     base_stats["bn1"], 2, True, 0, jnp.bfloat16)
        y = jax.lax.reduce_window(
            y, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
            ((0, 0), (1, 1), (1, 1), (0, 0)))
        for stage_idx in range(n_stages[upto]):
            n_blocks = stages[stage_idx]
            stride = 1 if stage_idx == 0 else 2
            for b in range(n_blocks):
                s = stride if b == 0 else 1
                mod = f"layer{stage_idx + 1}_{b}"
                p, st = base_params[mod], base_stats[mod]
                identity = y
                out = _conv_bn(y, p["conv1"], p["bn1"], st["bn1"], s, True,
                               0, jnp.bfloat16)
                out = _conv_bn(out, p["conv2"], p["bn2"], st["bn2"], 1, False,
                               0, jnp.bfloat16)
                if "downsample_0" in p:
                    identity = _conv_bn(y, p["downsample_0"], p["downsample_1"],
                                        st["downsample_1"], s, False, 0,
                                        jnp.bfloat16)
                y = jax.nn.relu(out + identity)
        return y

    return fwd


def measure(fwd, variables, windows) -> float:
    import jax.numpy as jnp

    run = _looped(fwd)  # ONE program; trip count is a traced scalar
    n1, nN = jnp.asarray(1, jnp.int32), jnp.asarray(ITERS, jnp.int32)
    float(run(variables, windows, nN))
    t0 = time.perf_counter(); float(run(variables, windows, n1)); t1 = time.perf_counter() - t0
    t0 = time.perf_counter(); float(run(variables, windows, nN)); tn = time.perf_counter() - t0
    return max((tn - t1) / (ITERS - 1), 1e-9)


def main():
    _enable_compile_cache()
    p = argparse.ArgumentParser()
    p.add_argument("--prefixes", nargs="*",
                   default=["fe", "stem", "l1", "full"],
                   choices=["fe", "stem", "l1", "l2", "l3", "l4", "full"])
    from synthetic_audio_detection_tpu.utils.config import parse_input_size
    p.add_argument("--input-size", type=parse_input_size, default=512)
    p.add_argument("--mono", action="store_true",
                   help="mono-folded stem (the native serving default)")
    args = p.parse_args()

    from __graft_entry__ import _flagship_ensemble
    from synthetic_audio_detection_tpu.utils.config import SpectrogramConfig

    ens = _flagship_ensemble(n_heads=6, shared_backbone=True,
                             dtype=jnp.bfloat16)
    if args.mono:
        from synthetic_audio_detection_tpu.ensemble.multihead import (
            fold_to_mono,
        )

        ens = fold_to_mono(ens)
    spec = SpectrogramConfig(mel_norm="slaney", out_size=args.input_size)
    rng = np.random.default_rng(0)
    windows = jnp.asarray(
        rng.standard_normal((BATCH, 128_000)).astype(np.float32) * 0.3)
    variables = jax.device_put(ens.variables)

    prev = None
    for name in args.prefixes:
        fwd = make_prefix(ens, spec, name)
        t = measure(fwd, variables, windows)
        row = {"prefix": name, "ms_per_batch": round(t * 1e3, 2)}
        if prev is not None:
            row["stage_delta_ms"] = round((t - prev) * 1e3, 2)
        prev = t
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
