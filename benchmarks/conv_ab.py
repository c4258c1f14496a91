"""A/B micro-benchmark: Pallas direct conv vs XLA lax.conv on TPU, at the
resnet18@512² stage shapes. Uses the same chained fori_loop differencing as
bench.py. Run: python benchmarks/conv_ab.py"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from synthetic_audio_detection_tpu.ops.fast_conv import conv3x3_gemm
from synthetic_audio_detection_tpu.ops.pallas_conv import conv3x3_bn_relu

ITERS = 11

# (name, B, H, W, C, F, stride) — resnet18 at 512² input
SHAPES = [
    ("layer1", 32, 128, 128, 64, 64, 1),
    ("layer1b128", 128, 128, 128, 64, 64, 1),  # serving batch
    ("layer1s", 32, 64, 64, 64, 64, 1),  # layer1 at 256² fast-mode input
    ("layer2", 32, 64, 64, 128, 128, 1),
    ("layer3", 32, 32, 32, 256, 256, 1),
    # 256² fast-mode stage shapes at serving batch (where does 65 TF/s go?)
    ("layer1sb", 128, 64, 64, 64, 64, 1),
    ("layer2s", 128, 32, 32, 128, 128, 1),
    ("layer3s", 128, 16, 16, 256, 256, 1),
    ("layer4s", 128, 8, 8, 512, 512, 1),
    # native-mode (128x256 input) layer1: the biggest model stage there
    # (1.11 ms of 3.83, stage_decomp --input-size native) — C=64 half-fills
    # the 128 lanes, H=32 is small; screen the s2d fold at this shape
    ("layer1nat", 128, 32, 64, 64, 64, 1),
]


def timed_loop(fn, x, w, scale, bias):
    def run(n):
        def body(_, carry):
            acc, xx = carry
            out = fn(xx, w, scale, bias)
            c = jnp.sum(out).astype(jnp.float32)
            return acc + c, xx + (c * 1e-30).astype(xx.dtype)

        return jax.jit(lambda xx: jax.lax.fori_loop(
            0, n, body, (jnp.float32(0.0), xx))[0])

    r1, rn = run(1), run(ITERS)
    float(r1(x)); float(rn(x))
    t0 = time.perf_counter(); float(r1(x)); t1 = time.perf_counter() - t0
    t0 = time.perf_counter(); float(rn(x)); tn = time.perf_counter() - t0
    return max((tn - t1) / (ITERS - 1), 1e-9)


def lax_conv(x, w, scale, bias):
    y = jax.lax.conv_general_dilated(
        x.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
        window_strides=(1, 1), padding=[(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    return jnp.maximum(y * scale + bias, 0.0)


def pallas_conv(x, w, scale, bias):
    return conv3x3_bn_relu(x, w, scale[0, 0, 0], bias[0, 0, 0], 1, True)


def pallasflat_conv(x, w, scale, bias):
    from synthetic_audio_detection_tpu.ops.pallas_conv_flat import (
        conv3x3_bn_relu_flat,
    )

    return conv3x3_bn_relu_flat(x, w, scale[0, 0, 0], bias[0, 0, 0])


def pallasfs_conv(x, w, scale, bias):
    from synthetic_audio_detection_tpu.ops.pallas_conv_flat import (
        conv3x3_bn_relu_flat_static,
    )

    return conv3x3_bn_relu_flat_static(x, w, scale[0, 0, 0], bias[0, 0, 0])


def pallas_conv_nokpack(x, w, scale, bias):
    return conv3x3_bn_relu(x, w, scale[0, 0, 0], bias[0, 0, 0], 1, True,
                           k_pack=False)


def gemm_conv(x, w, scale, bias):
    y = conv3x3_gemm(x, w, stride=1)
    return jnp.maximum(y * scale + bias, 0.0)


def make_b2h_conv(g: int):
    """Batch-to-height: stack g images along H with their own zero boundary
    rows ([B,H,W,C] → [B/g, g·(H+2), W, C]) and convolve rows VALID — each
    image's neighborhood reads its zero separator exactly where SAME padding
    would read zeros, so the result is bit-exact vs the per-image conv.
    Screens whether XLA's conv emitter recovers its tall-H rate (~135 TF/s
    at H=128 in the 512² composite) on the short-H native layer1 shape
    (H=32, ~70 TF/s). Row overhead (H+2)/H; stack/unstack are reshapes+pads
    and are COUNTED in the timing."""

    def fn(x, w, scale, bias):
        B, H, W, C = x.shape
        F = w.shape[-1]
        xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0)))
        tall = xp.reshape(B // g, g * (H + 2), W, C)
        y = jax.lax.conv_general_dilated(
            tall.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
            window_strides=(1, 1), padding=[(0, 0), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        )  # [B/g, g*(H+2)-2, W, F]; image i's rows start at i*(H+2)
        y = jnp.pad(y, ((0, 0), (0, 2), (0, 0), (0, 0)))
        y = y.reshape(B // g, g, H + 2, W, F)[:, :, :H]
        y = y.reshape(B, H, W, F)
        return jnp.maximum(y * scale + bias, 0.0)

    return fn


def make_s2d_conv(w):
    """One-conv s2d folding: runs on s2d(x); weights folded host-side once.
    4x nominal FLOPs at 4x the channel width (TF/s reported vs ORIGINAL
    FLOPs, so >baseline means net win)."""
    from synthetic_audio_detection_tpu.ops.space_to_depth import (
        conv3x3_s2d,
        fold_conv3x3_s2d,
    )

    wf = jnp.asarray(fold_conv3x3_s2d(np.asarray(w))).astype(jnp.bfloat16)

    def fn(x_s2d, _w, scale, bias):
        y = conv3x3_s2d(x_s2d.astype(jnp.bfloat16), wf,
                        preferred_element_type=jnp.float32)
        return jnp.maximum(y * scale + bias, 0.0)

    return fn


def make_s2d4_conv(w):
    """4-phase s2d folding: 4 convs [2,2,4C,F], 16/9 nominal FLOPs."""
    from synthetic_audio_detection_tpu.ops.space_to_depth import (
        conv3x3_s2d_4phase,
        fold_conv3x3_s2d_phase,
    )

    phases = [
        (jnp.asarray(k).astype(jnp.bfloat16), pad)
        for k, pad in (
            fold_conv3x3_s2d_phase(np.asarray(w), qy, qx)
            for qy in range(2) for qx in range(2)
        )
    ]

    def fn(x_s2d, _w, scale, bias):
        y = conv3x3_s2d_4phase(x_s2d.astype(jnp.bfloat16), phases,
                               preferred_element_type=jnp.float32)
        return jnp.maximum(y * scale + bias, 0.0)

    return fn


def make_s2dm_conv(w):
    """Merged-phase folding: one [2,2,4C,4F] VALID conv + phase slicing,
    ~1.83x nominal FLOPs at full channel width."""
    from synthetic_audio_detection_tpu.ops.space_to_depth import (
        conv3x3_s2d_merged,
        fold_conv3x3_s2d_merged,
    )

    wm = jnp.asarray(fold_conv3x3_s2d_merged(np.asarray(w))).astype(jnp.bfloat16)

    def fn(x_s2d, _w, scale, bias):
        y = conv3x3_s2d_merged(x_s2d.astype(jnp.bfloat16), wm,
                               preferred_element_type=jnp.float32)
        return jnp.maximum(y * scale + bias, 0.0)

    return fn


def make_s2dh_conv(w):
    """H-only s2d folding: [3,3,2C,2F] at 2x nominal FLOPs, C=128 lanes."""
    from synthetic_audio_detection_tpu.ops.space_to_depth import (
        conv3x3_s2d_h,
        fold_conv3x3_s2d_h,
    )

    wf = jnp.asarray(fold_conv3x3_s2d_h(np.asarray(w))).astype(jnp.bfloat16)

    def fn(x_s2dh, _w, scale, bias):
        y = conv3x3_s2d_h(x_s2dh.astype(jnp.bfloat16), wf,
                          preferred_element_type=jnp.float32)
        return jnp.maximum(y * scale + bias, 0.0)

    return fn


def _chunked_conv(x, w, scale, bias, chunk: int):
    """Batch-chunked lax.conv: B=128 computed as concat of B=chunk convs.
    Probes the emitter's batch sensitivity INSIDE one program (standalone
    lax.conv measured 72.5 TF/s at B=16 vs 52.4 at B=128 vs 29.7 at B=32 —
    if the small-batch tiling survives as separate ops in a composite, this
    is a free layer1 win)."""
    b = x.shape[0]
    assert b % chunk == 0
    xb = x.astype(jnp.bfloat16)
    wb = w.astype(jnp.bfloat16)
    outs = []
    for i in range(b // chunk):
        y = jax.lax.conv_general_dilated(
            xb[i * chunk:(i + 1) * chunk], wb,
            window_strides=(1, 1), padding=[(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        )
        outs.append(jnp.maximum(y * scale + bias, 0.0))
    return jnp.concatenate(outs, axis=0)


def chunk16_conv(x, w, scale, bias):
    return _chunked_conv(x, w, scale, bias, 16)


def chunk32_conv(x, w, scale, bias):
    return _chunked_conv(x, w, scale, bias, 32)


def chunk64_conv(x, w, scale, bias):
    return _chunked_conv(x, w, scale, bias, 64)


def _tiled_conv(x, w, scale, bias, splits_h, splits_w):
    """Spatial tiling with 1-px halos: [B,H,W,C] → [sh*sw*B, H/sh+2, W/sw+2, C]
    VALID conv → reassemble. Probes whether XLA's conv emitter handles the
    large-spatial/narrow-channel layer1 shape better as more batch x less
    spatial (layer1s at 64² measured 72.5 TF/s vs 29.7 at 128²)."""
    b, h, w_, c = x.shape
    th, tw = h // splits_h, w_ // splits_w
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    tiles = [
        xp[:, ty * th:ty * th + th + 2, tx * tw:tx * tw + tw + 2, :]
        for ty in range(splits_h) for tx in range(splits_w)
    ]
    xt = jnp.concatenate(tiles, axis=0).astype(jnp.bfloat16)
    y = jax.lax.conv_general_dilated(
        xt, w.astype(jnp.bfloat16),
        window_strides=(1, 1), padding=[(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )  # [sh*sw*B, th, tw, F]
    f = y.shape[-1]
    y = y.reshape(splits_h, splits_w, b, th, tw, f)
    y = y.transpose(2, 0, 3, 1, 4, 5).reshape(b, h, w_, f)
    return jnp.maximum(y * scale + bias, 0.0)


def tile4_conv(x, w, scale, bias):
    return _tiled_conv(x, w, scale, bias, 2, 2)


def tile2h_conv(x, w, scale, bias):
    return _tiled_conv(x, w, scale, bias, 2, 1)


def int8_conv_pure(x, w, scale, bias):
    """int8 MXU rate probe: operands pre-quantized OUTSIDE the measured op
    (x arrives int8), int32 accumulate, affine+relu in f32."""
    acc = jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding=[(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    return jnp.maximum(acc.astype(jnp.float32) * scale + bias, 0.0)


def int8_conv_dynq(x, w, scale, bias):
    """Serving-realistic int8: dynamic per-tensor activation quant inside."""
    s = jnp.maximum(jnp.max(jnp.abs(x)), 1e-12) / 127.0
    xq = jnp.clip(jnp.round(x / s), -127, 127).astype(jnp.int8)
    acc = jax.lax.conv_general_dilated(
        xq, w, window_strides=(1, 1), padding=[(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    return jnp.maximum(acc.astype(jnp.float32) * (s * scale) + bias, 0.0)


def timed_loop_int8(fn, x_int8, w_int8, scale, bias):
    """Chained loop for integer carries: perturbation derived from the output
    scalar through an int path the compiler cannot fold away."""
    def run(n):
        def body(_, carry):
            acc, xx = carry
            out = fn(xx, w_int8, scale, bias)
            c = jnp.sum(out).astype(jnp.float32)
            bump = (c.astype(jnp.int32) % jnp.int32(2)).astype(jnp.int8)
            return acc + c, jnp.clip(xx + bump, -127, 127)

        return jax.jit(lambda xx: jax.lax.fori_loop(
            0, n, body, (jnp.float32(0.0), xx))[0])

    r1, rn = run(1), run(ITERS)
    float(r1(x_int8)); float(rn(x_int8))
    t0 = time.perf_counter(); float(r1(x_int8)); t1 = time.perf_counter() - t0
    t0 = time.perf_counter(); float(rn(x_int8)); tn = time.perf_counter() - t0
    return max((tn - t1) / (ITERS - 1), 1e-9)


def main():
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--variants", nargs="*",
                   default=["lax", "gemm", "pallas"],
                   choices=["lax", "gemm", "pallas", "s2d", "s2d4", "s2dm",
                            "s2dh", "tile4", "tile2h", "int8pure", "int8dynq",
                            "chunk16", "chunk32", "chunk64", "pallasflat",
                            "pallasnk", "pallasfs", "b2h2", "b2h4", "b2h8",
                            "b2h16"])
    p.add_argument("--shapes", nargs="*",
                   default=[s[0] for s in SHAPES],
                   choices=[s[0] for s in SHAPES])
    args = p.parse_args()

    from synthetic_audio_detection_tpu.ops.space_to_depth import space_to_depth

    rng = np.random.default_rng(0)
    for name, B, H, W, C, F, stride in SHAPES:
        if name not in args.shapes:
            continue
        x = jnp.asarray(rng.standard_normal((B, H, W, C)).astype(np.float32) * 0.3)
        w = jnp.asarray(rng.standard_normal((3, 3, C, F)).astype(np.float32) * 0.05)
        scale = jnp.ones((1, 1, 1, F), jnp.float32)
        bias = jnp.zeros((1, 1, 1, F), jnp.float32)
        gflop = 2 * 9 * C * F * (H // stride) * (W // stride) * B / 1e9
        row = {"shape": name, "gflop_per_iter": round(gflop, 1)}
        for label in args.variants:
            try:
                if label in ("s2d", "s2d4", "s2dm", "s2dh"):
                    fn = {"s2d": make_s2d_conv, "s2d4": make_s2d4_conv,
                          "s2dm": make_s2dm_conv, "s2dh": make_s2dh_conv}[label](w)
                    if label == "s2dh":
                        from synthetic_audio_detection_tpu.ops.space_to_depth import (
                            space_to_depth_h,
                        )

                        xs = space_to_depth_h(x)
                        s4 = jnp.ones((1, 1, 1, 2 * F), jnp.float32)
                    else:
                        xs = space_to_depth(x)
                        s4 = jnp.ones((1, 1, 1, 4 * F), jnp.float32)
                    b4 = jnp.zeros_like(s4)
                    t = timed_loop(fn, xs, w, s4, b4)
                elif label == "int8pure":
                    xq = jnp.clip(jnp.round(x / 0.01), -127, 127).astype(jnp.int8)
                    wq = jnp.clip(jnp.round(w / 0.001), -127, 127).astype(jnp.int8)
                    t = timed_loop_int8(int8_conv_pure, xq, wq, scale, bias)
                elif label == "int8dynq":
                    wq = jnp.clip(jnp.round(w / 0.001), -127, 127).astype(jnp.int8)
                    t = timed_loop(int8_conv_dynq, x, wq, scale, bias)
                elif label.startswith("b2h"):
                    g = int(label[3:])
                    if B % g:
                        raise ValueError(f"batch {B} not divisible by {g}")
                    t = timed_loop(make_b2h_conv(g), x, w, scale, bias)
                else:
                    fn = {"lax": lax_conv, "gemm": gemm_conv,
                          "pallas": pallas_conv, "tile4": tile4_conv,
                          "tile2h": tile2h_conv, "chunk16": chunk16_conv,
                          "chunk32": chunk32_conv, "chunk64": chunk64_conv,
                          "pallasflat": pallasflat_conv,
                          "pallasnk": pallas_conv_nokpack,
                          "pallasfs": pallasfs_conv}[label]
                    t = timed_loop(fn, x, w, scale, bias)
                row[f"{label}_ms"] = round(t * 1e3, 3)
                row[f"{label}_tflops"] = round(gflop / t / 1e3, 1)
            except Exception as e:  # noqa: BLE001
                row[f"{label}_error"] = repr(e)[:200]
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
