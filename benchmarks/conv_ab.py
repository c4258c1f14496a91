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
    ("layer2", 32, 64, 64, 128, 128, 1),
    ("layer3", 32, 32, 32, 256, 256, 1),
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


def pallas_conv_nokpack(x, w, scale, bias):
    return conv3x3_bn_relu(x, w, scale[0, 0, 0], bias[0, 0, 0], 1, True,
                           k_pack=False)


def gemm_conv(x, w, scale, bias):
    y = conv3x3_gemm(x, w, stride=1)
    return jnp.maximum(y * scale + bias, 0.0)


def main():
    rng = np.random.default_rng(0)
    for name, B, H, W, C, F, stride in SHAPES:
        x = jnp.asarray(rng.standard_normal((B, H, W, C)).astype(np.float32) * 0.3)
        w = jnp.asarray(rng.standard_normal((3, 3, C, F)).astype(np.float32) * 0.05)
        scale = jnp.ones((1, 1, 1, F), jnp.float32)
        bias = jnp.zeros((1, 1, 1, F), jnp.float32)
        gflop = 2 * 9 * C * F * (H // stride) * (W // stride) * B / 1e9
        row = {"shape": name, "gflop_per_iter": round(gflop, 1)}
        variants = [("lax", lax_conv), ("gemm", gemm_conv),
                    ("pallas", pallas_conv)]
        for label, fn in variants:
            try:
                t = timed_loop(fn, x, w, scale, bias)
                row[f"{label}_ms"] = round(t * 1e3, 3)
                row[f"{label}_tflops"] = round(gflop / t / 1e3, 1)
            except Exception as e:  # noqa: BLE001
                row[f"{label}_error"] = repr(e)[:200]
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
