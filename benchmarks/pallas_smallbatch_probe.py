"""Probe: can the tunnel compile helper handle the Pallas layer1 conv as a
STANDALONE small-batch program, and at what TF/s?

Round-1/2 record: composite programs with the Pallas conv crash the remote
compile helper (HTTP 500) at B>=32 always, B<=16 intermittently. If a
standalone B=8/16 program compiles (with retries) and runs near the kernel's
layer3 rate (270 TF/s), serving can route layer1 through a separately-jitted
chunked program (8 async dispatches of B=16 per 128-batch) — the
segmented-program plan. Run: python benchmarks/pallas_smallbatch_probe.py
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from synthetic_audio_detection_tpu.ops.pallas_conv import conv3x3_bn_relu

ITERS = 11
H = W = 128
C = F = 64


def timed_loop(fn, x):
    def run(n):
        def body(_, carry):
            acc, xx = carry
            out = fn(xx)
            c = jnp.sum(out).astype(jnp.float32)
            return acc + c, xx + (c * 1e-30).astype(xx.dtype)

        return jax.jit(lambda xx: jax.lax.fori_loop(
            0, n, body, (jnp.float32(0.0), xx))[0])

    r1, rn = run(1), run(ITERS)
    float(r1(x)); float(rn(x))
    t0 = time.perf_counter(); float(r1(x)); t1 = time.perf_counter() - t0
    t0 = time.perf_counter(); float(rn(x)); tn = time.perf_counter() - t0
    return max((tn - t1) / (ITERS - 1), 1e-9)


def main():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((3, 3, C, F)).astype(np.float32) * 0.05)
    scale = jnp.ones((F,), jnp.float32)
    bias = jnp.zeros((F,), jnp.float32)

    for B in (8, 16):
        x = jnp.asarray(
            rng.standard_normal((B, H, W, C)).astype(np.float32) * 0.3
        ).astype(jnp.bfloat16)
        gflop = 2 * 9 * C * F * H * W * B / 1e9
        row = {"shape": f"layer1_b{B}", "gflop_per_iter": round(gflop, 1)}

        # lax baseline at the same small batch
        def lax_fn(xx):
            y = jax.lax.conv_general_dilated(
                xx, w.astype(jnp.bfloat16), (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32)
            return jnp.maximum(y * scale + bias, 0.0)

        try:
            t = timed_loop(lax_fn, x)
            row["lax_ms"] = round(t * 1e3, 3)
            row["lax_tflops"] = round(gflop / t / 1e3, 1)
        except Exception as e:  # noqa: BLE001
            row["lax_error"] = repr(e)[:160]

        # pallas with compile retries (helper 500s are intermittent at B<=16)
        def pl_fn(xx):
            return conv3x3_bn_relu(xx, w, scale, bias, 1, True)

        for attempt in range(5):
            try:
                t = timed_loop(pl_fn, x)
                row["pallas_ms"] = round(t * 1e3, 3)
                row["pallas_tflops"] = round(gflop / t / 1e3, 1)
                row["pallas_attempts"] = attempt + 1
                break
            except Exception as e:  # noqa: BLE001
                row["pallas_error"] = repr(e)[:160]
                row["pallas_attempts"] = attempt + 1
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
