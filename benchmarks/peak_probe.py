"""Empirical MXU peak probe: chained big bf16 matmuls.

The BASELINE physics notes assumed v5e bf16 peak ~197 TF/s, but lax layer3
measured 297 TF/s standalone (conv_ab.py 2026-08-16) — the tunnel's chip is
faster than assumed. This measures a lower bound on the real peak with the
N-vs-1 chained-loop method on [4096,4096]x[4096,4096] and
[8192,8192]x[8192,8192] bf16 matmuls (f32 accumulate).

Run: python benchmarks/peak_probe.py
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

ITERS = 21


def measure(n: int) -> dict:
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((n, n)).astype(np.float32) * 0.05
                    ).astype(jnp.bfloat16)
    b = jnp.asarray(rng.standard_normal((n, n)).astype(np.float32) * 0.05
                    ).astype(jnp.bfloat16)

    def run(iters):
        def body(_, carry):
            acc, aa = carry
            y = jax.lax.dot_general(
                aa, b, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            c = jnp.sum(y) * 1e-30
            return acc + c, aa + c.astype(aa.dtype)

        return jax.jit(lambda aa: jax.lax.fori_loop(
            0, iters, body, (jnp.float32(0.0), aa))[0])

    r1, rn = run(1), run(ITERS)
    float(r1(a)); float(rn(a))
    t0 = time.perf_counter(); float(r1(a)); t1 = time.perf_counter() - t0
    t0 = time.perf_counter(); float(rn(a)); tn = time.perf_counter() - t0
    per = max((tn - t1) / (ITERS - 1), 1e-9)
    tflops = 2 * n**3 / per / 1e12
    return {"n": n, "ms_per_matmul": round(per * 1e3, 3),
            "bf16_tflops": round(tflops, 1)}


def main():
    for n in (4096, 8192):
        print(json.dumps(measure(n)), flush=True)


if __name__ == "__main__":
    main()
