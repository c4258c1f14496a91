"""GEMM-formulated 3×3 convolution (plain XLA) — a MEASURED NEGATIVE RESULT,
kept as documentation.

Hypothesis: XLA's native conv runs the resnet18@512² layer1 shape (128²
spatial, C=64) at only ~25-31 TF/s (benchmarks/conv_ab.py), so reformulating
the stencil as 9 shifted channel-contraction GEMMs might recover MXU
utilization.

Measured on-chip: WORSE — layer1 4.7 TF/s, layer2 27 TF/s. In plain XLA each
shifted slice materializes through HBM (9× activation traffic) rather than
staying in registers/VMEM, so the formulation is bandwidth-bound. The same
math inside a Pallas kernel (ops/pallas_conv.py), where the slices are VMEM
loads, beats XLA on layer3 (270 vs 251 TF/s) — the Pallas route is the
correct one; its layer1 compile is currently blocked by the tunnel's compile
helper, not by the kernel (NOTES.md).

Mathematically exact:
    y[b, i, j, f] = Σ_{dy,dx,c} x[b, i·s+dy-1, j·s+dx-1, c] · w[dy, dx, c, f]
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def conv3x3_gemm(
    x: jnp.ndarray,
    w: jnp.ndarray,
    stride: int = 1,
    k_pack: Optional[bool] = None,
    precision_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """[B, H, W, C] × [3, 3, C, F] → [B, H/s, W/s, F], SAME padding."""
    B, H, W, C = x.shape
    F = w.shape[-1]
    assert w.shape[:3] == (3, 3, C)
    assert H % stride == 0 and W % stride == 0
    if k_pack is None:
        k_pack = C <= 64

    xp = jnp.pad(x.astype(precision_dtype), ((0, 0), (1, 1), (1, 1), (0, 0)))
    wt = w.astype(precision_dtype)
    Ho, Wo = H // stride, W // stride

    def tap(i):
        dy, dx = divmod(i, 3)
        return jax.lax.slice(
            xp,
            (0, dy, dx, 0),
            (B, dy + H, dx + W, C),
            (1, stride, stride, 1),
        )

    def contract(patch, kernel):
        # [B, Ho, Wo, K] · [K, F] → [B, Ho, Wo, F]
        return jax.lax.dot_general(
            patch, kernel,
            dimension_numbers=(((3,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    acc = jnp.zeros((B, Ho, Wo, F), jnp.float32)
    if k_pack:
        for i in range(0, 8, 2):
            dy0, dx0 = divmod(i, 3)
            dy1, dx1 = divmod(i + 1, 3)
            patch = jnp.concatenate([tap(i), tap(i + 1)], axis=-1)
            kernel = jnp.concatenate([wt[dy0, dx0], wt[dy1, dx1]], axis=0)
            acc = acc + contract(patch, kernel)
        acc = acc + contract(tap(8), wt[2, 2])
    else:
        for i in range(9):
            dy, dx = divmod(i, 3)
            acc = acc + contract(tap(i), wt[dy, dx])
    return acc
