"""Pallas direct 3×3 convolution prototype (NHWC, stride 1/2, fused
BN-affine + ReLU epilogue).

Motivation: at 512² inputs the ensemble's ResNet convs reach only ~28% MXU
utilization through XLA's conv lowering (benchmarks/throughput.py ablations);
this kernel explores recovering that headroom with a direct formulation —
one grid cell per image, the 3×3 stencil computed as 9 shifted
``dot_general`` contractions over the channel axis (no im2col, no reshape,
no frame materialization), with the BatchNorm affine and ReLU fused into the
accumulator epilogue.

Status: correctness-verified against lax.conv (tests/test_pallas_conv.py,
interpret mode + TPU when available); wired into benchmarks for A/B. Not yet
the serving default — full-stage integration is round-2 work.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, w_ref, scale_ref, bias_ref, out_ref, *,
            H: int, W: int, C: int, F: int, stride: int, relu: bool):
    """x_ref: [1, H+2, W+2, C] (pre-padded); w_ref: [3, 3, C, F];
    scale/bias: [1, F]; out: [1, H//s, W//s, F]."""
    Ho = H // stride
    Wo = W // stride
    acc = jnp.zeros((Ho, Wo, F), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            patch = x_ref[0, dy : dy + H : stride, dx : dx + W : stride, :]
            acc = acc + jax.lax.dot_general(
                patch.astype(jnp.bfloat16),
                w_ref[dy, dx, :, :],
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    y = acc * scale_ref[0, :][None, None, :] + bias_ref[0, :][None, None, :]
    if relu:
        y = jnp.maximum(y, 0.0)
    out_ref[0, :, :, :] = y


def conv3x3_bn_relu(
    x: jnp.ndarray,
    w: jnp.ndarray,
    scale: Optional[jnp.ndarray] = None,
    bias: Optional[jnp.ndarray] = None,
    stride: int = 1,
    relu: bool = True,
    interpret: bool = False,
) -> jnp.ndarray:
    """[B, H, W, C] × [3, 3, C, F] → [B, H/s, W/s, F] with SAME padding and a
    fused per-channel affine (+ReLU). Whole-image-per-grid-cell layout: valid
    while (H+2)·(W+2)·C·2B + H·W·F·4B fits VMEM (all resnet18 stages at 512²
    inputs do)."""
    B, H, W_, C = x.shape
    F = w.shape[-1]
    assert w.shape[:3] == (3, 3, C)
    assert H % stride == 0 and W_ % stride == 0
    if scale is None:
        scale = jnp.ones((F,), jnp.float32)
    if bias is None:
        bias = jnp.zeros((F,), jnp.float32)

    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    kernel = functools.partial(
        _kernel, H=H, W=W_, C=C, F=F, stride=stride, relu=relu
    )
    Ho, Wo = H // stride, W_ // stride
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H + 2, W_ + 2, C), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, C, F), lambda b: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, F), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, F), lambda b: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, Ho, Wo, F), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Ho, Wo, F), jnp.float32),
        interpret=interpret,
    )(xp, w.astype(jnp.bfloat16), scale[None, :], bias[None, :])
