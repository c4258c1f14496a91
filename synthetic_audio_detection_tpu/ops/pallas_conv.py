"""Pallas direct 3×3 convolution (NHWC, stride 1/2, fused BN-affine + ReLU).

Motivation (benchmarks/conv_ab.py, measured on-chip): XLA's conv lowering
runs the resnet18@512² layer2/layer3 shapes at 194/251 TF/s (≈ bf16 peak) but
**layer1 (128² spatial, C=64) at only 25 TF/s** — and layer1 holds ~half the
model FLOPs. This kernel computes the 3×3 stencil as shifted channel
contractions on the MXU — no im2col, no frame materialization — with two
layer1-specific tricks:

- **K-packing**: for C ≤ 64, tap pairs are concatenated along the channel
  (lane) axis so each ``dot_general`` contracts K = 2C = 128, filling the
  MXU's contraction dimension (unpacked C=64 idles half the array);
- bf16 streams in/out (f32 accumulation via preferred_element_type), keeping
  the whole-image-per-grid-cell layout inside VMEM.

Correctness vs lax.conv: tests/test_pallas_conv.py (interpret + TPU A/B).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TAPS = [(dy, dx) for dy in range(3) for dx in range(3)]


def _kernel(x_ref, w_ref, scale_ref, bias_ref, out_ref, *,
            H: int, W: int, C: int, F: int, stride: int, relu: bool,
            k_pack: bool):
    """x_ref: [1, H+2, W+2, C] bf16 (pre-padded); w_ref: [9, C, F] bf16
    (tap-major); scale/bias: [1, F] f32; out: [1, H//s, W//s, F] bf16."""
    Ho, Wo = H // stride, W // stride
    acc = jnp.zeros((Ho, Wo, F), jnp.float32)

    def tap(i):
        dy, dx = _TAPS[i]
        return x_ref[0, dy : dy + H : stride, dx : dx + W : stride, :]

    if k_pack:
        # pairs of taps → K = 2C per dot (the 9th tap pairs with zeros)
        for i in range(0, 8, 2):
            p = jnp.concatenate([tap(i), tap(i + 1)], axis=-1)
            wpair = jnp.concatenate([w_ref[i], w_ref[i + 1]], axis=0)
            acc = acc + jax.lax.dot_general(
                p, wpair,
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        acc = acc + jax.lax.dot_general(
            tap(8), w_ref[8],
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    else:
        for i in range(9):
            acc = acc + jax.lax.dot_general(
                tap(i), w_ref[i],
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

    y = acc * scale_ref[0, :][None, None, :] + bias_ref[0, :][None, None, :]
    if relu:
        y = jnp.maximum(y, 0.0)
    out_ref[0, :, :, :] = y.astype(out_ref.dtype)


def _tiled_kernel(x_hbm, w_ref, scale_ref, bias_ref, out_ref, scratch, sem, *,
                  TH: int, W: int, C: int, F: int, relu: bool, k_pack: bool):
    """Grid (B, H//TH). x_hbm: [B, H+2, W+2, C] bf16 in HBM/ANY; per cell DMA
    a [TH+2, W+2, C] halo slab into VMEM scratch, then the 9-tap contraction.
    Stride-1 only (the layer1 case). VMEM ≈ slab + out tile + f32 acc —
    ~2.2 MB at TH=32/W=128/C=F=64."""
    b = pl.program_id(0)
    t = pl.program_id(1)
    copy = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(t * TH, TH + 2)], scratch, sem
    )
    copy.start()
    copy.wait()

    acc = jnp.zeros((TH, W, F), jnp.float32)

    def tap(i):
        dy, dx = _TAPS[i]
        return scratch[dy : dy + TH, dx : dx + W, :]

    if k_pack:
        for i in range(0, 8, 2):
            p = jnp.concatenate([tap(i), tap(i + 1)], axis=-1)
            wpair = jnp.concatenate([w_ref[i], w_ref[i + 1]], axis=0)
            acc = acc + jax.lax.dot_general(
                p, wpair, dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        acc = acc + jax.lax.dot_general(
            tap(8), w_ref[8], dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    else:
        for i in range(9):
            acc = acc + jax.lax.dot_general(
                tap(i), w_ref[i], dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

    y = acc * scale_ref[0, :][None, None, :] + bias_ref[0, :][None, None, :]
    if relu:
        y = jnp.maximum(y, 0.0)
    out_ref[0, :, :, :] = y.astype(out_ref.dtype)


def conv3x3_bn_relu_tiled(
    x: jnp.ndarray,
    w: jnp.ndarray,
    scale: Optional[jnp.ndarray] = None,
    bias: Optional[jnp.ndarray] = None,
    relu: bool = True,
    tile_h: int = 32,
    k_pack: Optional[bool] = None,
    out_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jnp.ndarray:
    """Stride-1 3×3 conv with H-tiling + manual halo DMA (the layer1-shaped
    configuration where the whole-image variant exceeds VMEM)."""
    B, H, W_, C = x.shape
    F = w.shape[-1]
    assert w.shape[:3] == (3, 3, C)
    assert H % tile_h == 0
    if scale is None:
        scale = jnp.ones((F,), jnp.float32)
    if bias is None:
        bias = jnp.zeros((F,), jnp.float32)
    if k_pack is None:
        k_pack = C <= 64

    xp = jnp.pad(x.astype(jnp.bfloat16), ((0, 0), (1, 1), (1, 1), (0, 0)))
    w_taps = w.astype(jnp.bfloat16).reshape(9, C, F)
    kernel = functools.partial(
        _tiled_kernel, TH=tile_h, W=W_, C=C, F=F, relu=relu, k_pack=k_pack
    )
    return pl.pallas_call(
        kernel,
        grid=(B, H // tile_h),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # full array, manual DMA
            pl.BlockSpec((9, C, F), lambda b, t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, F), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, F), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_h, W_, F), lambda b, t: (b, t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W_, F), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((tile_h + 2, W_ + 2, C), jnp.bfloat16),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xp, w_taps, scale[None, :].astype(jnp.float32),
      bias[None, :].astype(jnp.float32))


def conv3x3_bn_relu(
    x: jnp.ndarray,
    w: jnp.ndarray,
    scale: Optional[jnp.ndarray] = None,
    bias: Optional[jnp.ndarray] = None,
    stride: int = 1,
    relu: bool = True,
    interpret: bool = False,
    k_pack: Optional[bool] = None,
    out_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """[B, H, W, C] × [3, 3, C, F] → [B, H/s, W/s, F] with SAME padding and a
    fused per-channel affine (+ReLU). Whole-image-per-grid-cell layout: valid
    while the bf16 image + output + f32 accumulator fit VMEM (all resnet18
    stages at 512² inputs do)."""
    B, H, W_, C = x.shape
    F = w.shape[-1]
    assert w.shape[:3] == (3, 3, C)
    assert H % stride == 0 and W_ % stride == 0
    if scale is None:
        scale = jnp.ones((F,), jnp.float32)
    if bias is None:
        bias = jnp.zeros((F,), jnp.float32)
    if k_pack is None:
        k_pack = C <= 64

    xp = jnp.pad(x.astype(jnp.bfloat16), ((0, 0), (1, 1), (1, 1), (0, 0)))
    w_taps = w.astype(jnp.bfloat16).reshape(9, C, F)
    kernel = functools.partial(
        _kernel, H=H, W=W_, C=C, F=F, stride=stride, relu=relu, k_pack=k_pack
    )
    Ho, Wo = H // stride, W_ // stride
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H + 2, W_ + 2, C), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, C, F), lambda b: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, F), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, F), lambda b: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, Ho, Wo, F), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Ho, Wo, F), out_dtype),
        interpret=interpret,
    )(xp, w_taps, scale[None, :].astype(jnp.float32),
      bias[None, :].astype(jnp.float32))
