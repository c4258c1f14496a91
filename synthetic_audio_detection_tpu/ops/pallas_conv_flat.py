"""Flat-2D Pallas conv: 3×3 stencil as row-shifted 2D matmuls.

Third structural formulation of the layer1 conv kernel (after whole-image-4D
and manual-DMA-tiled, both of which crash this toolchain's remote-compile
helper — NOTES.md). Hypothesis: the working Pallas mel kernel differs from
the crashing conv kernels in that its refs are plain 2D blocks with
contiguous slicing and 2D dots; this kernel matches that profile exactly:

- the padded image is pre-flattened (in XLA) to [B, (H+2)(W+2)+2, C] with a
  one-element guard at each end, so every tap of every output tile is ONE
  contiguous 2D row-slice `x_ref[q0+off : q0+off+T, :]` — no 4D blocks, no
  strided loads, no halo DMA;
- tap (dy, dx) is the row offset off = dy*(W+2) + dx applied to the flat
  output index; the W-padding columns come along as junk rows in the output
  and are sliced away afterwards (in XLA);
- the contraction is a plain [T, C] x [C, F] dot (K-packed to [T, 2C] pairs
  when C <= 64, same trick as ops/pallas_conv.py).

Stride-1 SAME only (the layer1 configuration: [B, 128, 128, 64] x
[3, 3, 64, 64] — submodel_trainer.py:606-633 backbone shapes).
Correctness: tests/test_pallas_conv.py::test_flat_conv_* (interpret mode).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _flat_kernel(x_ref, w_ref, scale_ref, bias_ref, out_ref, *,
                 T: int, W2: int, C: int, F: int, relu: bool, k_pack: bool):
    """x_ref: [1, Npad, C] bf16 (flattened padded image + guards);
    w_ref: [9, C, F] bf16 tap-major; out_ref: [1, T, F] bf16 — tile t covers
    flat output rows [t*T, t*T + T)."""
    t = pl.program_id(1)
    q0 = t * T  # flat output row base (guard offset folded into offsets)

    def tap_rows(i):
        # output q = y_out*W2 + x_p (x_p includes the junk padding columns);
        # tap (dy, dx) reads padded-image flat row (y_out+dy)*W2 + x_p+dx-1,
        # which in the guarded array (front guard = 1) is exactly
        # q + dy*W2 + dx — always in bounds thanks to the guards.
        dy, dx = divmod(i, 3)
        return x_ref[0, pl.dslice(q0 + dy * W2 + dx, T), :]

    acc = jnp.zeros((T, F), jnp.float32)
    if k_pack:
        for i in range(0, 8, 2):
            p = jnp.concatenate([tap_rows(i), tap_rows(i + 1)], axis=-1)
            wpair = jnp.concatenate([w_ref[i], w_ref[i + 1]], axis=0)
            acc = acc + jax.lax.dot_general(
                p, wpair, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        acc = acc + jax.lax.dot_general(
            tap_rows(8), w_ref[8], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    else:
        for i in range(9):
            acc = acc + jax.lax.dot_general(
                tap_rows(i), w_ref[i],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

    y = acc * scale_ref[0, :][None, :] + bias_ref[0, :][None, :]
    if relu:
        y = jnp.maximum(y, 0.0)
    out_ref[0, :, :] = y.astype(out_ref.dtype)


def _flat_static_kernel(x_ref, w_ref, scale_ref, bias_ref, out_ref, *,
                        T: int, W2: int, F: int, n_tiles: int, relu: bool):
    """Fully-static variant: grid=(B,), the tile loop unrolled in Python so
    every slice offset is a compile-time constant. This is the formulation
    the tunnel's compile helper ACCEPTS (benchmarks/pallas_helper_bisect.py:
    program_id-dependent dslice and lane-concat crash it; static tap slices
    compile). 9 K=C dots per tile."""
    scale = scale_ref[0, :][None, :]
    bias = bias_ref[0, :][None, :]
    for t in range(n_tiles):
        acc = jnp.zeros((T, F), jnp.float32)
        for i in range(9):
            dy, dx = divmod(i, 3)
            off = t * T + dy * W2 + dx
            acc = acc + jax.lax.dot_general(
                x_ref[0, off:off + T, :], w_ref[i],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        y = acc * scale + bias
        if relu:
            y = jnp.maximum(y, 0.0)
        out_ref[0, t * T:(t + 1) * T, :] = y.astype(out_ref.dtype)


def conv3x3_bn_relu_flat_static(
    x: jnp.ndarray,
    w: jnp.ndarray,
    scale: Optional[jnp.ndarray] = None,
    bias: Optional[jnp.ndarray] = None,
    relu: bool = True,
    tile_rows: Optional[int] = None,
    out_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jnp.ndarray:
    """Static-unrolled flat conv (the compile-helper-compatible formulation).
    [B, H, W, C] × [3, 3, C, F] → [B, H, W, F], stride-1 SAME + affine(+ReLU).
    """
    B, H, W_, C = x.shape
    F = w.shape[-1]
    assert w.shape[:3] == (3, 3, C)
    W2 = W_ + 2
    n_out = H * W2
    if tile_rows is None:
        tile_rows = max(
            (d for d in range(8, 1025, 8) if n_out % d == 0), default=n_out)
    assert n_out % tile_rows == 0, (n_out, tile_rows)
    if scale is None:
        scale = jnp.ones((F,), jnp.float32)
    if bias is None:
        bias = jnp.zeros((F,), jnp.float32)

    xp = jnp.pad(x.astype(jnp.bfloat16), ((0, 0), (1, 1), (1, 1), (0, 0)))
    flat = jnp.pad(xp.reshape(B, (H + 2) * W2, C), ((0, 0), (1, 1), (0, 0)))
    w_taps = w.astype(jnp.bfloat16).reshape(9, C, F)

    kernel = functools.partial(
        _flat_static_kernel, T=tile_rows, W2=W2, F=F,
        n_tiles=n_out // tile_rows, relu=relu)
    out_flat = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, flat.shape[1], C), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, C, F), lambda b: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, F), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, F), lambda b: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n_out, F), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, n_out, F), out_dtype),
        interpret=interpret,
    )(flat, w_taps, scale[None, :].astype(jnp.float32),
      bias[None, :].astype(jnp.float32))
    return out_flat.reshape(B, H, W2, F)[:, :, 1:1 + W_, :]


def conv3x3_bn_relu_flat(
    x: jnp.ndarray,
    w: jnp.ndarray,
    scale: Optional[jnp.ndarray] = None,
    bias: Optional[jnp.ndarray] = None,
    relu: bool = True,
    tile_rows: Optional[int] = None,
    k_pack: Optional[bool] = None,
    out_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jnp.ndarray:
    """[B, H, W, C] × [3, 3, C, F] → [B, H, W, F], stride-1 SAME, fused
    per-channel affine (+ReLU), via the flat-2D tap-matmul kernel."""
    B, H, W_, C = x.shape
    F = w.shape[-1]
    assert w.shape[:3] == (3, 3, C)
    W2 = W_ + 2
    n_out = H * W2  # junk columns included, sliced away below
    if tile_rows is None:
        # largest divisor of n_out <= 1024 and a multiple of 8 (sublane-
        # friendly); layer1@512² (n_out = 128*130 = 16640) picks 832
        tile_rows = max(
            (d for d in range(8, 1025, 8) if n_out % d == 0), default=n_out)
    assert n_out % tile_rows == 0, (n_out, tile_rows)
    if scale is None:
        scale = jnp.ones((F,), jnp.float32)
    if bias is None:
        bias = jnp.zeros((F,), jnp.float32)
    if k_pack is None:
        k_pack = C <= 64

    xp = jnp.pad(x.astype(jnp.bfloat16), ((0, 0), (1, 1), (1, 1), (0, 0)))
    flat = xp.reshape(B, (H + 2) * W2, C)
    # one-element guards so tap offsets at the extremes stay in bounds
    flat = jnp.pad(flat, ((0, 0), (1, 1), (0, 0)))
    w_taps = w.astype(jnp.bfloat16).reshape(9, C, F)

    kernel = functools.partial(
        _flat_kernel, T=tile_rows, W2=W2, C=C, F=F, relu=relu, k_pack=k_pack)
    out_flat = pl.pallas_call(
        kernel,
        grid=(B, n_out // tile_rows),
        in_specs=[
            pl.BlockSpec((1, flat.shape[1], C), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, C, F), lambda b, t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, F), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, F), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_rows, F), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, n_out, F), out_dtype),
        interpret=interpret,
    )(flat, w_taps, scale[None, :].astype(jnp.float32),
      bias[None, :].astype(jnp.float32))
    # drop the W-padding junk columns: rows q = y*W2 + x, keep x in [1, W]
    return out_flat.reshape(B, H, W2, F)[:, :, 1:1 + W_, :]
