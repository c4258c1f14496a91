"""Bisect which Pallas kernel features the tunnel's remote-compile helper
rejects (HTTP 500). Findings (2026-08-16, re-runnable):

- trivial elementwise kernel ............................ compiles
- tiled matmul with a 2D grid ........................... compiles
- fused mel kernel at a fresh batch size ................ compiles
- F1: program_id-DEPENDENT dynamic slice (pl.dslice) .... CRASHES
- F2: lane-axis jnp.concatenate then K=2C dot ........... CRASHES
- F3: 9 static tap slices + w_ref[i] 3D indexing ........ compiles

Implication: the conv-kernel blocker is NOT conv structure — it is dynamic
in-kernel slicing and lane concatenation. ops/pallas_conv.py with
k_pack=False uses only static slices and should compile (layer3 did, at
C=256 where k_pack never engages); every crashed layer1 attempt had either
k_pack=True (concat) or manual DMA / runtime offsets.

Run: python benchmarks/pallas_helper_bisect.py
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

sys.path.insert(0, ".")


def trial(name, fn):
    try:
        out = fn()
        print(name, ": OK", float(jnp.asarray(out).astype(jnp.float32).sum()))
    except Exception as e:  # noqa: BLE001
        print(name, ": FAIL", repr(e)[:110])


def main():
    A = jnp.ones((2, 2048, 64), jnp.bfloat16)
    W = jnp.ones((64, 64), jnp.bfloat16)
    W9 = jnp.ones((9, 64, 64), jnp.bfloat16)

    def k1(x_ref, w_ref, o_ref):
        t = pl.program_id(1)
        rows = x_ref[0, pl.dslice(t * 256 + 3, 256), :]
        o_ref[0, :, :] = jax.lax.dot_general(
            rows, w_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(o_ref.dtype)

    trial("F1 dyn-dslice", lambda: pl.pallas_call(
        k1, grid=(2, 7),
        in_specs=[pl.BlockSpec((1, 2048, 64), lambda b, t: (b, 0, 0)),
                  pl.BlockSpec((64, 64), lambda b, t: (0, 0))],
        out_specs=pl.BlockSpec((1, 256, 64), lambda b, t: (b, t, 0)),
        out_shape=jax.ShapeDtypeStruct((2, 1792, 64), jnp.bfloat16))(A, W))

    def k2(x_ref, w_ref, o_ref):
        a = x_ref[0, 0:256, :]
        b = x_ref[0, 1:257, :]
        p = jnp.concatenate([a, b], axis=-1)
        wp = jnp.concatenate([w_ref[...], w_ref[...]], axis=0)
        o_ref[0, :, :] = jax.lax.dot_general(
            p, wp, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(o_ref.dtype)

    trial("F2 lane-concat", lambda: pl.pallas_call(
        k2, grid=(2,),
        in_specs=[pl.BlockSpec((1, 2048, 64), lambda b: (b, 0, 0)),
                  pl.BlockSpec((64, 64), lambda b: (0, 0))],
        out_specs=pl.BlockSpec((1, 256, 64), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((2, 256, 64), jnp.bfloat16))(A, W))

    def k3(x_ref, w_ref, o_ref):
        acc = jnp.zeros((256, 64), jnp.float32)
        for i in range(9):
            acc = acc + jax.lax.dot_general(
                x_ref[0, i:i + 256, :], w_ref[i],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        o_ref[0, :, :] = acc.astype(o_ref.dtype)

    trial("F3 9-tap-static", lambda: pl.pallas_call(
        k3, grid=(2,),
        in_specs=[pl.BlockSpec((1, 2048, 64), lambda b: (b, 0, 0)),
                  pl.BlockSpec((9, 64, 64), lambda b: (0, 0, 0))],
        out_specs=pl.BlockSpec((1, 256, 64), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((2, 256, 64), jnp.bfloat16))(A, W9))


if __name__ == "__main__":
    main()
