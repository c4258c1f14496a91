"""Pallas direct conv vs lax.conv (interpret mode)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from synthetic_audio_detection_tpu.ops.pallas_conv import conv3x3_bn_relu


def _ref(x, w, scale, bias, stride, relu):
    y = jax.lax.conv_general_dilated(
        x.astype(jnp.float32), w.astype(jnp.float32),
        window_strides=(stride, stride),
        padding=[(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    y = y * scale[None, None, None, :] + bias[None, None, None, :]
    return jnp.maximum(y, 0.0) if relu else y


@pytest.mark.parametrize("stride,relu,k_pack", [
    (1, True, False), (2, False, False), (1, True, True), (2, True, True),
])
def test_conv3x3_matches_lax(rng, stride, relu, k_pack):
    B, H, W, C, F = 2, 16, 16, 8, 16
    x = jnp.asarray(rng.standard_normal((B, H, W, C)).astype(np.float32) * 0.5)
    w = jnp.asarray(rng.standard_normal((3, 3, C, F)).astype(np.float32) * 0.1)
    scale = jnp.asarray(rng.uniform(0.5, 1.5, F).astype(np.float32))
    bias = jnp.asarray(rng.standard_normal(F).astype(np.float32) * 0.1)
    got = np.asarray(conv3x3_bn_relu(x, w, scale, bias, stride, relu,
                                     interpret=True, k_pack=k_pack)).astype(np.float32)
    # reference uses the same bf16 inputs for a fair numerical comparison
    ref = np.asarray(_ref(x.astype(jnp.bfloat16).astype(jnp.float32),
                          w.astype(jnp.bfloat16).astype(jnp.float32),
                          scale, bias, stride, relu))
    assert got.shape == ref.shape == (B, H // stride, W // stride, F)
    np.testing.assert_allclose(got, ref, rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("shape,k_pack", [
    ((2, 16, 14, 8, 8), False),
    ((2, 16, 14, 8, 8), True),
    ((1, 32, 32, 64, 64), True),  # layer1-like channel width
])
def test_flat_conv_matches_lax(rng, shape, k_pack):
    """Flat-2D tap-matmul formulation (ops/pallas_conv_flat.py): the
    junk-column slicing and guard offsets must reproduce lax exactly."""
    from synthetic_audio_detection_tpu.ops.pallas_conv_flat import (
        conv3x3_bn_relu_flat,
    )

    B, H, W, C, F = shape
    x = jnp.asarray(rng.standard_normal((B, H, W, C)).astype(np.float32) * 0.5)
    w = jnp.asarray(rng.standard_normal((3, 3, C, F)).astype(np.float32) * 0.1)
    scale = jnp.asarray(rng.uniform(0.5, 1.5, F).astype(np.float32))
    bias = jnp.asarray(rng.standard_normal(F).astype(np.float32) * 0.1)
    got = np.asarray(conv3x3_bn_relu_flat(
        x, w, scale, bias, interpret=True, k_pack=k_pack)).astype(np.float32)
    ref = np.asarray(_ref(x.astype(jnp.bfloat16).astype(jnp.float32),
                          w.astype(jnp.bfloat16).astype(jnp.float32),
                          scale, bias, 1, True))
    assert got.shape == ref.shape == (B, H, W, F)
    np.testing.assert_allclose(got, ref, rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("shape", [
    (2, 16, 14, 8, 8),
    (1, 32, 32, 64, 64),  # layer1-like channel width
])
def test_flat_conv_static_matches_lax(rng, shape):
    """The STATIC-unrolled flat variant — the only formulation the remote
    compile helper accepts and the one benchmarks/conv_ab.py measured at
    58.8 TF/s — pinned against lax in interpret mode (its static 9-tap
    row-slice offsets and junk-column handling differ from the dynamic
    variant's)."""
    from synthetic_audio_detection_tpu.ops.pallas_conv_flat import (
        conv3x3_bn_relu_flat_static,
    )

    B, H, W, C, F = shape
    x = jnp.asarray(rng.standard_normal((B, H, W, C)).astype(np.float32) * 0.5)
    w = jnp.asarray(rng.standard_normal((3, 3, C, F)).astype(np.float32) * 0.1)
    scale = jnp.asarray(rng.uniform(0.5, 1.5, F).astype(np.float32))
    bias = jnp.asarray(rng.standard_normal(F).astype(np.float32) * 0.1)
    got = np.asarray(conv3x3_bn_relu_flat_static(
        x, w, scale, bias, interpret=True)).astype(np.float32)
    ref = np.asarray(_ref(x.astype(jnp.bfloat16).astype(jnp.float32),
                          w.astype(jnp.bfloat16).astype(jnp.float32),
                          scale, bias, 1, True))
    assert got.shape == ref.shape == (B, H, W, F)
    np.testing.assert_allclose(got, ref, rtol=2e-2, atol=2e-2)
