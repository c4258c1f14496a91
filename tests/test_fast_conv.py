"""conv3x3_gemm (ops/fast_conv.py — the measured-negative GEMM-formulated
conv kept as an engineering record) must stay numerically exact vs lax so
the recorded benchmark comparisons remain apples-to-apples."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from synthetic_audio_detection_tpu.ops.fast_conv import conv3x3_gemm


@pytest.mark.parametrize("stride,k_pack", [(1, False), (2, False),
                                           (1, True), (2, True)])
def test_conv3x3_gemm_matches_lax(rng, stride, k_pack):
    B, H, W, C, F = 2, 12, 16, 8, 16
    x = jnp.asarray(rng.standard_normal((B, H, W, C)).astype(np.float32) * 0.5)
    w = jnp.asarray(rng.standard_normal((3, 3, C, F)).astype(np.float32) * 0.1)
    ref = jax.lax.conv_general_dilated(
        x, w, (stride, stride), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    got = conv3x3_gemm(x, w, stride=stride, k_pack=k_pack,
                       precision_dtype=jnp.float32)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
