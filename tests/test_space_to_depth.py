"""Exactness of the space-to-depth conv folding (ops/space_to_depth.py) vs a
direct lax conv — the layer1 frontier reformulation must be bit-equivalent
in f32 before any perf claim."""

import numpy as np
import jax
import jax.numpy as jnp

from synthetic_audio_detection_tpu.ops.space_to_depth import (
    conv3x3_s2d,
    conv3x3_s2d_4phase,
    depth_to_space,
    fold_conv3x3_s2d,
    fold_conv3x3_s2d_phase,
    space_to_depth,
)


def _direct(x, w):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding=[(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )


def test_s2d_roundtrip(rng):
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 5)).astype(np.float32))
    np.testing.assert_array_equal(
        np.asarray(depth_to_space(space_to_depth(x))), np.asarray(x)
    )


def test_folded_conv_matches_direct(rng):
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 6)).astype(np.float32))
    w = rng.standard_normal((3, 3, 6, 7)).astype(np.float32)
    ref = np.asarray(_direct(x, jnp.asarray(w)))
    got = np.asarray(depth_to_space(
        conv3x3_s2d(space_to_depth(x), jnp.asarray(fold_conv3x3_s2d(w)))
    ))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_4phase_folding_matches_direct(rng):
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 6)).astype(np.float32))
    w = rng.standard_normal((3, 3, 6, 7)).astype(np.float32)
    ref = np.asarray(_direct(x, jnp.asarray(w)))
    phases = [fold_conv3x3_s2d_phase(w, qy, qx)
              for qy in range(2) for qx in range(2)]
    got = np.asarray(depth_to_space(
        conv3x3_s2d_4phase(space_to_depth(x), phases)
    ))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_folded_conv_layer1_shape(rng):
    # the real frontier shape (batch kept tiny for CPU)
    x = jnp.asarray(rng.standard_normal((1, 128, 128, 64)).astype(np.float32))
    w = (rng.standard_normal((3, 3, 64, 64)) * 0.05).astype(np.float32)
    ref = np.asarray(_direct(x, jnp.asarray(w)))
    got = np.asarray(depth_to_space(
        conv3x3_s2d(space_to_depth(x), jnp.asarray(fold_conv3x3_s2d(w)))
    ))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_merged_phase_folding_matches_direct(rng):
    from synthetic_audio_detection_tpu.ops.space_to_depth import (
        conv3x3_s2d_merged,
        fold_conv3x3_s2d_merged,
    )

    x = jnp.asarray(rng.standard_normal((2, 16, 16, 6)).astype(np.float32))
    w = rng.standard_normal((3, 3, 6, 7)).astype(np.float32)
    ref = np.asarray(_direct(x, jnp.asarray(w)))
    got = np.asarray(depth_to_space(
        conv3x3_s2d_merged(space_to_depth(x),
                           jnp.asarray(fold_conv3x3_s2d_merged(w)))
    ))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_merged_traced_fold_matches_host_fold(rng):
    from synthetic_audio_detection_tpu.ops.space_to_depth import (
        fold_conv3x3_s2d_merged,
        fold_conv3x3_s2d_merged_traced,
    )

    w = rng.standard_normal((3, 3, 8, 16)).astype(np.float32)
    np.testing.assert_array_equal(
        np.asarray(fold_conv3x3_s2d_merged_traced(jnp.asarray(w))),
        fold_conv3x3_s2d_merged(w),
    )


def test_h_only_folding_matches_direct(rng):
    from synthetic_audio_detection_tpu.ops.space_to_depth import (
        conv3x3_s2d_h,
        depth_to_space_h,
        fold_conv3x3_s2d_h,
        space_to_depth_h,
    )

    x = jnp.asarray(rng.standard_normal((2, 16, 16, 6)).astype(np.float32))
    w = rng.standard_normal((3, 3, 6, 7)).astype(np.float32)
    ref = np.asarray(_direct(x, jnp.asarray(w)))
    got = np.asarray(depth_to_space_h(
        conv3x3_s2d_h(space_to_depth_h(x), fold_conv3x3_s2d_h(w))
    ))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)
