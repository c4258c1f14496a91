"""Smoothing filters vs scipy oracles (exact semantics the reference relies on:
inference_runner.py:303, legacy/source/inference_script.py:204)."""

import numpy as np
import jax.numpy as jnp
from scipy.ndimage import gaussian_filter1d as scipy_g1d
from scipy.signal import medfilt as scipy_medfilt

from synthetic_audio_detection_tpu.ops.filters import gaussian_filter1d, median_filter1d


def test_gaussian_matches_scipy(rng):
    x = rng.standard_normal((37, 7)).astype(np.float32)
    ours = np.asarray(gaussian_filter1d(jnp.asarray(x), sigma=2.0, axis=0))
    ref = scipy_g1d(x, sigma=2.0, axis=0)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_gaussian_short_signal(rng):
    # shorter than the kernel radius — exercises the iterated symmetric pad
    x = rng.standard_normal((5, 3)).astype(np.float32)
    ours = np.asarray(gaussian_filter1d(jnp.asarray(x), sigma=2.0, axis=0))
    ref = scipy_g1d(x, sigma=2.0, axis=0)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_median_matches_scipy(rng):
    x = rng.standard_normal(101).astype(np.float32)
    ours = np.asarray(median_filter1d(jnp.asarray(x), kernel_size=5))
    ref = scipy_medfilt(x, kernel_size=5)
    np.testing.assert_allclose(ours, ref, atol=0)
