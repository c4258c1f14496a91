"""Temporal post-processing filters as jittable ops.

The reference smooths per-window probabilities on the host with
scipy.ndimage.gaussian_filter1d (inference_runner.py:300-325) and the legacy
analyzer adds scipy.signal.medfilt + majority-vote fallback
(legacy/source/inference_script.py:197-217). These are tiny [num_windows, N+1]
arrays, but keeping them on device avoids a host round-trip inside the serving
graph; the implementations match scipy defaults numerically.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=16)
def _gaussian_kernel1d(sigma: float, truncate: float = 4.0) -> np.ndarray:
    """scipy.ndimage.gaussian_filter1d kernel (order 0): radius =
    int(truncate * sigma + 0.5), normalized Gaussian."""
    radius = int(truncate * sigma + 0.5)
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


def gaussian_filter1d(x: jnp.ndarray, sigma: float, axis: int = 0, truncate: float = 4.0) -> jnp.ndarray:
    """Gaussian smoothing along `axis` with scipy's default 'reflect'
    boundary mode (mirror-on-edge, i.e. (d c b a | a b c d | d c b a))."""
    k = jnp.asarray(_gaussian_kernel1d(sigma, truncate))
    radius = (k.shape[0] - 1) // 2
    x = jnp.moveaxis(x, axis, -1)
    shape = x.shape
    n = shape[-1]
    flat = x.reshape(-1, 1, n)
    # scipy 'reflect' == jnp.pad 'symmetric'
    pad_w = min(radius, n)  # jnp symmetric pad cannot exceed length
    padded = flat
    remaining = radius
    while remaining > 0:
        w = min(remaining, padded.shape[-1])
        padded = jnp.pad(padded, ((0, 0), (0, 0), (w, w)), mode="symmetric")
        remaining -= w
    del pad_w
    y = jax.lax.conv_general_dilated(
        padded,
        k[None, None, :],
        window_strides=(1,),
        padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
    )
    y = y.reshape(shape)
    return jnp.moveaxis(y, -1, axis)


def median_filter1d(x: jnp.ndarray, kernel_size: int = 5, axis: int = -1) -> jnp.ndarray:
    """scipy.signal.medfilt semantics: zero padding at the edges, odd kernel."""
    if kernel_size % 2 != 1:
        raise ValueError("kernel_size must be odd")
    r = kernel_size // 2
    x = jnp.moveaxis(x, axis, -1)
    n = x.shape[-1]
    padded = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(r, r)], mode="constant")
    idx = jnp.arange(n)[:, None] + jnp.arange(kernel_size)[None, :]
    windows = padded[..., idx]  # [..., n, k]
    med = jnp.median(windows, axis=-1)
    return jnp.moveaxis(med, -1, axis)
