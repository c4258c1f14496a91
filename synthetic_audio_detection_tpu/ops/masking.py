"""SpecAugment-style frequency/time masking as jitted random ops.

Reproduces torchaudio.transforms.FrequencyMasking(15) + TimeMasking(35) as the
reference applies them to the dB spectrogram during training only
(reference: submodel_trainer.py:109-114, 194-197). torchaudio draws
`value ~ U[0, param)` and `start ~ U[0, dim - value)` as floats and masks
[start, start+value) with zeros; we match that distributionally using JAX PRNG
(exact RNG streams cannot match torch, which is fine — augmentation is random
by definition)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _axis_mask(key: jax.Array, batch: int, dim: int, param: int) -> jnp.ndarray:
    """Per-item mask over one axis → bool [batch, dim] (True = keep)."""
    k1, k2 = jax.random.split(key)
    value = jax.random.uniform(k1, (batch, 1), minval=0.0, maxval=float(param))
    start = jax.random.uniform(k2, (batch, 1)) * (dim - value)
    pos = jnp.arange(dim, dtype=jnp.float32)[None, :]
    masked = (pos >= start) & (pos < start + value)
    return ~masked


def spec_augment(
    key: jax.Array,
    spec: jnp.ndarray,
    freq_mask_param: int = 15,
    time_mask_param: int = 35,
    mask_value: float = 0.0,
) -> jnp.ndarray:
    """Apply one frequency mask then one time mask. spec: [B, n_mels, T]."""
    B, M, T = spec.shape
    kf, kt = jax.random.split(key)
    keep_f = _axis_mask(kf, B, M, freq_mask_param)[:, :, None]
    keep_t = _axis_mask(kt, B, T, time_mask_param)[:, None, :]
    return jnp.where(keep_f & keep_t, spec, mask_value)
