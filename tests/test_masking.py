"""SpecAugment masking properties vs the torchaudio semantics it mirrors
(FrequencyMasking(15)+TimeMasking(35), submodel_trainer.py:109-114):
value ~ U[0, param), start ~ U[0, dim - value), band masked to mask_value.
The masked region is (freq row band) ∪ (time column band): fully-masked rows
recover the freq band, fully-masked columns the time band.
"""

import numpy as np
import jax
import jax.numpy as jnp

from synthetic_audio_detection_tpu.ops.masking import spec_augment


def _full_band(changed_2d, axis):
    """Indices fully masked along `axis` (rows for axis=1, cols for axis=0)."""
    return np.nonzero(changed_2d.all(axis=axis))[0]


def test_masks_are_contiguous_bands_within_params():
    rng = np.random.default_rng(0)
    spec = jnp.asarray(rng.uniform(1.0, 2.0, (8, 64, 96)).astype(np.float32))
    out = np.asarray(spec_augment(jax.random.PRNGKey(3), spec,
                                  freq_mask_param=15, time_mask_param=35))
    src = np.asarray(spec)
    for b in range(8):
        changed = out[b] != src[b]
        freq_rows = _full_band(changed, axis=1)
        time_cols = _full_band(changed, axis=0)
        if freq_rows.size:
            assert freq_rows.max() - freq_rows.min() + 1 == freq_rows.size  # contiguous
            assert freq_rows.size <= 15
        if time_cols.size:
            assert time_cols.max() - time_cols.min() + 1 == time_cols.size
            assert time_cols.size <= 35
        # every changed cell is inside the union of the two bands and masked
        rows_any = np.nonzero(changed.any(axis=1))[0]
        for r in rows_any:
            if freq_rows.size and freq_rows.min() <= r <= freq_rows.max():
                continue
            cols = np.nonzero(changed[r])[0]
            assert time_cols.size and set(cols) <= set(time_cols)
        assert np.all(out[b][changed] == 0.0)


def test_mask_value_and_determinism():
    rng = np.random.default_rng(1)
    spec = jnp.asarray(rng.uniform(1.0, 2.0, (4, 32, 40)).astype(np.float32))
    a = np.asarray(spec_augment(jax.random.PRNGKey(7), spec, mask_value=-5.0))
    b = np.asarray(spec_augment(jax.random.PRNGKey(7), spec, mask_value=-5.0))
    c = np.asarray(spec_augment(jax.random.PRNGKey(8), spec, mask_value=-5.0))
    np.testing.assert_array_equal(a, b)  # same key → same masks
    assert not np.array_equal(a, c)  # different key → different masks
    changed = a != np.asarray(spec)
    assert np.all(a[changed] == -5.0)


def test_mask_width_distribution_matches_uniform():
    """Freq band widths over many draws stay within [0, 15] and average near
    the U[0,15) mean (distributional check, not bit-exact vs torch — the
    reference's augmentation is random by definition)."""
    spec = jnp.ones((512, 64, 8), jnp.float32)
    out = np.asarray(spec_augment(jax.random.PRNGKey(0), spec,
                                  freq_mask_param=15, time_mask_param=1))
    src = np.ones((64, 8), np.float32)
    widths = np.asarray([
        _full_band(out[b] != src, axis=1).size for b in range(512)
    ])
    assert widths.max() <= 15
    # E[width of U[0,15) on the integer grid] ≈ 7.5 minus edge effects
    assert 5.0 < widths.mean() < 9.0
