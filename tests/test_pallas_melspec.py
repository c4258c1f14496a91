"""Fused Pallas mel kernel vs the reference jnp pipeline (interpret mode on
CPU; the same kernel compiles for TPU — exercised by bench/serving)."""

import numpy as np
import jax.numpy as jnp
import pytest

from synthetic_audio_detection_tpu.ops import melspec as M
from synthetic_audio_detection_tpu.ops.pallas_melspec import (
    fused_log_mel,
    fused_log_mel_factored,
)
from synthetic_audio_detection_tpu.utils.config import SpectrogramConfig


@pytest.mark.parametrize("norm", [None, "slaney"])
def test_fused_matches_reference_pipeline(rng, norm):
    cfg = SpectrogramConfig(mel_norm=norm)
    x = (rng.standard_normal((2, 128_000)) * 0.3).astype(np.float32)

    got = np.asarray(fused_log_mel(jnp.asarray(x), cfg, interpret=True))

    mel = M.mel_spectrogram(jnp.asarray(x), cfg, 32_000, use_gemm_dft=True)
    db = M.amplitude_to_db(mel, cfg.top_db)
    ref = np.asarray(M.standardize(db, cfg.eps))

    assert got.shape == ref.shape == (2, 128, 251)
    # bf16 DFT matmuls inside the kernel vs f32 outside: allow bf16-level
    # relative error on the standardized output
    np.testing.assert_allclose(got, ref, rtol=0.05, atol=0.05)
    # distribution-level agreement is tight
    assert abs(got.mean() - ref.mean()) < 1e-3
    assert abs(got.std() - ref.std()) < 1e-2


def test_fused_short_window(rng):
    """1 s windows (32000 samples) also satisfy the hop-divisibility rule."""
    cfg = SpectrogramConfig()
    x = (rng.standard_normal((1, 32_000)) * 0.2).astype(np.float32)
    got = np.asarray(fused_log_mel(jnp.asarray(x), cfg, interpret=True))
    assert got.shape == (1, 128, 63)
    assert np.isfinite(got).all()
    # standardized: near-zero mean, near-unit std over real cells
    assert abs(got.mean()) < 1e-3
    assert abs(got.std() - 1.0) < 0.05


@pytest.mark.parametrize("norm", [None, "slaney"])
def test_factored_kernel_matches_reference_pipeline(rng, norm):
    """Shared-hop-block DFT kernel (ops/pallas_melspec._factored_kernel) vs
    the f32 jnp pipeline — same bf16-rounding tolerance budget as the strip
    kernel (the two kernels' error distributions are equivalent: mean abs
    ~0.0024 vs ~0.0022 on standardized output)."""
    cfg = SpectrogramConfig(mel_norm=norm)
    x = (rng.standard_normal((2, 128_000)) * 0.3).astype(np.float32)

    got = np.asarray(fused_log_mel_factored(jnp.asarray(x), cfg, interpret=True))

    mel = M.mel_spectrogram(jnp.asarray(x), cfg, 32_000, use_gemm_dft=True)
    db = M.amplitude_to_db(mel, cfg.top_db)
    ref = np.asarray(M.standardize(db, cfg.eps))

    assert got.shape == ref.shape == (2, 128, 251)
    np.testing.assert_allclose(got, ref, rtol=0.05, atol=0.15)
    assert abs(got.mean() - ref.mean()) < 1e-3
    assert abs(got.std() - ref.std()) < 1e-2
    assert float(np.mean(np.abs(got - ref))) < 5e-3


def test_factored_kernel_short_window_and_wpc(rng):
    cfg = SpectrogramConfig(mel_norm="slaney", out_size=0)
    x = (rng.standard_normal((4, 32_000)) * 0.2).astype(np.float32)
    base = np.asarray(fused_log_mel_factored(jnp.asarray(x), cfg, interpret=True))
    assert base.shape == (4, 128, 63)
    assert np.isfinite(base).all()
    assert abs(base.mean()) < 1e-3
    for wpc in (2, 4):
        got = np.asarray(fused_log_mel_factored(
            jnp.asarray(x), cfg, interpret=True, windows_per_cell=wpc))
        np.testing.assert_array_equal(got, base)
    odd = np.asarray(fused_log_mel_factored(
        jnp.asarray(x[:3]), cfg, interpret=True, windows_per_cell=2))
    np.testing.assert_array_equal(odd, base[:3])


def test_fused_kernel_windows_per_cell_parity(rng):
    """windows_per_cell > 1 (fewer grid steps) is numerically identical to
    the per-window kernel — same per-window math, only the grid packing
    changes."""
    from synthetic_audio_detection_tpu.ops.pallas_melspec import fused_log_mel
    from synthetic_audio_detection_tpu.utils.config import SpectrogramConfig

    cfg = SpectrogramConfig(mel_norm="slaney", out_size=0)
    w = jnp.asarray(
        (rng.standard_normal((4, 32_000)) * 0.3).astype(np.float32))
    base = np.asarray(fused_log_mel(w, cfg, interpret=True))
    for wpc in (2, 4):
        got = np.asarray(
            fused_log_mel(w, cfg, interpret=True, windows_per_cell=wpc))
        np.testing.assert_array_equal(got, base)
    # non-dividing wpc silently falls back to 1
    odd = np.asarray(
        fused_log_mel(w[:3], cfg, interpret=True, windows_per_cell=2))
    np.testing.assert_array_equal(odd, base[:3])
    # M-stacked strips: same strip math, one [wpc*f_pad, hop] operand per
    # dot — the pad+add stack assembly and row-sliced stats must not change
    # a single value
    for wpc in (2, 4):
        got = np.asarray(
            fused_log_mel(w, cfg, interpret=True, windows_per_cell=wpc,
                          stack_windows=True))
        np.testing.assert_array_equal(got, base)


def test_factored_kernel_lowp_tail_parity(rng):
    """lowp_tail=True (bf16 power→mel matmul + bf16 output) vs the f32-tail
    kernel: bounded by bf16 input-rounding noise. Each mel bin is a
    same-sign sum, so bf16 bounds the RELATIVE bin error (~0.4%) and log10
    turns it into <~0.02 dB; on standardized output that lands well inside
    the bf16 cast noise the serving model already sees."""
    cfg = SpectrogramConfig(mel_norm="slaney", out_size=0)
    x = (rng.standard_normal((4, 128_000)) * 0.3).astype(np.float32)
    base = np.asarray(fused_log_mel_factored(jnp.asarray(x), cfg, interpret=True))
    got = fused_log_mel_factored(jnp.asarray(x), cfg, interpret=True,
                                 lowp_tail=True)
    assert got.dtype == jnp.bfloat16
    got = np.asarray(got, np.float32)
    assert got.shape == base.shape
    # z-scores are O(1); bf16 eps ~ 0.0078/2 absolute at |z|<=1, plus the
    # matmul rounding — budget 0.05 abs worst-case, 0.005 mean
    np.testing.assert_allclose(got, base, atol=0.05)
    assert float(np.mean(np.abs(got - base))) < 5e-3
    # wpc packing: different unrolled programs may round the final bf16
    # cast differently at the last ulp (observed 4/128512 elements); a
    # one-bf16-ulp budget, not bit equality, is the contract in lowp mode
    for wpc in (2, 4):
        again = np.asarray(
            fused_log_mel_factored(jnp.asarray(x), cfg, interpret=True,
                                   lowp_tail=True, windows_per_cell=wpc),
            np.float32)
        np.testing.assert_allclose(again, got, rtol=2 ** -7, atol=2 ** -9)


def test_factored_kernel_db_only_mode(rng):
    """standardize=False stops at the clamped dB spectrogram — the training
    front end's seam (SpecAugment masks dB before standardization,
    submodel_trainer.py:194-199). Pinned two ways: vs the jnp dB pipeline,
    and jnp-standardizing it must reproduce the fused standardized output."""
    cfg = SpectrogramConfig()
    x = (rng.standard_normal((2, 128_000)) * 0.3).astype(np.float32)

    db_k = np.asarray(
        fused_log_mel_factored(jnp.asarray(x), cfg, interpret=True,
                               standardize=False)
    )
    mel = M.mel_spectrogram(jnp.asarray(x), cfg, 32_000, use_gemm_dft=True)
    db_ref = np.asarray(M.amplitude_to_db(mel, cfg.top_db))
    assert db_k.shape == db_ref.shape == (2, 128, 251)
    # dB of a bf16-DFT power spectrum: same tolerance class as the
    # standardized comparison (dB range here spans ~80)
    assert float(np.mean(np.abs(db_k - db_ref))) < 0.05
    np.testing.assert_allclose(db_k, db_ref, atol=1.5)

    z = np.asarray(M.standardize(jnp.asarray(db_k), cfg.eps))
    z_fused = np.asarray(
        fused_log_mel_factored(jnp.asarray(x), cfg, interpret=True)
    )
    np.testing.assert_allclose(z, z_fused, rtol=1e-4, atol=1e-4)


def test_train_features_pallas_mode_matches_gemm(rng):
    """steps._features_from_waveforms(dft_mode='pallas') — the Pallas dB
    kernel feeding the jnp SpecAugment/standardize/crop chain — agrees with
    the f32 gemm path at kernel tolerance, eval mode (no augment RNG)."""
    from synthetic_audio_detection_tpu.train import steps as S

    cfg = SpectrogramConfig(out_size=0)  # native mode
    x = jnp.asarray((rng.standard_normal((2, 128_000)) * 0.3).astype(np.float32))
    a = np.asarray(S._features_from_waveforms(x, cfg, None, None, 32_000,
                                              dft_mode="gemm"))
    b = np.asarray(S._features_from_waveforms(x, cfg, None, None, 32_000,
                                              dft_mode="pallas"))
    assert a.shape == b.shape
    assert float(np.mean(np.abs(a - b))) < 5e-3
    np.testing.assert_allclose(a, b, atol=0.2)


def test_factored_kernel_stack_dft_parity(rng):
    """stack_dft=True (ONE M-stacked DFT matmul per grid cell) is
    numerically identical: each row's dot product is independent of the
    matmul's M, and the frame rows that cross a window boundary (reading
    the next window's rows instead of the zero pad) are all >= n_frames —
    masked dead by the standardize valid mask, exactly like the pad rows."""
    cfg = SpectrogramConfig(mel_norm="slaney", out_size=0)
    for T in (128_000, 32_000):
        x = (rng.standard_normal((4, T)) * 0.3).astype(np.float32)
        base = np.asarray(
            fused_log_mel_factored(jnp.asarray(x), cfg, interpret=True))
        for wpc in (1, 2, 4):
            got = np.asarray(fused_log_mel_factored(
                jnp.asarray(x), cfg, interpret=True, windows_per_cell=wpc,
                stack_dft=True))
            # same math per row; the CPU interpreter's dot re-tiles at the
            # different M and rounds a handful of entries at the 1e-6 level
            # (observed only under the 8-virtual-device CPU config)
            np.testing.assert_allclose(got, base, atol=1e-5, rtol=0)


def test_factored_kernel_assemble_bf16_parity(rng):
    """assemble_bf16=True (phase combine + window conv in bf16, 2
    elements/lane on the VPU) vs the f32 assembly: the phase factors are
    exactly representable, so the budget is the bf16 rounding of the DFT
    products — the same class as lowp_tail's (relative ~0.4% on spectral
    values, sub-0.05 absolute on standardized z-scores)."""
    cfg = SpectrogramConfig(mel_norm="slaney", out_size=0)
    x = (rng.standard_normal((4, 128_000)) * 0.3).astype(np.float32)
    base = np.asarray(fused_log_mel_factored(jnp.asarray(x), cfg, interpret=True))
    got = np.asarray(fused_log_mel_factored(
        jnp.asarray(x), cfg, interpret=True, assemble_bf16=True))
    assert got.shape == base.shape
    # bulk error is bf16-rounding class; the worst case is amplified by
    # cancellation in the 3-tap Hann conv (0.5x - 0.25(l+r)) where the
    # windowed value is much smaller than its taps — observed tail: ~2 of
    # 128k elements near 0.13 abs. Budget: tight bulk, bounded tail; the
    # serving go/no-go for this variant is the on-chip verdict-agreement
    # A/B, not kernel parity alone.
    err = np.abs(got - base)
    assert float(err.mean()) < 8e-3
    assert float(np.quantile(err, 0.999)) < 0.08
    assert float(err.max()) < 0.25
    # composes with stack_dft (same assembly, shared DFT product)
    both = np.asarray(fused_log_mel_factored(
        jnp.asarray(x), cfg, interpret=True, assemble_bf16=True,
        stack_dft=True))
    np.testing.assert_array_equal(both, got)
