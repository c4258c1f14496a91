"""On-device waveform augmentation (ops/waveform_augment.py).

Oracles: scipy.signal.firwin for the windowed-sinc low-pass kernel (an
independent implementation of the same filter spec), numpy 'same'
convolution for the filtering, and direct power measurement for the SNR
contract. Also pins the no-op guarantees: zero probabilities leave
_features_from_waveforms bit-identical to the default config (the rng is
only consumed when enabled).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.signal

from synthetic_audio_detection_tpu.ops import waveform_augment as wa
from synthetic_audio_detection_tpu.train.steps import _features_from_waveforms
from synthetic_audio_detection_tpu.utils.config import (
    SpecAugmentConfig,
    SpectrogramConfig,
)

SR = 32_000


def _wav(b=4, t=8000, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal((b, t)) * 0.3).astype(np.float32)


class TestLowpassKernel:
    def test_matches_scipy_firwin(self):
        taps = 63
        for cutoff in (2000.0, 6000.0, 12000.0):
            ours = np.asarray(
                wa.lowpass_kernels(jnp.array([cutoff]), taps, SR)[0]
            )
            ref = scipy.signal.firwin(taps, cutoff, window="hann", fs=SR)
            np.testing.assert_allclose(ours, ref, atol=1e-6)

    def test_dc_gain_is_one(self):
        k = wa.lowpass_kernels(jnp.array([3000.0, 9000.0]), 63, SR)
        np.testing.assert_allclose(np.asarray(k).sum(axis=1), 1.0, atol=1e-6)

    def test_constant_signal_passes_unchanged(self):
        cfg = SpecAugmentConfig(wave_lowpass_prob=1.0,
                                wave_lowpass_hz=(4000.0, 4000.0))
        x = jnp.full((2, 4000), 0.25, dtype=jnp.float32)
        y = wa.augment_waveforms(jax.random.PRNGKey(0), x, cfg, SR)
        # interior samples exact (edges see zero-padding from 'same' conv)
        np.testing.assert_allclose(np.asarray(y[:, 64:-64]), 0.25, atol=1e-5)


class TestLowpassFiltering:
    def test_matches_numpy_same_convolution(self):
        cutoff = 5000.0
        cfg = SpecAugmentConfig(wave_lowpass_prob=1.0,
                                wave_lowpass_hz=(cutoff, cutoff),
                                wave_taps=63)
        x = _wav(b=3, t=2048)
        y = np.asarray(
            wa.augment_waveforms(jax.random.PRNGKey(1), jnp.array(x), cfg, SR)
        )
        k = scipy.signal.firwin(63, cutoff, window="hann", fs=SR)
        for i in range(x.shape[0]):
            ref = np.convolve(x[i], k, mode="same")
            np.testing.assert_allclose(y[i], ref, atol=1e-5)

    def test_attenuates_above_cutoff(self):
        cfg = SpecAugmentConfig(wave_lowpass_prob=1.0,
                                wave_lowpass_hz=(4000.0, 4000.0))
        t = np.arange(32_000, dtype=np.float32) / SR
        hi = np.sin(2 * np.pi * 12_000 * t)[None, :]
        lo = np.sin(2 * np.pi * 1_000 * t)[None, :]
        out_hi = np.asarray(wa.augment_waveforms(
            jax.random.PRNGKey(2), jnp.array(hi), cfg, SR))
        out_lo = np.asarray(wa.augment_waveforms(
            jax.random.PRNGKey(2), jnp.array(lo), cfg, SR))
        assert np.square(out_hi).mean() < 1e-3 * np.square(hi).mean()
        assert np.square(out_lo).mean() > 0.98 * np.square(lo).mean()


class TestNoise:
    def test_snr_contract(self):
        for target in (0.0, 10.0, 25.0):
            cfg = SpecAugmentConfig(wave_noise_prob=1.0,
                                    wave_snr_db=(target, target))
            x = jnp.array(_wav(b=4, t=128_000))
            y = wa.augment_waveforms(jax.random.PRNGKey(3), x, cfg, SR)
            noise = np.asarray(y - x)
            snr = 10 * np.log10(
                np.square(np.asarray(x)).mean(axis=1)
                / np.square(noise).mean(axis=1)
            )
            np.testing.assert_allclose(snr, target, atol=0.2)

    def test_bernoulli_mask_rows_exact_or_noisy(self):
        cfg = SpecAugmentConfig(wave_noise_prob=0.5, wave_snr_db=(10.0, 10.0))
        x = jnp.array(_wav(b=64, t=2000))
        y = wa.augment_waveforms(jax.random.PRNGKey(4), x, cfg, SR)
        diff = np.abs(np.asarray(y - x)).max(axis=1)
        untouched = (diff == 0.0).sum()
        assert 10 <= untouched <= 54  # ~Binomial(64, 0.5)


class TestFeatureIntegration:
    def test_zero_prob_config_is_bitwise_noop(self):
        x = jnp.array(_wav(b=2, t=128_000))
        spec = SpectrogramConfig(mel_norm=None, out_size=0)
        rng = jax.random.PRNGKey(5)
        base = _features_from_waveforms(x, spec, SpecAugmentConfig(), rng, SR)
        zeroed = _features_from_waveforms(
            x, spec,
            SpecAugmentConfig(wave_noise_prob=0.0, wave_lowpass_prob=0.0),
            rng, SR)
        np.testing.assert_array_equal(np.asarray(base), np.asarray(zeroed))

    def test_enabled_changes_features_and_jits(self):
        x16 = (np.asarray(_wav(b=2, t=128_000)) * 32768.0).clip(
            -32768, 32767).astype(np.int16)
        spec = SpectrogramConfig(mel_norm=None, out_size=0)
        cfg = SpecAugmentConfig(wave_noise_prob=1.0, wave_snr_db=(5.0, 5.0),
                                wave_lowpass_prob=1.0,
                                wave_lowpass_hz=(6000.0, 6000.0))
        fn = jax.jit(lambda w, r: _features_from_waveforms(
            w, spec, cfg, r, SR))
        rng = jax.random.PRNGKey(6)
        out = np.asarray(fn(jnp.array(x16), rng))
        base = np.asarray(_features_from_waveforms(
            jnp.array(x16), spec, SpecAugmentConfig(), rng, SR))
        assert np.isfinite(out).all()
        assert np.abs(out - base).max() > 1e-3

    def test_eval_mode_ignores_wave_fields(self):
        x = jnp.array(_wav(b=2, t=128_000))
        spec = SpectrogramConfig.inference(out_size=0)
        cfg = SpecAugmentConfig(wave_noise_prob=1.0)
        a = _features_from_waveforms(x, spec, cfg, None, SR)
        b = _features_from_waveforms(x, spec, None, None, SR)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestCliPlumbing:
    def test_spec_augment_from_args(self):
        import argparse

        from synthetic_audio_detection_tpu.utils.config import (
            add_wave_augment_args,
            spec_augment_from_args,
        )

        p = argparse.ArgumentParser()
        add_wave_augment_args(p)
        off = spec_augment_from_args(p.parse_args([]))
        assert not off.wave_enabled
        assert off == SpecAugmentConfig()
        on = spec_augment_from_args(p.parse_args(
            ["--wave-augment", "--wave-snr-db", "3", "12",
             "--wave-lowpass-prob", "0.4"]))
        assert on.wave_enabled
        assert on.wave_snr_db == (3.0, 12.0)
        assert on.wave_noise_prob == 0.5 and on.wave_lowpass_prob == 0.4

    @pytest.mark.parametrize("cli", ["submodel_trainer", "ensemble_trainer"])
    def test_trainer_parsers_accept_flags(self, cli):
        import importlib

        mod = importlib.import_module(
            f"synthetic_audio_detection_tpu.cli.{cli}")
        args = mod.build_parser().parse_args(
            (["--synthetic-classes", "A"] if cli == "ensemble_trainer" else [])
            + ["--wave-augment"])
        assert args.wave_augment
