"""Native mel-resolution mode (--input-size native / out_size=0).

The reference resizes every 128×251 mel up to 512² only because its
ImageNet-pretrained backbones expect square RGB (inference_runner.py:157-174);
models trained from scratch can consume the mel at its true resolution with
zero information loss. These tests pin the native mode's contracts: the
padded shape, pad-neutrality (zero == post-standardization mean), config
round-trip, CLI parsing, end-to-end pipeline, and the train step.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from synthetic_audio_detection_tpu.ops import melspec
from synthetic_audio_detection_tpu.utils.config import (
    InferenceConfig,
    SpectrogramConfig,
    parse_input_size,
)


def test_parse_input_size():
    assert parse_input_size("512") == 512
    assert parse_input_size("native") == 0
    assert parse_input_size("NATIVE") == 0
    assert parse_input_size("0") == 0
    assert parse_input_size(256) == 256
    with pytest.raises(ValueError):
        parse_input_size("-4")
    with pytest.raises(ValueError):
        parse_input_size("big")


def test_model_input_hw():
    assert SpectrogramConfig(out_size=512).model_input_hw() == (512, 512)
    native = SpectrogramConfig(out_size=0)
    assert native.is_native
    # 4 s @ 32 kHz, hop 512, center → 251 frames → padded to 256
    assert native.num_frames(128_000) == 251
    assert native.model_input_hw(128_000) == (128, 256)
    # a shorter window still pads to a multiple of 128
    assert native.model_input_hw(32_000) == (128, 128)


def test_native_features_pad_not_resize(rng):
    cfg = SpectrogramConfig(mel_norm="slaney", out_size=0)
    w = (rng.standard_normal((2, 128_000)) * 0.3).astype(np.float32)
    z = np.asarray(melspec.log_mel_features(jnp.asarray(w), cfg))
    assert z.shape == (2, 128, 256)
    raw = np.asarray(
        melspec.log_mel_features(jnp.asarray(w), cfg, resize=False)
    )
    assert raw.shape == (2, 128, 251)
    # content columns identical to the unresized mel, pad columns exactly zero
    np.testing.assert_array_equal(z[:, :, :251], raw)
    np.testing.assert_array_equal(z[:, :, 251:], 0.0)


def test_native_pipeline_end_to_end(rng):
    """Full pipeline at a small native shape (n_mels=32 → 32×128 images):
    schema intact, rectangular input accepted by the resnet, and the
    diagnostics program agrees with serving exactly."""
    from synthetic_audio_detection_tpu.ensemble.multihead import build_ensemble
    from synthetic_audio_detection_tpu.infer.pipeline import InferencePipeline
    from synthetic_audio_detection_tpu.models.classifier import (
        BinaryClassifier,
        init_classifier,
    )

    spec = SpectrogramConfig(mel_norm="slaney", out_size=0, n_mels=32)
    model = BinaryClassifier(backbone="resnet18")
    hw = spec.model_input_hw(16_000)
    assert hw == (32, 128)
    vds = [init_classifier(model, jax.random.PRNGKey(i), input_size=hw)
           for i in range(2)]
    ens = build_ensemble(model, vds, ["SynA", "SynB", "Real"],
                         detect_shared_backbone=False)
    pipe = InferencePipeline(
        ens, spec=spec, infer=InferenceConfig(batch_size=8), use_pallas=False,
    )
    windows = (rng.standard_normal((3, 16_000)) * 0.3).astype(np.float32)
    stamps = [(i * 0.5, i * 0.5 + 0.5) for i in range(3)]
    res = pipe.analyze_windows(windows, stamps)
    assert len(res["segments"]) == 3
    assert set(res["percentages"]) == {"SynA", "SynB", "Real"}

    logits = pipe.logits_for_windows(windows)
    agg, nh = pipe.logits_and_per_head(windows)
    # the diagnostics program shares the serving graph: bit-identical logits
    np.testing.assert_array_equal(agg, logits)
    # host-side re-aggregation of the per-head view matches the verdict
    syn = nh[:, :, 1]
    real_mean = nh[:, :, 0].mean(axis=1, keepdims=True)
    np.testing.assert_allclose(
        np.concatenate([syn, real_mean], axis=1), logits, rtol=1e-6, atol=1e-6
    )


def test_native_train_step(rng):
    """One jitted train step at the native shape: runs, finite loss, and the
    RRC/SpecAugment path handles the rectangular mel."""
    from synthetic_audio_detection_tpu.models.classifier import BinaryClassifier
    from synthetic_audio_detection_tpu.train import steps
    from synthetic_audio_detection_tpu.utils.config import (
        SpecAugmentConfig,
        TrainConfig,
    )

    spec = SpectrogramConfig(out_size=0, n_mels=32)
    cfg = TrainConfig(batch_size=2, stop_grad_boundary=True)
    model = BinaryClassifier(backbone="resnet18")
    state, tx = steps.create_train_state(
        model, jax.random.PRNGKey(0), cfg,
        input_size=spec.model_input_hw(16_000),
    )
    step = jax.jit(steps.make_train_step(
        model, tx, cfg, spec, SpecAugmentConfig(), sample_rate=4_000,
        stop_grad_stage=4,
    ))
    batch = {
        "audio": jnp.asarray(
            (rng.standard_normal((4, 16_000)) * 0.3).astype(np.float32)),
        "label": jnp.asarray([0, 1, 0, 1], jnp.int32),
    }
    state2, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    assert int(state2.step) == 1


def test_native_config_roundtrip():
    from synthetic_audio_detection_tpu.utils import config as C

    cfg = C.PipelineConfig(spec=SpectrogramConfig(mel_norm="slaney", out_size=0))
    back = C.from_dict(C.PipelineConfig, C.to_dict(cfg))
    assert back.spec.is_native
