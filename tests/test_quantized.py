"""Int8 PTQ backbone vs the float path: argmax agreement + logit fidelity."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from synthetic_audio_detection_tpu.ensemble.multihead import (
    build_ensemble,
    ensemble_forward,
)
from synthetic_audio_detection_tpu.models.classifier import (
    BinaryClassifier,
    init_classifier,
)
from synthetic_audio_detection_tpu.models.quantized import (
    quantize_ensemble,
    quantized_ensemble_forward,
)


def _shared_ensemble(n_heads=3):
    model = BinaryClassifier(backbone="resnet18")
    base = init_classifier(model, jax.random.PRNGKey(0), input_size=64)
    vds = []
    for i in range(n_heads):
        v = init_classifier(model, jax.random.PRNGKey(10 + i), input_size=64)
        v["params"]["base"] = base["params"]["base"]
        v["batch_stats"]["base"] = base["batch_stats"]["base"]
        vds.append(v)
    names = [f"S{i}" for i in range(n_heads)] + ["Real"]
    return build_ensemble(model, vds, names)


def test_quantized_matches_float(rng):
    ens = _shared_ensemble()
    qens = quantize_ensemble(ens)
    x = jnp.asarray(rng.standard_normal((4, 64, 64, 3)).astype(np.float32))
    ref = np.asarray(ensemble_forward(ens, x))
    got = np.asarray(quantized_ensemble_forward(qens, x))
    assert got.shape == ref.shape
    # int8 PTQ: logits track the float path closely
    corr = np.corrcoef(ref.ravel(), got.ravel())[0, 1]
    assert corr > 0.99, corr
    err = np.abs(got - ref) / (np.abs(ref).mean() + 1e-6)
    assert err.mean() < 0.15, err.mean()
    # verdict-level agreement
    np.testing.assert_array_equal(ref.argmax(1), got.argmax(1))


def test_quantize_rejects_dense():
    model = BinaryClassifier(backbone="resnet18")
    vds = [init_classifier(model, jax.random.PRNGKey(i), input_size=64)
           for i in range(2)]
    ens = build_ensemble(model, vds, ["A", "B", "Real"],
                         detect_shared_backbone=False)
    with pytest.raises(ValueError):
        quantize_ensemble(ens)
