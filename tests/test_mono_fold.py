"""fold_to_mono: 1-channel folded stem must reproduce 3-channel logits."""

import numpy as np
import jax
import jax.numpy as jnp

from synthetic_audio_detection_tpu.ensemble.multihead import (
    build_ensemble,
    ensemble_forward,
    fold_to_mono,
)
from synthetic_audio_detection_tpu.models.classifier import (
    BinaryClassifier,
    init_classifier,
)


def test_mono_fold_bit_identical(rng):
    model = BinaryClassifier(backbone="resnet18")
    vds = [init_classifier(model, jax.random.PRNGKey(i)) for i in range(2)]
    ens = build_ensemble(model, vds, ["A", "B", "Real"],
                         detect_shared_backbone=False)
    mono = fold_to_mono(ens)
    assert mono.model.in_channels == 1

    z = rng.standard_normal((2, 64, 64)).astype(np.float32)
    x3 = jnp.broadcast_to(jnp.asarray(z)[..., None], (2, 64, 64, 3))
    x1 = jnp.asarray(z)[..., None]
    out3 = np.asarray(ensemble_forward(ens, x3))
    out1 = np.asarray(ensemble_forward(mono, x1))
    np.testing.assert_allclose(out1, out3, rtol=1e-5, atol=1e-5)
