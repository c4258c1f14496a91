"""Data-parallel serving over the 8-device virtual mesh: sharded window
batches must produce the same logits as single-device execution."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from synthetic_audio_detection_tpu.ensemble.multihead import build_ensemble
from synthetic_audio_detection_tpu.infer.pipeline import InferencePipeline
from synthetic_audio_detection_tpu.models.classifier import (
    BinaryClassifier,
    init_classifier,
)
from synthetic_audio_detection_tpu.parallel import sharding as sh
from synthetic_audio_detection_tpu.utils.config import (
    AudioConfig,
    InferenceConfig,
    SpectrogramConfig,
)


@pytest.mark.skipif(jax.device_count() < 2, reason="needs virtual devices")
def test_mesh_sharded_logits_match_single_device(rng):
    model = BinaryClassifier(backbone="resnet18")
    vds = [init_classifier(model, jax.random.PRNGKey(i), input_size=64)
           for i in range(2)]
    ens = build_ensemble(model, vds, ["A", "B", "Real"],
                         detect_shared_backbone=False)
    spec = SpectrogramConfig(mel_norm="slaney", out_size=64)
    windows = (rng.standard_normal((16, 32_000)) * 0.3).astype(np.float32)

    single = InferencePipeline(
        ens, spec=spec, infer=InferenceConfig(batch_size=16), use_pallas=False
    )
    ref = single.logits_for_windows(windows)

    mesh = sh.create_mesh(data_parallel=8, model_parallel=1)
    sharded = InferencePipeline(
        ens, spec=spec, infer=InferenceConfig(batch_size=16),
        use_pallas=False, mesh=mesh,
    )
    got = sharded.logits_for_windows(windows)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)

    # odd-sized batch exercises bucket rounding to the mesh multiple
    got7 = sharded.logits_for_windows(windows[:7])
    np.testing.assert_allclose(got7, ref[:7], rtol=1e-4, atol=1e-4)
