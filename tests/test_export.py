"""StableHLO serving-artifact round trip (infer/export.py).

The artifact must reproduce the live serving program's logits to float
tolerance after a serialize → bytes → deserialize round trip (separately
compiled executables differ in fusion order at the ~1e-7 level), carry its
metadata, expose one entry per exported batch size, accept the int16 PCM
transport entry point, and drive a full artifact-backed
InferencePipeline.from_artifact analyze with verdicts identical to the
checkpoint-backed pipeline.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from synthetic_audio_detection_tpu.ensemble.multihead import build_ensemble
from synthetic_audio_detection_tpu.infer import export as sadx
from synthetic_audio_detection_tpu.infer.pipeline import (
    InferencePipeline,
    _forward_windows,
)
from synthetic_audio_detection_tpu.models.classifier import (
    BinaryClassifier,
    init_classifier,
)
from synthetic_audio_detection_tpu.utils.config import (
    AudioConfig,
    InferenceConfig,
    SpectrogramConfig,
)


@pytest.fixture(scope="module")
def tiny_ensemble():
    model = BinaryClassifier(backbone="resnet18")
    vds = [init_classifier(model, jax.random.PRNGKey(i), input_size=64)
           for i in range(2)]
    return build_ensemble(model, vds, ["A", "B", "Real"],
                          detect_shared_backbone=False)


def _windows(dtype, n=2):
    rng = np.random.default_rng(0)
    ints = rng.integers(-32768, 32768, size=(n, 128_000), dtype=np.int16)
    if dtype == np.int16:
        return ints
    return ints.astype(np.float32) / 32768.0


def test_artifact_roundtrip_matches_live_serving(tiny_ensemble, tmp_path):
    spec = SpectrogramConfig.inference(out_size=64)
    data = sadx.export_serving(
        tiny_ensemble, spec=spec, batch_sizes=(2,),
        transport_dtype="float32", compute_dtype=jnp.float32,
    )
    path = tmp_path / "m.sadx"
    sadx.write_artifact(str(path), data)
    calls, meta = sadx.load_artifact(str(path))
    assert sorted(calls) == [2]

    w = _windows(np.float32)
    got = np.asarray(calls[2](w))
    want = np.asarray(_forward_windows(
        tiny_ensemble.variables, jnp.asarray(w),
        ensemble=tiny_ensemble, spec_cfg=spec,
        sample_rate=AudioConfig().sample_rate,
        use_gemm_dft=True, compute_dtype=jnp.float32,
    ))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
    assert got.shape == (2, 3)  # [B, N+1]

    assert meta["class_names"] == ["A", "B", "Real"]
    assert meta["entries"] == [{"batch_size": 2,
                                "nbytes": meta["entries"][0]["nbytes"]}]
    assert meta["spec"] == dataclasses.asdict(spec)


def test_artifact_int16_transport_entry_point(tiny_ensemble):
    spec = SpectrogramConfig.inference(out_size=64)
    data = sadx.export_serving(
        tiny_ensemble, spec=spec, batch_sizes=(2,),
        transport_dtype="int16", compute_dtype=jnp.float32,
    )
    calls, meta = sadx.load_artifact(data)
    assert meta["transport_dtype"] == "int16"

    got = np.asarray(calls[2](_windows(np.int16)))
    want = np.asarray(_forward_windows(
        tiny_ensemble.variables, jnp.asarray(_windows(np.float32)),
        ensemble=tiny_ensemble, spec_cfg=spec,
        sample_rate=AudioConfig().sample_rate,
        use_gemm_dft=True, compute_dtype=jnp.float32,
    ))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_pipeline_from_artifact_matches_checkpoint_pipeline(
        tiny_ensemble, tmp_path):
    """Full serve-from-artifact path: multi-bucket export, from_artifact
    pipeline, analyze a real WAV — verdict labels identical and percentages
    at float tolerance vs the checkpoint-backed pipeline; per-head
    diagnostics refuse cleanly."""
    from synthetic_audio_detection_tpu.audio import wavio

    spec = SpectrogramConfig.inference(out_size=64)
    live = InferencePipeline(
        tiny_ensemble, spec=spec,
        infer=InferenceConfig(batch_size=4),
        compute_dtype=jnp.float32, transport_dtype="int16",
    )
    data = sadx.export_serving(
        tiny_ensemble, spec=spec, batch_sizes=(2, 4),
        transport_dtype="int16", compute_dtype=jnp.float32,
    )
    pipe = InferencePipeline.from_artifact(data)
    assert pipe._bucket_sizes == [2, 4]
    assert pipe.ensemble.class_names == ["A", "B", "Real"]

    rng = np.random.default_rng(3)
    wav = tmp_path / "clip.wav"
    wavio.write_wav(str(wav),
                    (rng.standard_normal(13 * 32_000) * 0.2).clip(-1, 1),
                    32_000)
    got = pipe.analyze_file(str(wav))
    want = live.analyze_file(str(wav))
    assert [s["label"] for s in got["segments"]] == [
        s["label"] for s in want["segments"]]
    for k in got["percentages"]:
        assert got["percentages"][k] == pytest.approx(
            want["percentages"][k], abs=1e-3)

    with pytest.raises(NotImplementedError, match="artifact"):
        pipe.per_head_sigmoids(_windows(np.float32))
    with pytest.raises(NotImplementedError, match="artifact"):
        pipe.logits_and_per_head(_windows(np.float32))


def test_artifact_rejects_bad_magic():
    with pytest.raises(ValueError, match="bad magic"):
        sadx.load_artifact(b"NOPE" + b"\0" * 32)


def test_from_artifact_honors_host_audio_config(tiny_ensemble):
    """Host-side knobs (overlap, silence gate) come from the caller; the
    sample rate always comes from the artifact (it defines what the exported
    program expects — cli/serve.py --overlap path)."""
    spec = SpectrogramConfig.inference(out_size=64)
    data = sadx.export_serving(
        tiny_ensemble, spec=spec, batch_sizes=(2,),
        audio=AudioConfig(sample_rate=16_000),
        transport_dtype="float32", compute_dtype=jnp.float32,
    )
    pipe = InferencePipeline.from_artifact(
        data, audio=AudioConfig(overlap=0.5, silence_threshold=1e-4))
    assert pipe.audio.overlap == 0.5
    assert pipe.audio.silence_threshold == 1e-4
    assert pipe.audio.sample_rate == 16_000  # artifact wins

    # weight dedup: the two-entry export stores the weight blob once
    two = sadx.export_serving(
        tiny_ensemble, spec=spec, batch_sizes=(2, 4),
        transport_dtype="float32", compute_dtype=jnp.float32,
    )
    one = sadx.export_serving(
        tiny_ensemble, spec=spec, batch_sizes=(2,),
        transport_dtype="float32", compute_dtype=jnp.float32,
    )
    _, meta = sadx.load_artifact(two)
    assert meta["weights_nbytes"] > 0
    # adding a second entry must NOT add another weight copy: growth is far
    # below the weight blob size
    assert len(two) - len(one) < meta["weights_nbytes"] // 2
