"""Inference pipeline unit tests: windowing, silence gate, bucketing,
result schema, smoothing (reference inference_runner.py semantics)."""

import json

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from synthetic_audio_detection_tpu.ensemble.multihead import build_ensemble
from synthetic_audio_detection_tpu.infer.pipeline import (
    InferencePipeline,
    result_json,
    slice_waveform,
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


def test_slice_waveform_windows_and_gate():
    cfg = AudioConfig()  # 4 s windows, overlap 0, gate 1e-3
    sr = cfg.sample_rate
    wf = np.zeros(10 * sr, np.float32)
    wf[0 * sr : 4 * sr] = 0.1      # window 0 loud
    # window 1 (4..8 s) silent → gated out
    # trailing 8..10 s: incomplete window → dropped (reference behavior)
    windows, stamps = slice_waveform(wf, cfg)
    assert windows.shape == (1, 4 * sr)
    assert stamps == [(0.0, 4.0)]


def test_slice_waveform_overlap():
    cfg = AudioConfig(overlap=0.5)
    sr = cfg.sample_rate
    wf = (np.ones(12 * sr) * 0.1).astype(np.float32)
    windows, stamps = slice_waveform(wf, cfg)
    # hop = 2 s → starts at 0,2,4,6,8 (start+4 <= 12)
    assert [s for s, _ in stamps] == [0.0, 2.0, 4.0, 6.0, 8.0]


@pytest.fixture(scope="module")
def tiny_pipeline():
    model = BinaryClassifier(backbone="resnet18")
    vds = [init_classifier(model, jax.random.PRNGKey(i), input_size=64)
           for i in range(2)]
    ens = build_ensemble(model, vds, ["SynA", "SynB", "Real"],
                         detect_shared_backbone=False)
    return InferencePipeline(
        ens,
        spec=SpectrogramConfig(mel_norm="slaney", out_size=64),
        infer=InferenceConfig(batch_size=8),
        use_pallas=False,
    )


def test_analyze_windows_schema(tiny_pipeline, rng):
    windows = (rng.standard_normal((3, 128_000)) * 0.3).astype(np.float32)
    stamps = [(0.0, 4.0), (4.0, 8.0), (8.0, 12.0)]
    res = tiny_pipeline.analyze_windows(windows, stamps)
    assert set(res) == {"segments", "percentages"}
    assert len(res["segments"]) == 3
    for seg, (s, e) in zip(res["segments"], stamps):
        assert seg["start_sec"] == s and seg["end_sec"] == e
        assert seg["label"] in ("SynA", "SynB", "Real")
    assert set(res["percentages"]) == {"SynA", "SynB", "Real"}
    payload = json.loads(result_json("x.wav", res))
    assert payload["filename"] == "x.wav"


def test_empty_windows_schema(tiny_pipeline):
    res = tiny_pipeline.analyze_windows(np.zeros((0, 128_000), np.float32), [])
    assert res["segments"] == []
    assert all(v == 0.0 for v in res["percentages"].values())


def test_smoothing_renormalizes(tiny_pipeline, rng):
    windows = (rng.standard_normal((6, 128_000)) * 0.3).astype(np.float32)
    stamps = [(i * 4.0, i * 4.0 + 4.0) for i in range(6)]
    res = tiny_pipeline.analyze_windows(windows, stamps, smooth=True)
    # smoothed path renormalizes rows → percentages sum to ~100
    assert sum(res["percentages"].values()) == pytest.approx(100.0, abs=0.1)


def test_unsmoothed_percentages_are_independent_sigmoids(tiny_pipeline, rng):
    """Faithful reference quirk: unsmoothed percentages are means of
    independent sigmoids and need NOT sum to 100 (inference_runner.py:327-334)."""
    windows = (rng.standard_normal((4, 128_000)) * 0.3).astype(np.float32)
    stamps = [(i * 4.0, i * 4.0 + 4.0) for i in range(4)]
    res = tiny_pipeline.analyze_windows(windows, stamps, smooth=False)
    logits = tiny_pipeline.logits_for_windows(windows)
    probs = 1 / (1 + np.exp(-logits.astype(np.float64)))
    for j, c in enumerate(["SynA", "SynB", "Real"]):
        assert res["percentages"][c] == pytest.approx(
            probs[:, j].mean() * 100, abs=0.01)


def test_int16_transport_matches_float(tiny_pipeline, rng):
    """PCM-sourced windows through int16 transport give identical logits."""
    from synthetic_audio_detection_tpu.infer.pipeline import InferencePipeline

    pcm = rng.integers(-20000, 20000, (2, 128_000)).astype(np.int16)
    windows = (pcm.astype(np.float32) / 32768.0)
    p16 = InferencePipeline(
        tiny_pipeline.ensemble, spec=tiny_pipeline.spec,
        infer=tiny_pipeline.infer, use_pallas=False,
        transport_dtype="int16",
    )
    a = tiny_pipeline.logits_for_windows(windows)
    b = p16.logits_for_windows(windows)
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)


def test_bucketing_padding_consistency(tiny_pipeline, rng):
    """Logits must be independent of how the batch is bucketed/padded."""
    windows = (rng.standard_normal((5, 128_000)) * 0.3).astype(np.float32)
    all_at_once = tiny_pipeline.logits_for_windows(windows)
    one_by_one = np.concatenate(
        [tiny_pipeline.logits_for_windows(windows[i : i + 1]) for i in range(5)]
    )
    np.testing.assert_allclose(all_at_once, one_by_one, rtol=1e-4, atol=1e-4)


def test_pallas_autogate_respects_compute_dtype(tiny_pipeline, monkeypatch):
    """On TPU backends the fused (bf16-DFT) Pallas mel front end may only
    auto-enable for reduced-precision pipelines; float32 pipelines stay
    float32 end to end so near-threshold verdicts match CPU/reference runs."""
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    ens = tiny_pipeline.ensemble
    spec = SpectrogramConfig(mel_norm="slaney", out_size=64)
    p32 = InferencePipeline(ens, spec=spec, compute_dtype=jnp.float32)
    assert p32.use_pallas is False
    pbf = InferencePipeline(ens, spec=spec, compute_dtype=jnp.bfloat16)
    assert pbf.use_pallas is True
    forced = InferencePipeline(
        ens, spec=spec, compute_dtype=jnp.float32, use_pallas=True
    )
    assert forced.use_pallas is True  # explicit choice always wins


def test_load_audio_non_wav_dispatch(tmp_path, rng):
    """inference_runner.py:145 decodes any torchaudio container; our serving
    path must route non-WAV through ffmpeg (or error clearly without it)."""
    import shutil
    import subprocess

    from synthetic_audio_detection_tpu.audio import wavio
    from synthetic_audio_detection_tpu.audio.decode import load_audio

    y = (rng.standard_normal(32000) * 0.1).astype(np.float32)
    src = tmp_path / "a.wav"
    wavio.write_wav(src, y, 32000)
    wf, sr = load_audio(str(src))  # WAV path: native parser
    assert sr == 32000 and wf.shape[1] == 32000

    if shutil.which("ffmpeg"):
        flac = tmp_path / "a.flac"
        subprocess.run(
            ["ffmpeg", "-loglevel", "error", "-y", "-i", str(src), str(flac)],
            check=True,
        )
        wf2, sr2 = load_audio(str(flac))
        assert sr2 == 32000
        np.testing.assert_allclose(wf2[0], wf[0], atol=2e-4)  # flac lossless, 16-bit quant
    else:
        (tmp_path / "b.mp3").write_bytes(b"\xff\xfb\x90\x00" + b"\x00" * 64)
        with pytest.raises(RuntimeError, match="ffmpeg"):
            load_audio(str(tmp_path / "b.mp3"))


def test_fast_backbone_and_s2d_autogates(tiny_pipeline, monkeypatch):
    """Measured-regime gating: throughput pipelines (bucket > 32) take the
    folded-affine fast backbone; latency pipelines (bucket <= 32) take the
    s2d layer1 route instead; float32 pipelines take neither."""
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    ens = tiny_pipeline.ensemble  # shared-backbone (built in fixture? check)
    import dataclasses
    ens = dataclasses.replace(ens, shared_backbone=True)
    spec = SpectrogramConfig(mel_norm="slaney", out_size=64)

    p_throughput = InferencePipeline(
        ens, spec=spec, infer=InferenceConfig(batch_size=128),
        compute_dtype=jnp.bfloat16,
    )
    assert p_throughput.use_fast_backbone is True
    assert p_throughput.use_s2d_layer1 is False

    p_latency = InferencePipeline(
        ens, spec=spec, infer=InferenceConfig(batch_size=8),
        compute_dtype=jnp.bfloat16,
    )
    assert p_latency.use_s2d_layer1 is True
    assert p_latency.use_fast_backbone is False

    p_f32 = InferencePipeline(
        ens, spec=spec, infer=InferenceConfig(batch_size=128),
        compute_dtype=jnp.float32,
    )
    assert p_f32.use_fast_backbone is False
    assert p_f32.use_s2d_layer1 is False


def test_per_head_sigmoids_consistent_with_aggregate(tiny_pipeline):
    """Diagnostic per-head sigmoids must be the pre-aggregation view of the
    serving output: sigmoid(agg syn_k) == per-head syn_k, and the aggregate
    real logit is the mean of per-head real logits."""
    rng = np.random.default_rng(0)
    windows = (rng.standard_normal((3, 128_000)) * 0.2).astype(np.float32)
    probs = tiny_pipeline.per_head_sigmoids(windows)  # [3, N, 2]
    assert probs.shape == (3, tiny_pipeline.ensemble.num_heads, 2)
    logits = tiny_pipeline.logits_for_windows(windows)  # [3, N+1]
    agg_sig = 1.0 / (1.0 + np.exp(-logits))
    n = tiny_pipeline.ensemble.num_heads
    # syn columns match per-head synthetic sigmoids
    np.testing.assert_allclose(agg_sig[:, :n], probs[:, :, 1],
                               rtol=1e-4, atol=1e-4)
    # aggregate real = sigmoid(mean of per-head real logits)
    per_head_real_logits = np.log(probs[:, :, 0] / (1 - probs[:, :, 0]))
    expect = 1.0 / (1.0 + np.exp(-per_head_real_logits.mean(axis=1)))
    np.testing.assert_allclose(agg_sig[:, n], expect, rtol=1e-3, atol=1e-3)


def _smooth_labels(probs, infer, col_thr):
    """Drive InferencePipeline.smooth_probs against a minimal stand-in (the
    method touches only self.infer / self._col_thr / _decide_rows)."""
    import types

    thr = np.asarray(col_thr, np.float32)
    fake = types.SimpleNamespace(infer=infer, _col_thr=thr,
                                 _col_thr_vis=thr,
                                 _thr_generic=float(thr[-1]))
    fake._decide_rows = types.MethodType(InferencePipeline._decide_rows, fake)
    sm, idx = InferencePipeline.smooth_probs(fake, probs)
    return sm, idx


def test_smooth_default_decides_on_renormalized_rows():
    """Reference quirk preserved at the defaults: the post-smoothing
    re-decision compares the RENORMALIZED rows against the scalar threshold
    (inference_runner.py:300-325). Row [0.6, 0.1, 0.8] renormalizes to
    [0.4, 0.067, 0.533]: no synthetic column is strong on the renormalized
    scale, so the verdict is Real — even though the raw sigmoids would call
    it synthetic."""
    probs = np.tile(np.float32([0.6, 0.1, 0.8]), (5, 1))
    sm, idx = _smooth_labels(probs, InferenceConfig(), [0.5, 0.5, 0.5])
    np.testing.assert_allclose(sm.sum(axis=1), 1.0, atol=1e-6)
    assert list(idx) == [2] * 5  # Real column index


def test_smooth_custom_operating_points_decide_on_sigmoid_scale():
    """Opt-in operating points are fit on the calibrated sigmoid scale, so
    with --smooth the re-decision must run on the smoothed
    PRE-renormalization values (the renormalized rows would be a scale
    mismatch voiding the fitted thresholds). col_thr[SynA]=0.55: raw 0.6 is
    strong => synthetic; the renormalized 0.4 would have (wrongly) read
    Real."""
    probs = np.tile(np.float32([0.6, 0.1, 0.8]), (5, 1))
    infer = InferenceConfig(per_column_thresholds=True)
    sm, idx = _smooth_labels(probs, infer, [0.55, 0.9, 0.5])
    np.testing.assert_allclose(sm.sum(axis=1), 1.0, atol=1e-6)  # schema kept
    assert list(idx) == [0] * 5  # SynA — decided on the sigmoid scale

    # syn_override_k != 1 also engages the sigmoid-scale decision: with K=2
    # a single strong column no longer overrides Real
    infer_k2 = InferenceConfig(per_column_thresholds=True, syn_override_k=2)
    _, idx_k2 = _smooth_labels(probs, infer_k2, [0.55, 0.9, 0.5])
    assert list(idx_k2) == [2] * 5
