"""Streaming analyzer: chunk-fed results must equal the offline pipeline.

Oracle = the repo's own offline path (slice_waveform + analyze_windows) over
the concatenated audio — the streaming module reuses the pipeline's forward
and assembly, so equality here pins the windowing/buffer/flush logic, the
part that is new. The resampler oracle is audio/dsp.resample_poly_np
(itself pinned against torchaudio semantics elsewhere)."""

import jax
import numpy as np
import pytest

from synthetic_audio_detection_tpu.audio.dsp import resample_poly_np
from synthetic_audio_detection_tpu.ensemble.multihead import build_ensemble
from synthetic_audio_detection_tpu.infer.pipeline import (
    InferencePipeline,
    slice_waveform,
)
from synthetic_audio_detection_tpu.infer.streaming import (
    StreamingAnalyzer,
    StreamingResampler,
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
def pipe():
    model = BinaryClassifier(backbone="resnet18")
    vds = [init_classifier(model, jax.random.PRNGKey(i), input_size=64)
           for i in range(2)]
    ens = build_ensemble(model, vds, ["SynA", "SynB", "Real"],
                         detect_shared_backbone=False)
    return InferencePipeline(
        ens,
        audio=AudioConfig(overlap=0.3, silence_threshold=1e-3),
        spec=SpectrogramConfig(mel_norm="slaney", out_size=64),
        infer=InferenceConfig(batch_size=8),
        use_pallas=False,
    )


def _chunks(x, rng, lo=1_000, hi=90_000):
    """Split x into random-sized chunks (including some tiny ones)."""
    out, pos = [], 0
    while pos < len(x):
        n = int(rng.integers(lo, hi)) if rng.random() > 0.2 else int(
            rng.integers(1, 50))
        out.append(x[pos : pos + n])
        pos += n
    return out


@pytest.mark.parametrize("orig,new", [(44_100, 32_000), (48_000, 32_000),
                                      (16_000, 32_000), (22_050, 32_000)])
def test_streaming_resampler_matches_offline(orig, new):
    rng = np.random.default_rng(orig)
    x = (rng.standard_normal(orig * 3 + 137) * 0.5).astype(np.float32)
    want = resample_poly_np(x, orig, new)
    rs = StreamingResampler(orig, new)
    got = [rs.feed(c) for c in _chunks(x, rng, lo=500, hi=20_000)]
    got.append(rs.finalize())
    got = np.concatenate(got)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_streaming_resampler_single_big_feed():
    rng = np.random.default_rng(0)
    x = (rng.standard_normal(44_100 * 2) * 0.5).astype(np.float32)
    want = resample_poly_np(x, 44_100, 32_000)
    rs = StreamingResampler(44_100, 32_000)
    got = np.concatenate([rs.feed(x), rs.finalize()])
    np.testing.assert_allclose(got, want, atol=1e-6)


def _offline(pipe, wf, smooth=None):
    if len(wf) < pipe.audio.window_samples:
        wf = np.pad(wf, (0, pipe.audio.window_samples - len(wf)))
    windows, stamps = slice_waveform(wf, pipe.audio)
    return pipe.analyze_windows(windows, stamps, smooth=smooth)


def _assert_results_equal(got, want, atol=0.0):
    assert [s["label"] for s in got["segments"]] == \
        [s["label"] for s in want["segments"]]
    assert [(s["start_sec"], s["end_sec"]) for s in got["segments"]] == \
        [(s["start_sec"], s["end_sec"]) for s in want["segments"]]
    assert set(got["percentages"]) == set(want["percentages"])
    for k in want["percentages"]:
        assert abs(got["percentages"][k] - want["percentages"][k]) <= atol, k


def test_stream_equals_offline_at_target_rate(pipe):
    rng = np.random.default_rng(1)
    wf = (rng.standard_normal(32_000 * 11) * 0.3).astype(np.float32)
    want = _offline(pipe, wf)
    sa = StreamingAnalyzer(pipe)
    live = []
    for c in _chunks(wf, rng):
        live.extend(sa.feed(c))
    got = sa.finalize()
    # identical windows through identical bucket programs → exact floats
    _assert_results_equal(got, want, atol=0.0)
    # the live per-window verdicts are the final (unsmoothed) segments
    assert [v["label"] for v in live] == [s["label"] for s in want["segments"]]
    assert sa.windows_completed == len(want["segments"])


def test_stream_equals_offline_with_resample(pipe):
    rng = np.random.default_rng(2)
    src = 44_100
    raw = (rng.standard_normal(src * 10) * 0.3).astype(np.float32)
    want = _offline(pipe, resample_poly_np(raw, src, 32_000))
    sa = StreamingAnalyzer(pipe, source_rate=src)
    for c in _chunks(raw, rng):
        sa.feed(c)
    got = sa.finalize()
    # resampled streams agree to ~1e-6 → logits to float tolerance
    _assert_results_equal(got, want, atol=1e-3)


def test_stream_smoothing_matches_offline(pipe):
    rng = np.random.default_rng(3)
    wf = (rng.standard_normal(32_000 * 13) * 0.3).astype(np.float32)
    want = _offline(pipe, wf, smooth=True)
    sa = StreamingAnalyzer(pipe)
    for c in _chunks(wf, rng):
        sa.feed(c)
    _assert_results_equal(sa.finalize(smooth=True), want, atol=0.0)


def test_stream_silence_gate_matches_offline(pipe):
    rng = np.random.default_rng(4)
    win = pipe.audio.window_samples
    hop = pipe.audio.hop_samples
    # loud | silent (spans whole windows) | loud
    wf = np.concatenate([
        (rng.standard_normal(hop * 2) * 0.3),
        np.zeros(win + hop * 2),
        (rng.standard_normal(win + hop) * 0.3),
    ]).astype(np.float32)
    want = _offline(pipe, wf)
    assert want["segments"]  # sanity: some windows survived
    sa = StreamingAnalyzer(pipe)
    for c in _chunks(wf, rng):
        sa.feed(c)
    _assert_results_equal(sa.finalize(), want, atol=0.0)


def test_stream_shorter_than_window_pads(pipe):
    rng = np.random.default_rng(5)
    wf = (rng.standard_normal(32_000) * 0.3).astype(np.float32)  # 1 s
    want = _offline(pipe, wf)
    sa = StreamingAnalyzer(pipe)
    sa.feed(wf)
    _assert_results_equal(sa.finalize(), want, atol=0.0)
    assert len(want["segments"]) == 1


def test_silent_stream_empty_contract(pipe):
    sa = StreamingAnalyzer(pipe)
    assert sa.feed(np.zeros(200_000, np.float32)) == []
    assert sa.finalize() == {"segments": [], "percentages": {}}


def test_feed_after_finalize_rejected(pipe):
    sa = StreamingAnalyzer(pipe)
    sa.finalize()
    with pytest.raises(RuntimeError):
        sa.feed(np.zeros(10, np.float32))
