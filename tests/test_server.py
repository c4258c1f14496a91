"""HTTP serving daemon: health, analyze, batch, error isolation — driven
through a real socket against a warm pipeline."""

import base64
import io
import json
import threading
import urllib.request

import numpy as np
import jax
import pytest

from synthetic_audio_detection_tpu.audio import wavio
from synthetic_audio_detection_tpu.ensemble.multihead import build_ensemble
from synthetic_audio_detection_tpu.infer.pipeline import InferencePipeline
from synthetic_audio_detection_tpu.infer.server import serve
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
def server_url():
    model = BinaryClassifier(backbone="resnet18")
    vds = [init_classifier(model, jax.random.PRNGKey(i), input_size=64)
           for i in range(2)]
    ens = build_ensemble(model, vds, ["SynA", "SynB", "Real"],
                         detect_shared_backbone=False)
    pipeline = InferencePipeline(
        ens,
        audio=AudioConfig(),
        spec=SpectrogramConfig(mel_norm="slaney", out_size=64),
        infer=InferenceConfig(batch_size=8),
        use_pallas=False,
    )
    srv = serve(pipeline, host="127.0.0.1", port=0, warmup=True)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{port}"
    srv.shutdown()


def _wav_bytes(seconds=5.0, freq=440.0, sr=32000):
    t = np.arange(int(seconds * sr)) / sr
    y = (0.4 * np.sin(2 * np.pi * freq * t)).astype(np.float32)
    buf = io.BytesIO()
    import tempfile, os

    with tempfile.NamedTemporaryFile(suffix=".wav", delete=False) as f:
        path = f.name
    wavio.write_wav(path, y, sr)
    data = open(path, "rb").read()
    os.unlink(path)
    return data


def test_healthz(server_url):
    with urllib.request.urlopen(f"{server_url}/healthz", timeout=30) as r:
        body = json.loads(r.read())
    assert body["status"] == "ok"
    assert body["classes"] == ["SynA", "SynB", "Real"]


def test_analyze(server_url):
    data = _wav_bytes()
    req = urllib.request.Request(
        f"{server_url}/analyze?filename=x.wav", data=data, method="POST",
        headers={"Content-Type": "audio/wav"},
    )
    with urllib.request.urlopen(req, timeout=120) as r:
        body = json.loads(r.read())
    assert body["filename"] == "x.wav"
    assert len(body["segments"]) == 1  # 5 s → one full 4 s window
    assert set(body["percentages"]) == {"SynA", "SynB", "Real"}


def test_analyze_batch_and_error_isolation(server_url):
    good = base64.b64encode(_wav_bytes(4.5)).decode()
    good2 = base64.b64encode(_wav_bytes(4.5, freq=660.0)).decode()
    bad = base64.b64encode(b"not a wav").decode()
    payload = json.dumps(
        {"files": {"a.wav": good, "b.wav": good2, "broken.wav": bad}}
    ).encode()
    req = urllib.request.Request(
        f"{server_url}/analyze_batch", data=payload, method="POST",
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=120) as r:
        body = json.loads(r.read())
    # good files analyzed (their windows coalesced through the batcher),
    # the bad file errors by name without failing the request
    assert body["results"]["a.wav"]["segments"]
    assert body["results"]["b.wav"]["segments"]
    assert "error" in body["results"]["broken.wav"]

    # malformed wav → 400, server keeps serving
    bad = urllib.request.Request(
        f"{server_url}/analyze", data=b"garbage", method="POST"
    )
    with pytest.raises(urllib.error.HTTPError) as exc:
        urllib.request.urlopen(bad, timeout=30)
    assert exc.value.code == 400
    with urllib.request.urlopen(f"{server_url}/healthz", timeout=30) as r:
        assert json.loads(r.read())["status"] == "ok"


def test_analyze_per_head_diagnostics(server_url):
    """?per_head=1 adds pre-aggregation [head][real, syn] sigmoids under a
    NEW key (the reference schema keys are unchanged); absent without it."""
    data = _wav_bytes()
    req = urllib.request.Request(
        f"{server_url}/analyze?filename=x.wav&per_head=1", data=data,
        method="POST", headers={"Content-Type": "audio/wav"},
    )
    with urllib.request.urlopen(req, timeout=120) as r:
        body = json.loads(r.read())
    assert set(body) == {"filename", "segments", "percentages", "per_head"}
    assert len(body["per_head"]) == len(body["segments"]) == 1
    window = body["per_head"][0]
    assert len(window) == 2  # two heads
    for head in window:
        assert len(head) == 2
        assert all(0.0 <= v <= 1.0 for v in head)

    req2 = urllib.request.Request(
        f"{server_url}/analyze?filename=x.wav", data=data, method="POST",
        headers={"Content-Type": "audio/wav"},
    )
    with urllib.request.urlopen(req2, timeout=120) as r:
        body2 = json.loads(r.read())
    assert "per_head" not in body2


def test_concurrent_requests_coalesce_and_match_sequential(server_url):
    """Micro-batching (default on): concurrent clips share device batches
    and every response matches the same clip posted alone (verdict-exact;
    percentages to float tolerance — a coalesced batch may execute in a
    different bucket shape, which is a different XLA program)."""
    clips = {f"c{i}.wav": _wav_bytes(4.5, freq=220.0 + 110.0 * i)
             for i in range(6)}

    def post(name, data):
        req = urllib.request.Request(
            f"{server_url}/analyze?filename={name}", data=data,
            method="POST", headers={"Content-Type": "audio/wav"},
        )
        with urllib.request.urlopen(req, timeout=120) as r:
            return json.loads(r.read())

    sequential = {name: post(name, data) for name, data in clips.items()}

    concurrent = {}
    errors = []

    def run(name, data):
        try:
            concurrent[name] = post(name, data)
        except BaseException as e:  # noqa: BLE001
            errors.append((name, e))

    threads = [threading.Thread(target=run, args=(n, d))
               for n, d in clips.items()]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    assert not errors, errors
    for name in clips:
        seq, con = sequential[name], concurrent[name]
        assert con["filename"] == name
        assert [s["label"] for s in con["segments"]] == \
               [s["label"] for s in seq["segments"]]
        for cls, pct in seq["percentages"].items():
            assert con["percentages"][cls] == pytest.approx(pct, abs=1e-3)


def _post(url, data=b"", timeout=120):
    req = urllib.request.Request(url, data=data, method="POST")
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return json.loads(r.read())


def test_stream_lifecycle_matches_analyze(server_url):
    """start → int16 chunked feeds → finalize == /analyze of the same audio."""
    wav = _wav_bytes(9.0)
    want = _post(f"{server_url}/analyze?filename=s.wav", wav)

    sid = _post(f"{server_url}/stream/start")["stream_id"]
    wf, sr = wavio.read_wav_bytes(wav)
    pcm = wavio.pcm16_quantize(wf.mean(axis=0))
    live = []
    rng = np.random.default_rng(6)
    pos = 0
    while pos < len(pcm):
        n = int(rng.integers(10_000, 120_000))
        body = pcm[pos : pos + n].tobytes()
        pos += n
        live.extend(_post(f"{server_url}/stream/{sid}/feed", body)["windows"])
    got = _post(f"{server_url}/stream/{sid}/finalize")
    # int16 transport quantizes the waveform once (the file was PCM_16, so
    # values are exact) → identical windows → identical result
    assert [s["label"] for s in got["segments"]] == \
        [s["label"] for s in want["segments"]]
    assert [v["label"] for v in live] == [s["label"] for s in want["segments"]]
    for k, v in want["percentages"].items():
        assert abs(got["percentages"][k] - v) < 1e-6
    # the session is gone now
    req = urllib.request.Request(
        f"{server_url}/stream/{sid}/feed", data=b"\x00\x00", method="POST")
    with pytest.raises(urllib.error.HTTPError) as exc:
        urllib.request.urlopen(req, timeout=30)
    assert exc.value.code == 404


def test_stream_source_rate_and_abort(server_url):
    sid = _post(f"{server_url}/stream/start?source_rate=16000")["stream_id"]
    rng = np.random.default_rng(7)
    chunk = (rng.standard_normal(16_000) * 0.3).astype(np.float32).tobytes()
    out = _post(f"{server_url}/stream/{sid}/feed?dtype=float32", chunk)
    assert out["windows"] == []  # 1 s in — no window complete yet
    assert _post(f"{server_url}/stream/{sid}/abort")["status"] == "aborted"
    with pytest.raises(urllib.error.HTTPError) as exc:
        _post(f"{server_url}/stream/{sid}/finalize")
    assert exc.value.code == 404


def test_stream_bad_dtype_and_unknown_session(server_url):
    sid = _post(f"{server_url}/stream/start")["stream_id"]
    with pytest.raises(urllib.error.HTTPError) as exc:
        _post(f"{server_url}/stream/{sid}/feed?dtype=int8", b"\x00")
    assert exc.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as exc:
        _post(f"{server_url}/stream/nope/finalize")
    assert exc.value.code == 404
    _post(f"{server_url}/stream/{sid}/abort")
