"""HTTP serving daemon: persistent compiled ensemble behind a JSON API.

The reference serves only through a one-shot CLI (inference_runner.py), which
pays model-load + XLA-compile on every clip. For production deployment the
framework keeps ONE warm InferencePipeline (compiled window buckets reused
across requests) behind a minimal stdlib HTTP server — no web-framework
dependency, thread-safe via a single dispatch lock (device execution is
serialized anyway; host decode runs per-request in the handler thread).
Concurrent verdict requests coalesce into shared device batches
(infer/batching.py micro-batching, default on) so bursty short-clip load
fills full MXU buckets instead of dispatching one bucket-8 program each.

API:
    GET  /healthz            → {"status": "ok", "classes": [...]}
    POST /analyze            → body: WAV bytes (Content-Type: audio/wav)
                               query: ?smooth=1&filename=clip.wav
                                      [&per_head=1 → adds "per_head": per-
                                      window [head][real, syn] sigmoids]
                               → the reference JSON schema
                                 {filename, segments[], percentages{}}
    POST /analyze_batch      → body: JSON {"files": {"name": <base64 wav>, ...}}
                               → {"results": {"name": {...}, ...}}; files fan
                               out through the micro-batcher so one request's
                               clips share device batches; a bad file yields
                               {"error": ...} for that name only

Start:  python -m synthetic_audio_detection_tpu.cli.serve \
            --merged-model merged.pth --port 8321 [--bf16]
"""

from __future__ import annotations

import base64
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Dict, Optional
from urllib.parse import parse_qs, urlparse

import numpy as np

from synthetic_audio_detection_tpu.audio import wavio
from synthetic_audio_detection_tpu.audio.dsp import resample_poly_np
from synthetic_audio_detection_tpu.infer.batching import MicroBatcher
from synthetic_audio_detection_tpu.infer.pipeline import (
    InferencePipeline,
    slice_waveform,
)


class ServingState:
    """Warm pipeline + dispatch lock shared across handler threads.

    With ``micro_batch`` (the default), verdict forwards from concurrent
    requests coalesce into shared device batches (infer/batching.py) —
    the TPU sees full buckets under bursty short-clip load instead of one
    bucket-8 program per request. The per-head diagnostics path keeps the
    plain lock (it runs a different program shape)."""

    def __init__(self, pipeline: InferencePipeline,
                 micro_batch: bool = True, linger_ms: float = 0.0):
        self.pipeline = pipeline
        self.lock = threading.Lock()
        self.batcher: Optional[MicroBatcher] = None
        if micro_batch:
            def locked_forward(windows):
                with self.lock:  # serialize vs per_head/warmup dispatches
                    return self.pipeline.logits_for_windows(windows)

            self.batcher = MicroBatcher(
                locked_forward,
                max_windows=pipeline.infer.batch_size,
                linger_ms=linger_ms,
            )

    def analyze_wav_bytes(self, data: bytes, smooth: bool,
                          per_head: bool = False) -> Dict[str, Any]:
        wf, sr = wavio.read_wav_bytes(data)
        mono = wf.mean(axis=0)
        audio_cfg = self.pipeline.audio
        if sr != audio_cfg.sample_rate:
            mono = resample_poly_np(mono, sr, audio_cfg.sample_rate)
        if mono.shape[0] < audio_cfg.window_samples:
            mono = np.pad(mono, (0, audio_cfg.window_samples - mono.shape[0]))
        windows, stamps = slice_waveform(mono.astype(np.float32), audio_cfg)
        if per_head and windows.shape[0]:
            with self.lock:  # device dispatch is serialized
                # ONE device program yields the serving logits AND the
                # pre-aggregation view — same numerics by construction, and
                # bucketed like serving so it never compiles an unbounded
                # per-clip shape while holding the lock
                logits, nh = self.pipeline.logits_and_per_head(windows)
            result = self.pipeline.analyze_windows(
                windows, stamps, smooth=smooth, logits=logits)
            probs = 1.0 / (1.0 + np.exp(-nh))
            # added under a NEW key so the reference schema stays intact
            result["per_head"] = [
                [[round(float(p), 4) for p in head] for head in window]
                for window in probs
            ]
        else:
            if self.batcher is not None and windows.shape[0]:
                # verdict path: share the device batch with concurrent
                # requests; the lock rides inside the batcher's forward
                logits = self.batcher.logits(windows)
                result = self.pipeline.analyze_windows(
                    windows, stamps, smooth=smooth, logits=logits)
            else:
                with self.lock:
                    result = self.pipeline.analyze_windows(
                        windows, stamps, smooth=smooth)
            if per_head:  # all-silent clip: keep the key present
                result["per_head"] = []
        return result

    def warmup(self) -> None:
        """Compile both serving buckets (short-clip and full-batch) so no
        request pays an XLA compile."""
        T = self.pipeline.audio.window_samples
        for n in (1, self.pipeline.infer.batch_size):
            dummy = np.zeros((n, T), np.float32)
            dummy[:, 0] = 1.0
            with self.lock:
                self.pipeline.logits_for_windows(dummy)


def make_handler(state: ServingState):
    class Handler(BaseHTTPRequestHandler):
        def _send(self, code: int, payload: Dict[str, Any]) -> None:
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, fmt, *args):  # quiet default stderr chatter
            pass

        def do_GET(self):
            if urlparse(self.path).path == "/healthz":
                self._send(200, {
                    "status": "ok",
                    "classes": state.pipeline.ensemble.class_names,
                })
            else:
                self._send(404, {"error": "not found"})

        def do_POST(self):
            parsed = urlparse(self.path)
            length = int(self.headers.get("Content-Length", 0))
            data = self.rfile.read(length)
            try:
                if parsed.path == "/analyze":
                    q = parse_qs(parsed.query)
                    smooth = q.get("smooth", ["0"])[0] in ("1", "true")
                    per_head = q.get("per_head", ["0"])[0] in ("1", "true")
                    name = q.get("filename", ["audio.wav"])[0]
                    result = state.analyze_wav_bytes(data, smooth, per_head)
                    self._send(200, {"filename": name, **result})
                elif parsed.path == "/analyze_batch":
                    req = json.loads(data)
                    files = req.get("files", {})
                    smooth = bool(req.get("smooth"))
                    results = {}
                    if state.batcher is not None and len(files) > 1:
                        # fan the files out so their windows coalesce into
                        # shared device batches; per-file error isolation
                        # (a bad file reports, the rest still analyze)
                        from concurrent.futures import ThreadPoolExecutor

                        def one(item):
                            name, b64 = item
                            try:
                                return name, state.analyze_wav_bytes(
                                    base64.b64decode(b64), smooth)
                            except Exception as e:  # noqa: BLE001
                                return name, {"error": str(e)}

                        with ThreadPoolExecutor(
                                max_workers=min(8, len(files))) as pool:
                            results = dict(pool.map(one, files.items()))
                    else:
                        for name, b64 in files.items():
                            try:
                                results[name] = state.analyze_wav_bytes(
                                    base64.b64decode(b64), smooth)
                            except Exception as e:  # noqa: BLE001
                                results[name] = {"error": str(e)}
                    self._send(200, {"results": results})
                else:
                    self._send(404, {"error": "not found"})
            except Exception as e:  # noqa: BLE001 - per-request isolation
                self._send(400, {"error": str(e)})

    return Handler


def serve(
    pipeline: InferencePipeline,
    host: str = "127.0.0.1",
    port: int = 8321,
    warmup: bool = True,
    micro_batch: bool = True,
    linger_ms: float = 0.0,
) -> ThreadingHTTPServer:
    """Create (and return) the server; caller runs serve_forever()."""
    state = ServingState(pipeline, micro_batch=micro_batch,
                         linger_ms=linger_ms)
    if warmup:
        state.warmup()
    srv = ThreadingHTTPServer((host, port), make_handler(state))
    srv.serving_state = state  # tests/observability (dispatch_count)
    return srv
