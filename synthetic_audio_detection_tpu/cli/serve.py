"""Serving daemon CLI: warm compiled ensemble behind an HTTP JSON API
(infer/server.py). No reference counterpart — the reference re-loads and
re-compiles per clip via its one-shot CLI.

    python -m synthetic_audio_detection_tpu.cli.serve \
        --merged-model merged.pth --port 8321 [--bf16]
    python -m synthetic_audio_detection_tpu.cli.serve \
        --artifact merged.sadx --port 8321     # StableHLO artifact serving
"""

from __future__ import annotations

import argparse
import logging
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Synthetic-audio detection server")
    src = p.add_mutually_exclusive_group(required=True)
    src.add_argument("--merged-model")
    src.add_argument("--artifact",
                     help="serve from a StableHLO artifact (infer/export.py) "
                     "instead of a checkpoint: no model code or weight trees "
                     "at runtime; compute config is baked into the artifact")
    p.add_argument("--backbone", default="resnet18")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8321)
    p.add_argument("--threshold", type=float, default=0.5)
    p.add_argument("--batch-size", type=int, default=128)
    p.add_argument("--overlap", type=float, default=0.0)
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--no-warmup", action="store_true")
    p.add_argument("--no-micro-batch", action="store_true",
                   help="dispatch each request's windows alone instead of "
                   "coalescing concurrent requests into shared device "
                   "batches (infer/batching.py)")
    p.add_argument("--linger-ms", type=float, default=0.0,
                   help="micro-batching: wait up to this long for more "
                   "requests before dispatching an idle-device batch "
                   "(0 = drain-and-go; the device's own execution time "
                   "already accumulates the next burst)")
    p.add_argument("--stream-ttl", type=float, default=300.0,
                   help="live /stream sessions: evict after this many "
                   "seconds idle")
    p.add_argument("--max-streams", type=int, default=32,
                   help="max concurrent live /stream sessions (429 beyond)")
    from synthetic_audio_detection_tpu.utils.config import parse_input_size

    p.add_argument("--input-size", type=parse_input_size, default=512,
                   help="Spectrogram image size: 512 = reference fidelity, "
                   "256 = the fast mode (docs/PERFORMANCE.md)")
    p.add_argument("--no-calibration", action="store_true",
                   help="Ignore checkpoint/artifact-carried temperature "
                   "calibration (tools/calibrate_ensemble.py); uncalibrated "
                   "models are unaffected either way")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    logging.basicConfig(level=logging.INFO, format="%(levelname)s %(message)s")
    from synthetic_audio_detection_tpu.utils.compile_cache import (
        enable_persistent_cache,
    )

    enable_persistent_cache()

    import jax.numpy as jnp

    from synthetic_audio_detection_tpu.checkpoints import serialization
    from synthetic_audio_detection_tpu.infer.pipeline import InferencePipeline
    from synthetic_audio_detection_tpu.infer.server import serve
    from synthetic_audio_detection_tpu.utils.config import (
        AudioConfig,
        InferenceConfig,
        SpectrogramConfig,
    )

    if args.artifact:
        if args.bf16 or args.input_size != 512 or args.batch_size != 128:
            logging.warning(
                "--bf16/--input-size/--batch-size are baked into the "
                "artifact at export time; ignoring the CLI values")
        # --overlap and --threshold stay host-side (windowing / decision
        # rule) and are honored for artifact serving too
        pipeline = InferencePipeline.from_artifact(
            args.artifact,
            audio=AudioConfig(overlap=args.overlap),
            infer=InferenceConfig(threshold=args.threshold,
                                  apply_calibration=not args.no_calibration),
        )
        source = args.artifact
    else:
        ensemble = serialization.load_merged(args.merged_model,
                                             backbone=args.backbone)
        if args.bf16:
            from synthetic_audio_detection_tpu.ensemble.multihead import (
                with_dtype,
            )

            ensemble = with_dtype(ensemble, jnp.bfloat16)
        pipeline = InferencePipeline(
            ensemble,
            audio=AudioConfig(overlap=args.overlap),
            spec=SpectrogramConfig.inference(out_size=args.input_size),
            infer=InferenceConfig(threshold=args.threshold,
                                  batch_size=args.batch_size,
                                  apply_calibration=not args.no_calibration),
            compute_dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
        )
        source = args.merged_model
    server = serve(pipeline, args.host, args.port,
                   warmup=not args.no_warmup,
                   micro_batch=not args.no_micro_batch,
                   linger_ms=args.linger_ms,
                   stream_ttl=args.stream_ttl,
                   max_streams=args.max_streams)
    logging.info("serving %s on http://%s:%d (classes: %s)",
                 source, args.host, args.port,
                 pipeline.ensemble.class_names)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    return 0


if __name__ == "__main__":
    sys.exit(main())
