"""On-chip StableHLO artifact drive: export → artifact serve → verdict parity.

tests/test_export.py pins artifact-vs-live equivalence on CPU; this drive
runs the SAME contract on the real TPU (VERDICT r3 #6): export a merged
checkpoint to a .sadx StableHLO artifact (weights baked in, no model code
at load time — infer/export.py), open BOTH pipelines, analyze every WAV in
a folder through each, and require verdict-level agreement (identical
segment labels; percentages within float tolerance — separately compiled
executables legitimately differ ~1e-7 in fusion order).

Usage:
    python tools/stablehlo_drive.py --merged-model M.ckpt \
        --audio-dir runs/study/dataset/test/Real --input-size native --bf16
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--merged-model", required=True)
    p.add_argument("--audio-dir", required=True)
    p.add_argument("--max-files", type=int, default=12)
    from synthetic_audio_detection_tpu.utils.config import parse_input_size

    p.add_argument("--input-size", type=parse_input_size, default=512)
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--batch-size", type=int, default=128)
    p.add_argument("--backbone", default="resnet18")
    p.add_argument("--artifact", help="reuse an existing artifact path")
    args = p.parse_args(argv)

    from synthetic_audio_detection_tpu.utils.compile_cache import (
        enable_persistent_cache,
    )

    enable_persistent_cache()

    import jax.numpy as jnp

    from synthetic_audio_detection_tpu.checkpoints import serialization
    from synthetic_audio_detection_tpu.infer import export as export_mod
    from synthetic_audio_detection_tpu.infer.pipeline import InferencePipeline
    from synthetic_audio_detection_tpu.utils.config import (
        AudioConfig,
        InferenceConfig,
        SpectrogramConfig,
    )

    ensemble = serialization.load_merged(args.merged_model,
                                         backbone=args.backbone)
    if args.bf16:
        from synthetic_audio_detection_tpu.ensemble.multihead import with_dtype

        ensemble = with_dtype(ensemble, jnp.bfloat16)
    live = InferencePipeline(
        ensemble,
        audio=AudioConfig(),
        spec=SpectrogramConfig.inference(out_size=args.input_size),
        infer=InferenceConfig(batch_size=args.batch_size),
        compute_dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
    )

    art_path = args.artifact
    if not art_path:
        art_path = os.path.join(tempfile.mkdtemp(prefix="sadx_"), "m.sadx")
        data = export_mod.export_serving(
            ensemble,
            audio=AudioConfig(),
            spec=SpectrogramConfig.inference(out_size=args.input_size),
            batch_sizes=(8, args.batch_size),
            compute_dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
            # match the live pipeline's auto-gates so the parity check
            # compares like with like (folded-affine vs flax differ at
            # bf16 rounding scale)
            use_fast_backbone=live.use_fast_backbone,
        )
        export_mod.write_artifact(art_path, data)
    artifact = InferencePipeline.from_artifact(art_path)

    wavs = sorted(
        f for f in os.listdir(args.audio_dir)
        if f.lower().endswith(".wav"))[: args.max_files]
    if not wavs:
        raise SystemExit(f"{args.audio_dir}: no wavs")

    n_label_mismatch = 0
    max_pct_dev = 0.0
    for name in wavs:
        path = os.path.join(args.audio_dir, name)
        a = live.analyze_file(path)
        b = artifact.analyze_file(path)
        la = [s["label"] for s in a["segments"]]
        lb = [s["label"] for s in b["segments"]]
        if la != lb:
            n_label_mismatch += 1
        for c in a["percentages"]:
            max_pct_dev = max(max_pct_dev, abs(
                a["percentages"][c] - b["percentages"].get(c, float("nan"))))
    report = {
        "artifact": art_path,
        "n_files": len(wavs),
        "label_mismatches": n_label_mismatch,
        "max_percentage_deviation": max_pct_dev,
        "ok": n_label_mismatch == 0 and max_pct_dev < 0.05,
    }
    print(json.dumps(report))
    return 0 if report["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
