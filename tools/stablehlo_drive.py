"""On-chip StableHLO artifact drive: export → artifact serve → verdict parity.

tests/test_export.py pins artifact-vs-live equivalence on CPU; this drive
runs the SAME contract on the real TPU (VERDICT r3 #6): export a merged
checkpoint to a .sadx StableHLO artifact (weights baked in, no model code
at load time — infer/export.py) and compare against TWO live pipelines on
every WAV in a folder:

- MATCHED numerics (the exact program that was exported: jnp GEMM mel, no
  mono fold, same transport/backbone): percentages must agree to float
  tolerance — separately compiled executables differ ~1e-7-scale in fusion
  order, amplified through bf16 sigmoids to ≲0.1 percentage points;
- PRODUCTION auto-gated serving (Pallas factored mel + mono fold at native
  bf16): verdict labels must agree; percentages legitimately differ at
  reduced-precision/mel-formulation scale (observed ~2.6 pp max), so only
  the label contract is enforced there.

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
    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    spec = SpectrogramConfig.inference(out_size=args.input_size)
    production = InferencePipeline(
        ensemble,
        audio=AudioConfig(),
        spec=spec,
        infer=InferenceConfig(batch_size=args.batch_size),
        compute_dtype=dtype,
    )
    # the exported program's exact numerics: jnp GEMM mel, no mono fold,
    # int16 transport (the artifact's entry point dequantizes on device)
    matched = InferencePipeline(
        ensemble,
        audio=AudioConfig(),
        spec=spec,
        infer=InferenceConfig(batch_size=args.batch_size),
        compute_dtype=dtype,
        use_pallas=False,
        fold_mono=False,
        use_fast_backbone=True,
        transport_dtype="int16",
    )

    art_path = args.artifact
    if not art_path:
        art_path = os.path.join(tempfile.mkdtemp(prefix="sadx_"), "m.sadx")
        data = export_mod.export_serving(
            ensemble,
            audio=AudioConfig(),
            spec=spec,
            batch_sizes=(8, args.batch_size),
            compute_dtype=dtype,
            use_fast_backbone=True,
        )
        export_mod.write_artifact(art_path, data)
    artifact = InferencePipeline.from_artifact(art_path)

    wavs = sorted(
        f for f in os.listdir(args.audio_dir)
        if f.lower().endswith(".wav"))[: args.max_files]
    if not wavs:
        raise SystemExit(f"{args.audio_dir}: no wavs")

    prod_label_mismatch = 0
    matched_label_mismatch = 0
    matched_max_dev = 0.0
    prod_max_dev = 0.0
    for name in wavs:
        path = os.path.join(args.audio_dir, name)
        a = artifact.analyze_file(path)
        m = matched.analyze_file(path)
        p = production.analyze_file(path)
        la = [s["label"] for s in a["segments"]]
        if la != [s["label"] for s in m["segments"]]:
            matched_label_mismatch += 1
        if la != [s["label"] for s in p["segments"]]:
            prod_label_mismatch += 1
        for c in a["percentages"]:
            matched_max_dev = max(matched_max_dev, abs(
                a["percentages"][c] - m["percentages"].get(c, float("nan"))))
            prod_max_dev = max(prod_max_dev, abs(
                a["percentages"][c] - p["percentages"].get(c, float("nan"))))
    report = {
        "artifact": art_path,
        "n_files": len(wavs),
        "matched_label_mismatches": matched_label_mismatch,
        "matched_max_percentage_deviation": matched_max_dev,
        "production_label_mismatches": prod_label_mismatch,
        "production_max_percentage_deviation": prod_max_dev,
        "ok": (matched_label_mismatch == 0 and matched_max_dev < 0.1
               and prod_label_mismatch == 0),
    }
    print(json.dumps(report))
    return 0 if report["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
