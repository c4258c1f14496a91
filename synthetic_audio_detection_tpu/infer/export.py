"""Self-contained StableHLO serving artifacts (``jax.export``).

The reference deploys by shipping a torch ``.pth`` plus the Python stack
that rebuilds the model around it (inference_runner.py:77-123: key-space
discovery, timm backbone construction, dummy forward). A TPU-native
framework can ship something stronger: ``jax.export`` lowers the ENTIRE
serving program — int16 PCM dequantization, the mel front end, the vmapped
multi-head forward, the ``[B, N+1]`` aggregation — into serialized
StableHLO modules (one per batch-size entry) plus ONE shared copy of the
trained weights, bound to every entry as call arguments at load time. The
artifact is:

* **self-contained** — loadable from any JAX process via
  :func:`load_artifact` with no model code, no checkpoint parsing, no timm;
* **versionable** — bytes on disk are the unit a serving fleet ships and
  rolls back;
* **cross-platform** — ``platforms=['tpu']`` (or cpu/cuda) pins where it may
  run; export happens on any host, no TPU needed at export time.

File format: ``SADX1\\n`` magic, a JSON metadata header (class names, batch
shape, transport dtype, spectrogram config), then the StableHLO payload.

No reference counterpart — an extra serving surface like infer/server.py
(PARITY.md "beyond the reference").
"""

from __future__ import annotations

import dataclasses
import functools
import io
import json
import os
import struct
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp

from synthetic_audio_detection_tpu.ensemble.multihead import MultiHeadEnsemble
from synthetic_audio_detection_tpu.utils.config import (
    AudioConfig,
    SpectrogramConfig,
)

_MAGIC = b"SADX1\n"


def _serving_fn(ensemble: MultiHeadEnsemble, spec: SpectrogramConfig,
                sample_rate: int, compute_dtype: Any, use_fast_backbone: bool):
    """→ (fn(weight_leaves, windows) -> logits, weight_leaves).

    The weight tree rides as an ARGUMENT (flat leaf list; the treedef is
    static program structure), not as baked constants — a multi-batch-size
    artifact then stores the weights ONCE instead of once per entry."""
    from synthetic_audio_detection_tpu.infer.pipeline import _forward_windows

    leaves, treedef = jax.tree_util.tree_flatten(ensemble.variables)

    def fn(weight_leaves, windows):
        variables = jax.tree_util.tree_unflatten(treedef, weight_leaves)
        return _forward_windows(
            variables, windows,
            ensemble=ensemble, spec_cfg=spec, sample_rate=sample_rate,
            use_gemm_dft=True, compute_dtype=compute_dtype,
            use_pallas=False, use_s2d_layer1=False,
            use_fast_backbone=use_fast_backbone,
        )

    return fn, leaves


def export_serving(
    ensemble: MultiHeadEnsemble,
    *,
    audio: Optional[AudioConfig] = None,
    spec: Optional[SpectrogramConfig] = None,
    batch_sizes: Sequence[int] = (8, 128),
    transport_dtype: str = "int16",
    compute_dtype: Any = jnp.bfloat16,
    use_fast_backbone: bool = False,
    platforms: Optional[Sequence[str]] = None,
) -> bytes:
    """Serialize the full serving program — one entry per batch size —
    for ``[b, window]`` windows → ``[b, N+1]`` logits; the weight tree is
    stored once and shared by all entries.

    ``batch_sizes`` defaults to the live pipeline's two-level buckets
    (8 for short clips, 128 for throughput — infer/pipeline.py:_bucket),
    so :meth:`InferencePipeline.from_artifact` serves any clip length
    through exactly the shapes the artifact carries.
    ``transport_dtype='int16'`` exports the PCM-transport entry point (the
    artifact dequantizes on device, mirroring InferencePipeline);
    ``platforms`` defaults to the exporting process's backend.
    """
    from jax import export as jexport

    audio = audio or AudioConfig()
    spec = spec or SpectrogramConfig.inference()
    if transport_dtype not in ("float32", "int16"):
        raise ValueError(f"unsupported transport_dtype {transport_dtype!r}")
    if not batch_sizes:
        raise ValueError("need at least one batch size")
    in_dtype = jnp.int16 if transport_dtype == "int16" else jnp.float32

    fn, leaves = _serving_fn(ensemble, spec, audio.sample_rate, compute_dtype,
                             use_fast_backbone)
    jit_fn = jax.jit(fn)
    import numpy as np
    from flax import serialization as flax_ser

    np_leaves = [np.asarray(leaf) for leaf in leaves]
    weights_blob = flax_ser.msgpack_serialize(np_leaves)
    leaf_specs = [jax.ShapeDtypeStruct(a.shape, a.dtype) for a in np_leaves]
    payloads, entries, platforms_out = [], [], None
    for b in sorted(set(int(b) for b in batch_sizes)):
        arg = jax.ShapeDtypeStruct((b, audio.window_samples), in_dtype)
        exported = jexport.export(
            jit_fn, platforms=tuple(platforms) if platforms else None,
        )(leaf_specs, arg)
        payload = exported.serialize()
        payloads.append(payload)
        entries.append({"batch_size": b, "nbytes": len(payload)})
        platforms_out = list(exported.platforms)

    meta = {
        "class_names": list(ensemble.class_names),
        "generic_head": bool(ensemble.generic_head),
        "backbone": ensemble.model.backbone,
        "entries": entries,
        "window_samples": audio.window_samples,
        "sample_rate": audio.sample_rate,
        "transport_dtype": transport_dtype,
        "compute_dtype": jnp.dtype(compute_dtype).name,
        "platforms": platforms_out,
        "spec": dataclasses.asdict(spec),
        # weights stored ONCE (msgpack leaf list) and passed to every entry
        # as arguments; absent in pre-dedup artifacts, whose entries baked
        # the weights in as constants (load_artifact handles both)
        "weights_nbytes": len(weights_blob),
    }
    if ensemble.calibration:
        # temperature calibration is a host-side post-scale (infer/pipeline),
        # so it rides artifact metadata rather than the exported programs
        meta["calibration"] = dict(ensemble.calibration)
    head = json.dumps(meta, sort_keys=True).encode()
    buf = io.BytesIO()
    buf.write(_MAGIC)
    buf.write(struct.pack("<I", len(head)))
    buf.write(head)
    buf.write(weights_blob)
    for payload in payloads:
        buf.write(payload)
    return buf.getvalue()


def write_artifact(path: str, data: bytes) -> None:
    with open(path, "wb") as f:
        f.write(data)


def load_artifact(path_or_bytes):
    """→ ({batch_size: callable ``fn(windows) -> logits``}, metadata dict).
    Needs only jax (+ flax's msgpack codec for the shared weight blob) —
    no model code, checkpoints, or framework classes. The shared weights
    are bound to each entry here, so callers still see windows-only
    callables."""
    from jax import export as jexport

    if isinstance(path_or_bytes, (str, os.PathLike)):
        with open(path_or_bytes, "rb") as f:
            data = f.read()
    else:
        data = path_or_bytes
    if data[: len(_MAGIC)] != _MAGIC:
        raise ValueError("not a SADX serving artifact (bad magic)")
    off = len(_MAGIC)
    (hlen,) = struct.unpack_from("<I", data, off)
    off += 4
    meta = json.loads(data[off : off + hlen].decode())
    off += hlen
    weight_leaves = None
    if meta.get("weights_nbytes"):
        from flax import serialization as flax_ser

        n = meta["weights_nbytes"]
        weight_leaves = [
            jnp.asarray(a)
            for a in flax_ser.msgpack_restore(data[off : off + n])
        ]
        off += n
    calls = {}
    for entry in meta["entries"]:
        n = entry["nbytes"]
        call = jexport.deserialize(data[off : off + n]).call
        if weight_leaves is not None:
            # bind the shared weights: entries take (leaves, windows)
            call = functools.partial(call, weight_leaves)
        calls[entry["batch_size"]] = call
        off += n
    if off != len(data):
        raise ValueError("artifact payload length mismatch")
    return calls, meta


def main(argv=None) -> int:
    """CLI: export a merged checkpoint to a serving artifact."""
    import argparse

    from synthetic_audio_detection_tpu.checkpoints import serialization
    from synthetic_audio_detection_tpu.ensemble.multihead import with_dtype
    from synthetic_audio_detection_tpu.utils.config import parse_input_size

    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--merged-model", required=True)
    p.add_argument("--output", required=True, help="artifact path (.sadx)")
    p.add_argument("--backbone", default="resnet18")
    p.add_argument("--batch-sizes", default="8,128",
                   help="comma-separated batch entries; default 8,128 = the "
                   "live pipeline's two-level buckets")
    p.add_argument("--input-size", type=parse_input_size, default=512)
    p.add_argument("--transport-dtype", default="int16",
                   choices=("float32", "int16"))
    p.add_argument("--bf16", action="store_true",
                   help="bfloat16 compute inside the artifact")
    p.add_argument("--platform", default="",
                   help="target platform(s), comma-separated (tpu,cpu,cuda); "
                   "default = the exporting process's backend")
    args = p.parse_args(argv)

    from synthetic_audio_detection_tpu.utils.compile_cache import (
        enable_persistent_cache,
    )

    enable_persistent_cache()

    ensemble = serialization.load_merged(args.merged_model,
                                         backbone=args.backbone)
    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    ensemble = with_dtype(ensemble, dtype)
    data = export_serving(
        ensemble,
        spec=SpectrogramConfig.inference(out_size=args.input_size),
        batch_sizes=[int(b) for b in args.batch_sizes.split(",")],
        transport_dtype=args.transport_dtype,
        compute_dtype=dtype,
        platforms=[s for s in args.platform.split(",") if s] or None,
    )
    write_artifact(args.output, data)
    print(f"Wrote serving artifact to {args.output} "
          f"({len(data)} bytes, heads={len(ensemble.class_names) - 1})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
