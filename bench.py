"""End-to-end throughput benchmark: 4-second segments/sec/chip.

Measures the full serving path on one chip — waveform windows → fused mel
front end (GEMM DFT on the MXU) → 6-head ResNet-18 ensemble → [B, N+1]
logits — as ONE jitted program in bfloat16, mirroring BASELINE.json's
north-star metric (≥25k 4-s segments/sec/chip on v5e end-to-end).

Prints exactly one JSON line:
    {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}
vs_baseline is value / 25000 (the BASELINE.json target; the reference
publishes no segments/sec number of its own — SURVEY.md §6).
"""

from __future__ import annotations

import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

TARGET_SEGS_PER_SEC = 25_000.0


def main() -> None:
    from __graft_entry__ import _flagship_ensemble
    from synthetic_audio_detection_tpu.infer.pipeline import _forward_windows
    from synthetic_audio_detection_tpu.utils.config import SpectrogramConfig

    batch = int(jax.device_count() and 128)
    ens = _flagship_ensemble()
    spec_cfg = SpectrogramConfig.inference()
    fwd = jax.jit(
        functools.partial(
            _forward_windows,
            ensemble=ens,
            spec_cfg=spec_cfg,
            sample_rate=32_000,
            use_gemm_dft=True,
            compute_dtype=jnp.bfloat16,
        )
    )

    rng = np.random.default_rng(0)
    windows = jnp.asarray(
        rng.standard_normal((batch, 128_000)).astype(np.float32) * 0.3
    )
    variables = jax.device_put(ens.variables)

    # compile + warmup
    jax.block_until_ready(fwd(variables, windows))

    # steady state: enough iterations for a stable estimate
    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fwd(variables, windows)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    segs_per_sec = batch * iters / dt
    print(
        json.dumps(
            {
                "metric": "4s_segments_per_sec_per_chip",
                "value": round(segs_per_sec, 1),
                "unit": "segments/s",
                "vs_baseline": round(segs_per_sec / TARGET_SEGS_PER_SEC, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
