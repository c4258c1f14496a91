"""Parametrized throughput harness: segments/sec/chip across configurations.

Covers BASELINE.json configs 2-3 (batched front end; merged 6-head ensemble
batch inference) and supports the fidelity/speed trade-offs: input size,
dtype, fused-Pallas vs jnp front end, shared vs dense backbones, head count,
batch size.

Timing uses the N-vs-1 chained fori_loop differencing from bench.py (honest on
tunneled runtimes). Run:

    python benchmarks/throughput.py --configs default fast
    python benchmarks/throughput.py --batch 256 --heads 6 --input-size 256
"""

from __future__ import annotations

import argparse
import functools
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")  # repo root


def measure(fwd, variables, windows, iters: int = 11) -> float:
    """Per-iteration seconds via N-vs-1 chained-loop differencing.

    Median-of-3 on BOTH endpoints (as bench.py): a single t1/tN sample rides
    one tunnel round trip whose latency jitters by tens of ms — enough to
    produce physically impossible readings on sub-ms-per-iter configs (a
    round-3 run read the mel kernel at 294 TF/s nominal, above the chip's
    197 peak, from one polluted t1)."""
    import jax.numpy as jnp

    from bench import _looped

    run = _looped(fwd)  # ONE program; trip count is a traced scalar
    n1, nN = jnp.asarray(1, jnp.int32), jnp.asarray(iters, jnp.int32)
    float(run(variables, windows, nN))

    def timed(n) -> float:
        t0 = time.perf_counter()
        float(run(variables, windows, n))
        return time.perf_counter() - t0

    t1 = sorted(timed(n1) for _ in range(3))[1]
    tn = sorted(timed(nN) for _ in range(3))[1]
    return max((tn - t1) / (iters - 1), 1e-9)


def bench_config(
    batch: int,
    heads: int,
    input_size: int,
    dtype: str,
    use_pallas: bool,
    shared_backbone: bool,
    backbone: str = "resnet18",
    mono: bool = False,
    int8: bool = False,
    melonly: bool = False,
    s2d: bool = False,
    fastpath_plain: bool = False,
    s2d_stem: str = "",
    iters: int = 11,
    gemm_dft: bool = True,
    mel_wpc: int = 1,
    mel_stack: bool = False,
    mel_factored: bool = False,
    mel_lowp: bool = False,
    mel_bf16asm: bool = False,
    mel_stackdft: bool = False,
    dft_mode: str = "",
    trunk_stages: int = 0,
) -> dict:
    from __graft_entry__ import _flagship_ensemble
    from synthetic_audio_detection_tpu.ensemble.multihead import fold_to_mono
    from synthetic_audio_detection_tpu.infer.pipeline import _forward_windows
    from synthetic_audio_detection_tpu.utils.config import SpectrogramConfig

    ens = _flagship_ensemble(
        n_heads=heads, backbone=backbone, shared_backbone=shared_backbone,
        dtype=jnp.bfloat16 if dtype == "bf16" else jnp.float32,
        shared_trunk_stages=trunk_stages,
    )
    if mono:
        ens = fold_to_mono(ens)
    spec = SpectrogramConfig(mel_norm="slaney", out_size=input_size)
    if melonly:
        from synthetic_audio_detection_tpu.ops.pallas_melspec import (
            fused_log_mel,
            fused_log_mel_factored,
        )
        from synthetic_audio_detection_tpu.ops import melspec as M

        def fwd(_, windows):
            if use_pallas and mel_factored:
                z = fused_log_mel_factored(windows, spec, 32_000,
                                           windows_per_cell=mel_wpc,
                                           lowp_tail=mel_lowp,
                                           assemble_bf16=mel_bf16asm,
                                           stack_dft=mel_stackdft)
            elif use_pallas:
                z = fused_log_mel(windows, spec, 32_000,
                                  windows_per_cell=mel_wpc,
                                  stack_windows=mel_stack)
            else:
                z = M.standardize(M.amplitude_to_db(
                    M.mel_spectrogram(windows, spec, 32_000, gemm_dft,
                                      dft_mode=dft_mode or None),
                    spec.top_db))
            feats = M.finalize_features(z, spec)
            return feats.astype(jnp.bfloat16)

        variables_in = jnp.zeros(())
    elif int8:
        from synthetic_audio_detection_tpu.models.quantized import (
            quantize_ensemble,
            quantized_ensemble_forward,
        )
        from synthetic_audio_detection_tpu.ops.pallas_melspec import serving_log_mel
        from synthetic_audio_detection_tpu.ops import melspec as M

        qens = quantize_ensemble(ens)

        def fwd(qvars, windows):
            if use_pallas:
                z = serving_log_mel(windows, spec, 32_000)
            else:
                z = M.standardize(M.amplitude_to_db(
                    M.mel_spectrogram(windows, spec, 32_000, True), spec.top_db))
            feats = M.finalize_features(z, spec)
            x = jnp.broadcast_to(feats[..., None], (*feats.shape, 3))
            import dataclasses as dc
            q = dc.replace(qens, qbackbone=qvars[0], head_variables=qvars[1])
            return quantized_ensemble_forward(q, x)

        variables_in = (qens.qbackbone, qens.head_variables)
    elif fastpath_plain:
        # isolate the functional fast-path interpreter WITHOUT s2d: any gap
        # vs 'default' is interpreter overhead (fusion/dtype), not s2d itself
        import dataclasses as dc

        from synthetic_audio_detection_tpu.models.fast_resnet import (
            fast_ensemble_forward,
        )
        from synthetic_audio_detection_tpu.ops.pallas_melspec import serving_log_mel
        from synthetic_audio_detection_tpu.ops import melspec as M

        def fwd(variables, windows):
            if use_pallas:
                z = serving_log_mel(windows, spec, 32_000, lowp_tail=mel_lowp)
            else:
                z = M.standardize(M.amplitude_to_db(
                    M.mel_spectrogram(windows, spec, 32_000, True), spec.top_db))
            feats = M.finalize_features(z, spec)
            ch = ens.model.in_channels
            x = feats[..., None].astype(jnp.bfloat16)
            if ch > 1:
                x = jnp.broadcast_to(x, (*feats.shape, ch))
            e = dc.replace(ens, variables=variables)
            return fast_ensemble_forward(
                e, x, s2d_layer1=s2d, s2d_stem=s2d_stem,
                s2d_min_h=32 if input_size == 0 else 128)

        variables_in = ens.variables
    else:
        fwd = functools.partial(
            _forward_windows,
            ensemble=ens,
            spec_cfg=spec,
            sample_rate=32_000,
            use_gemm_dft=gemm_dft,
            compute_dtype=jnp.bfloat16 if dtype == "bf16" else jnp.float32,
            use_pallas=use_pallas,
            use_s2d_layer1=s2d,
        )
        variables_in = None
    rng = np.random.default_rng(0)
    windows = jnp.asarray(
        rng.standard_normal((batch, 128_000)).astype(np.float32) * 0.3
    )
    variables = jax.device_put(
        variables_in if variables_in is not None else ens.variables
    )
    per_iter = measure(fwd, variables, windows, iters=iters)
    return {
        "batch": batch,
        "heads": heads,
        "input_size": input_size,
        "dtype": dtype,
        "pallas": use_pallas,
        "shared_backbone": shared_backbone,
        "backbone": backbone,
        "mono": mono,
        "int8": int8,
        "trunk_stages": trunk_stages,
        "ms_per_batch": round(per_iter * 1e3, 2),
        "segments_per_sec": round(batch / per_iter, 1),
    }


PRESETS = {
    # reference-fidelity merged-model serving (the bench.py config)
    "default": dict(batch=128, heads=6, input_size=512, dtype="bf16",
                    use_pallas=True, shared_backbone=True),
    # fidelity-flag fast mode: 256x256 input
    "fast": dict(batch=128, heads=6, input_size=256, dtype="bf16",
                 use_pallas=True, shared_backbone=True),
    # dense independent backbones (worst case)
    "dense": dict(batch=32, heads=6, input_size=512, dtype="bf16",
                  use_pallas=True, shared_backbone=False),
    # single head (config 1 scaled up)
    "single": dict(batch=128, heads=1, input_size=512, dtype="bf16",
                   use_pallas=True, shared_backbone=False),
    # jnp front end (no pallas) for A/B
    "nopallas": dict(batch=128, heads=6, input_size=512, dtype="bf16",
                     use_pallas=False, shared_backbone=True),
    # mono-folded stem (exact transform, 3x less stem input)
    "mono": dict(batch=128, heads=6, input_size=512, dtype="bf16",
                 use_pallas=True, shared_backbone=True, mono=True),
    # mono + 256^2 fast mode
    "mono-fast": dict(batch=128, heads=6, input_size=256, dtype="bf16",
                      use_pallas=True, shared_backbone=True, mono=True),
    # int8 PTQ backbone (2x MXU rate)
    "int8": dict(batch=128, heads=6, input_size=512, dtype="bf16",
                 use_pallas=True, shared_backbone=True, int8=True),
    # int8 + fast mode
    "int8-fast": dict(batch=128, heads=6, input_size=256, dtype="bf16",
                      use_pallas=True, shared_backbone=True, int8=True),
    # space-to-depth layer1 (H-only folding) at reference fidelity
    "s2d": dict(batch=128, heads=6, input_size=512, dtype="bf16",
                use_pallas=True, shared_backbone=True, s2d=True),
    # fast-path interpreter WITHOUT s2d (isolates interpreter overhead)
    "fastpath": dict(batch=128, heads=6, input_size=512, dtype="bf16",
                     use_pallas=True, shared_backbone=True,
                     fastpath_plain=True),
    # fast-path at 256² fast mode
    "fastpath-fast": dict(batch=128, heads=6, input_size=256, dtype="bf16",
                          use_pallas=True, shared_backbone=True,
                          fastpath_plain=True),
    # fast path + mono-folded stem (stem measured 4.19 ms @C=3 vs 1.72 @C=1)
    "fastpath-mono": dict(batch=128, heads=6, input_size=512, dtype="bf16",
                          use_pallas=True, shared_backbone=True,
                          fastpath_plain=True, mono=True),
    "fastpath-mono-fast": dict(batch=128, heads=6, input_size=256, dtype="bf16",
                               use_pallas=True, shared_backbone=True,
                               fastpath_plain=True, mono=True),
    # fast path + s2d-folded stem (the composite's worst stage: 6.18 ms of
    # 21.2 at ~25 TF/s, stage_decomp.py) — 'h' = 1.14x FLOPs @2C lanes,
    # 'full' = 1.31x @4C
    "s2dstem-h": dict(batch=128, heads=6, input_size=512, dtype="bf16",
                      use_pallas=True, shared_backbone=True,
                      fastpath_plain=True, s2d_stem="h"),
    "s2dstem-full": dict(batch=128, heads=6, input_size=512, dtype="bf16",
                         use_pallas=True, shared_backbone=True,
                         fastpath_plain=True, s2d_stem="full"),
    # front end only at 256² (front-end share of the fast mode)
    "melonly-fast": dict(batch=128, heads=1, input_size=256, dtype="bf16",
                         use_pallas=True, shared_backbone=True, melonly=True),
    # s2d + 256² fast mode
    "s2d-fast": dict(batch=128, heads=6, input_size=256, dtype="bf16",
                     use_pallas=True, shared_backbone=True, s2d=True),
    # per-clip latency config: small batch, fidelity input
    "latency": dict(batch=8, heads=6, input_size=512, dtype="bf16",
                    use_pallas=True, shared_backbone=True),
    # latency + s2d layer1 (the serving auto-gate's choice for buckets <= 32)
    "latency-s2d": dict(batch=8, heads=6, input_size=512, dtype="bf16",
                        use_pallas=True, shared_backbone=True, s2d=True),
    # front end only (mel + resize, no model) — decomposition ablation
    "melonly": dict(batch=128, heads=1, input_size=512, dtype="bf16",
                    use_pallas=True, shared_backbone=True, melonly=True),
    # NATIVE mel resolution (input_size 0): the 128x251 mel padded to
    # 128x256, NO resize — the resolution the 512/256 modes interpolate from
    # (docs/PERFORMANCE.md native study)
    "native": dict(batch=128, heads=6, input_size=0, dtype="bf16",
                   use_pallas=True, shared_backbone=True),
    "native-b256": dict(batch=256, heads=6, input_size=0, dtype="bf16",
                        use_pallas=True, shared_backbone=True),
    "native-b512": dict(batch=512, heads=6, input_size=0, dtype="bf16",
                        use_pallas=True, shared_backbone=True),
    "native-b1024": dict(batch=1024, heads=6, input_size=0, dtype="bf16",
                         use_pallas=True, shared_backbone=True),
    "fastpath-native": dict(batch=128, heads=6, input_size=0, dtype="bf16",
                            use_pallas=True, shared_backbone=True,
                            fastpath_plain=True),
    "fastpath-native-b256": dict(batch=256, heads=6, input_size=0,
                                 dtype="bf16", use_pallas=True,
                                 shared_backbone=True, fastpath_plain=True),
    "fastpath-native-b512": dict(batch=512, heads=6, input_size=0,
                                 dtype="bf16", use_pallas=True,
                                 shared_backbone=True, fastpath_plain=True),
    "melonly-native": dict(batch=128, heads=1, input_size=0, dtype="bf16",
                           use_pallas=True, shared_backbone=True,
                           melonly=True),
    "latency-native": dict(batch=8, heads=6, input_size=0, dtype="bf16",
                           use_pallas=True, shared_backbone=True),
    "mono-native": dict(batch=128, heads=6, input_size=0, dtype="bf16",
                        use_pallas=True, shared_backbone=True, mono=True),
    # trunk-shared serving (the joint trainer's per_head_stages=1 artifact:
    # shared trunk once + 6 vmapped per-head layer4 tails, multihead.py)
    "trunk1-native": dict(batch=128, heads=6, input_size=0, dtype="bf16",
                          use_pallas=True, shared_backbone=False,
                          trunk_stages=1),
    "trunk1": dict(batch=128, heads=6, input_size=512, dtype="bf16",
                   use_pallas=True, shared_backbone=False, trunk_stages=1),
    # fully dense 6 backbones at native (what trunk sharing saves from)
    "dense-native": dict(batch=128, heads=6, input_size=0, dtype="bf16",
                         use_pallas=True, shared_backbone=False),
    "fastpath-mono-native": dict(batch=128, heads=6, input_size=0,
                                 dtype="bf16", use_pallas=True,
                                 shared_backbone=True, fastpath_plain=True,
                                 mono=True),
    # XLA FFT front end A/B (never measured on chip before round 3: the
    # GEMM-DFT was chosen by design; at native the front end is 45% of the
    # batch, so if the TPU FFT op is any good this is the top lever)
    "melonly-native-fft": dict(batch=128, heads=1, input_size=0,
                               dtype="bf16", use_pallas=False,
                               shared_backbone=True, melonly=True,
                               gemm_dft=False),
    "melonly-native-gemm": dict(batch=128, heads=1, input_size=0,
                                dtype="bf16", use_pallas=False,
                                shared_backbone=True, melonly=True,
                                gemm_dft=True),
    "native-fft": dict(batch=128, heads=6, input_size=0, dtype="bf16",
                       use_pallas=False, shared_backbone=True,
                       gemm_dft=False),
    "int8-native": dict(batch=128, heads=6, input_size=0, dtype="bf16",
                        use_pallas=True, shared_backbone=True, int8=True),
    # windows-per-grid-cell A/B on the fused mel kernel (front end = 46% of
    # the native batch; fewer grid steps, same matmul shapes)
    # s2d layer1 at native (composite test; micro screen unresolvable)
    "fastpath-s2d-native": dict(batch=128, heads=6, input_size=0,
                                dtype="bf16", use_pallas=True,
                                shared_backbone=True, fastpath_plain=True,
                                mono=True, s2d=True),
    "melwpc2": dict(batch=128, heads=1, input_size=0, dtype="bf16",
                    use_pallas=True, shared_backbone=True, melonly=True,
                    mel_wpc=2),
    "melwpc4": dict(batch=128, heads=1, input_size=0, dtype="bf16",
                    use_pallas=True, shared_backbone=True, melonly=True,
                    mel_wpc=4),
    "melwpc8": dict(batch=128, heads=1, input_size=0, dtype="bf16",
                    use_pallas=True, shared_backbone=True, melonly=True,
                    mel_wpc=8),
    # M-stacked strips: all wpc windows in ONE [wpc*256, 512] matmul per
    # strip (pad+add assembly) — k dots/cell instead of wpc*k, 2x/4x M
    "melstack2": dict(batch=128, heads=1, input_size=0, dtype="bf16",
                      use_pallas=True, shared_backbone=True, melonly=True,
                      mel_wpc=2, mel_stack=True),
    "melstack4": dict(batch=128, heads=1, input_size=0, dtype="bf16",
                      use_pallas=True, shared_backbone=True, melonly=True,
                      mel_wpc=4, mel_stack=True),
    # factored (shared hop-block) DFT kernel: one [264,512]x[512,1792] dot
    # per window (4x fewer DFT MACs than the strip kernel), frames assembled
    # by {0,±1} phase masks + lane-roll Hann conv (VPU)
    "melfct1": dict(batch=128, heads=1, input_size=0, dtype="bf16",
                    use_pallas=True, shared_backbone=True, melonly=True,
                    mel_factored=True, mel_wpc=1),
    "melfct2": dict(batch=128, heads=1, input_size=0, dtype="bf16",
                    use_pallas=True, shared_backbone=True, melonly=True,
                    mel_factored=True, mel_wpc=2),
    "melfct4": dict(batch=128, heads=1, input_size=0, dtype="bf16",
                    use_pallas=True, shared_backbone=True, melonly=True,
                    mel_factored=True, mel_wpc=4),
    "melfct8": dict(batch=128, heads=1, input_size=0, dtype="bf16",
                    use_pallas=True, shared_backbone=True, melonly=True,
                    mel_factored=True, mel_wpc=8),
    # low-precision tail: bf16 power→mel matmul (one MXU pass vs f32's
    # bf16x3) + bf16 output write
    "melfct4-lowp": dict(batch=128, heads=1, input_size=0, dtype="bf16",
                         use_pallas=True, shared_backbone=True, melonly=True,
                         mel_factored=True, mel_wpc=4, mel_lowp=True),
    # round-5 assembly-cost variants (the 0.77 ms vs ~0.3 ms matmul-bound
    # gap is VPU elementwise passes — docs/PERFORMANCE.md native ceiling):
    # bf16 assembly halves the per-pass lane cost; stack_dft fuses the wpc
    # per-window DFT matmuls into one wide-M matmul per grid cell
    "melfct4-bf16asm": dict(batch=128, heads=1, input_size=0, dtype="bf16",
                            use_pallas=True, shared_backbone=True,
                            melonly=True, mel_factored=True, mel_wpc=4,
                            mel_bf16asm=True),
    "melfct4-stackdft": dict(batch=128, heads=1, input_size=0, dtype="bf16",
                             use_pallas=True, shared_backbone=True,
                             melonly=True, mel_factored=True, mel_wpc=4,
                             mel_stackdft=True),
    # wpc=4 stacking overflows scoped VMEM (y_all [1016,1792] f32 ~7.3 MB
    # on top of the cell's working set — 23.4M vs the 16M limit, measured
    # HTTP 500); wpc=2 halves the stacked product
    "melfct2-stackdft": dict(batch=128, heads=1, input_size=0, dtype="bf16",
                             use_pallas=True, shared_backbone=True,
                             melonly=True, mel_factored=True, mel_wpc=2,
                             mel_stackdft=True),
    "melfct2-asm-stack": dict(batch=128, heads=1, input_size=0, dtype="bf16",
                              use_pallas=True, shared_backbone=True,
                              melonly=True, mel_factored=True, mel_wpc=2,
                              mel_bf16asm=True, mel_stackdft=True),
    "melfct4-asm-stack": dict(batch=128, heads=1, input_size=0, dtype="bf16",
                              use_pallas=True, shared_backbone=True,
                              melonly=True, mel_factored=True, mel_wpc=4,
                              mel_bf16asm=True, mel_stackdft=True),
    "melfct8-asm-stack": dict(batch=128, heads=1, input_size=0, dtype="bf16",
                              use_pallas=True, shared_backbone=True,
                              melonly=True, mel_factored=True, mel_wpc=8,
                              mel_bf16asm=True, mel_stackdft=True),
    "melfct4-asm-lowp": dict(batch=128, heads=1, input_size=0, dtype="bf16",
                             use_pallas=True, shared_backbone=True,
                             melonly=True, mel_factored=True, mel_wpc=4,
                             mel_bf16asm=True, mel_lowp=True),
    "fastpath-mono-native-lowp": dict(batch=128, heads=6, input_size=0,
                                      dtype="bf16", use_pallas=True,
                                      shared_backbone=True,
                                      fastpath_plain=True, mono=True,
                                      mel_lowp=True),
    # factored DFT through plain XLA (no Pallas) — fusion/HBM A/B
    "melonly-native-fct-jnp": dict(batch=128, heads=1, input_size=0,
                                   dtype="bf16", use_pallas=False,
                                   shared_backbone=True, melonly=True,
                                   dft_mode="factored"),
}


def int8_agreement(
    batch: int = 128, heads: int = 6, input_size: int = 512,
    backbone: str = "resnet18", use_pallas: bool = True,
) -> dict:
    """Accuracy contract for the int8 path ON THE RUNNING BACKEND: argmax
    agreement + worst logit deviation between the bf16 ensemble forward and
    the int8-PTQ forward on identical windows. (tests/test_quantized.py
    checks this on CPU; this checks it where serving actually runs.)"""
    import dataclasses as dc

    from __graft_entry__ import _flagship_ensemble
    from synthetic_audio_detection_tpu.infer.pipeline import _forward_windows
    from synthetic_audio_detection_tpu.models.quantized import (
        quantize_ensemble,
        quantized_ensemble_forward,
    )
    from synthetic_audio_detection_tpu.ops.pallas_melspec import serving_log_mel
    from synthetic_audio_detection_tpu.ops import melspec as M
    from synthetic_audio_detection_tpu.utils.config import SpectrogramConfig

    ens = _flagship_ensemble(n_heads=heads, backbone=backbone,
                             shared_backbone=True, dtype=jnp.bfloat16)
    spec = SpectrogramConfig(mel_norm="slaney", out_size=input_size)
    qens = quantize_ensemble(ens)

    fwd_bf16 = jax.jit(functools.partial(
        _forward_windows, ensemble=ens, spec_cfg=spec, sample_rate=32_000,
        use_gemm_dft=True, compute_dtype=jnp.bfloat16, use_pallas=use_pallas,
    ))

    def _fwd_int8(qvars, windows):
        if use_pallas:
            z = serving_log_mel(windows, spec, 32_000)
        else:
            z = M.standardize(M.amplitude_to_db(
                M.mel_spectrogram(windows, spec, 32_000, True), spec.top_db))
        feats = M.finalize_features(z, spec)
        x = jnp.broadcast_to(feats[..., None], (*feats.shape, 3))
        q = dc.replace(qens, qbackbone=qvars[0], head_variables=qvars[1])
        return quantized_ensemble_forward(q, x)

    fwd_int8 = jax.jit(_fwd_int8)

    rng = np.random.default_rng(7)
    windows = jnp.asarray(
        rng.standard_normal((batch, 128_000)).astype(np.float32) * 0.3
    )
    lb = np.asarray(fwd_bf16(ens.variables, windows), np.float32)
    li = np.asarray(
        fwd_int8((qens.qbackbone, qens.head_variables), windows), np.float32
    )
    agree = float(np.mean(lb.argmax(-1) == li.argmax(-1)))
    # sigmoid-space deviation is what the decision rule actually consumes
    pb, pi = 1 / (1 + np.exp(-lb)), 1 / (1 + np.exp(-li))
    return {
        "check": "int8_vs_bf16_agreement",
        "batch": batch,
        "input_size": input_size,
        "argmax_agreement": agree,
        "max_sigmoid_dev": float(np.max(np.abs(pb - pi))),
        "mean_sigmoid_dev": float(np.mean(np.abs(pb - pi))),
    }


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--configs", nargs="*", default=["default"],
                   choices=sorted(PRESETS))
    p.add_argument("--batch", type=int)
    p.add_argument("--heads", type=int)
    from synthetic_audio_detection_tpu.utils.config import parse_input_size
    p.add_argument("--input-size", type=parse_input_size)
    p.add_argument("--dtype", choices=["bf16", "f32"])
    p.add_argument("--no-pallas", action="store_true")
    p.add_argument("--backbone", type=str, default=None,
                   help="override the preset backbone (resnet18/34/50/...)")
    p.add_argument("--iters", type=int, default=11,
                   help="loop iterations for the N-vs-1 differencing; raise "
                   "for sub-ms configs near the tunnel's timing noise floor")
    p.add_argument("--agreement", action="store_true",
                   help="Also run the int8-vs-bf16 argmax agreement check")
    args = p.parse_args()

    from bench import _enable_compile_cache
    _enable_compile_cache()

    if args.agreement:
        print(json.dumps(int8_agreement(
            batch=args.batch or 128,
            input_size=512 if args.input_size is None else args.input_size,
            use_pallas=not args.no_pallas,
        )))

    for name in args.configs:
        cfg = dict(PRESETS[name])
        if args.batch:
            cfg["batch"] = args.batch
        if args.heads:
            cfg["heads"] = args.heads
        if args.input_size is not None:
            cfg["input_size"] = args.input_size
        if args.dtype:
            cfg["dtype"] = args.dtype
        if args.no_pallas:
            cfg["use_pallas"] = False
        if args.backbone:
            cfg["backbone"] = args.backbone
        result = bench_config(**cfg, iters=args.iters)
        print(json.dumps({"config": name, **result}))


if __name__ == "__main__":
    main()
