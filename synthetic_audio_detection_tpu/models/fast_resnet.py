"""Eval-mode functional ResNet forward with pluggable conv implementations
(the integration scaffold for custom serving kernels).

Eval-mode BatchNorm folds to a per-channel affine; 3×3 convs whose channel
width is ≤ ``gemm_max_channels`` route through an alternative implementation
(currently ops.fast_conv.conv3x3_gemm — a measured NEGATIVE result on TPU,
see its docstring — so the default is gemm_max_channels=0, i.e. pure
lax.conv). When the Pallas direct conv (ops/pallas_conv.py) unblocks on a
native runtime, swapping it into ``_conv`` is the intended use of this
scaffold: layer1 runs at 25-31 TF/s through lax.conv vs near-peak elsewhere
(benchmarks/conv_ab.py), the single biggest full-fidelity throughput lever.

Like models.quantized, this is a functional interpreter over the standard
Flax parameter tree — any imported/trained checkpoint works unchanged.
Numerics match the Flax model in bf16 (tests/test_fast_resnet.py).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from synthetic_audio_detection_tpu.models.resnet import BN_EPS, RESNET_SPECS
from synthetic_audio_detection_tpu.ops.fast_conv import conv3x3_gemm


def _bn_affine(bn_p: Dict, bn_s: Dict):
    alpha = bn_p["scale"] / jnp.sqrt(bn_s["var"] + BN_EPS)
    beta = bn_p["bias"] - bn_s["mean"] * alpha
    return alpha, beta


def _conv(x, kernel, stride, gemm_max_channels, dtype):
    kh, kw, cin, cout = kernel.shape
    if kh == 3 and kw == 3 and cin <= gemm_max_channels:
        return conv3x3_gemm(x, kernel, stride, precision_dtype=dtype)
    pad = (kh - 1) // 2
    return jax.lax.conv_general_dilated(
        x.astype(dtype), kernel.astype(dtype),
        window_strides=(stride, stride),
        padding=[(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )


def _conv_bn(x, p, bn_p, bn_s, stride, relu, gemm_max_channels, dtype):
    y = _conv(x, p["kernel"], stride, gemm_max_channels, dtype)
    alpha, beta = _bn_affine(bn_p, bn_s)
    y = y * alpha[None, None, None, :] + beta[None, None, None, :]
    y = jax.nn.relu(y) if relu else y
    # cast down in the conv epilogue: activations in HBM stay in the compute
    # dtype (f32 residents double the layer1 bandwidth bill otherwise)
    return y.astype(dtype)


def _s2d_conv_bn(x_s2d, p, bn_p, bn_s, relu, dtype, mode="h"):
    """Stride-1 3x3 conv + BN affine + optional ReLU, entirely in s2d space:
    the [3,3,C,F] kernel folds (traceably) into s2d form and the per-channel
    affine tiles across the phases. Exact vs the direct conv.

    Measured at the layer1 shape [32,128,128,64] on v5e (benchmarks/conv_ab.py):
    mode='h'   H-only fold [3,3,2C,2F] (2x FLOPs):  53.1 TF/s effective — WINNER
    mode='3x3' full fold [3,3,4C,4F]   (4x FLOPs):  33.0
    mode='merged' [2,2,4C,4F]+slicing (1.83x):      23.2 (slices round-trip HBM)
    lax.conv baseline:                               29.7
    At the 256²-input shape [*,64,64,64] lax wins (72.5 vs 45.0) — callers
    gate on spatial size (fast_backbone_apply: H >= 128)."""
    from synthetic_audio_detection_tpu.ops.space_to_depth import (
        conv3x3_s2d,
        conv3x3_s2d_h,
        conv3x3_s2d_merged,
        fold_conv3x3_s2d_h,
        fold_conv3x3_s2d_merged_traced,
        fold_conv3x3_s2d_traced,
    )

    if mode == "h":
        wf = fold_conv3x3_s2d_h(p["kernel"].astype(dtype))
        y = conv3x3_s2d_h(x_s2d.astype(dtype), wf,
                          preferred_element_type=jnp.float32)
        reps = 2
    elif mode == "merged":
        wf = fold_conv3x3_s2d_merged_traced(p["kernel"].astype(dtype))
        y = conv3x3_s2d_merged(x_s2d.astype(dtype), wf,
                               preferred_element_type=jnp.float32)
        reps = 4
    else:
        wf = fold_conv3x3_s2d_traced(p["kernel"].astype(dtype))
        y = conv3x3_s2d(x_s2d.astype(dtype), wf,
                        preferred_element_type=jnp.float32)
        reps = 4
    alpha, beta = _bn_affine(bn_p, bn_s)
    alpha4, beta4 = jnp.tile(alpha, reps), jnp.tile(beta, reps)
    y = y * alpha4[None, None, None, :] + beta4[None, None, None, :]
    y = jax.nn.relu(y) if relu else y
    return y.astype(dtype)  # keep HBM residents in the compute dtype


def fast_backbone_apply(
    base_params: Dict[str, Any],
    base_stats: Dict[str, Any],
    x: jnp.ndarray,
    backbone: str = "resnet18",
    gemm_max_channels: int = 0,
    dtype=jnp.bfloat16,
    s2d_layer1: bool = False,
    s2d_stem: str = "",
    s2d_min_h: int = 128,
) -> jnp.ndarray:
    """[B, H, W, C] → un-pooled feature map (eval mode).

    s2d_layer1=True runs the stride-1 basic-block stage 1 (the 25-31 TF/s
    layer1 frontier, NOTES.md) in space-to-depth form: [B,128,128,64] →
    [B,64,64,256] with exactly-folded kernels — 4x nominal FLOPs at MXU-
    friendly channel width. Residual adds/ReLU/BN commute with the
    rearrangement, so the whole stage stays in s2d space with one
    depth_to_space at the end. Basic-block backbones only.

    s2d_stem ('h' | 'full') folds the 7x7/2 stem conv onto an s2d input
    (exact; ops/space_to_depth.py stem section) — the composite's worst
    stage at 512² (6.18 ms of 21.2, ~25 TF/s, benchmarks/stage_decomp.py):
    'h' = [4,7,2C,F] at 1.14x FLOPs, 'full' = [4,4,4C,F] at 1.31x."""
    block, stages = RESNET_SPECS[backbone]
    if s2d_stem in ("h", "full") and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0:
        from synthetic_audio_detection_tpu.ops.space_to_depth import (
            conv7x7s2_s2d,
            conv7x7s2_s2d_h,
            fold_conv7x7s2_s2d,
            fold_conv7x7s2_s2d_h,
            space_to_depth,
            space_to_depth_h,
        )

        k = base_params["conv1"]["kernel"].astype(dtype)
        if s2d_stem == "h":
            y = conv7x7s2_s2d_h(space_to_depth_h(x.astype(dtype)),
                                fold_conv7x7s2_s2d_h(k),
                                preferred_element_type=jnp.float32)
        else:
            y = conv7x7s2_s2d(space_to_depth(x.astype(dtype)),
                              fold_conv7x7s2_s2d(k),
                              preferred_element_type=jnp.float32)
        alpha, beta = _bn_affine(base_params["bn1"], base_stats["bn1"])
        y = jax.nn.relu(
            y * alpha[None, None, None, :] + beta[None, None, None, :]
        ).astype(dtype)
    else:
        y = _conv_bn(x, base_params["conv1"], base_params["bn1"],
                     base_stats["bn1"], 2, True, gemm_max_channels, dtype)
    y = jax.lax.reduce_window(
        y, -jnp.inf, jax.lax.max,
        window_dimensions=(1, 3, 3, 1),
        window_strides=(1, 2, 2, 1),
        padding=((0, 0), (1, 1), (1, 1), (0, 0)),
    )
    # default min spatial 128 = the measured-positive regime at 512² inputs;
    # s2d_min_h lets experiments engage the fold at smaller shapes (e.g. the
    # native mode's 32-row stage 1) where the micro screen is unresolvable
    use_s2d = (
        s2d_layer1 and block == "basic"
        and y.shape[1] >= s2d_min_h and y.shape[1] % 2 == 0
    )
    if use_s2d:
        from synthetic_audio_detection_tpu.ops.space_to_depth import (
            depth_to_space_h,
            space_to_depth_h,
        )

        ys = space_to_depth_h(y)
        for b in range(stages[0]):
            p, st = base_params[f"layer1_{b}"], base_stats[f"layer1_{b}"]
            identity = ys
            out = _s2d_conv_bn(ys, p["conv1"], p["bn1"], st["bn1"], True, dtype)
            out = _s2d_conv_bn(out, p["conv2"], p["bn2"], st["bn2"], False, dtype)
            ys = jax.nn.relu(out + identity)
        y = depth_to_space_h(ys)
    n_convs = 2 if block == "basic" else 3
    for stage_idx, n_blocks in enumerate(stages):
        if stage_idx == 0 and use_s2d:
            continue
        stride = 1 if stage_idx == 0 else 2
        for b in range(n_blocks):
            s = stride if b == 0 else 1
            mod = f"layer{stage_idx + 1}_{b}"
            p, st = base_params[mod], base_stats[mod]
            identity = y
            if block == "basic":
                out = _conv_bn(y, p["conv1"], p["bn1"], st["bn1"], s, True,
                               gemm_max_channels, dtype)
                out = _conv_bn(out, p["conv2"], p["bn2"], st["bn2"], 1, False,
                               gemm_max_channels, dtype)
            else:
                out = _conv_bn(y, p["conv1"], p["bn1"], st["bn1"], 1, True,
                               gemm_max_channels, dtype)
                out = _conv_bn(out, p["conv2"], p["bn2"], st["bn2"], s, True,
                               gemm_max_channels, dtype)
                out = _conv_bn(out, p["conv3"], p["bn3"], st["bn3"], 1, False,
                               gemm_max_channels, dtype)
            if "downsample_0" in p:
                identity = _conv_bn(
                    y, p["downsample_0"], p["downsample_1"],
                    st["downsample_1"], s, False, gemm_max_channels, dtype,
                )
            y = jax.nn.relu(out + identity)
    return y


def fast_ensemble_per_head_logits(ens, x: jnp.ndarray,
                                  s2d_layer1: bool = False,
                                  s2d_stem: str = "",
                                  s2d_min_h: int = 128) -> jnp.ndarray:
    """Shared-backbone ensemble through the fast backbone, PRE-aggregation.
    x: [B, H, W, C] → per-head logits [N, B, 2] (matches
    ensemble_per_head_logits numerics in bf16). s2d_layer1 routes stage 1
    through the space-to-depth folding."""
    from synthetic_audio_detection_tpu.models.head import BinaryHead

    if not ens.shared_backbone:
        raise ValueError("fast_ensemble_forward requires shared backbones")
    base_params = jax.tree_util.tree_map(
        lambda a: a[0], ens.variables["params"]["base"]
    )
    base_stats = jax.tree_util.tree_map(
        lambda a: a[0], ens.variables["batch_stats"]["base"]
    )
    feats = fast_backbone_apply(
        base_params, base_stats, x, ens.model.backbone,
        dtype=ens.model.dtype,  # honor the model's compute dtype verbatim
        s2d_layer1=s2d_layer1,
        s2d_stem=s2d_stem,
        s2d_min_h=s2d_min_h,
    )
    head = BinaryHead(dtype=ens.model.dtype)
    head_vars = {
        "params": ens.variables["params"]["head"],
        "batch_stats": ens.variables["batch_stats"]["head"],
    }

    def head_fwd(hv, f):
        return head.apply(
            {"params": hv["params"], "batch_stats": hv["batch_stats"]},
            f, train=False,
        )

    return jax.vmap(head_fwd, in_axes=(0, None))(head_vars, feats)


def fast_ensemble_forward(ens, x: jnp.ndarray,
                          s2d_layer1: bool = False,
                          s2d_stem: str = "",
                          s2d_min_h: int = 128) -> jnp.ndarray:
    """[B, H, W, C] → [B, N+1] aggregated ensemble logits (the serving
    surface; aggregation rule model_merger.py:75-91)."""
    from synthetic_audio_detection_tpu.ensemble.multihead import _aggregate

    return _aggregate(fast_ensemble_per_head_logits(
        ens, x, s2d_layer1, s2d_stem, s2d_min_h))
