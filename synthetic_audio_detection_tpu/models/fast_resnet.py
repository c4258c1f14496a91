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
    return jax.nn.relu(y) if relu else y


def fast_backbone_apply(
    base_params: Dict[str, Any],
    base_stats: Dict[str, Any],
    x: jnp.ndarray,
    backbone: str = "resnet18",
    gemm_max_channels: int = 0,
    dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """[B, H, W, C] → un-pooled feature map (eval mode)."""
    block, stages = RESNET_SPECS[backbone]
    y = _conv_bn(x, base_params["conv1"], base_params["bn1"],
                 base_stats["bn1"], 2, True, gemm_max_channels, dtype)
    y = jax.lax.reduce_window(
        y, -jnp.inf, jax.lax.max,
        window_dimensions=(1, 3, 3, 1),
        window_strides=(1, 2, 2, 1),
        padding=((0, 0), (1, 1), (1, 1), (0, 0)),
    )
    n_convs = 2 if block == "basic" else 3
    for stage_idx, n_blocks in enumerate(stages):
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


def fast_ensemble_forward(ens, x: jnp.ndarray) -> jnp.ndarray:
    """Shared-backbone ensemble forward through the fast backbone.
    x: [B, H, W, C] → [B, N+1] logits (matches ensemble_forward numerics in
    bf16)."""
    from synthetic_audio_detection_tpu.ensemble.multihead import _aggregate
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
        base_params, base_stats, x, ens.model.backbone, dtype=ens.model.dtype
        if ens.model.dtype != jnp.float32 else jnp.bfloat16,
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

    logits_nh = jax.vmap(head_fwd, in_axes=(0, None))(head_vars, feats)
    return _aggregate(logits_nh)
