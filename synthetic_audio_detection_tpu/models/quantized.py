"""Int8 post-training quantization for the ResNet backbone (serving fast path).

v5e's MXU runs int8 at ~2x the bf16 rate; the backbone is >99% of ensemble
FLOPs (the MLP heads are negligible), so int8 convs are the single biggest
speed lever after the fidelity flag. Scheme (standard PTQ):

- weights: per-output-channel symmetric int8 (scale = max|w|/127 per channel),
  with eval-mode BatchNorm folded into a per-channel affine (alpha, beta)
  applied to the int32 accumulator — BN disappears as an op;
- activations: dynamic per-tensor symmetric int8 (scale from the live max) —
  no calibration dataset needed, robust across inputs;
- accumulation: int32 on the MXU (preferred_element_type), then
  out = acc * (s_x * s_w * alpha) + beta, ReLU in float.

The quantized forward is a functional interpreter over the SAME parameter
tree layout the Flax ResNet produces (conv1/bn1/layer{i}_{j}/...), so any
imported or trained checkpoint quantizes without re-export. Accuracy contract
is checked in tests/test_quantized.py: argmax agreement and logit correlation
vs the float path.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from synthetic_audio_detection_tpu.models.resnet import BN_EPS, RESNET_SPECS


# ---------------------------------------------------------------------------
# Quantization transform (host-side, once per checkpoint)
# ---------------------------------------------------------------------------

def _fold_bn(bn_params: Dict, bn_stats: Dict) -> Tuple[np.ndarray, np.ndarray]:
    """BN(scale,bias,mean,var) → per-channel (alpha, beta): y = alpha*x + beta."""
    scale = np.asarray(bn_params["scale"], np.float64)
    bias = np.asarray(bn_params["bias"], np.float64)
    mean = np.asarray(bn_stats["mean"], np.float64)
    var = np.asarray(bn_stats["var"], np.float64)
    alpha = scale / np.sqrt(var + BN_EPS)
    beta = bias - mean * alpha
    return alpha.astype(np.float32), beta.astype(np.float32)


def _quant_weight(kernel: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """[kh,kw,ci,co] float → (int8 kernel, per-co scale)."""
    k = np.asarray(kernel, np.float32)
    s = np.max(np.abs(k), axis=(0, 1, 2)) / 127.0
    s = np.maximum(s, 1e-12)
    q = np.clip(np.round(k / s), -127, 127).astype(np.int8)
    return q, s.astype(np.float32)


def _quant_conv_bn(conv: Dict, bn_params: Dict, bn_stats: Dict) -> Dict:
    q, s_w = _quant_weight(conv["kernel"])
    alpha, beta = _fold_bn(bn_params, bn_stats)
    return {
        "kernel_q": q,
        # conv-out channel scale folded with BN alpha: one multiply total
        "out_scale": (s_w * alpha).astype(np.float32),
        "bias": beta,
    }


def quantize_backbone(base_params: Dict, base_stats: Dict, backbone: str) -> Dict:
    """Flax ResNet base params/stats → quantized parameter tree."""
    block, stages = RESNET_SPECS[backbone]
    out: Dict[str, Any] = {
        "stem": _quant_conv_bn(
            base_params["conv1"], base_params["bn1"], base_stats["bn1"]
        ),
        "layers": [],
    }
    n_convs = 2 if block == "basic" else 3
    for stage_idx, n_blocks in enumerate(stages):
        for b in range(n_blocks):
            mod = f"layer{stage_idx + 1}_{b}"
            p, st = base_params[mod], base_stats[mod]
            entry = {
                "convs": [
                    _quant_conv_bn(p[f"conv{i+1}"], p[f"bn{i+1}"], st[f"bn{i+1}"])
                    for i in range(n_convs)
                ],
            }
            if "downsample_0" in p:
                entry["downsample"] = _quant_conv_bn(
                    p["downsample_0"], p["downsample_1"], st["downsample_1"]
                )
            out["layers"].append(entry)
    return jax.tree_util.tree_map(
        lambda x: jnp.asarray(x) if isinstance(x, np.ndarray) else x, out
    )


# ---------------------------------------------------------------------------
# Quantized forward (jitted)
# ---------------------------------------------------------------------------

def _quant_act(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Dynamic per-tensor symmetric int8."""
    s = jnp.maximum(jnp.max(jnp.abs(x)), 1e-12) / 127.0
    q = jnp.clip(jnp.round(x / s), -127, 127).astype(jnp.int8)
    return q, s


def _qconv(x: jnp.ndarray, qc: Dict, stride: int, relu: bool) -> jnp.ndarray:
    """int8 conv + folded BN affine (+ optional ReLU) → float32/bf16."""
    xq, s_x = _quant_act(x)
    kh = qc["kernel_q"].shape[0]
    pad = (kh - 1) // 2
    acc = jax.lax.conv_general_dilated(
        xq,
        qc["kernel_q"],
        window_strides=(stride, stride),
        padding=[(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * (s_x * qc["out_scale"])[None, None, None, :]
    y = y + qc["bias"][None, None, None, :]
    return jax.nn.relu(y) if relu else y


def quantized_backbone_apply(
    qtree: Dict, x: jnp.ndarray, backbone: str = "resnet18"
) -> jnp.ndarray:
    """[B,H,W,C] → un-pooled features, int8 convs throughout. `backbone` is
    static (strings cannot ride a traced pytree)."""
    block, stages = RESNET_SPECS[backbone]
    y = _qconv(x.astype(jnp.float32), qtree["stem"], 2, relu=True)
    y = jax.lax.reduce_window(
        y, -jnp.inf, jax.lax.max,
        window_dimensions=(1, 3, 3, 1),
        window_strides=(1, 2, 2, 1),
        padding=((0, 0), (1, 1), (1, 1), (0, 0)),
    )
    li = 0
    for stage_idx, n_blocks in enumerate(stages):
        stride = 1 if stage_idx == 0 else 2
        for b in range(n_blocks):
            s = stride if b == 0 else 1
            entry = qtree["layers"][li]
            li += 1
            identity = y
            if block == "basic":
                out = _qconv(y, entry["convs"][0], s, relu=True)
                out = _qconv(out, entry["convs"][1], 1, relu=False)
            else:
                out = _qconv(y, entry["convs"][0], 1, relu=True)
                out = _qconv(out, entry["convs"][1], s, relu=True)
                out = _qconv(out, entry["convs"][2], 1, relu=False)
            if "downsample" in entry:
                identity = _qconv(y, entry["downsample"], s, relu=False)
            y = jax.nn.relu(out + identity)
    return y


# ---------------------------------------------------------------------------
# Quantized ensemble
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class QuantizedEnsemble:
    """Shared-backbone ensemble with an int8 backbone and float heads.

    Built from a MultiHeadEnsemble whose backbones are shared (the
    reference-merged layout) — the dominant serving configuration."""

    qbackbone: Dict                 # arrays only (jit-traceable)
    head_variables: Dict            # stacked [N, ...] head params/stats
    class_names: List[str]
    backbone: str = "resnet18"      # static topology key
    head_dtype: Any = jnp.float32

    @property
    def num_heads(self) -> int:
        return len(self.class_names) - 1


def quantize_ensemble(ens) -> QuantizedEnsemble:
    from synthetic_audio_detection_tpu.ensemble.multihead import MultiHeadEnsemble

    assert isinstance(ens, MultiHeadEnsemble)
    if not ens.shared_backbone:
        raise ValueError(
            "quantize_ensemble requires a shared-backbone ensemble "
            "(reference-merged layout); dense ensembles: quantize per head")
    base_params = jax.tree_util.tree_map(
        lambda a: np.asarray(a[0]), ens.variables["params"]["base"]
    )
    base_stats = jax.tree_util.tree_map(
        lambda a: np.asarray(a[0]), ens.variables["batch_stats"]["base"]
    )
    qb = quantize_backbone(base_params, base_stats, ens.model.backbone)
    heads = {
        "params": ens.variables["params"]["head"],
        "batch_stats": ens.variables["batch_stats"]["head"],
    }
    return QuantizedEnsemble(qb, heads, list(ens.class_names),
                             backbone=ens.model.backbone,
                             head_dtype=ens.model.dtype)


def quantized_ensemble_forward(qens: QuantizedEnsemble, x: jnp.ndarray) -> jnp.ndarray:
    """[B,H,W,C] → [B, N+1] ensemble logits (int8 backbone, vmapped heads)."""
    from synthetic_audio_detection_tpu.ensemble.multihead import _aggregate
    from synthetic_audio_detection_tpu.models.head import BinaryHead

    feats = quantized_backbone_apply(qens.qbackbone, x, qens.backbone)
    head = BinaryHead(dtype=qens.head_dtype)

    def head_fwd(hv, f):
        return head.apply(
            {"params": hv["params"], "batch_stats": hv["batch_stats"]},
            f, train=False,
        )

    logits_nh = jax.vmap(head_fwd, in_axes=(0, None))(qens.head_variables, feats)
    return _aggregate(logits_nh)
