"""Flax ResNet-18/34/50/101/152 backbones (torchvision/timm v1.5 topology).

The reference's sub-models wrap `timm.create_model('resnet<N>', num_classes=0)`
(reference: model_merger.py:24, submodel_trainer.py:606) — standard ResNets:
7x7/2 stem, 3x3/2 max-pool, four stages of Basic/Bottleneck blocks with the
stride on the 3x3 conv (v1.5). This implementation is NHWC (TPU-native conv
layout) with module names mirroring the torch parameter key space (`conv1`,
`bn1`, `layer1.0.conv2`, `downsample.0` ...) so the torch ``.pth`` importer in
checkpoints.torch_compat is a mechanical layout transpose.

`forward_features` semantics match timm: the result is the un-pooled feature
map (for 512x512 input: [B, 16, 16, C]); the binary head (models.head)
consumes it exactly the way the reference's `BinaryClassifier.forward` does
(model_merger.py:38-40).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

# stage depths per variant: every timm `resnet*` name with the VANILLA
# topology (7x7 stem, identity/1x1-downsample residuals) that the reference's
# `--model-name` choices expose (submodel_trainer.py:51-52). Tweaked-stem
# variants (resnet10t/26d/50s/…) have a different key space and are rejected
# by name, matching argparse's choices error.
RESNET_SPECS = {
    "resnet18": ("basic", (2, 2, 2, 2)),
    "resnet26": ("bottleneck", (2, 2, 2, 2)),
    "resnet34": ("basic", (3, 4, 6, 3)),
    "resnet50": ("bottleneck", (3, 4, 6, 3)),
    "resnet101": ("bottleneck", (3, 4, 23, 3)),
    "resnet152": ("bottleneck", (3, 8, 36, 3)),
    "resnet200": ("bottleneck", (3, 24, 36, 3)),
}

BN_EPS = 1e-5
BN_MOMENTUM = 0.9  # flax convention: new = m*old + (1-m)*batch  (torch 0.1)


def _conv(features: int, kernel: int, stride: int, name: str, dtype) -> nn.Conv:
    pad = (kernel - 1) // 2
    return nn.Conv(
        features,
        (kernel, kernel),
        strides=(stride, stride),
        padding=[(pad, pad), (pad, pad)],
        use_bias=False,
        dtype=dtype,
        name=name,
    )


def _bn(train: bool, name: str, dtype) -> nn.BatchNorm:
    return nn.BatchNorm(
        use_running_average=not train,
        momentum=BN_MOMENTUM,
        epsilon=BN_EPS,
        dtype=dtype,
        name=name,
    )


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        out = _conv(self.planes, 3, self.stride, "conv1", self.dtype)(x)
        out = _bn(train, "bn1", self.dtype)(out)
        out = nn.relu(out)
        out = _conv(self.planes, 3, 1, "conv2", self.dtype)(out)
        out = _bn(train, "bn2", self.dtype)(out)
        if self.downsample:
            identity = _conv(self.planes, 1, self.stride, "downsample_0", self.dtype)(x)
            identity = _bn(train, "downsample_1", self.dtype)(identity)
        return nn.relu(out + identity)


class _S2DConv3x3(nn.Module):
    """Stride-1 3x3 conv evaluated in H-only space-to-depth form. The
    parameter is the ORIGINAL [3, 3, C, F] kernel (same name/shape/init as
    nn.Conv — checkpoints are interchangeable); it folds traceably to
    [3, 3, 2C, 2F] inside the program, so gradients flow to the original
    kernel and the reformulation is exact in both eval and train mode.
    Measured 53.1 vs 29.7 TF/s effective at the layer1@512² shape
    (benchmarks/conv_ab.py --variants s2dh)."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x_s2dh):
        from synthetic_audio_detection_tpu.ops.space_to_depth import (
            conv3x3_s2d_h,
            fold_conv3x3_s2d_h,
        )

        c = x_s2dh.shape[-1] // 2
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (3, 3, c, self.features),
        )
        wf = fold_conv3x3_s2d_h(kernel.astype(self.dtype))
        # Emit in the compute dtype, exactly like nn.Conv (the MXU still
        # accumulates bf16 matmuls in f32 internally). Forcing a wider
        # preferred_element_type here materializes f32 activations in HBM —
        # measured as a 2x layer1 slowdown in the composite serving program.
        return conv3x3_s2d_h(x_s2dh.astype(self.dtype), wf,
                             preferred_element_type=None)


class S2DBasicBlock(nn.Module):
    """BasicBlock evaluated in H-only s2d space (stride 1, no downsample —
    the resnet18/34 stage-1 configuration). BatchNorm reduces over the phase
    axis as well (reshape to [..., 2, C]), which is EXACTLY the original
    per-channel statistic: s2d phases are just relocated rows. Param tree is
    identical to BasicBlock's."""

    planes: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x_s2dh, train: bool = False):
        def bn(y, name):
            b, h, w, c2 = y.shape
            y5 = y.reshape(b, h, w, 2, c2 // 2)
            y5 = _bn(train, name, self.dtype)(y5)
            return y5.reshape(b, h, w, c2)

        identity = x_s2dh
        out = _S2DConv3x3(self.planes, self.dtype, name="conv1")(x_s2dh)
        out = nn.relu(bn(out, "bn1"))
        out = _S2DConv3x3(self.planes, self.dtype, name="conv2")(out)
        out = bn(out, "bn2")
        return nn.relu(out + identity)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    expansion: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        out = _conv(self.planes, 1, 1, "conv1", self.dtype)(x)
        out = _bn(train, "bn1", self.dtype)(out)
        out = nn.relu(out)
        # v1.5: stride on the 3x3 (torchvision + timm default)
        out = _conv(self.planes, 3, self.stride, "conv2", self.dtype)(out)
        out = _bn(train, "bn2", self.dtype)(out)
        out = nn.relu(out)
        out = _conv(self.planes * self.expansion, 1, 1, "conv3", self.dtype)(out)
        out = _bn(train, "bn3", self.dtype)(out)
        if self.downsample:
            identity = _conv(
                self.planes * self.expansion, 1, self.stride, "downsample_0", self.dtype
            )(x)
            identity = _bn(train, "downsample_1", self.dtype)(identity)
        return nn.relu(out + identity)


class ResNet(nn.Module):
    """ResNet backbone, NHWC, returning un-pooled features (timm
    `forward_features` with num_classes=0)."""

    block: str  # "basic" | "bottleneck"
    stage_sizes: Sequence[int]
    in_channels: int = 3
    dtype: Any = jnp.float32
    # Run stage 1 in H-only space-to-depth form (exact; train + eval). Only
    # engages for basic blocks at stage-1 spatial >= 128 (512² inputs) where
    # it is the measured win; otherwise silently uses the standard blocks.
    s2d_stage1: bool = False
    # Freeze-boundary gradient stop: during train, stop_gradient the
    # activation entering stage N (1-based; 0 = off). With the reference
    # freeze schedule (everything below layer4 frozen, layer3 joining at
    # epochs//3 — submodel_trainer.py:609-633,687-691) the backward pass
    # through the frozen stages is pure waste: their grads are masked to
    # zero by the trainer anyway (train/steps.py freeze_mask). Stopping the
    # gradient at the boundary lets XLA DCE that whole backward subgraph —
    # identical updates (the pruned grads were exact zeros after masking)
    # and MORE robust (a non-finite frozen-layer grad can no longer poison
    # the global-norm clip through g*0=NaN).
    stop_grad_stage: int = 0
    # Stage slicing: run only stages [first_stage, last_stage] (1-based,
    # inclusive). The stem (conv1/bn1/maxpool) runs only when first_stage
    # is 1; last_stage None means "through the final stage". A sliced model
    # keeps the SAME parameter names as the corresponding subtree of the
    # full model (layer{k}_{b}.*), so a trunk (1..3) and a tail (4..4)
    # assemble into exactly the full backbone's checkpoint key space. Used
    # by the joint trainer's per-head-tail mode (train/joint.py).
    first_stage: int = 1
    last_stage: Optional[int] = None

    @property
    def num_features(self) -> int:
        last = len(self.stage_sizes) if self.last_stage is None else self.last_stage
        expansion = 1 if self.block == "basic" else 4
        return 64 * 2 ** (last - 1) * expansion

    @nn.compact
    def __call__(self, x, train: bool = False):
        # x: [B, H, W, C]
        x = x.astype(self.dtype)
        first = self.first_stage
        last = len(self.stage_sizes) if self.last_stage is None else self.last_stage
        if not 1 <= first <= last <= len(self.stage_sizes):
            raise ValueError(
                f"stage slice [{first}, {last}] out of range for "
                f"{len(self.stage_sizes)} stages"
            )
        if first == 1:
            x = _conv(64, 7, 2, "conv1", self.dtype)(x)
            x = _bn(train, "bn1", self.dtype)(x)
            x = nn.relu(x)
            x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        block_cls = BasicBlock if self.block == "basic" else Bottleneck
        expansion = 1 if self.block == "basic" else 4
        planes = 64 * 2 ** (first - 1)
        in_planes = 64 if first == 1 else 64 * 2 ** (first - 2) * expansion
        for stage_idx, n_blocks in enumerate(self.stage_sizes):
            if not first - 1 <= stage_idx <= last - 1:
                continue
            if train and self.stop_grad_stage == stage_idx + 1:
                x = jax.lax.stop_gradient(x)
            if (
                stage_idx == 0 and self.s2d_stage1 and self.block == "basic"
                and x.shape[1] >= 128 and x.shape[1] % 2 == 0
            ):
                from synthetic_audio_detection_tpu.ops.space_to_depth import (
                    depth_to_space_h,
                    space_to_depth_h,
                )

                xs = space_to_depth_h(x)
                for b in range(n_blocks):
                    xs = S2DBasicBlock(
                        planes=planes, dtype=self.dtype, name=f"layer1_{b}"
                    )(xs, train=train)
                x = depth_to_space_h(xs)
                in_planes = planes * expansion
                planes *= 2
                continue
            stride = 1 if stage_idx == 0 else 2
            for b in range(n_blocks):
                s = stride if b == 0 else 1
                needs_ds = s != 1 or in_planes != planes * expansion
                x = block_cls(
                    planes=planes,
                    stride=s,
                    downsample=needs_ds,
                    dtype=self.dtype,
                    name=f"layer{stage_idx + 1}_{b}",
                )(x, train=train)
                in_planes = planes * expansion
            planes *= 2
        return x  # [B, H/32, W/32, num_features]


def create_resnet(
    name: str,
    in_channels: int = 3,
    dtype: Any = jnp.float32,
    module_name: Optional[str] = None,
    s2d_stage1: bool = False,
    stop_grad_stage: int = 0,
    first_stage: int = 1,
    last_stage: Optional[int] = None,
) -> ResNet:
    if name not in RESNET_SPECS:
        raise ValueError(f"unknown backbone {name!r}; choose from {sorted(RESNET_SPECS)}")
    block, stages = RESNET_SPECS[name]
    return ResNet(
        block=block,
        stage_sizes=stages,
        in_channels=in_channels,
        dtype=dtype,
        name=module_name,
        s2d_stage1=s2d_stage1,
        stop_grad_stage=stop_grad_stage,
        first_stage=first_stage,
        last_stage=last_stage,
    )


def backbone_num_features(name: str) -> int:
    block, _ = RESNET_SPECS[name]
    return 512 if block == "basic" else 2048


def fold_rgb_conv(conv1_kernel: jnp.ndarray) -> jnp.ndarray:
    """Fold the reference's `spec.repeat(3,1,1)` channel triplication into the
    stem conv: since all three input channels carry identical data, summing
    conv1's kernel over its input-channel axis gives a 1-channel conv with a
    bit-identical output — 3x less input bandwidth on the hot path.
    kernel: [kh, kw, 3, O] → [kh, kw, 1, O]."""
    return conv1_kernel.sum(axis=2, keepdims=True)
