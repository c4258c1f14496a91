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

    @property
    def num_features(self) -> int:
        return 512 if self.block == "basic" else 2048

    @nn.compact
    def __call__(self, x, train: bool = False):
        # x: [B, H, W, C]
        x = x.astype(self.dtype)
        x = _conv(64, 7, 2, "conv1", self.dtype)(x)
        x = _bn(train, "bn1", self.dtype)(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        block_cls = BasicBlock if self.block == "basic" else Bottleneck
        expansion = 1 if self.block == "basic" else 4
        planes = 64
        in_planes = 64
        for stage_idx, n_blocks in enumerate(self.stage_sizes):
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
