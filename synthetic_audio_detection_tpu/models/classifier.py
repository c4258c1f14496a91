"""Sub-model = backbone + binary head (reference `BinaryClassifier`,
model_merger.py:18-40). Output convention: index 0 = Real, index 1 = Synthetic
(authoritative per model_merger.py:81-85; SURVEY.md §2.2)."""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from synthetic_audio_detection_tpu.models.head import BinaryHead
from synthetic_audio_detection_tpu.models.resnet import create_resnet
from synthetic_audio_detection_tpu.utils.config import ModelConfig

REAL_INDEX = 0
SYNTHETIC_INDEX = 1


class BinaryClassifier(nn.Module):
    """forward: [B, H, W, C] NHWC spectrogram image → [B, num_outputs] logits.

    num_outputs=2 is the modular sub-model contract; the legacy 5-class model
    (legacy/source/train.py:566-578, head ends Linear(256, 5)) is the same
    topology with num_outputs=5."""

    backbone: str = "resnet18"
    in_channels: int = 3
    num_outputs: int = 2
    dtype: Any = jnp.float32
    # exact H-only space-to-depth stage 1 (models/resnet.py:S2DBasicBlock);
    # param tree unchanged, so checkpoints are interchangeable either way
    s2d_stage1: bool = False
    # train-time freeze-boundary gradient stop (models/resnet.py:ResNet
    # .stop_grad_stage): skip the backward pass through frozen stages
    stop_grad_stage: int = 0

    @nn.compact
    def __call__(self, x, train: bool = False):
        base = create_resnet(self.backbone, self.in_channels, self.dtype,
                             module_name="base", s2d_stage1=self.s2d_stage1,
                             stop_grad_stage=self.stop_grad_stage)
        feats = base(x, train=train)
        return BinaryHead(
            num_outputs=self.num_outputs, dtype=self.dtype, name="head"
        )(feats, train=train)


def build_classifier(cfg: ModelConfig, in_channels: int = 3) -> BinaryClassifier:
    dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
    return BinaryClassifier(backbone=cfg.backbone, in_channels=in_channels, dtype=dtype)


def init_classifier(model: BinaryClassifier, rng: jax.Array, input_size=512):
    """Initialize variables with a dummy batch; returns the variable dict
    {'params': ..., 'batch_stats': ...}. ``input_size`` is an int (square) or
    an (H, W) pair (native mel-resolution mode); parameter shapes are
    spatial-size-independent either way."""
    hw = (input_size, input_size) if isinstance(input_size, int) else tuple(input_size)
    dummy = jnp.zeros((1, *hw, model.in_channels), jnp.float32)
    return model.init({"params": rng}, dummy, train=False)
