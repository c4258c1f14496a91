"""Binary-classifier head: pooled features → 2 logits [Real, Synthetic].

Topology mirrors the reference head exactly (model_merger.py:25-37):
AdaptiveAvgPool2d(1) → Flatten → Linear(F,512) → BN1d → ReLU → Dropout(0.5)
→ Linear(512,256) → BN1d → ReLU → Dropout(0.3) → Linear(256,2).

Module names track the torch Sequential indices (`fc1`↔head.2, `bn1`↔head.3,
`fc2`↔head.6, `bn2`↔head.7, `out`↔head.10) via checkpoints.torch_compat's
key map. Dropout is identity in eval mode; at train time it uses the 'dropout'
PRNG collection.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from synthetic_audio_detection_tpu.models.resnet import _bn


class BinaryHead(nn.Module):
    hidden: Sequence[int] = (512, 256)
    dropout: Sequence[float] = (0.5, 0.3)
    num_outputs: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, train: bool = False):
        # feats: [B, H, W, F] un-pooled feature map (timm forward_features)
        x = feats.astype(self.dtype)
        if x.ndim == 4:
            x = x.mean(axis=(1, 2))  # AdaptiveAvgPool2d(1) + Flatten
        for i, (width, rate) in enumerate(zip(self.hidden, self.dropout)):
            x = nn.Dense(width, dtype=self.dtype, name=f"fc{i + 1}")(x)
            x = _bn(train, f"bn{i + 1}", self.dtype)(x)
            x = nn.relu(x)
            x = nn.Dropout(rate, deterministic=not train)(x)
        return nn.Dense(self.num_outputs, dtype=self.dtype, name="out")(x)
