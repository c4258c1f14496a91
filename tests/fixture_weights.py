"""Deterministic BinaryClassifier weights in the torch key space.

Both the golden-fixture GENERATOR (tools/gen_golden_fixtures.py, needs torch)
and the torch-free fixture TEST (tests/test_golden_fixtures.py) rebuild the
exact same state dict from this recipe, so the fixture pack only has to store
inputs and expected outputs — not 45 MB of weights. Values are derived from
crc32 of (seed, key), never from Python's salted hash() or framework RNGs, so
they are stable across processes, jax/torch versions, and platforms.
"""

from __future__ import annotations

import zlib
from typing import Dict

import jax
import numpy as np


def deterministic_state_dict(
    backbone: str = "resnet18", seed: int = 0
) -> Dict[str, np.ndarray]:
    """Torch-key-space state dict ('base.*'/'head.<i>.*') with reproducible
    pseudo-random values. Shapes come from the model topology (via a throwaway
    flax init); values come only from crc32(seed/key)."""
    from synthetic_audio_detection_tpu.checkpoints.torch_compat import (
        torch_state_dict_from_variables,
    )
    from synthetic_audio_detection_tpu.models.classifier import (
        BinaryClassifier,
        init_classifier,
    )

    model = BinaryClassifier(backbone=backbone)
    variables = init_classifier(model, jax.random.PRNGKey(0), input_size=64)
    shapes = {
        k: np.asarray(v).shape
        for k, v in torch_state_dict_from_variables(
            jax.tree_util.tree_map(np.asarray, variables)
        ).items()
    }

    sd: Dict[str, np.ndarray] = {}
    for key in sorted(shapes):
        shape = shapes[key]
        rng = np.random.default_rng(zlib.crc32(f"{seed}/{key}".encode()))
        if key.endswith("running_var"):
            arr = 1.0 + 0.05 * rng.uniform(size=shape)
        elif key.endswith("running_mean"):
            arr = 0.01 * rng.standard_normal(shape)
        elif key.endswith(".weight") and len(shape) == 1:  # BN affine scale
            arr = 1.0 + 0.05 * rng.standard_normal(shape)
        elif key.endswith(".bias"):
            arr = 0.01 * rng.standard_normal(shape)
        else:  # conv [co,ci,kh,kw] or linear [co,ci] weight
            fan_in = int(np.prod(shape[1:]))
            arr = rng.standard_normal(shape) / np.sqrt(fan_in)
        sd[key] = arr.astype(np.float32)
    return sd
