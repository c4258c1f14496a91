"""Space-to-depth reformulation of early ResNet convs (layer1 frontier).

Why: at 512² inputs, resnet18 layer1 runs 3x3 convs on [B, 128, 128, 64] —
C=64 underfills the TPU's 128-wide lanes and XLA tiles it at 25-31 TF/s
(~8x under peak) while layer2/3 shapes run near peak (benchmarks/conv_ab.py,
NOTES.md round 1). Layer1 holds ~half the model FLOPs, so it bounds the
full-fidelity serving rate.

The fix (the classic MLPerf-ResNet TPU trick, re-derived for stride-1 convs):
rearrange [B, H, W, C] → [B, H/2, W/2, 4C] (space_to_depth) and fold the
3x3 kernel into an EXACTLY equivalent kernel on the rearranged tensor. With
r=2 the folded kernel is [3, 3, 4C, 4F] with 9 of 36 input-tap/phase
combinations nonzero per output phase: 4x the nominal FLOPs, but at
channel width 256 the MXU runs ~8x faster, netting ~2x on layer1
(measured — see benchmarks/conv_ab.py --s2d).

Derivation (r=2, padding 1): for output phase qy∈{0,1} and tap dy∈{0,1,2},
the original row offset qy+dy-1 lands on s2d row ty = floor((qy+dy-1)/2)
with phase py = (qy+dy-1) - 2*ty; ty ∈ {-1,0,1} maps to folded-kernel tap
ty+1 under padding 1. Same for columns. Zero-padding commutes with the
rearrangement because only phase-1 rows of the out-of-range s2d taps are
ever referenced (val=-2 / val=+3 are unreachable), and those rows are the
original zero padding.

Reference shape inventory: submodel_trainer.py:606-633 (resnet backbone).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def space_to_depth(x: jnp.ndarray, r: int = 2) -> jnp.ndarray:
    """[B, H, W, C] → [B, H/r, W/r, r*r*C]; channel layout (py, px, c)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // r, r, w // r, r, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // r, w // r, r * r * c)


def depth_to_space(x: jnp.ndarray, r: int = 2) -> jnp.ndarray:
    """Inverse of :func:`space_to_depth`."""
    b, h, w, rc = x.shape
    c = rc // (r * r)
    x = x.reshape(b, h, w, r, r, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h * r, w * r, c)


def fold_conv3x3_s2d(w: np.ndarray) -> np.ndarray:
    """Fold a stride-1 3x3 kernel [3, 3, C, F] into the equivalent s2d-space
    kernel [3, 3, 4C, 4F] (r=2). conv(s2d(x), folded, pad 1) == s2d(conv(x,
    w, pad 1)) exactly."""
    w = np.asarray(w)
    kh, kw, c, f = w.shape
    assert (kh, kw) == (3, 3), "fold_conv3x3_s2d is specific to 3x3 kernels"
    out = np.zeros((3, 3, 4 * c, 4 * f), w.dtype)
    for qy in range(2):
        for dy in range(3):
            vy = qy + dy - 1
            ty, py = vy // 2, vy % 2
            for qx in range(2):
                for dx in range(3):
                    vx = qx + dx - 1
                    tx, px = vx // 2, vx % 2
                    ci = (py * 2 + px) * c
                    co = (qy * 2 + qx) * f
                    out[ty + 1, tx + 1, ci:ci + c, co:co + f] = w[dy, dx]
    return out


def _fold_map() -> np.ndarray:
    """Constant one-hot tensor M[ty, tx, p, q, dy, dx] encoding the folding:
    original tap (dy, dx) of output phase q lands on s2d tap (ty, tx) of
    input phase p. Built once in numpy; contracting W against it reproduces
    fold_conv3x3_s2d as a traceable einsum (so folding can live INSIDE a
    jitted program whose weights are traced arguments)."""
    m = np.zeros((3, 3, 4, 4, 3, 3), np.float32)
    for qy in range(2):
        for dy in range(3):
            vy = qy + dy - 1
            ty, py = vy // 2, vy % 2
            for qx in range(2):
                for dx in range(3):
                    vx = qx + dx - 1
                    tx, px = vx // 2, vx % 2
                    m[ty + 1, tx + 1, py * 2 + px, qy * 2 + qx, dy, dx] = 1.0
    return m


_FOLD_MAP = _fold_map()


def fold_conv3x3_s2d_traced(w: jnp.ndarray) -> jnp.ndarray:
    """Traceable twin of :func:`fold_conv3x3_s2d`: [3, 3, C, F] (traced) →
    [3, 3, 4C, 4F]. The contraction against the constant one-hot map costs
    ~9x the weight size — noise next to one conv at serving shapes."""
    c, f = w.shape[2], w.shape[3]
    wf = jnp.einsum("tspqyx,yxcf->tspcqf", jnp.asarray(_FOLD_MAP, w.dtype), w)
    return wf.reshape(3, 3, 4 * c, 4 * f)


def conv3x3_s2d(x_s2d: jnp.ndarray, w_folded: jnp.ndarray,
                preferred_element_type=jnp.float32) -> jnp.ndarray:
    """Stride-1 'layer1-equivalent' conv in s2d space: [B, H/2, W/2, 4C] x
    [3, 3, 4C, 4F] → [B, H/2, W/2, 4F]."""
    return jax.lax.conv_general_dilated(
        x_s2d, w_folded,
        window_strides=(1, 1), padding=[(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=preferred_element_type,
    )


def fold_conv3x3_s2d_phase(
    w: np.ndarray, qy: int, qx: int
) -> Tuple[np.ndarray, Tuple[Tuple[int, int], Tuple[int, int]]]:
    """Per-output-phase folding: [3, 3, C, F] → ([2, 2, 4C, F], padding).
    Four such convs (one per (qy, qx)) reproduce the full conv at 16/9 the
    nominal FLOPs (vs 4x for the one-conv folding); outputs concatenate along
    channels in (qy, qx) phase order to form the s2d result."""
    w = np.asarray(w)
    _, _, c, f = w.shape
    out = np.zeros((2, 2, 4 * c, f), w.dtype)
    for dy in range(3):
        vy = qy + dy - 1
        ty, py = vy // 2, vy % 2
        for dx in range(3):
            vx = qx + dx - 1
            tx, px = vx // 2, vx % 2
            ci = (py * 2 + px) * c
            out[ty + (1 - qy), tx + (1 - qx), ci:ci + c, :] = w[dy, dx]
    padding = ((1 - qy, qy), (1 - qx, qx))
    return out, padding


def fold_conv3x3_s2d_merged(w: np.ndarray) -> np.ndarray:
    """Merged-phase folding: [3, 3, C, F] → ONE [2, 2, 4C, 4F] kernel whose
    output-channel block q is the phase-q kernel of
    :func:`fold_conv3x3_s2d_phase`. Used with :func:`conv3x3_s2d_merged`:
    full 4C→4F MXU width at only ~1.83x nominal FLOPs (vs 4x for the
    3x3 one-conv folding) — the per-phase padding differences move into
    output slicing instead of the kernel."""
    w = np.asarray(w)
    _, _, c, f = w.shape
    blocks = []
    for qy in range(2):
        for qx in range(2):
            k, _ = fold_conv3x3_s2d_phase(w, qy, qx)
            blocks.append(k)
    return np.concatenate(blocks, axis=3)  # [2,2,4C,4F]


def conv3x3_s2d_merged(x_s2d: jnp.ndarray, w_merged: jnp.ndarray,
                       preferred_element_type=jnp.float32) -> jnp.ndarray:
    """Pad-once + VALID [2,2] conv + per-phase output slicing. Exactly equals
    conv3x3_s2d on the same s2d input. x_s2d: [B, H', W', 4C] → [B, H', W', 4F].

    Phase (qy, qx)'s valid outputs sit at offset (qy, qx) in the padded
    conv result; the four [B, H', W', F] slices concatenate back into the
    s2d channel layout."""
    b, h, w_, c4 = x_s2d.shape
    xp = jnp.pad(x_s2d, ((0, 0), (1, 1), (1, 1), (0, 0)))
    y = jax.lax.conv_general_dilated(
        xp, w_merged,
        window_strides=(1, 1), padding=[(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=preferred_element_type,
    )  # [B, H'+1, W'+1, 4F]
    f = w_merged.shape[3] // 4
    outs = []
    for qy in range(2):
        for qx in range(2):
            q = qy * 2 + qx
            outs.append(y[:, qy:qy + h, qx:qx + w_, q * f:(q + 1) * f])
    return jnp.concatenate(outs, axis=-1)


def space_to_depth_h(x: jnp.ndarray) -> jnp.ndarray:
    """H-only s2d (r=2): [B, H, W, C] → [B, H/2, W, 2C]; channel (py, c)."""
    b, h, w, c = x.shape
    return x.reshape(b, h // 2, 2, w, c).transpose(0, 1, 3, 2, 4).reshape(
        b, h // 2, w, 2 * c)


def depth_to_space_h(x: jnp.ndarray) -> jnp.ndarray:
    b, h, w, c2 = x.shape
    c = c2 // 2
    return x.reshape(b, h, w, 2, c).transpose(0, 1, 3, 2, 4).reshape(
        b, h * 2, w, c)


def _fold_map_h() -> np.ndarray:
    """One-hot map for H-only folding: M[ty, p, q, dy]."""
    m = np.zeros((3, 2, 2, 3), np.float32)
    for qy in range(2):
        for dy in range(3):
            vy = qy + dy - 1
            ty, py = vy // 2, vy % 2
            m[ty + 1, py, qy, dy] = 1.0
    return m


_FOLD_MAP_H = _fold_map_h()


def fold_conv3x3_s2d_h(w) -> jnp.ndarray:
    """[3, 3, C, F] → [3, 3, 2C, 2F]: H-only folding (2x nominal FLOPs at 2x
    channel width; W taps pass through). Traceable."""
    w = jnp.asarray(w)
    c, f = w.shape[2], w.shape[3]
    # W'[ty, dx, (p,c), (q,f)] = M[ty,p,q,dy] W[dy,dx,c,f]
    wf = jnp.einsum("tpqy,yxcf->txpcqf", jnp.asarray(_FOLD_MAP_H, w.dtype), w)
    return wf.reshape(3, 3, 2 * c, 2 * f)


def conv3x3_s2d_h(x_s2dh: jnp.ndarray, w_folded: jnp.ndarray,
                  preferred_element_type=jnp.float32) -> jnp.ndarray:
    """[B, H/2, W, 2C] x [3, 3, 2C, 2F] → [B, H/2, W, 2F] (padding 1)."""
    return jax.lax.conv_general_dilated(
        x_s2dh, w_folded,
        window_strides=(1, 1), padding=[(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=preferred_element_type,
    )


def _fold_map_merged() -> np.ndarray:
    """One-hot map for the merged-phase folding (tap index ty + (1-qy))."""
    m = np.zeros((2, 2, 4, 4, 3, 3), np.float32)
    for qy in range(2):
        for dy in range(3):
            vy = qy + dy - 1
            ty, py = vy // 2, vy % 2
            for qx in range(2):
                for dx in range(3):
                    vx = qx + dx - 1
                    tx, px = vx // 2, vx % 2
                    m[ty + (1 - qy), tx + (1 - qx),
                      py * 2 + px, qy * 2 + qx, dy, dx] = 1.0
    return m


_FOLD_MAP_MERGED = _fold_map_merged()


def fold_conv3x3_s2d_merged_traced(w: jnp.ndarray) -> jnp.ndarray:
    """Traceable twin of :func:`fold_conv3x3_s2d_merged`:
    [3, 3, C, F] (traced) → [2, 2, 4C, 4F]."""
    c, f = w.shape[2], w.shape[3]
    wf = jnp.einsum(
        "tspqyx,yxcf->tspcqf", jnp.asarray(_FOLD_MAP_MERGED, w.dtype), w
    )
    return wf.reshape(2, 2, 4 * c, 4 * f)


# ---------------------------------------------------------------------------
# Stem (7x7 stride-2) foldings — the OTHER narrow-channel frontier
# ---------------------------------------------------------------------------
# Composite stage decomposition at 512²/B=128 (benchmarks/stage_decomp.py):
# stem+maxpool = 6.18 ms of the 21.2 ms batch (~25 TF/s — the worst stage;
# layer1 runs at ~135 TF/s in the composite). The stride-2 stem folds onto an
# s2d input with NO output phases: r = 2u+dy-3 = 2i+p gives tap offsets
# i-u ∈ {-2,-1,0,+1}, so the folded kernel has 4 H-taps and channel width
# 2C (H-only) or 4C (both dims) at 1.14x / 1.31x nominal FLOPs.


def _fold_map_stem_h() -> np.ndarray:
    """One-hot M[ty, p, dy]: stem tap dy lands on s2d-H tap ty, phase p
    (dy = 2*ty + p - 1)."""
    m = np.zeros((4, 2, 7), np.float32)
    for ty in range(4):
        for p in range(2):
            dy = 2 * ty + p - 1
            if 0 <= dy < 7:
                m[ty, p, dy] = 1.0
    return m


_FOLD_MAP_STEM_H = _fold_map_stem_h()


def fold_conv7x7s2_s2d_h(w) -> jnp.ndarray:
    """[7, 7, C, F] → [4, 7, 2C, F]: H-only stem folding (1.14x nominal
    FLOPs at 2C channel width; stride 2 keeps only the W axis). Traceable."""
    w = jnp.asarray(w)
    c, f = w.shape[2], w.shape[3]
    wf = jnp.einsum("tpy,yxcf->txpcf",
                    jnp.asarray(_FOLD_MAP_STEM_H, w.dtype), w)
    return wf.reshape(4, 7, 2 * c, f)


def conv7x7s2_s2d_h(x_s2dh: jnp.ndarray, w_folded: jnp.ndarray,
                    preferred_element_type=jnp.float32) -> jnp.ndarray:
    """[B, H/2, W, 2C] x [4, 7, 2C, F] → [B, H/2, W/2, F]. Exactly equals
    the SAME-padded 7x7 stride-2 stem conv on the unfolded input."""
    return jax.lax.conv_general_dilated(
        x_s2dh, w_folded,
        window_strides=(1, 2), padding=[(2, 1), (3, 3)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=preferred_element_type,
    )


def fold_conv7x7s2_s2d(w) -> jnp.ndarray:
    """[7, 7, C, F] → [4, 4, 4C, F]: both-axes stem folding (1.31x nominal
    FLOPs at 4C channel width). Channel layout matches space_to_depth's
    (py, px, c). Traceable."""
    w = jnp.asarray(w)
    c, f = w.shape[2], w.shape[3]
    m = jnp.asarray(_FOLD_MAP_STEM_H, w.dtype)
    wf = jnp.einsum("tpy,sqx,yxcf->tspqcf", m, m, w)
    return wf.reshape(4, 4, 4 * c, f)


def conv7x7s2_s2d(x_s2d: jnp.ndarray, w_folded: jnp.ndarray,
                  preferred_element_type=jnp.float32) -> jnp.ndarray:
    """[B, H/2, W/2, 4C] x [4, 4, 4C, F] → [B, H/2, W/2, F]. Exactly equals
    the SAME-padded 7x7 stride-2 stem conv on the unfolded input."""
    return jax.lax.conv_general_dilated(
        x_s2d, w_folded,
        window_strides=(1, 1), padding=[(2, 1), (2, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=preferred_element_type,
    )


def conv3x3_s2d_4phase(x_s2d: jnp.ndarray, folded_phases,
                       preferred_element_type=jnp.float32) -> jnp.ndarray:
    """Apply the four per-phase folded convs and interleave outputs into the
    s2d channel layout. folded_phases: [(kernel, padding)] in (qy, qx) order."""
    outs = []
    for kern, pad in folded_phases:
        outs.append(jax.lax.conv_general_dilated(
            x_s2d, jnp.asarray(kern),
            window_strides=(1, 1), padding=list(pad),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=preferred_element_type,
        ))
    return jnp.concatenate(outs, axis=-1)
