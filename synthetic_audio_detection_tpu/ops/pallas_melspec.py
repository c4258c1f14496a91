"""Fused mel-spectrogram Pallas kernel (TPU).

The BASELINE.json north star calls for the mel front end — framing, STFT, mel
filterbank, log/normalize — fused into a single Pallas kernel feeding the
backbone. This kernel runs ONE grid cell per 4 s window and keeps every
intermediate in VMEM:

    waveform [T+pad] ──(reshape-framing)──► frames [F, n_fft]   (never in HBM)
      × Hann ──► MXU: ·cosᵀ, ·sinᵀ (GEMM DFT, only the ≤f_max bins)
      ──► power = re²+im² ──► MXU: ·mel_fb ──► 10·log10, top_db clamp
      ──► per-spectrogram standardize (masked mean/var over real frames)
      ──► out [F_pad, n_mels]

Numerics match ops.melspec.log_mel_features(resize=False) (same DFT matrices,
filterbank, dB clamp, unbiased-std standardization) — asserted in
tests/test_pallas_melspec.py — so the Pallas path is a drop-in for serving.

The framing trick (ops/melspec.frame_signal): with hop | n_fft and padded
length a hop multiple, frames = concat of k=n_fft/hop shifted reshapes —
pure layout ops Mosaic lowers without gathers.

HBM traffic per window: read 0.52 MB (waveform f32) + write 0.13 MB, versus
the unfused pipeline's ≥2 MB materialized frames — a 4× cut at the
memory-bound front of the serving graph.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from synthetic_audio_detection_tpu.ops import melspec
from synthetic_audio_detection_tpu.utils.config import SpectrogramConfig


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _plan(cfg: SpectrogramConfig, num_samples: int, sample_rate: int):
    """Static geometry shared by kernel and caller."""
    n_fft, hop = cfg.n_fft, cfg.hop_length
    assert cfg.center, "kernel assumes center padding (reference setting)"
    assert n_fft % hop == 0, "fused kernel requires hop | n_fft"
    pad = n_fft // 2
    padded = num_samples + 2 * pad
    n_frames = 1 + (padded - n_fft) // hop
    # align up with trailing zeros so (a) hop | padded (reshape framing) and
    # (b) 128 | padded (the waveform enters the kernel as [.., 128] lanes);
    # the extra samples only reach frames beyond n_frames, never read
    align = hop * 128 // math.gcd(hop, 128)
    padded_align = _round_up(padded, align)
    fb = melspec.mel_filterbank(
        cfg.n_freqs, cfg.f_min, cfg.f_max, cfg.n_mels, sample_rate,
        cfg.mel_norm, cfg.mel_scale,
    )
    n_bins = _round_up(melspec.significant_bins(fb), 128)
    f_pad = _round_up(n_frames, 8)
    mels_pad = _round_up(cfg.n_mels, 128)
    return pad, padded_align - padded, padded_align, n_frames, f_pad, n_bins, mels_pad, fb


def _kernel(
    wave_ref,      # [wpc, padded//128, 128] f32 (center-padded windows)
    window_ref,    # [1, n_fft] f32 periodic Hann
    cs_ref,        # [n_fft, 2*n_bins] bf16 — cos | sin side by side
    fb_ref,        # [n_bins, mels_pad] f32
    out_ref,       # [wpc, f_pad, mels_pad] f32
    *,
    n_fft: int,
    hop: int,
    n_frames: int,
    f_pad: int,
    top_db: float,
    eps: float,
    n_mels: int,
    windows_per_cell: int = 1,
    stack_windows: bool = False,
):
    n_bins = cs_ref.shape[1] // 2
    wpc = windows_per_cell
    k = n_fft // hop

    def strip_xw(w: int, i: int, w_i):
        """Strip i of window w: [f_pad, hop] bf16 windowed frame rows."""
        x = wave_ref[w, :, :]
        r = x.reshape((x.shape[0] * x.shape[1]) // hop, hop)
        # The frame matrix [n_frames, n_fft] is never materialized (Mosaic
        # cannot concat sublane-offset slices, and it would cost 2 MB VMEM):
        # the DFT matmul is accumulated over k hop-wide strips —
        #   frames[:, i*hop:(i+1)*hop] == r[i : i+n_frames]
        # so  re|im = Σ_i (r_i · w_i) @ cs[i*hop:(i+1)*hop, :].
        part = jax.lax.slice_in_dim(r, i, i + n_frames, axis=0)
        if f_pad != n_frames:
            part = jnp.pad(part, ((0, f_pad - n_frames), (0, 0)))
        return (part * w_i[None, :]).astype(jnp.bfloat16)

    def standardize_to(mel, w: int):
        """dB + top_db clamp + per-spectrogram stats over REAL rows/cols,
        written to out_ref[w]."""
        rows = jax.lax.broadcasted_iota(jnp.int32, mel.shape, 0) < n_frames
        cols = jax.lax.broadcasted_iota(jnp.int32, mel.shape, 1) < n_mels
        valid = rows & cols
        db = 10.0 * jnp.log10(jnp.maximum(mel, 1e-10))
        db_max = jnp.max(jnp.where(valid, db, -jnp.inf))
        db = jnp.maximum(db, db_max - top_db)
        n_valid = n_frames * n_mels
        mean = jnp.sum(jnp.where(valid, db, 0.0)) / n_valid
        var = jnp.sum(jnp.where(valid, (db - mean) ** 2, 0.0)) / max(n_valid - 1, 1)
        z = (db - mean) / (jnp.sqrt(var) + eps)
        out_ref[w, :, :] = jnp.where(valid, z, 0.0)

    # cos and sin ride ONE matmul per strip (concatenated host-side along
    # N — lane concat inside the kernel would crash the compile helper,
    # but a pre-concatenated constant is just a wider operand): half the
    # dispatches, N=2·n_bins, same FLOPs.
    if stack_windows and wpc > 1:
        # M-stacked: all wpc windows ride each strip matmul as one
        # [wpc·f_pad, hop] operand — wider M per dot, k dots per cell
        # instead of wpc·k. The stack is assembled by zero-pad + add
        # (sublane concat of computed values is a Mosaic no-go; the pads
        # are trivial VPU work against a [512, hop] tile).
        acc = jnp.zeros((wpc * f_pad, 2 * n_bins), jnp.float32)
        for i in range(k):
            w_i = jax.lax.slice_in_dim(window_ref[0, :], i * hop, (i + 1) * hop)
            xw_all = None
            for w in range(wpc):
                p = jnp.pad(strip_xw(w, i, w_i),
                            ((w * f_pad, (wpc - 1 - w) * f_pad), (0, 0)))
                xw_all = p if xw_all is None else xw_all + p
            cs_i = jax.lax.slice_in_dim(cs_ref[:, :], i * hop, (i + 1) * hop, axis=0)
            acc = acc + jnp.dot(xw_all, cs_i, preferred_element_type=jnp.float32)
        re = jax.lax.slice_in_dim(acc, 0, n_bins, axis=1)
        im = jax.lax.slice_in_dim(acc, n_bins, 2 * n_bins, axis=1)
        power = re * re + im * im               # [wpc·f_pad, n_bins]
        mel_all = jnp.dot(power.astype(jnp.float32), fb_ref[:, :],
                          preferred_element_type=jnp.float32)
        for w in range(wpc):
            standardize_to(
                jax.lax.slice_in_dim(mel_all, w * f_pad, (w + 1) * f_pad,
                                     axis=0), w)
        return

    # windows_per_cell > 1 amortizes per-grid-step overhead (fewer cells,
    # same matmul shapes — the per-window work is a static python loop)
    for w in range(wpc):
        acc = jnp.zeros((f_pad, 2 * n_bins), jnp.float32)
        for i in range(k):
            w_i = jax.lax.slice_in_dim(window_ref[0, :], i * hop, (i + 1) * hop)
            xw = strip_xw(w, i, w_i)
            cs_i = jax.lax.slice_in_dim(cs_ref[:, :], i * hop, (i + 1) * hop, axis=0)
            acc = acc + jnp.dot(xw, cs_i, preferred_element_type=jnp.float32)
        re = jax.lax.slice_in_dim(acc, 0, n_bins, axis=1)
        im = jax.lax.slice_in_dim(acc, n_bins, 2 * n_bins, axis=1)
        power = re * re + im * im                       # [f_pad, n_bins]
        mel = jnp.dot(
            power.astype(jnp.float32), fb_ref[:, :],
            preferred_element_type=jnp.float32,
        )                                               # [f_pad, mels_pad]
        standardize_to(mel, w)


def _factored_kernel(
    wave_ref,      # [wpc, padded//128, 128] f32 (center-padded windows)
    cs_ref,        # [hop, 2*n_bins] bf16 — block-DFT cos | sin (cols ≥ nraw zero)
    ab_ref,        # [2*k4, n_bins] f32 — combine phases a_i | b_i
    fb_ref,        # [n_bins, mels_pad] f32 (rows ≥ n_sig zero)
    out_ref,       # [wpc, f_pad, mels_pad] f32
    *,
    hop: int,
    k4: int,
    n_frames: int,
    f_pad: int,
    rows_pad: int,
    top_db: float,
    eps: float,
    n_mels: int,
    windows_per_cell: int = 1,
    b_zero: tuple = (),
    a_one: tuple = (),
    standardize: bool = True,
    lowp_tail: bool = False,
    assemble_bf16: bool = False,
    stack_dft: bool = False,
    nb_rows: int = 0,
):
    """Factored (shared hop-block) GEMM-DFT mel kernel.

    Same numerics as ops.melspec.power_spectrogram_factored: each hop block's
    512-sample DFT at the full n_fft frequencies rides ONE [rows, hop] ×
    [hop, 2*n_bins] matmul (k4× fewer MACs than the per-strip kernel, which
    re-transforms every block k4 times under k4 different window quarters);
    frames are assembled from k4 shifted row-slices with the {0,±1} phase
    masks (VPU), and the periodic-Hann window is the exact 3-tap frequency
    conv 0.5·X[f] − 0.25·X[f−1] − 0.25·X[f+1] via lane rolls (pltpu.roll),
    with the f=0 tap fixed to conj(X[1]) by a lane-0 select.

    Round-5 throughput knobs (the 51-iter native stage decomposition put
    this kernel at 0.77 ms vs a ~0.3 ms pure-matmul bound — the gap is the
    VPU assembly passes, docs/PERFORMANCE.md):
      assemble_bf16 — run the phase combine + window conv + power in bf16
        (2 elements/lane on the VPU halves the pass cost of the dominant
        [f_pad, n_bins] elementwise stage); the DFT matmul still
        accumulates in f32 and the mel matmul input is cast back per
        lowp_tail. Phase factors are exactly representable ({0,±1} and
        short cosines), so the error budget is the bf16 rounding of y
        (~0.4% rel) — bounded by the same argument as lowp_tail.
      stack_dft — ONE [wpc·nb, hop]×[hop, 2·n_bins] DFT matmul per grid
        cell instead of wpc separate M≈256 matmuls (wider M fills the MXU;
        per-window row slices come off the shared product; frame rows that
        cross a window boundary read the next window's rows and are masked
        dead by standardize's valid mask exactly like the zero-pad rows).
    """
    n_bins = cs_ref.shape[1] // 2
    wpc = windows_per_cell
    asm_t = jnp.bfloat16 if assemble_bf16 else jnp.float32

    def standardize_to(mel, w: int):
        rows = jax.lax.broadcasted_iota(jnp.int32, mel.shape, 0) < n_frames
        cols = jax.lax.broadcasted_iota(jnp.int32, mel.shape, 1) < n_mels
        valid = rows & cols
        db = 10.0 * jnp.log10(jnp.maximum(mel, 1e-10))
        db_max = jnp.max(jnp.where(valid, db, -jnp.inf))
        db = jnp.maximum(db, db_max - top_db)
        if not standardize:
            # dB-only mode (training front end: SpecAugment masks the dB
            # spectrogram BEFORE standardization, submodel_trainer.py:194-199)
            out_ref[w, :, :] = jnp.where(valid, db, 0.0).astype(out_ref.dtype)
            return
        n_valid = n_frames * n_mels
        mean = jnp.sum(jnp.where(valid, db, 0.0)) / n_valid
        var = jnp.sum(jnp.where(valid, (db - mean) ** 2, 0.0)) / max(n_valid - 1, 1)
        z = (db - mean) / (jnp.sqrt(var) + eps)
        out_ref[w, :, :] = jnp.where(valid, z, 0.0).astype(out_ref.dtype)

    y_all = None
    if stack_dft:
        x = wave_ref[:, :, :]
        r = x.reshape((x.shape[0] * x.shape[1] * x.shape[2]) // hop, hop)
        y_all = jnp.dot(r.astype(jnp.bfloat16), cs_ref[:, :],
                        preferred_element_type=jnp.float32)  # [wpc*nb, 2nb]

    for w in range(wpc):
        if stack_dft:
            # this window's rows of the shared product; frames needing rows
            # past the window's nb_rows read into the NEXT window's block
            # (or the final zero pad) — all such frames are ≥ n_frames and
            # masked dead in standardize, same as zero-pad rows
            need = f_pad + k4 - 1
            avail = y_all.shape[0] - w * nb_rows
            y = jax.lax.slice_in_dim(
                y_all, w * nb_rows, w * nb_rows + min(need, avail), axis=0)
            if avail < need:
                y = jnp.pad(y, ((0, need - avail), (0, 0)))
        else:
            x = wave_ref[w, :, :]
            r = x.reshape((x.shape[0] * x.shape[1]) // hop, hop)
            if rows_pad != r.shape[0]:
                r = jnp.pad(r, ((0, rows_pad - r.shape[0]), (0, 0)))
            y = jnp.dot(r.astype(jnp.bfloat16), cs_ref[:, :],
                        preferred_element_type=jnp.float32)  # [rows_pad, 2nb]
        if assemble_bf16:
            y = y.astype(jnp.bfloat16)
        x_re = jnp.zeros((f_pad, n_bins), asm_t)
        x_im = jnp.zeros((f_pad, n_bins), asm_t)
        for i in range(k4):
            yi = jax.lax.slice_in_dim(y, i, i + f_pad, axis=0)
            yre = jax.lax.slice_in_dim(yi, 0, n_bins, axis=1)
            yim = jax.lax.slice_in_dim(yi, n_bins, 2 * n_bins, axis=1)
            if i in a_one:                 # c_i ≡ 1: plain accumulate
                x_re = x_re + yre
                x_im = x_im + yim
            elif i in b_zero:              # c_i real (±1 lane pattern)
                a = ab_ref[i, :][None, :].astype(asm_t)
                x_re = x_re + a * yre
                x_im = x_im + a * yim
            else:                          # full complex multiply-accumulate
                a = ab_ref[i, :][None, :].astype(asm_t)
                b = ab_ref[k4 + i, :][None, :].astype(asm_t)
                x_re = x_re + a * yre - b * yim
                x_im = x_im + a * yim + b * yre
        if assemble_bf16:
            # Mosaic's lane roll does not lower for packed bf16 on this
            # toolchain (HTTP 500 at pltpu.roll) — the combine above (the
            # dominant pass cost) stays bf16; the 3-tap window conv runs
            # in f32
            x_re = x_re.astype(jnp.float32)
            x_im = x_im.astype(jnp.float32)
        # periodic Hann as the exact 3-tap conv in frequency
        l_re = pltpu.roll(x_re, n_bins - 1, 1)   # L[f] = X[f+1] (left shift)
        l_im = pltpu.roll(x_im, n_bins - 1, 1)
        r_re = pltpu.roll(x_re, 1, 1)      # R[f] = X[f−1]; f=0 wraps → fix
        r_im = pltpu.roll(x_im, 1, 1)
        lane0 = jax.lax.broadcasted_iota(jnp.int32, x_re.shape, 1) == 0
        r_re = jnp.where(lane0, l_re, r_re)          # X[−1] = conj(X[1])
        r_im = jnp.where(lane0, -l_im, r_im)
        w_re = 0.5 * x_re - 0.25 * (r_re + l_re)
        w_im = 0.5 * x_im - 0.25 * (r_im + l_im)
        power = w_re * w_re + w_im * w_im            # [f_pad, n_bins]
        if lowp_tail:
            # bf16 mel matmul (f32 accumulate): one MXU pass instead of the
            # bf16x3 decomposition XLA uses for an f32 dot. Power values span
            # a huge range but each mel bin sums same-sign terms, so bf16's
            # ~3 decimal digits bound the RELATIVE bin error (~0.4%), which
            # the subsequent log10 turns into <~0.02 dB absolute — below the
            # bf16 model's own input-rounding noise.
            mel = jnp.dot(power.astype(jnp.bfloat16), fb_ref[:, :],
                          preferred_element_type=jnp.float32)
        else:
            mel = jnp.dot(power, fb_ref[:, :], preferred_element_type=jnp.float32)
        standardize_to(mel, w)


def fused_log_mel_factored(
    waveforms: jnp.ndarray,
    cfg: SpectrogramConfig,
    sample_rate: int = 32_000,
    interpret: bool = False,
    windows_per_cell: int = 4,
    standardize: bool = True,
    lowp_tail: bool = False,
    assemble_bf16: bool = False,
    stack_dft: bool = False,
) -> jnp.ndarray:
    """Factored-DFT variant of fused_log_mel: same output (float tolerance),
    ~4× fewer DFT MACs. See _factored_kernel.

    Measured same-process on v5e (throughput.py melwpc2/melfct*, b128,
    median-of-3 N-vs-1): 0.92 ms (wpc=4) / 0.95 (wpc=2, 8) vs 1.55 for the
    strip kernel — a 1.7× front-end win; wpc=4 is the default.

    standardize=False stops at the clamped dB spectrogram (no per-spectrogram
    mean/std) — the training front end's seam, where SpecAugment masks the dB
    values before standardization.

    lowp_tail=True runs the power→mel matmul in bf16 (one MXU pass instead
    of f32's bf16x3 decomposition) and returns bf16 (halves the output
    write). The DFT matmul is bf16 either way; only use with a bf16
    consumer — z-scores round to ~3 decimal digits."""
    B, T = waveforms.shape
    if B % windows_per_cell != 0:
        windows_per_cell = 1
    n_fft, hop = cfg.n_fft, cfg.hop_length
    assert n_fft % hop == 0 and cfg.win == n_fft and cfg.center
    k4 = n_fft // hop
    pad, tail, padded, n_frames, f_pad, _, mels_pad, fb = _plan(cfg, T, sample_rate)
    n_sig = melspec.significant_bins(fb)
    nraw = n_sig + 1                     # guard bin for the f+1 window tap
    n_bins = _round_up(nraw, 128)
    nb = padded // hop
    rows_pad = _round_up(max(nb, f_pad + k4 - 1), 8)

    cos_np, sin_np = melspec._dft_matrices(n_fft, nraw)
    cs_np = np.zeros((hop, 2 * n_bins), np.float32)
    cs_np[:, :nraw] = cos_np[:hop]
    cs_np[:, n_bins : n_bins + nraw] = sin_np[:hop]
    cs = jnp.asarray(cs_np, jnp.bfloat16)

    a_np, b_np = melspec.hop_block_phases(n_fft, hop, n_bins)
    ab = jnp.asarray(np.concatenate([a_np, b_np], axis=0))
    a_one = tuple(i for i in range(k4) if np.all(a_np[i] == 1.0) and np.all(b_np[i] == 0.0))
    b_zero = tuple(i for i in range(k4) if np.all(b_np[i] == 0.0) and i not in a_one)

    fb_p = np.zeros((n_bins, mels_pad), np.float32)
    fb_p[:n_sig, : cfg.n_mels] = fb[:n_sig]
    fb_j = jnp.asarray(fb_p, jnp.bfloat16 if lowp_tail else jnp.float32)
    out_dtype = jnp.bfloat16 if lowp_tail else jnp.float32

    x = jnp.pad(waveforms, ((0, 0), (pad, pad)), mode=cfg.pad_mode)
    if tail:
        x = jnp.pad(x, ((0, 0), (0, tail)))
    x = x.reshape(B, padded // 128, 128)

    wpc = windows_per_cell
    kernel = functools.partial(
        _factored_kernel,
        hop=hop,
        k4=k4,
        n_frames=n_frames,
        f_pad=f_pad,
        rows_pad=rows_pad,
        top_db=float(cfg.top_db),
        eps=cfg.eps,
        n_mels=cfg.n_mels,
        windows_per_cell=wpc,
        b_zero=b_zero,
        a_one=a_one,
        standardize=standardize,
        lowp_tail=lowp_tail,
        assemble_bf16=assemble_bf16,
        stack_dft=stack_dft,
        nb_rows=padded // hop,
    )
    out = pl.pallas_call(
        kernel,
        grid=(B // wpc,),
        in_specs=[
            pl.BlockSpec((wpc, padded // 128, 128), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hop, 2 * n_bins), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * k4, n_bins), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_bins, mels_pad), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((wpc, f_pad, mels_pad), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, f_pad, mels_pad), out_dtype),
        interpret=interpret,
    )(x, cs, ab, fb_j)

    return jnp.transpose(out[:, :n_frames, : cfg.n_mels], (0, 2, 1))


def serving_log_mel(
    waveforms: jnp.ndarray,
    cfg: SpectrogramConfig,
    sample_rate: int = 32_000,
    interpret: bool = False,
    lowp_tail: bool = False,
) -> jnp.ndarray:
    """The serving pipelines' mel kernel: the measured-best fused variant
    (the factored-DFT kernel at its default wpc; the round-5 assembly
    variants engage via the SERVING_* gates below once measured). One
    symbol so infer/pipeline.py, bench.py, and the benchmark fastpath
    configs all move together when the measured winner changes."""
    return fused_log_mel_factored(waveforms, cfg, sample_rate,
                                  interpret=interpret, lowp_tail=lowp_tail,
                                  stack_dft=SERVING_STACK_DFT,
                                  assemble_bf16=SERVING_ASSEMBLE_BF16)


# serving-kernel variant gates: set from measured composite A/Bs on chip
# (round-5 session; see docs/PERFORMANCE.md front-end section). Module
# constants rather than call args so every serving consumer (pipeline,
# bench, benchmarks) flips together.
SERVING_STACK_DFT = False
SERVING_ASSEMBLE_BF16 = False


def fused_log_mel(
    waveforms: jnp.ndarray,
    cfg: SpectrogramConfig,
    sample_rate: int = 32_000,
    interpret: bool = False,
    windows_per_cell: int = 2,
    stack_windows: bool = False,
) -> jnp.ndarray:
    """[B, T] → [B, n_mels, n_frames] standardized log-mel (no resize),
    numerically equal to ops.melspec.log_mel_features(..., resize=False)
    transposed, via one fused Pallas kernel. `interpret=True` runs the
    kernel in interpreter mode (CPU testing). `windows_per_cell` processes
    that many windows per grid cell (falls back to 1 unless it divides B) —
    same matmul shapes, fewer grid steps. Measured A/B (throughput.py
    melwpc2/4/8 at B=128, combined-cs + trimmed-bin kernel): 1.47 / 1.52 /
    1.69 ms vs 1.61 at wpc=1 — wpc=2 is the default; 8 regresses (VMEM
    pressure). (The pre-round-3-finale split-cos/sin 896-bin kernel measured
    1.85/1.74/1.70/1.86 at wpc 1/2/4/8 — the combined matrix + dust-bin trim
    moved the optimum.)"""
    B, T = waveforms.shape
    if B % windows_per_cell != 0:
        windows_per_cell = 1
    pad, tail, padded, n_frames, f_pad, n_bins, mels_pad, fb = _plan(
        cfg, T, sample_rate
    )
    cos_np, sin_np = melspec._dft_matrices(cfg.n_fft, n_bins)
    cs = jnp.asarray(np.concatenate([cos_np, sin_np], axis=1), jnp.bfloat16)
    fb_p = np.zeros((n_bins, mels_pad), np.float32)
    rows = min(n_bins, fb.shape[0])
    fb_p[:rows, : cfg.n_mels] = fb[:rows]
    fb_j = jnp.asarray(fb_p)

    x = jnp.pad(waveforms, ((0, 0), (pad, pad)), mode=cfg.pad_mode)
    if tail:
        x = jnp.pad(x, ((0, 0), (0, tail)))
    x = x.reshape(B, padded // 128, 128)
    window = np.asarray(melspec.hann_window(cfg.n_fft))[None, :]

    wpc = windows_per_cell
    kernel = functools.partial(
        _kernel,
        n_fft=cfg.n_fft,
        hop=cfg.hop_length,
        n_frames=n_frames,
        f_pad=f_pad,
        top_db=float(cfg.top_db),
        eps=cfg.eps,
        n_mels=cfg.n_mels,
        windows_per_cell=wpc,
        stack_windows=stack_windows,
    )
    out = pl.pallas_call(
        kernel,
        grid=(B // wpc,),
        in_specs=[
            pl.BlockSpec((wpc, padded // 128, 128), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cfg.n_fft), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cfg.n_fft, 2 * n_bins), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_bins, mels_pad), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((wpc, f_pad, mels_pad), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, f_pad, mels_pad), jnp.float32),
        interpret=interpret,
    )(x, jnp.asarray(window), cs, fb_j)

    # [B, f_pad, mels_pad] → [B, n_mels, n_frames]
    return jnp.transpose(out[:, :n_frames, : cfg.n_mels], (0, 2, 1))
