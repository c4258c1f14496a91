"""ctypes bindings for the native audio I/O library (native/sadio.cpp).

Provides GIL-free multithreaded WAV decode + mono downmix for the host data
path (the role ffmpeg subprocesses + torchaudio's C++ ops play in the
reference — audio_convert.py:26-34, submodel_trainer.py:143). Falls back to
the pure-Python audio.wavio reader when the shared library is not built
(``make -C native``).
"""

from __future__ import annotations

import ctypes
import os
from typing import List, Optional, Tuple

import numpy as np

_LIB_PATHS = (
    os.path.join(os.path.dirname(__file__), "..", "..", "native", "libsadio.so"),
    os.path.join(os.path.dirname(__file__), "libsadio.so"),
)

_lib = None


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    for p in _LIB_PATHS:
        p = os.path.abspath(p)
        if os.path.exists(p):
            lib = ctypes.CDLL(p)
            lib.sadio_wav_info.restype = ctypes.c_int32
            lib.sadio_wav_info.argtypes = [
                ctypes.c_char_p, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int64),
            ]
            lib.sadio_decode_file_mono.restype = ctypes.c_int64
            lib.sadio_decode_file_mono.argtypes = [
                ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
                ctypes.c_int64, ctypes.POINTER(ctypes.c_int32),
            ]
            lib.sadio_decode_batch.restype = None
            lib.sadio_decode_batch.argtypes = [
                ctypes.POINTER(ctypes.c_char_p), ctypes.c_int32,
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int32),
                ctypes.c_int32,
            ]
            if hasattr(lib, "sadio_resample_poly"):
                lib.sadio_resample_poly.restype = ctypes.c_int64
                lib.sadio_resample_poly.argtypes = [
                    ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
                    ctypes.POINTER(ctypes.c_float),
                    ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
                    ctypes.c_int32,
                    ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
                    ctypes.c_int32,
                ]
            _lib = lib
            return _lib
    return None


def available() -> bool:
    return _load() is not None


def wav_info(path: str) -> Tuple[int, int, int]:
    """(channels, sample_rate, frames) — raises on parse failure."""
    lib = _load()
    if lib is None:
        raise RuntimeError("libsadio.so not built (make -C native)")
    with open(path, "rb") as f:
        data = f.read()
    ch = ctypes.c_int32()
    sr = ctypes.c_int32()
    fr = ctypes.c_int64()
    rc = lib.sadio_wav_info(data, len(data), ctypes.byref(ch),
                            ctypes.byref(sr), ctypes.byref(fr))
    if rc != 0:
        raise ValueError(f"{path}: sadio parse error {rc}")
    return ch.value, sr.value, fr.value


def read_mono(path: str, max_frames: Optional[int] = None) -> Tuple[np.ndarray, int]:
    """Decode + mean-downmix one WAV → (float32 [T], sample_rate)."""
    lib = _load()
    if lib is None:
        from synthetic_audio_detection_tpu.audio import wavio

        wf, sr = wavio.read_wav(path)
        mono = wf.mean(axis=0)
        if max_frames is not None:
            mono = mono[:max_frames]
        return mono.astype(np.float32), sr
    if max_frames is None:
        _, _, max_frames = wav_info(path)
    out = np.zeros(max(max_frames, 1), np.float32)
    sr = ctypes.c_int32()
    got = lib.sadio_decode_file_mono(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        max_frames, ctypes.byref(sr),
    )
    if got < 0:
        raise ValueError(f"{path}: sadio decode error {got}")
    return out[:got], sr.value


def resample_poly(
    x: np.ndarray, orig_sr: int, new_sr: int, threads: int = 0
) -> Optional[np.ndarray]:
    """Multithreaded C polyphase resample with the torchaudio-semantics kernel
    bank (ops/resample._sinc_kernels). Returns None when the library lacks the
    symbol (caller falls back to the numpy path)."""
    lib = _load()
    if lib is None or not hasattr(lib, "sadio_resample_poly"):
        return None
    import math

    from synthetic_audio_detection_tpu.ops.resample import _sinc_kernels

    if orig_sr == new_sr:
        return np.asarray(x, np.float32)
    kernels, width, orig_g, new_g = _sinc_kernels(orig_sr, new_sr)
    kern = np.ascontiguousarray(kernels[:, 0, :], np.float32)  # [new_g, L]
    x = np.ascontiguousarray(x, np.float32)
    target = int(math.ceil(new_g * len(x) / orig_g))
    out = np.empty(target, np.float32)
    got = lib.sadio_resample_poly(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(x),
        kern.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        new_g, orig_g, kern.shape[1], width,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), target, threads,
    )
    if got < 0:
        return None
    return out


def decode_batch(
    paths: List[str], max_frames: int, threads: int = 0
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode N files in parallel → (out [N, max_frames] zero-padded,
    lengths [N] (negative = per-file error), rates [N])."""
    lib = _load()
    if lib is None:
        from synthetic_audio_detection_tpu.audio import wavio

        out = np.zeros((len(paths), max_frames), np.float32)
        lengths = np.zeros(len(paths), np.int64)
        rates = np.zeros(len(paths), np.int32)
        for i, p in enumerate(paths):
            try:
                wf, sr = wavio.read_wav(p)
                mono = wf.mean(axis=0)[:max_frames]
                out[i, : len(mono)] = mono
                lengths[i] = len(mono)
                rates[i] = sr
            except Exception:
                lengths[i] = -1
        return out, lengths, rates

    n = len(paths)
    out = np.zeros((n, max_frames), np.float32)
    lengths = np.zeros(n, np.int64)
    rates = np.zeros(n, np.int32)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    lib.sadio_decode_batch(
        arr, n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), max_frames,
        lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        rates.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        threads,
    )
    return out, lengths, rates
