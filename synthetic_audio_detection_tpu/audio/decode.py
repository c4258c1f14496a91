"""Container-agnostic audio decode for the serving path.

The reference's inference_runner decodes via ``torchaudio.load``
(inference_runner.py:145), which accepts flac/mp3/ogg as well as WAV. Here
WAV goes through the native RIFF parser and anything else is decoded by
ffmpeg to a temporary WAV at its ORIGINAL sample rate and channel count
(resampling/downmix stay the caller's responsibility, matching torchaudio's
behavior of returning the file as stored). A clear error is raised when
ffmpeg is unavailable — the same dependency posture as data/etl.py's convert
shim (audio_convert.py:26-34 requires ffmpeg for non-WAV too).
"""

from __future__ import annotations

import os
import shutil
import subprocess
import tempfile
from typing import Tuple

import numpy as np

from synthetic_audio_detection_tpu.audio import wavio


def have_ffmpeg() -> bool:
    return shutil.which("ffmpeg") is not None


def load_audio(path: str) -> Tuple[np.ndarray, int]:
    """Decode any audio container to (waveform [C, T] float32, sample_rate).

    WAV → native parser; other containers → ffmpeg (original rate/channels),
    mirroring torchaudio.load's contract (inference_runner.py:145).
    """
    ext = os.path.splitext(path)[1].lower()
    if ext == ".wav":
        return wavio.read_wav(path)
    if not os.path.exists(path):
        raise FileNotFoundError(path)
    if not have_ffmpeg():
        raise RuntimeError(
            f"{path}: decoding {ext or 'extension-less'} audio requires "
            "ffmpeg (not installed). The reference decodes via torchaudio "
            "(inference_runner.py:145); install ffmpeg or convert to WAV."
        )
    fd, tmp = tempfile.mkstemp(suffix=".wav")
    os.close(fd)
    try:
        res = subprocess.run(
            [
                "ffmpeg", "-loglevel", "error", "-y", "-i", path,
                # float WAV: torchaudio.load returns full-precision floats,
                # so 24-bit/float sources must not be truncated to 16 bits
                "-c:a", "pcm_f32le", tmp,
            ],
            capture_output=True,
            text=True,
        )
        if res.returncode != 0:
            raise RuntimeError(f"{path}: ffmpeg decode failed: {res.stderr.strip()}")
        return wavio.read_wav(tmp)
    finally:
        try:
            os.unlink(tmp)
        except OSError:
            pass
