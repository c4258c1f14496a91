"""Native sadio library vs the pure-Python wavio reader (byte-identical
decode + downmix contract)."""

import os
import subprocess

import numpy as np
import pytest

from synthetic_audio_detection_tpu.audio import native, wavio

NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "native")


@pytest.fixture(scope="module", autouse=True)
def build_native():
    subprocess.run(["make", "-C", NATIVE_DIR, "-s"], check=True)
    assert native.available()


def _write(tmp_path, name, data, sr=32000, subtype="PCM_16"):
    p = tmp_path / name
    wavio.write_wav(p, data, sr, subtype)
    return str(p)


def test_info_and_mono_match_python(tmp_path, rng):
    x = np.clip(rng.standard_normal((2, 5000)) * 0.3, -0.99, 0.99).astype(np.float32)
    p = _write(tmp_path, "a.wav", x, 44100)
    ch, sr, frames = native.wav_info(p)
    assert (ch, sr, frames) == (2, 44100, 5000)
    mono, sr2 = native.read_mono(p)
    assert sr2 == 44100
    ref, _ = wavio.read_wav(p)
    np.testing.assert_allclose(mono, ref.mean(axis=0), atol=1e-7)


def test_float32_wav(tmp_path, rng):
    x = rng.standard_normal((1, 3000)).astype(np.float32)
    p = _write(tmp_path, "f.wav", x, 16000, "FLOAT")
    mono, sr = native.read_mono(p)
    np.testing.assert_allclose(mono, x[0], atol=0)
    assert sr == 16000


def test_batch_decode(tmp_path, rng):
    paths = []
    refs = []
    for i in range(5):
        x = np.clip(rng.standard_normal((2, 1000 + 100 * i)) * 0.2, -1, 1).astype(np.float32)
        paths.append(_write(tmp_path, f"b{i}.wav", x, 32000))
        refs.append(x.mean(axis=0))
    paths.append(str(tmp_path / "missing.wav"))  # per-file error isolation
    out, lengths, rates = native.decode_batch(paths, max_frames=2000, threads=3)
    assert out.shape == (6, 2000)
    for i, r in enumerate(refs):
        assert lengths[i] == len(r)
        assert rates[i] == 32000
        ref_q, _ = wavio.read_wav(paths[i])
        np.testing.assert_allclose(out[i, : len(r)], ref_q.mean(axis=0), atol=1e-7)
        np.testing.assert_array_equal(out[i, len(r):], 0)
    assert lengths[5] < 0  # missing file reported, others unaffected
