"""Grain input pipeline: batch contract + corrupt-file weighting."""

import numpy as np
import pytest

from synthetic_audio_detection_tpu.audio import wavio
from synthetic_audio_detection_tpu.data.grain_pipeline import make_grain_loader


@pytest.fixture()
def wav_tree(tmp_path, rng):
    samples = []
    for i in range(8):
        p = tmp_path / f"{i:016x}.wav"
        # > 0.9 of one segment so the short-file policy keeps it
        y = (rng.standard_normal(120_000) * 0.2).astype(np.float32)
        wavio.write_wav(p, y, 32_000)
        samples.append((str(p), i % 2))
    # one corrupt file: must yield weight-0 rows, not crash the epoch
    bad = tmp_path / "bad.wav"
    bad.write_bytes(b"not a wav at all")
    samples.append((str(bad), 1))
    return samples


def test_grain_batches_contract(wav_tree):
    loader = make_grain_loader(wav_tree, batch_size=3, shuffle=True, seed=0,
                               workers=0, drop_remainder=True)
    batches = list(loader)
    assert len(batches) == 3  # 9 files // 3
    total_zero_weight = 0
    for b in batches:
        assert b["audio"].shape == (6, 128_000)
        assert b["label"].shape == (6,) and b["label"].dtype == np.int32
        assert b["weight"].shape == (6,)
        total_zero_weight += int((b["weight"] == 0).sum())
    assert total_zero_weight == 2  # the corrupt file's two rows


def test_grain_shuffle_determinism(wav_tree):
    a = [b["label"].tolist() for b in make_grain_loader(
        wav_tree, 3, seed=7, workers=0)]
    b = [b["label"].tolist() for b in make_grain_loader(
        wav_tree, 3, seed=7, workers=0)]
    assert a == b
    c = [b["label"].tolist() for b in make_grain_loader(
        wav_tree, 3, seed=8, workers=0)]
    assert a != c or len(a) == 0  # different seed ⇒ different order (w.h.p.)
