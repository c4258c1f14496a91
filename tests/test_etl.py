"""ETL pipeline tests: rename → convert → segment → split → leakage audit
(the reference's L1 layer, SURVEY.md §3.4) end-to-end on synthesized WAVs."""

import os

import numpy as np
import pytest

from synthetic_audio_detection_tpu.audio import wavio
from synthetic_audio_detection_tpu.data import etl


def make_wav(path, seconds=1.0, sr=44100, freq=440.0, channels=2):
    t = np.arange(int(seconds * sr)) / sr
    y = (0.5 * np.sin(2 * np.pi * freq * t)).astype(np.float32)
    wavio.write_wav(path, np.stack([y] * channels), sr)


def test_rename_is_hash_prefix(tmp_path):
    p = tmp_path / "song.wav"
    make_wav(p)
    renamed = etl.rename_files(str(tmp_path))
    assert len(renamed) == 1
    new = os.path.basename(renamed[0][1])
    stem, ext = os.path.splitext(new)
    assert ext == ".wav" and len(stem) == 16
    assert all(c in "0123456789abcdef" for c in stem)
    # deterministic: renaming again is a no-op (same content → same name)
    assert etl.rename_files(str(tmp_path)) == []


def test_convert_resamples_and_downmixes(tmp_path):
    src = tmp_path / "in"
    dst = tmp_path / "out"
    src.mkdir()
    make_wav(src / "a.wav", seconds=0.5, sr=44100, channels=2)
    errors = etl.convert_directory(str(src), str(dst))
    assert errors == []
    wf, sr = wavio.read_wav(dst / "a.wav")
    assert sr == 32000
    assert wf.shape[0] == 1  # mono
    assert abs(wf.shape[1] - 16000) <= 2


def test_segmenter_naming_contract(tmp_path):
    src = tmp_path / "abcdef0123456789.wav"
    make_wav(src, seconds=9.5, sr=32000, channels=1)
    out = tmp_path / "segs"
    paths = etl.split_audio(str(src), str(out))
    names = [os.path.basename(p) for p in paths]
    # 9.5 s → two full 4 s segments + one 1.5 s trailing partial (ffmpeg
    # -f segment keeps the tail)
    assert names == [
        "abcdef0123456789_Segment_000.wav",
        "abcdef0123456789_Segment_001.wav",
        "abcdef0123456789_Segment_002.wav",
    ]
    wf, sr = wavio.read_wav(paths[0])
    assert sr == 32000 and wf.shape[1] == 128000
    wf, _ = wavio.read_wav(paths[2])
    assert wf.shape[1] == int(1.5 * 32000)


def _build_class_tree(tmp_path, n_sources=6, segs_per_source=4):
    src_dir = tmp_path / "classes" / "Real"
    src_dir.mkdir(parents=True)
    rng = np.random.default_rng(0)
    for i in range(n_sources):
        h = f"{i:016x}"
        for s in range(segs_per_source):
            y = (rng.standard_normal(8000) * 0.1).astype(np.float32)
            wavio.write_wav(src_dir / f"{h}_Segment_{s:03d}.wav", y, 32000)
    return tmp_path / "classes"


def test_group_aware_split_has_no_leakage(tmp_path):
    classes = _build_class_tree(tmp_path)
    out = tmp_path / "dataset"
    report = etl.split_dataset(str(classes), str(out), 0.5, seed=1)
    tr, te = report.per_class["Real"]
    assert tr + te == 24
    assert tr > 0 and te > 0
    audit = etl.check_overlap(str(out))
    assert audit.clean


def test_file_level_split_then_fix(tmp_path):
    classes = _build_class_tree(tmp_path)
    out = tmp_path / "dataset"
    etl.split_dataset(str(classes), str(out), 0.5, seed=3, group_aware=False)
    audit = etl.check_overlap(str(out))
    # file-level split of 4-segment groups virtually guarantees leakage
    assert not audit.clean
    fixed = etl.check_overlap(str(out), fix=True)
    assert fixed.moved > 0 or fixed.deleted > 0
    assert etl.check_overlap(str(out)).clean


def test_group_key_extraction():
    assert etl.extract_group_key("abc123_Segment_001.wav") == "abc123"
    assert etl.extract_group_key("abc123_speed_up_1.2_Segment_001.wav") == "abc123"
    assert etl.extract_group_key("plain.wav") == "plain"


def test_threaded_split_deterministic(tmp_path):
    """Seeded splits must be identical regardless of thread count: the RNG is
    derived per (seed, class), so worker interleaving cannot perturb it."""
    def build(root):
        rng = np.random.default_rng(0)
        for cls in ("Real", "SynA", "SynB"):
            d = root / cls
            d.mkdir(parents=True)
            for i in range(6):
                h = f"{cls}{i:014x}"[:16]
                for s in range(3):
                    y = (rng.standard_normal(4000) * 0.1).astype(np.float32)
                    wavio.write_wav(d / f"{h}_Segment_{s:03d}.wav", y, 32000)

    def run(tag, threads):
        root = tmp_path / f"in_{tag}"
        build(root)
        out = tmp_path / f"out_{tag}"
        etl.split_dataset(str(root), str(out), 0.5, seed=7, threads=threads)
        return {
            (split, cls): sorted(os.listdir(out / split / cls))
            for split in ("train", "test")
            for cls in ("Real", "SynA", "SynB")
            if (out / split / cls).is_dir()
        }

    a = run("a", threads=1)
    b = run("b", threads=4)
    c = run("c", threads=4)
    assert a == b == c


def test_group_aware_split_tiny_corpus_keeps_test_nonempty(tmp_path):
    """Greedy group fill must not drain every group into train when the
    per-group overshoot spans the whole class (4 sources at ratio 0.8)."""
    from synthetic_audio_detection_tpu.data import etl

    src = tmp_path / "seg" / "Real"
    src.mkdir(parents=True)
    for g in range(4):
        for s in range(11):
            (src / f"{g:016x}_aug_{s}_Segment_000.wav").write_bytes(b"RIFF")
    report = etl.split_dataset(
        str(tmp_path / "seg"), str(tmp_path / "ds"),
        split_ratio=0.8, seed=3,
    )
    train, test = report.per_class["Real"]
    assert train > 0 and test > 0
    # still leakage-free: no group on both sides
    train_groups = {f.split("_")[0]
                    for f in os.listdir(tmp_path / "ds" / "train" / "Real")}
    test_groups = {f.split("_")[0]
                   for f in os.listdir(tmp_path / "ds" / "test" / "Real")}
    assert not (train_groups & test_groups)
