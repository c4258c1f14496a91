"""CLI flag-surface smoke tests: every compat CLI parses --help and rejects
missing required flags (catches import/argparse regressions cheaply; the
flag names are the reference's public API surface)."""

import subprocess
import sys

import pytest

CLIS = [
    "file_renamer",
    "audio_convert",
    "audio_augmenter",
    "audio_segmenter",
    "dataset_manager",
    "file_manager",
    "submodel_trainer",
    "model_merger",
    "inference_runner",
    "legacy_trainer",
    "legacy_inference",
]

# required reference flags per CLI (subset; names must match the reference)
REQUIRED_FLAGS = {
    "file_renamer": ["--input_dir", "--recursive"],
    "audio_convert": ["--input", "--output"],
    "audio_augmenter": ["--input", "--output", "--csv", "--pool-size"],
    "audio_segmenter": ["--input", "--output"],
    "dataset_manager": ["--input_dir", "--output_dir", "--split", "--threads"],
    "file_manager": ["--input_dir", "--fix"],
    "submodel_trainer": ["--data-dir", "--batch-size", "--epochs", "--lr",
                         "--workers", "--seed", "--checkpoint-dir",
                         "--resume", "--evaluate", "--Class0", "--Class1",
                         "--model-name"],
    "model_merger": ["--submodels-folder", "--csv-file", "--model-name",
                     "--output-path"],
    "inference_runner": ["--merged-model", "--audio", "--threshold",
                         "--device", "--confidence-threshold", "--smooth",
                         "--output-json"],
    "legacy_trainer": ["--data-dir", "--epochs", "--model-name"],
    "legacy_inference": ["--audio_path", "--checkpoint_path", "--output_dir",
                         "--confidence_threshold", "--IsBatch", "--parallel"],
}


@pytest.mark.parametrize("name", CLIS)
def test_cli_help(name):
    res = subprocess.run(
        [sys.executable, "-m", f"synthetic_audio_detection_tpu.cli.{name}",
         "--help"],
        capture_output=True, text=True, timeout=120,
    )
    assert res.returncode == 0, res.stderr[-500:]
    for flag in REQUIRED_FLAGS[name]:
        assert flag in res.stdout, f"{name} missing reference flag {flag}"


def test_required_flags_enforced():
    res = subprocess.run(
        [sys.executable, "-m",
         "synthetic_audio_detection_tpu.cli.model_merger"],
        capture_output=True, text=True, timeout=120,
    )
    assert res.returncode == 2
    assert "required" in res.stderr


def test_train_s2d_autogate_defers_to_stop_grad_boundary():
    """With the stop-grad freeze boundary on (default), layer1's backward is
    skipped and the s2d fold measured slightly negative (train_ab.py sg vs
    sg-s2d) — auto mode must not engage it; explicit --s2d-layer1 still wins."""
    from synthetic_audio_detection_tpu.cli.submodel_trainer import (
        _resolve_s2d,
        build_parser,
    )

    p = build_parser()
    auto_default = p.parse_args(["--data-dir", "x"])
    assert auto_default.stop_grad_boundary is True
    assert _resolve_s2d(auto_default) is False

    explicit = p.parse_args(["--data-dir", "x", "--s2d-layer1"])
    assert _resolve_s2d(explicit) is True

    no_sg = p.parse_args(["--data-dir", "x", "--no-stop-grad-boundary"])
    assert no_sg.stop_grad_boundary is False
    # auto in the no-boundary regime depends on the backend; just ensure it
    # doesn't raise and returns a bool
    assert _resolve_s2d(no_sg) in (True, False)


def test_inference_runner_audio_dir_exclusivity():
    """Folder mode (--audio-dir) and single-file mode (--audio) are mutually
    exclusive and one is required (the legacy --IsBatch precedent brought to
    the modular CLI)."""
    res = subprocess.run(
        [sys.executable, "-m",
         "synthetic_audio_detection_tpu.cli.inference_runner",
         "--merged-model", "x.pth"],
        capture_output=True, text=True, timeout=120,
    )
    assert res.returncode == 2
    assert "exactly one of --audio / --audio-dir" in res.stderr
