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
