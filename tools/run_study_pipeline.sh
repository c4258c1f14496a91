#!/usr/bin/env bash
# End-to-end study ETL: raw corpus -> the reference's 6-CLI chain -> split tree.
#
# Mirrors the reference pipeline order (SURVEY.md section 3.4):
#   file_renamer -> audio_convert -> audio_augmenter -> audio_segmenter
#   -> dataset_manager -> file_manager
# run per class folder so class identity survives as directory structure.
#
# Usage: tools/run_study_pipeline.sh <corpus-root> [split-seed]
#   <corpus-root> must contain raw/<ClassName>/*.wav
#   (e.g. from tools/gen_study_corpus.py --out <corpus-root>).
# Produces <corpus-root>/dataset/{train,test}/<ClassName>/*.wav
set -euo pipefail
D=${1:?usage: run_study_pipeline.sh <corpus-root> [split-seed]}
SEED=${2:-11}
cd "$(dirname "$0")/.."

for cls in $(ls "$D/raw"); do
  echo "=== $cls: rename -> convert -> augment -> segment"
  python -m synthetic_audio_detection_tpu.cli.file_renamer -i "$D/raw/$cls"
  python -m synthetic_audio_detection_tpu.cli.audio_convert \
    -i "$D/raw/$cls" -o "$D/conv/$cls"
  python -m synthetic_audio_detection_tpu.cli.audio_augmenter \
    -i "$D/conv/$cls" -o "$D/aug/$cls" -c "$D/aug_${cls}.csv" --seed "$SEED"
  python -m synthetic_audio_detection_tpu.cli.audio_segmenter \
    -i "$D/aug/$cls" -o "$D/seg/$cls"
done

echo "=== split + leakage audit"
python -m synthetic_audio_detection_tpu.cli.dataset_manager \
  -i "$D/seg" -o "$D/dataset" -s 0.8 --seed "$SEED"
python -m synthetic_audio_detection_tpu.cli.file_manager -i "$D/dataset"
echo "=== done: $D/dataset"
