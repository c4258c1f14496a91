#!/usr/bin/env bash
# Train the FULL ensemble for a study corpus: one binary head per synthetic
# class (reference recipe: Real-vs-one-generator, submodel_trainer.py:43-47),
# merge them with the CSV-driven merger, and run the held-out accuracy study.
#
# The reference makes users drive each head training by hand; this is the
# one-command orchestrator. Expects the tree tools/run_study_pipeline.sh
# produces: <corpus-root>/dataset/{train,test}/<ClassName>/*.wav
#
# Usage: tools/train_study_ensemble.sh <corpus-root>
#   EPOCHS=6 INPUT_SIZE=native BATCH=128 HARD_NEG=0 SEED=42 BF16=1 WORKERS=8
#   env knobs override the defaults. HARD_NEG=1 folds every OTHER generator's
#   segments into each head's Class0 (--hard-negative-classes), turning the
#   head from "synthetic?" into "THIS generator?" (docs/PERFORMANCE.md,
#   attribution hard-negatives study).
#   JOINT=1 trains ALL heads in one pass with the joint ensemble trainer
#   (train/joint.py: shared backbone fwd/bwd + vmapped heads, hard negatives
#   built in — ~N heads for the cost of one) instead of the sequential
#   per-head loop; the merge step is skipped (the joint trainer emits the
#   merged artifact directly). PER_HEAD_STAGES=K (with JOINT=1) trains the
#   trailing K ResNet stages per head on the shared trunk (K=1: per-head
#   layer4 — sequential-run specialization capacity at joint cost).
# Output under <corpus-root>/ensemble/: heads/<cls>/best_model.ckpt,
#   recipe.csv, merged.pth, study.json
set -euo pipefail
D=${1:?usage: train_study_ensemble.sh <corpus-root>}
EPOCHS=${EPOCHS:-6}
INPUT_SIZE=${INPUT_SIZE:-native}
BATCH=${BATCH:-128}
HARD_NEG=${HARD_NEG:-0}
SEED=${SEED:-42}
BF16=${BF16:-1}
WORKERS=${WORKERS:-8}
JOINT=${JOINT:-0}
PER_HEAD_STAGES=${PER_HEAD_STAGES:-0}
cd "$(dirname "$0")/.."

classes=$(ls "$D/dataset/train" | grep -v '^Real$')
E="${OUT:-$D/ensemble}"
mkdir -p "$E/heads"
bf16_flag=""
[ "$BF16" = "1" ] && bf16_flag="--bf16"

if [ "$JOINT" = "1" ]; then
  echo "=== joint ensemble training: $classes (epochs=$EPOCHS input=$INPUT_SIZE batch=$BATCH)"
  # shellcheck disable=SC2086
  python -m synthetic_audio_detection_tpu.cli.ensemble_trainer \
    --data-dir "$D/dataset" --real-class Real \
    --synthetic-classes $classes \
    --epochs "$EPOCHS" --batch-size "$BATCH" --input-size "$INPUT_SIZE" \
    $bf16_flag --workers "$WORKERS" --seed "$SEED" \
    --per-head-stages "$PER_HEAD_STAGES" \
    --checkpoint-dir "$E/joint" --log-dir "$E/runs/joint"
  cp "$E/joint/joint_model.ckpt.merged.pth" "$E/merged.pth"
  echo "=== held-out study"
  # shellcheck disable=SC2086
  python tools/accuracy_study.py --merged-model "$E/merged.pth" \
    --data-dir "$D/dataset/test" --input-size "$INPUT_SIZE" $bf16_flag \
    | tee "$E/study.json"
  echo "=== done: $E"
  exit 0
fi

echo "=== heads: $classes (epochs=$EPOCHS input=$INPUT_SIZE batch=$BATCH hard_neg=$HARD_NEG)"
: > "$E/recipe.csv"
echo "model_filename,synthetic_class,real_class" >> "$E/recipe.csv"
for cls in $classes; do
  hn_flag=""
  if [ "$HARD_NEG" = "1" ]; then
    others=$(echo "$classes" | grep -v "^$cls$" | tr '\n' ' ')
    hn_flag="--hard-negative-classes $others"
  fi
  echo "=== training head: Real vs $cls"
  # shellcheck disable=SC2086
  python -m synthetic_audio_detection_tpu.cli.submodel_trainer \
    --data-dir "$D/dataset" --Class0 Real --Class1 "$cls" \
    --epochs "$EPOCHS" --batch-size "$BATCH" --input-size "$INPUT_SIZE" \
    $bf16_flag $hn_flag --workers "$WORKERS" --seed "$SEED" \
    --checkpoint-dir "$E/heads/$cls" --log-dir "$E/runs/$cls"
  echo "heads/$cls/best_model.ckpt,$cls,Real" >> "$E/recipe.csv"
done

echo "=== merging $(echo "$classes" | wc -w) heads"
python -m synthetic_audio_detection_tpu.cli.model_merger \
  --submodels-folder "$E" --csv-file "$E/recipe.csv" \
  --output-path "$E/merged.pth"

echo "=== held-out study"
# shellcheck disable=SC2086
python tools/accuracy_study.py --merged-model "$E/merged.pth" \
  --data-dir "$D/dataset/test" --input-size "$INPUT_SIZE" $bf16_flag \
  | tee "$E/study.json"
echo "=== done: $E"
