#!/usr/bin/env bash
# Incremental-head study row (VERDICT r4 #6 'done' criterion): grow a
# SynthD head onto the round-4 logo_SynthD artifact (trained WITHOUT
# SynthD) against its frozen trunk, then evaluate the grown artifact on
# the full held-out tree. Comparators:
#   - before: runs/study/logo_SynthD_full.json (SynthD binary 0.5763,
#     attribution 0.0 — unseen)
#   - from-scratch joint with SynthD seen: logo_SynthA_full.json's SynthD
#     row (binary 0.9435, attribution 0.904)
# Usage: tools/round5_addhead_study.sh <corpus-root>
set -uo pipefail
D=${1:?usage: round5_addhead_study.sh <corpus-root>}
LOG="$D/campaign_logs"
mkdir -p "$LOG"
cd "$(dirname "$0")/.."

M="$D/logo_SynthD/joint_model.ckpt.merged.ckpt"
OUT="$D/logo_SynthD_plusD.ckpt"
echo "=== addhead_train $(date -u +%H:%M:%S)" | tee -a "$LOG/campaign5.log"
timeout 3600 python -m synthetic_audio_detection_tpu.cli.add_head \
  --merged-model "$M" --data-dir "$D/dataset" --new-class SynthD \
  --epochs 3 --batch-size 64 --bf16 --input-size native \
  --output "$OUT" > "$LOG/addhead_train.log" 2>&1 || exit 1
echo "=== addhead_eval $(date -u +%H:%M:%S)" | tee -a "$LOG/campaign5.log"
timeout 1800 python tools/accuracy_study.py --merged-model "$OUT" \
  --data-dir "$D/dataset/test" --input-size native --bf16 \
  > "$D/logo_SynthD_plusD_full.json" 2> "$LOG/addhead_eval.log" || exit 1
echo "=== addhead done $(date -u +%H:%M:%S)" | tee -a "$LOG/campaign5.log"
