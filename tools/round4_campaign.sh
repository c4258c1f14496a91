#!/usr/bin/env bash
# Round-4 TPU study campaign (VERDICT r3 items #3 and #4), sequenced so the
# most important results land first and a tunnel outage costs the tail, not
# the head. Every step is timeout-bounded; a failed step logs and continues.
#
#   1. HN LOGO arms SynthD, SynthF (recreates the entry-30 artifacts the
#      sandbox recycle destroyed; evals reproduce the baseline table)
#   2. decision-layer A/B on each HN artifact (tools/decision_ab.py:
#      reference unanimity vs calibrated scalar EER vs per-column EER at
#      K=1,2 — one device pass per tree, variants evaluated host-side)
#   3. wave-augment LOGO arms SynthD, SynthF (the augmentation lever arm
#      SynthA was measured in session 11; D/F were stalled by the hang)
#   4. HN SynthA arm + its A/B (completes the 3-holdout table)
#
# Usage: tools/round4_campaign.sh <corpus-root> [logdir]
set -uo pipefail
D=${1:?usage: round4_campaign.sh <corpus-root> [logdir]}
LOG=${2:-$D/campaign_logs}
mkdir -p "$LOG"
cd "$(dirname "$0")/.."

step() {  # step <name> <timeout-secs> <cmd...>
  local name=$1 tmo=$2; shift 2
  echo "=== $name start $(date -u +%H:%M:%S)" | tee -a "$LOG/campaign.log"
  timeout "$tmo" "$@" > "$LOG/$name.log" 2>&1
  local rc=$?
  echo "=== $name rc=$rc $(date -u +%H:%M:%S)" | tee -a "$LOG/campaign.log"
  return $rc
}

stepj() {  # stepj <name> <timeout-secs> <json-out> <cmd...> — stdout is JSON
  local name=$1 tmo=$2 out=$3; shift 3
  echo "=== $name start $(date -u +%H:%M:%S)" | tee -a "$LOG/campaign.log"
  timeout "$tmo" "$@" > "$out" 2> "$LOG/$name.log"
  local rc=$?
  echo "=== $name rc=$rc $(date -u +%H:%M:%S)" | tee -a "$LOG/campaign.log"
  return $rc
}

train_arm() {  # train_arm <holdout> <tag> <extra...>
  local G=$1 TAG=$2; shift 2
  local ALL SYN CK
  ALL=$(ls "$D/dataset/test" | grep -v '^Real$')
  SYN=$(echo "$ALL" | grep -vx "$G" | tr '\n' ' ')
  CK="$D/logo_${G}${TAG}"
  step "train_${G}${TAG}" 4800 \
    python -m synthetic_audio_detection_tpu.cli.ensemble_trainer \
      --data-dir "$D/dataset" --synthetic-classes $SYN \
      --epochs 6 --batch-size 128 --seed 0 \
      --bf16 --input-size native --checkpoint-dir "$CK" "$@" || return 1
  local M="$CK/joint_model.ckpt.merged.ckpt"
  stepj "eval_${G}${TAG}_full" 1800 "$D/logo_${G}${TAG}_full.json" \
    python tools/accuracy_study.py --merged-model "$M" \
      --data-dir "$D/dataset/test" --input-size native --bf16
  local EV="$D/logo_${G}${TAG}_eval"
  rm -rf "$EV"; mkdir -p "$EV"
  ln -s "$(cd "$D/dataset/test/Real" && pwd)" "$EV/Real"
  ln -s "$(cd "$D/dataset/test/$G" && pwd)" "$EV/$G"
  stepj "eval_${G}${TAG}_unseen" 1800 "$D/logo_${G}${TAG}_unseen.json" \
    python tools/accuracy_study.py --merged-model "$M" \
      --data-dir "$EV" --input-size native --bf16
}

ab_arm() {  # ab_arm <holdout>
  local G=$1
  local M="$D/logo_${G}/joint_model.ckpt.merged.ckpt"
  [ -f "$M" ] || { echo "ab_${G}: no model" | tee -a "$LOG/campaign.log"; return 1; }
  step "ab_${G}" 3600 \
    python tools/decision_ab.py --merged-model "$M" \
      --fit-dir "$D/dataset/train" --data-dir "$D/dataset/test" \
      --holdout "$G" --input-size native --bf16 --k 1 2 \
      --output "$D/logo_${G}_decision_ab.json"
}

# phase 1+2: HN arms D, F with A/B right after each (results land early)
train_arm SynthD "" && ab_arm SynthD
train_arm SynthF "" && ab_arm SynthF

# phase 3: wave-augment arms (the stalled VERDICT #3 measurement)
train_arm SynthD "_waug" --wave-augment
train_arm SynthF "_waug" --wave-augment

# phase 4: StableHLO artifact drive on chip (VERDICT #6) with a real model
M="$D/logo_SynthD/joint_model.ckpt.merged.ckpt"
if [ -f "$M" ]; then
  stepj "stablehlo_drive" 2400 "$D/stablehlo_drive.json" \
    python tools/stablehlo_drive.py --merged-model "$M" \
      --audio-dir "$D/dataset/test/Real" --input-size native --bf16
fi

# phase 4b: native stage decomposition recheck (post-factored-kernel front
# end fraction — the ceiling-certificate input, VERDICT weak #6)
step "stage_decomp_native" 2400 \
  python benchmarks/stage_decomp.py --input-size native --mono

# phase 5 (optional tail): complete the 3-holdout table
train_arm SynthA "" && ab_arm SynthA

echo "=== campaign done $(date -u)" | tee -a "$LOG/campaign.log"
