#!/usr/bin/env bash
# Round-5 TPU study campaign (VERDICT r4 items #4 and #5), sequenced so the
# most important results land first and a tunnel outage costs the tail.
#
#   1. GENERIC-HEAD LOGO arms SynthD, SynthF: the first lever aimed at the
#      unseen-generator RANKING (specialist heads measured chance-level in
#      both label regimes). Same protocol as the round-4 arms (6 ep, native,
#      bf16, b128, seed 0, hard negatives) plus --generic-head; each arm is
#      evaluated on the full test tree and the Real+holdout tree in BOTH
#      decision modes (reference unanimity / --generic-verdict, whose AUC
#      score is the generic head's probability).
#   2. Calibration-split protocol (Šidák drift): carve the held-out test
#      tree into group-disjoint CAL/EVAL halves, then decision_ab on the
#      round-4 logo_SynthD artifact fit on (a) the train tree [round-4
#      protocol] and (b) the CAL half — both evaluated on the same EVAL
#      half. Closes the "0.95 target lands at 0.76-0.78" finding with a
#      measured protocol fix.
#   3. Optional tail: SynthA generic arm (completes the 3-holdout table).
#
# Usage: tools/round5_campaign.sh <corpus-root> [logdir]
set -uo pipefail
D=${1:?usage: round5_campaign.sh <corpus-root> [logdir]}
LOG=${2:-$D/campaign_logs}
mkdir -p "$LOG"
cd "$(dirname "$0")/.."

step() {  # step <name> <timeout-secs> <cmd...>
  local name=$1 tmo=$2; shift 2
  echo "=== $name start $(date -u +%H:%M:%S)" | tee -a "$LOG/campaign5.log"
  timeout "$tmo" "$@" > "$LOG/$name.log" 2>&1
  local rc=$?
  echo "=== $name rc=$rc $(date -u +%H:%M:%S)" | tee -a "$LOG/campaign5.log"
  return $rc
}

stepj() {  # stepj <name> <timeout-secs> <json-out> <cmd...> — stdout is JSON
  local name=$1 tmo=$2 out=$3; shift 3
  echo "=== $name start $(date -u +%H:%M:%S)" | tee -a "$LOG/campaign5.log"
  timeout "$tmo" "$@" > "$out" 2> "$LOG/$name.log"
  local rc=$?
  echo "=== $name rc=$rc $(date -u +%H:%M:%S)" | tee -a "$LOG/campaign5.log"
  return $rc
}

gen_arm() {  # gen_arm <holdout>
  local G=$1
  local ALL SYN CK M EV
  ALL=$(ls "$D/dataset/test" | grep -v '^Real$')
  SYN=$(echo "$ALL" | grep -vx "$G" | tr '\n' ' ')
  CK="$D/logo_${G}_gen"
  step "train_${G}_gen" 4800 \
    python -m synthetic_audio_detection_tpu.cli.ensemble_trainer \
      --data-dir "$D/dataset" --synthetic-classes $SYN \
      --epochs 6 --batch-size 128 --seed 0 \
      --bf16 --input-size native --generic-head \
      --checkpoint-dir "$CK" || return 1
  M="$CK/joint_model.ckpt.merged.ckpt"
  EV="$D/logo_${G}_gen_eval"
  rm -rf "$EV"; mkdir -p "$EV"
  ln -s "$(cd "$D/dataset/test/Real" && pwd)" "$EV/Real"
  ln -s "$(cd "$D/dataset/test/$G" && pwd)" "$EV/$G"
  # both decision modes on both trees (4 evals; the pipeline recompiles per
  # process — each is its own timeout-bounded step)
  stepj "eval_${G}_gen_full_ref" 1800 "$D/logo_${G}_gen_full.json" \
    python tools/accuracy_study.py --merged-model "$M" \
      --data-dir "$D/dataset/test" --input-size native --bf16
  stepj "eval_${G}_gen_full_gv" 1800 "$D/logo_${G}_gen_full_gv.json" \
    python tools/accuracy_study.py --merged-model "$M" \
      --data-dir "$D/dataset/test" --input-size native --bf16 --generic-verdict
  stepj "eval_${G}_gen_unseen_ref" 1800 "$D/logo_${G}_gen_unseen.json" \
    python tools/accuracy_study.py --merged-model "$M" \
      --data-dir "$EV" --input-size native --bf16
  stepj "eval_${G}_gen_unseen_gv" 1800 "$D/logo_${G}_gen_unseen_gv.json" \
    python tools/accuracy_study.py --merged-model "$M" \
      --data-dir "$EV" --input-size native --bf16 --generic-verdict
}

# phase 1: the two arms with complete round-4 baselines
gen_arm SynthD
gen_arm SynthF

# phase 2: calibration-split protocol on the round-4 HN SynthD artifact
M4="$D/logo_SynthD/joint_model.ckpt.merged.ckpt"
if [ -f "$M4" ]; then
  step "carve_split" 300 \
    python tools/carve_eval_split.py --data-dir "$D/dataset/test" \
      --out-cal "$D/test_cal" --out-eval "$D/test_eval"
  step "ab_trainfit" 3600 \
    python tools/decision_ab.py --merged-model "$M4" \
      --fit-dir "$D/dataset/train" --data-dir "$D/test_eval" \
      --holdout SynthD --input-size native --bf16 --k 1 2 \
      --output "$D/calsplit_trainfit.json"
  step "ab_calfit" 3600 \
    python tools/decision_ab.py --merged-model "$M4" \
      --fit-dir "$D/test_cal" --data-dir "$D/test_eval" \
      --holdout SynthD --input-size native --bf16 --k 1 2 \
      --output "$D/calsplit_calfit.json"
fi

# phase 3 (optional tail): complete the generic 3-holdout table
gen_arm SynthA

echo "=== campaign5 done $(date -u)" | tee -a "$LOG/campaign5.log"
