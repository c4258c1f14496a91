#!/usr/bin/env bash
# Round-5 phase 2, restructured to spend tunnel time once: the round-4
# decision-A/B cache already holds the TRAIN-tree fit logits for the
# logo_SynthD artifact, so only the CAL/EVAL halves of the held-out tree
# need fresh device passes; the train-fit arm is then synthesized OFFLINE
# by pairing the cached train fit logits with the new EVAL-half test
# logits (decision_ab --from-logits).
set -uo pipefail
D=${1:?usage: round5_phase2.sh <corpus-root>}
LOG="$D/campaign_logs"
mkdir -p "$LOG"
cd "$(dirname "$0")/.."

M4="$D/logo_SynthD/joint_model.ckpt.merged.ckpt"
OLD="$D/logo_SynthD_decision_ab.json.logits.npz"
[ -f "$M4" ] || { echo "no artifact $M4"; exit 1; }
[ -f "$OLD" ] || { echo "no round-4 cache $OLD"; exit 1; }

echo "=== carve $(date -u +%H:%M:%S)" | tee -a "$LOG/campaign5.log"
timeout 300 python tools/carve_eval_split.py --data-dir "$D/dataset/test" \
  --out-cal "$D/test_cal" --out-eval "$D/test_eval" \
  > "$LOG/carve_split.log" 2>&1 || exit 1

echo "=== ab_calfit $(date -u +%H:%M:%S)" | tee -a "$LOG/campaign5.log"
timeout 3600 python tools/decision_ab.py --merged-model "$M4" \
  --fit-dir "$D/test_cal" --data-dir "$D/test_eval" \
  --holdout SynthD --input-size native --bf16 --k 1 2 \
  --output "$D/calsplit_calfit.json" > "$LOG/ab_calfit.log" 2>&1 || exit 1

echo "=== ab_trainfit_offline $(date -u +%H:%M:%S)" | tee -a "$LOG/campaign5.log"
timeout 600 python - "$D" <<'EOF' > "$LOG/ab_trainfit.log" 2>&1 || exit 1
import sys, numpy as np
D = sys.argv[1]
old = np.load(f"{D}/logo_SynthD_decision_ab.json.logits.npz")
new = np.load(f"{D}/calsplit_calfit.json.logits.npz")
assert [str(s) for s in old["class_names"]] == [str(s) for s in new["class_names"]]
np.savez_compressed(
    f"{D}/calsplit_trainfit.synth.npz",
    fit_logits=old["fit_logits"], fit_class_idx=old["fit_class_idx"],
    test_logits=new["test_logits"], test_file_class=new["test_file_class"],
    test_file_count=new["test_file_count"], class_names=new["class_names"],
    real_name=new["real_name"],
    generic_head=np.array(False),
)
print("synthesized train-fit/eval-half cache")
EOF
timeout 600 python tools/decision_ab.py \
  --merged-model "$M4" --fit-dir "$D/dataset/train" \
  --data-dir "$D/test_eval" --holdout SynthD \
  --from-logits "$D/calsplit_trainfit.synth.npz" --k 1 2 \
  --output "$D/calsplit_trainfit.json" >> "$LOG/ab_trainfit.log" 2>&1 || exit 1

echo "=== phase2 done $(date -u +%H:%M:%S)" | tee -a "$LOG/campaign5.log"
