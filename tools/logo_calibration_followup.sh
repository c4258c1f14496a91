#!/usr/bin/env bash
# Calibration follow-up to the LOGO generalization study.
#
# The LOGO study (tools/generalization_study.sh, docs/PERFORMANCE.md)
# measured Real TNR collapsing under 5-head unanimity: per-head
# false-positive rates compound through the any-head rule as
# 1 - prod(1 - FPR_k). docs/PERFORMANCE.md names per-head threshold
# calibration (tools/calibrate_ensemble.py) as the framework's lever —
# this driver MEASURES that claim on the study's own artifacts:
# for each holdout's trained ensemble it fits per-column temperatures +
# the EER operating threshold on the TRAIN tree (the holdout class is
# absent from the ensemble's class names, so collect_logits_tree skips
# its folder automatically), re-runs the full-tree accuracy study with
# the calibrated checkpoint, and prints a before/after table against the
# uncalibrated run's JSON.
#
# Usage: tools/logo_calibration_followup.sh <corpus-root> [TAG] [Holdout ...]
#   <corpus-root>/logo_<G><TAG>/joint_model.ckpt.merged.ckpt must exist
#   (a completed generalization_study.sh run with the same TAG), as must
#   <corpus-root>/logo_<G><TAG>_full.json (the uncalibrated baseline).
# Env knobs: SIZE (native), BATCH (128).
set -euo pipefail
D=${1:?usage: logo_calibration_followup.sh <corpus-root> [TAG] [holdout...]}
TAG=${2:-}
shift 2 || shift || true
HOLDOUTS=("$@")
[ ${#HOLDOUTS[@]} -gt 0 ] || HOLDOUTS=(SynthA SynthD SynthF)
SIZE=${SIZE:-native}
BATCH=${BATCH:-128}
cd "$(dirname "$0")/.."

for G in "${HOLDOUTS[@]}"; do
  M="$D/logo_${G}${TAG}/joint_model.ckpt.merged.ckpt"
  CAL="$D/logo_${G}${TAG}_cal.ckpt"
  echo "=== holdout $G$TAG: fit temperatures + EER threshold on train tree"
  python tools/calibrate_ensemble.py --merged-model "$M" \
    --fit-dir "$D/dataset/train" --input-size "$SIZE" --bf16 \
    --batch-size "$BATCH" --store-eer-threshold --output "$CAL" \
    > "$D/logo_${G}${TAG}_calfit.json"
  echo "=== holdout $G$TAG: full-tree eval with calibration"
  python tools/accuracy_study.py --merged-model "$CAL" \
    --data-dir "$D/dataset/test" --input-size "$SIZE" --bf16 \
    --batch-size "$BATCH" > "$D/logo_${G}${TAG}_cal_full.json"
done

echo "=== summary (before -> after calibration)"
python - "$D" "$TAG" "${HOLDOUTS[@]}" <<'EOF'
import json, sys
d, tag, holdouts = sys.argv[1], sys.argv[2], sys.argv[3:]
print("| holdout | Real TNR | unseen TPR | seen TPR (mean) | threshold |")
print("|---|---|---|---|---|")
for g in holdouts:
    before = json.load(open(f"{d}/logo_{g}{tag}_full.json"))["per_class"]
    after = json.load(open(f"{d}/logo_{g}{tag}_cal_full.json"))["per_class"]
    fit = json.load(open(f"{d}/logo_{g}{tag}_calfit.json"))["calibration"]
    def seen(pc):
        vals = [v["binary"] for c, v in pc.items() if c not in ("Real", g)]
        return sum(vals) / len(vals)
    print(f"| {g} | {before['Real']['binary']:.3f} -> "
          f"{after['Real']['binary']:.3f} | "
          f"{before[g]['binary']:.3f} -> {after[g]['binary']:.3f} | "
          f"{seen(before):.3f} -> {seen(after):.3f} | "
          f"{fit.get('threshold', 0.5)} |")
EOF
