#!/usr/bin/env bash
# Leave-one-generator-out (LOGO) generalization study.
#
# The product question for a deepfake detector: does it flag audio from a
# synthesis method it NEVER trained on? The reference offers no way to ask
# it (its evaluation is the trainer's own val split, submodel_trainer.py
# :376-383). This study holds each chosen generator out of training
# entirely, trains a joint ensemble on the remaining generators
# (cli/ensemble_trainer.py, hard negatives built in), and measures on the
# held-out split:
#   - unseen TPR: fraction of the held-out generator's test segments the
#     unanimity rule flags Synthetic (per_class[G].binary in the report);
#   - seen TPR / Real TNR as controls, from the same full-tree pass;
#   - clean unseen AUC/EER from a Real-vs-held-out-only tree.
#
# Usage: tools/generalization_study.sh <corpus-root> [HoldoutClass ...]
#   <corpus-root> must contain dataset/{train,test}/<Class>/*.wav
#   (tools/gen_study_corpus.py + tools/run_study_pipeline.sh).
#   Default holdouts: SynthA SynthD SynthF (tremolo AM / bit-crush / tonal
#   peaks — three unrelated artifact families).
# Env knobs: EPOCHS (6), BATCH (128), SIZE (native), SEED (0),
#   EXTRA (extra ensemble_trainer flags, e.g. "--no-hard-negatives"),
#   TAG (suffix for output files, e.g. "_noHN").
set -euo pipefail
D=${1:?usage: generalization_study.sh <corpus-root> [holdout...]}
shift || true
HOLDOUTS=("$@")
[ ${#HOLDOUTS[@]} -gt 0 ] || HOLDOUTS=(SynthA SynthD SynthF)
EPOCHS=${EPOCHS:-6}
BATCH=${BATCH:-128}
SIZE=${SIZE:-native}
SEED=${SEED:-0}
EXTRA=${EXTRA:-}
TAG=${TAG:-}
cd "$(dirname "$0")/.."

ALL=$(ls "$D/dataset/test" | grep -v '^Real$')

for G in "${HOLDOUTS[@]}"; do
  SYN=$(echo "$ALL" | grep -vx "$G" | tr '\n' ' ')
  CK="$D/logo_${G}${TAG}"
  echo "=== holdout $G$TAG: train joint ensemble on: $SYN"
  python -m synthetic_audio_detection_tpu.cli.ensemble_trainer \
    --data-dir "$D/dataset" --synthetic-classes $SYN \
    --epochs "$EPOCHS" --batch-size "$BATCH" --seed "$SEED" \
    --bf16 --input-size "$SIZE" --checkpoint-dir "$CK" $EXTRA
  M="$CK/joint_model.ckpt.merged.ckpt"
  echo "=== holdout $G: full-tree eval (seen TPR + unseen TPR + Real TNR)"
  python tools/accuracy_study.py --merged-model "$M" \
    --data-dir "$D/dataset/test" --input-size "$SIZE" --bf16 \
    > "$D/logo_${G}${TAG}_full.json"
  echo "=== holdout $G: Real-vs-$G eval (clean unseen AUC/EER)"
  EV="$D/logo_${G}${TAG}_eval"
  rm -rf "$EV"; mkdir -p "$EV"
  ln -s "$(cd "$D/dataset/test/Real" && pwd)" "$EV/Real"
  ln -s "$(cd "$D/dataset/test/$G" && pwd)" "$EV/$G"
  python tools/accuracy_study.py --merged-model "$M" \
    --data-dir "$EV" --input-size "$SIZE" --bf16 \
    > "$D/logo_${G}${TAG}_unseen.json"
done

echo "=== summary"
python - "$D" "$TAG" "${HOLDOUTS[@]}" <<'EOF'
import json, sys
d, tag, holdouts = sys.argv[1], sys.argv[2], sys.argv[3:]
print(f"| holdout | unseen TPR | seen TPR (mean) | Real TNR | unseen AUC | unseen EER |")
print("|---|---|---|---|---|---|")
for g in holdouts:
    full = json.load(open(f"{d}/logo_{g}{tag}_full.json"))
    uns = json.load(open(f"{d}/logo_{g}{tag}_unseen.json"))
    pc = full["per_class"]
    seen = [v["binary"] for c, v in pc.items() if c not in ("Real", g)]
    print(f"| {g} | {pc[g]['binary']:.3f} | "
          f"{sum(seen)/len(seen):.3f} | {pc['Real']['binary']:.3f} | "
          f"{uns.get('binary_auc', float('nan')):.3f} | "
          f"{uns.get('binary_eer', float('nan')):.3f} |")
EOF
