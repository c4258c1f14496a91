"""Summarize the round-4 campaign outputs into markdown tables.

Reads <root>/logo_<G>{,_waug}_full.json / _unseen.json (accuracy_study
output) and <root>/logo_<G>_decision_ab.json (decision_ab output), prints
the LOGO generalization table and the decision-layer A/B table ready for
docs/PERFORMANCE.md.

Usage: python tools/summarize_round4.py runs/study [SynthD SynthF ...]
"""

from __future__ import annotations

import json
import os
import sys


def _load(path):
    try:
        with open(path) as f:
            return json.load(f)
    except (OSError, json.JSONDecodeError):
        return None


def logo_row(root, g, tag=""):
    full = _load(os.path.join(root, f"logo_{g}{tag}_full.json"))
    uns = _load(os.path.join(root, f"logo_{g}{tag}_unseen.json"))
    if not full:
        return None
    pc = full["per_class"]
    seen = [v["binary"] for c, v in pc.items() if c not in ("Real", g)]
    row = {
        "holdout": f"{g}{tag}",
        "unseen_tpr": pc.get(g, {}).get("binary"),
        "seen_tpr": round(sum(seen) / len(seen), 3) if seen else None,
        "real_tnr": pc.get("Real", {}).get("binary"),
        "auc": (uns or {}).get("binary_auc"),
        "eer": (uns or {}).get("binary_eer"),
    }
    return row


def main(argv=None) -> int:
    args = argv if argv is not None else sys.argv[1:]
    root = args[0] if args else "runs/study"
    holdouts = args[1:] or ["SynthD", "SynthF", "SynthA"]

    print("## LOGO arms (6 ep native bf16 joint, hard negatives unless _waug)")
    print("| arm | unseen TPR | seen TPR | Real TNR | unseen AUC | unseen EER |")
    print("|---|---|---|---|---|---|")
    for g in holdouts:
        for tag in ("", "_waug"):
            r = logo_row(root, g, tag)
            if r:
                print(f"| {r['holdout']} | {r['unseen_tpr']} | {r['seen_tpr']}"
                      f" | {r['real_tnr']} | {r['auc']} | {r['eer']} |")

    print()
    print("## Decision-layer A/B (same serving logits, matched operating points)")
    print("| arm | variant | Real TNR | unseen TPR | seen TPR | seen attr |")
    print("|---|---|---|---|---|---|")
    for g in holdouts:
        ab = _load(os.path.join(root, f"logo_{g}_decision_ab.json"))
        if not ab:
            continue
        for name, v in ab["variants"].items():
            print(f"| {g} | {name} | {v.get('real_tnr')} | "
                  f"{v.get('unseen_tpr', '-')} | {v.get('seen_tpr_mean')} | "
                  f"{v.get('seen_attr_mean')} |")

    sd = _load(os.path.join(root, "stablehlo_drive.json"))
    if sd:
        print()
        print(f"## StableHLO on-chip drive: {json.dumps(sd)}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
