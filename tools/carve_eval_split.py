"""Carve a held-out segment tree into disjoint CAL / EVAL halves, group-aware.

Round 4 measured Šidák/EER operating points fit on the TRAIN tree missing
their TNR target by ~17 points on held-out files (docs/PERFORMANCE.md
Decision-layer finding 3): real-window quantiles shift between trees. The
protocol fix is to fit operating points on a CALIBRATION split that is (a)
unseen in training and (b) disjoint from the evaluation files. This tool
carves exactly that from a held-out tree: segments are grouped by their
source-file hash prefix (the ``{16-hex}_...`` filename contract,
data/etl.py rename_files — the same group key the leakage audit uses), and
whole groups go to one side, so no source recording straddles the split.

Symlink trees (no data copied):
    python tools/carve_eval_split.py --data-dir D/dataset/test \
        --out-cal D/test_cal --out-eval D/test_eval [--cal-fraction 0.5]
"""

from __future__ import annotations

import argparse
import os
import sys
import zlib


def group_key(name: str) -> str:
    """Leading source-file hash of an ETL segment filename."""
    return name.split("_", 1)[0]


def carve(data_dir: str, out_cal: str, out_eval: str,
          cal_fraction: float = 0.5, seed: int = 0) -> dict:
    stats = {}
    for cls in sorted(os.listdir(data_dir)):
        folder = os.path.join(data_dir, cls)
        if not os.path.isdir(folder):
            continue
        for out in (out_cal, out_eval):
            os.makedirs(os.path.join(out, cls), exist_ok=True)
        n_cal = n_eval = 0
        for name in sorted(os.listdir(folder)):
            if not name.lower().endswith(".wav"):
                continue
            # deterministic group assignment: crc of (seed, group hash) —
            # every segment of one source recording lands on the same side
            h = zlib.crc32(f"{seed}:{group_key(name)}".encode()) / 0xFFFFFFFF
            side = out_cal if h < cal_fraction else out_eval
            dst = os.path.join(side, cls, name)
            if not os.path.lexists(dst):
                os.symlink(os.path.abspath(os.path.join(folder, name)), dst)
            if side is out_cal:
                n_cal += 1
            else:
                n_eval += 1
        stats[cls] = {"cal": n_cal, "eval": n_eval}
    return stats


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--data-dir", required=True)
    p.add_argument("--out-cal", required=True)
    p.add_argument("--out-eval", required=True)
    p.add_argument("--cal-fraction", type=float, default=0.5)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)
    stats = carve(args.data_dir, args.out_cal, args.out_eval,
                  args.cal_fraction, args.seed)
    import json

    print(json.dumps(stats))
    return 0


if __name__ == "__main__":
    sys.exit(main())
