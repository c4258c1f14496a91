#!/usr/bin/env bash
# Round-5 front-end kernel A/B (VERDICT r4 #2): spend the last admitted
# sub-ceiling headroom — the factored mel kernel's 0.77 ms vs ~0.3 ms
# matmul bound (the gap is VPU assembly passes). Every probe is a FRESH
# process (same-process multi-mode sequences read ~2x fast on this rig —
# CLAUDE.md twice-confirmed rule), 51 iterations, one config per process.
#
#   melonly ladder: baseline melfct4, then stack_dft / bf16 assembly /
#   both / wpc=8-both / bf16asm+lowp.
#
# Composite promotion happens separately after the gates are flipped.
# Usage: tools/round5_kernel_ab.sh [logdir]
set -uo pipefail
LOG=${1:-/tmp/kernel_ab_r5}
mkdir -p "$LOG"
cd "$(dirname "$0")/.."

for cfg in melfct4 melfct4-stackdft melfct4-bf16asm melfct4-asm-stack \
           melfct8-asm-stack melfct4-asm-lowp; do
  echo "=== $cfg $(date -u +%H:%M:%S)" | tee -a "$LOG/ab.log"
  timeout 1200 python benchmarks/throughput.py --configs "$cfg" --iters 51 \
    > "$LOG/$cfg.json" 2> "$LOG/$cfg.err"
  rc=$?
  echo "=== $cfg rc=$rc $(date -u +%H:%M:%S)" | tee -a "$LOG/ab.log"
  tail -1 "$LOG/$cfg.json" | tee -a "$LOG/ab.log"
done
echo "=== kernel A/B done $(date -u)" | tee -a "$LOG/ab.log"
