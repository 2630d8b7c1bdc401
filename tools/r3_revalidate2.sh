#!/bin/bash
# Follow-up to r3_revalidate.sh: the families the wedge-detector killed
# (C8, C12 — launcher retry bug, fixed), the L1152 rerun (output file
# was clobbered mid-run by a git stash; exit 0 proved 100/100 but the
# per-instance lines were lost), and the L2048 straggler escalation.
set -u
cd "$(dirname "$0")/.."
R=tools/tpu_run.sh

$R results/j124_C8_r3.jsonl  results/j124_C8_r3.err  7200 -- python tools/conformance.py --family j124 --C 8  --n 200
$R results/j124_C12_r3.jsonl results/j124_C12_r3.err 7200 -- python tools/conformance.py --family j124 --C 12 --n 200
$R results/droplet_L1152_r3.jsonl results/droplet_L1152_r3.err 7200 -- python tools/conformance.py --family droplet --L 1152 --n 100
$R results/droplet_L2048_esc_r3.jsonl results/droplet_L2048_esc_r3.err 7200 -- python tools/conformance.py --family droplet --L 2048 --only 26,52,63,65,92,99 --escalate
echo "== revalidate2 done =="
date
