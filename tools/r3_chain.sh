#!/bin/bash
# Round-3 revalidation chain (sequential: one TPU process at a time).
# C8 completed 200/200 (results/j124_C8_r3.jsonl, committed); this
# resumes the chain from C12. C12/C16 earlier partials held only batch
# timings (no ok-instance lines), so they rerun from scratch.
set -u
cd "$(dirname "$0")/.."
R=tools/tpu_run.sh

$R results/j124_C12_r3.jsonl results/j124_C12_r3.err 7200 -- python tools/conformance.py --family j124 --C 12 --n 200
$R results/j124_C16_r3.jsonl results/j124_C16_r3.err 10800 -- python tools/conformance.py --family j124 --C 16 --n 200
$R results/droplet_L1152_r3.jsonl results/droplet_L1152_r3.err 7200 -- python tools/conformance.py --family droplet --L 1152 --n 100
$R results/droplet_L2048_esc_r3.jsonl results/droplet_L2048_esc_r3.err 7200 -- python tools/conformance.py --family droplet --L 2048 --only 26,52,63,65,92,99 --escalate
$R results/r3_probe4.jsonl results/r3_probe4.err 5400 -- python tools/r3_probe4.py
echo "== r3 chain done =="
date
