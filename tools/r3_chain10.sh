#!/bin/bash
# Beam-width escalation rungs with BOUNDED large caps (the fully
# uncapped M*Np merge program at C16/M=4096 = 1M candidates crashed the
# TPU worker — kernel fault; results/j124_C16_esc_r3.err):
#   1. C12 #27 at M=8192, cap 32*M = 262144 (vs count_max 1M at M=4096;
#      overflow flag reports if the cap binds)
#   2. C16 wave misses (64,65,66,113,132,156,180) at M=8192, cap 16*M =
#      131072 — round 2 fixed 7/8 C16 stragglers with exactly this M
#      escalation
# Waits for chain9 (real PID in /tmp/r3_chain9_real.pid).
set -u
cd "$(dirname "$0")/.."
MAIN=$(cat /tmp/r3_chain9_real.pid 2>/dev/null || echo 0)
while [ "$MAIN" -gt 0 ] && kill -0 "$MAIN" 2>/dev/null; do
    sleep 60
done
R=tools/tpu_run.sh
$R results/j124_C12_i27_m8192.jsonl results/j124_C12_i27_m8192.err 7200 -- \
    python tools/conformance.py --family j124 --C 12 --only 27 \
    --path device --cand-factor 32 --M 8192
$R results/j124_C16_esc2_r3.jsonl results/j124_C16_esc2_r3.err 14400 -- \
    python tools/conformance.py --family j124 --C 16 \
    --only 64,65,66,113,132,156,180 --path device --cand-factor 16 \
    --M 8192
echo "== r3 chain10 done =="
date
