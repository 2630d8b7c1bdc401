#!/bin/bash
# Beam-width rungs: C12 #27 at M=8192 (uncapped merge came back exact-
# energy/undercounted-degeneracy with merge_overflow=0 and count_max =
# M*Np — beam-diversity-bound, the same failure class round 2 fixed
# with M=8192). Waits for chain7 (real PID in /tmp/r3_chain7_real.pid).
set -u
cd "$(dirname "$0")/.."
MAIN=$(cat /tmp/r3_chain7_real.pid 2>/dev/null || echo 0)
while [ "$MAIN" -gt 0 ] && kill -0 "$MAIN" 2>/dev/null; do
    sleep 60
done
R=tools/tpu_run.sh
$R results/j124_C12_i27_m8192.jsonl results/j124_C12_i27_m8192.err 7200 -- \
    python tools/conformance.py --family j124 --C 12 --only 27 \
    --path device --cand-factor 0 --M 8192
echo "== r3 chain8 done =="
date
