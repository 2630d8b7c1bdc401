#!/bin/bash
# Rung 3 for the two remaining C16 instances (66, 156): M=16384 with
# cap 16*M = 262144 (their rung-2 count_max was 1.12M/0.62M, so the
# 131072 cap bound; the round-2 protocol's terminal rungs were
# M=16384 and beta=0.5). Then the oracle-checked low-cap validation
# rerun (probe7's first run collided with an early-fired chain).
# Waits for chain11 (real PID in /tmp/r3_chain11_real.pid).
set -u
cd "$(dirname "$0")/.."
MAIN=$(cat /tmp/r3_chain11_real.pid 2>/dev/null || echo 0)
while [ "$MAIN" -gt 0 ] && kill -0 "$MAIN" 2>/dev/null; do
    sleep 60
done
R=tools/tpu_run.sh
$R results/j124_C16_esc3_r3.jsonl results/j124_C16_esc3_r3.err 14400 -- \
    python tools/conformance.py --family j124 --C 16 --only 66,156 \
    --path device --cand-factor 16 --M 16384
$R results/r3_probe7.jsonl results/r3_probe7.err 10800 -- \
    python tools/r3_probe7.py
echo "== r3 chain12 done =="
date
