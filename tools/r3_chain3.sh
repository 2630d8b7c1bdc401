#!/bin/bash
# C16 escalation retries: the 7 wave-pass misses (instances 64, 65, 66,
# 113, 132, 156, 180) are all exact-energy degeneracy undercounts with
# merge_overflow 548-829 — cap-bound. First rung: uncapped merge
# (--cand-factor 0 = exact full-candidate-set semantics). Waits for the
# chain2 follow-ups (PID in /tmp/r3_chain2.pid) to finish first.
set -u
cd "$(dirname "$0")/.."
MAIN=$(cat /tmp/r3_chain2.pid 2>/dev/null || echo 0)
while [ "$MAIN" -gt 0 ] && kill -0 "$MAIN" 2>/dev/null; do
    sleep 60
done
R=tools/tpu_run.sh
$R results/j124_C16_esc_r3.jsonl results/j124_C16_esc_r3.err 14400 -- \
    python tools/conformance.py --family j124 --C 16 \
    --only 64,65,66,113,132,156,180 --path device --cand-factor 0
echo "== r3 chain3 done =="
date
