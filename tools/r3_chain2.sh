#!/bin/bash
# Follow-up chain: waits for the main r3 chain (PID in /tmp/r3_chain.pid)
# to finish, then runs the C12 #27 degeneracy retry with the uncapped
# exact merge (first pass: rot-2 energy exact, degeneracy undercount
# 117179136 vs 117225216 with merge_overflow=380 — cap-bound).
set -u
cd "$(dirname "$0")/.."
MAIN=$(cat /tmp/r3_chain.pid 2>/dev/null || echo 0)
while [ "$MAIN" -gt 0 ] && kill -0 "$MAIN" 2>/dev/null; do
    sleep 60
done
R=tools/tpu_run.sh
$R results/j124_C12_i27_retry.jsonl results/j124_C12_i27_retry.err 3600 -- \
    python tools/conformance.py --family j124 --C 12 --only 27 \
    --path device --cand-factor 0
$R results/r3_probe5.jsonl results/r3_probe5.err 5400 -- \
    python tools/r3_probe5.py
echo "== r3 chain2 done =="
date
