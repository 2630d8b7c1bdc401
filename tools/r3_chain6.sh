#!/bin/bash
# L2048 instance 99 escalation (its slot in the chain timed out at the
# job level after instance 92 consumed the budget; r2 solved 99 at
# D=48 rot=0 in 156 s — results/droplet_L2048_retry.jsonl). Waits for
# chain5.
set -u
cd "$(dirname "$0")/.."
MAIN=$(cat /tmp/r3_chain5.pid 2>/dev/null || echo 0)
while [ "$MAIN" -gt 0 ] && kill -0 "$MAIN" 2>/dev/null; do
    sleep 60
done
R=tools/tpu_run.sh
$R results/droplet_L2048_99_esc.jsonl results/droplet_L2048_99_esc.err 7200 -- \
    python tools/conformance.py --family droplet --L 2048 --only 99 \
    --D 48 --M 2048
echo "== r3 chain6 done =="
date
