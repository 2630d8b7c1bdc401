#!/bin/bash
# Instance-92 fidelity probe (see tools/r3_probe6.py). Waits for chain4.
set -u
cd "$(dirname "$0")/.."
MAIN=$(cat /tmp/r3_chain4.pid 2>/dev/null || echo 0)
while [ "$MAIN" -gt 0 ] && kill -0 "$MAIN" 2>/dev/null; do
    sleep 60
done
R=tools/tpu_run.sh
$R results/r3_probe6.jsonl results/r3_probe6.err 5400 -- \
    python tools/r3_probe6.py
echo "== r3 chain5 done =="
date
