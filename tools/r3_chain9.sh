#!/bin/bash
# Oracle-checked low-cap validation (tools/r3_probe7.py). Waits for
# chain8 (real PID in /tmp/r3_chain8_real.pid).
set -u
cd "$(dirname "$0")/.."
MAIN=$(cat /tmp/r3_chain8_real.pid 2>/dev/null || echo 0)
while [ "$MAIN" -gt 0 ] && kill -0 "$MAIN" 2>/dev/null; do
    sleep 60
done
R=tools/tpu_run.sh
$R results/r3_probe7.jsonl results/r3_probe7.err 7200 -- \
    python tools/r3_probe7.py
echo "== r3 chain9 done =="
date
