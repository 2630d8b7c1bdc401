#!/bin/bash
# Rerun of the L1152 droplet revalidation (its first launch raced a
# library edit mid-session and died on an import-skew unpack error).
# Waits for chain3 (PID in /tmp/r3_chain3.pid) to finish first.
set -u
cd "$(dirname "$0")/.."
MAIN=$(cat /tmp/r3_chain3.pid 2>/dev/null || echo 0)
while [ "$MAIN" -gt 0 ] && kill -0 "$MAIN" 2>/dev/null; do
    sleep 60
done
R=tools/tpu_run.sh
$R results/droplet_L1152_r3.jsonl results/droplet_L1152_r3.err 7200 -- \
    python tools/conformance.py --family droplet --L 1152 --n 100
echo "== r3 chain4 done =="
date
