#!/bin/bash
# Localize the r2->r3 f32 drift on L2048 #92 (r2 hit the oracle at
# rot=2; today both device paths agree on -3398.45 there): A/B the
# randomized-sketch zip-up truncation, the main r3 boundary-build
# change (TNAX_ZIPUP_RSVD=0 forces the exact SVD path). Waits for
# chain10 (real PID in /tmp/r3_chain10_real.pid).
set -u
cd "$(dirname "$0")/.."
MAIN=$(cat /tmp/r3_chain10_real.pid 2>/dev/null || echo 0)
while [ "$MAIN" -gt 0 ] && kill -0 "$MAIN" 2>/dev/null; do
    sleep 60
done
R=tools/tpu_run.sh
TNAX_ZIPUP_RSVD=0 $R results/r3_probe6_rsvd0.jsonl \
    results/r3_probe6_rsvd0.err 5400 -- python tools/r3_probe6.py
echo "== r3 chain11 done =="
date
