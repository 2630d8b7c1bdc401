#!/bin/bash
# Sequential tail of the round-3 revalidation queue (replaces the
# fragile chain4/5/6 watcher daisy after a double-fork kill bug let a
# stale watcher launch a duplicate TPU job). Waits for the chain3 C16
# uncapped retries (real script PID in /tmp/r3_chain3_real.pid), then:
#   1. droplet L1152 rerun (first launch died on an import race)
#   2. C16 second-rung escalation (M=8192, uncapped) for any instance
#      the first rung left unmatched
#   3. droplet L2048 instance 99 at the reference operating point
#   4. instance-92 fidelity probe (tools/r3_probe6.py)
set -u
cd "$(dirname "$0")/.."
MAIN=$(cat /tmp/r3_chain3_real.pid 2>/dev/null || echo 0)
while [ "$MAIN" -gt 0 ] && kill -0 "$MAIN" 2>/dev/null; do
    sleep 60
done
R=tools/tpu_run.sh

$R results/droplet_L1152_r3.jsonl results/droplet_L1152_r3.err 7200 -- \
    python tools/conformance.py --family droplet --L 1152 --n 100

FAILED=$(python - <<'EOF'
import json
bad = []
try:
    for line in open("results/j124_C16_esc_r3.jsonl"):
        line = line.strip()
        if line.startswith("{"):
            r = json.loads(line)
            if "instance" in r and not r.get("ok"):
                bad.append(str(r["instance"]))
except FileNotFoundError:
    pass
print(",".join(bad))
EOF
)
if [ -n "$FAILED" ]; then
    $R results/j124_C16_esc2_r3.jsonl results/j124_C16_esc2_r3.err 14400 -- \
        python tools/conformance.py --family j124 --C 16 --only "$FAILED" \
        --path device --cand-factor 0 --M 8192
fi

$R results/droplet_L2048_99_esc.jsonl results/droplet_L2048_99_esc.err 7200 -- \
    python tools/conformance.py --family droplet --L 2048 --only 99 \
    --D 48 --M 2048

$R results/r3_probe6.jsonl results/r3_probe6.err 5400 -- \
    python tools/r3_probe6.py
echo "== r3 chain7 done =="
date
